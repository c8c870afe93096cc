"""Multimodal plumbing tests: binary payload columns survive the Arrow
round trip, the mapInPandas stages produce the pinned schema, real codecs
raise the documented NotImplementedError."""

from __future__ import annotations

import pytest

from lakehouse_architecture_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_image_stub,
    encode_fake_image,
    extract_image_features,
    resize_images,
    sample_video_frames,
)


@pytest.fixture()
def media(spark):
    rows = [
        (1, "image", "fake", encode_fake_image(64, 48, seed=7), 64, 48, None),
        (2, "image", "fake", encode_fake_image(8, 8, seed=9), 8, 8, None),
        (3, "image", "fake", None, None, None, None),  # null payload
        (4, "video", "fake", b"", 320, 240, 2500),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_image_features(spark, media):
    out = extract_image_features(media.filter("kind = 'image'"))
    rows = {r.media_id: r for r in out.collect()}
    assert rows[1].decoded_width == 64 and rows[1].decoded_height == 48
    assert rows[2].payload_bytes == 8 + 16 + 64
    assert rows[3].mean_pixel is None
    # deterministic across runs
    again = {r.media_id: r.mean_pixel for r in
             extract_image_features(media.filter("kind = 'image'")).collect()}
    assert again[1] == rows[1].mean_pixel


def test_decode_rejects_unknown_formats():
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"\x89PNG\r\n\x1a\n....")  # truncated PNG
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"not an image at all")


def _png_bytes(width: int, height: int) -> bytes:
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    chunk = b"IHDR" + ihdr
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
    )


def _jpeg_bytes(width: int, height: int) -> bytes:
    import struct

    # SOI + APP0(JFIF) + DQT filler + SOF0 frame header
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00" * 6
    dqt = b"\xff\xdb" + struct.pack(">H", 4) + b"\x00\x00"
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", height, width)
        + b"\x01\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + dqt + sof0


def test_decode_real_image_headers():
    """Real container headers parse to actual dimensions (pure Python,
    no codec library)."""
    import struct

    from lakehouse_architecture_spark.operators.multimodal import decode_image

    assert decode_image(_png_bytes(640, 480)) == {
        "width": 640, "height": 480, "mean_pixel": None,
    }
    assert decode_image(_jpeg_bytes(1024, 768)) == {
        "width": 1024, "height": 768, "mean_pixel": None,
    }
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 4
    assert decode_image(gif)["width"] == 320
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 64, -48) + b"\x00" * 4
    out = decode_image(bmp)
    assert (out["width"], out["height"]) == (64, 48)  # top-down height abs'd


def test_decode_wav_header():
    import struct

    from lakehouse_architecture_spark.operators.multimodal import decode_audio

    rate, channels, bits, n_frames = 44100, 2, 16, 44100 * 3
    data_len = n_frames * channels * (bits // 8)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, 4, bits)
    wav = (
        b"RIFF" + struct.pack("<I", 36 + data_len) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", data_len) + b"\x00" * 64  # truncated body
    )
    out = decode_audio(wav)
    assert out["sample_rate"] == rate
    assert out["n_samples"] == n_frames
    assert out["rms"] is None


def test_mixed_real_and_fake_formats_in_one_batch(spark):
    """The mapInPandas stage handles fake + real headers in one Arrow
    batch — metadata from headers, pixel stats only where decodable."""
    rows = [
        (1, "image", "fake", encode_fake_image(64, 48, seed=7), 64, 48, None),
        (2, "image", "png", _png_bytes(800, 600), 800, 600, None),
        (3, "image", "jpeg", _jpeg_bytes(320, 240), 320, 240, None),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in extract_image_features(df).collect()}
    assert (out[2].decoded_width, out[2].decoded_height) == (800, 600)
    assert (out[3].decoded_width, out[3].decoded_height) == (320, 240)
    assert out[1].mean_pixel is not None and out[2].mean_pixel is None


def test_resize_rewrites_metadata(spark, media):
    out = {r.media_id: (r.width, r.height)
           for r in resize_images(media, max_dim=32).collect()}
    assert out[1] == (32, 24)   # 64x48 scaled by 0.5
    assert out[2] == (8, 8)     # already within bounds
    assert out[3] == (None, None)


def test_sample_video_frames(spark, media):
    frames = sample_video_frames(media, every_ms=1000).collect()
    assert {(f.media_id, f.frame_ts_ms) for f in frames} == {
        (4, 0), (4, 1000), (4, 2000),
    }


def test_extract_audio_features(spark):
    from lakehouse_architecture_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_fake_audio,
        extract_audio_features,
    )

    rows = [
        (1, "audio", "fake", encode_fake_audio(16000, 32000, 7), None, None, 2000),
        (2, "audio", "fake", None, None, None, None),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in extract_audio_features(df).collect()}
    assert out[1].sample_rate == 16000
    assert out[1].duration_computed_ms == 2000
    assert float(out[1].rms) > 0
    assert out[2].sample_rate is None


def test_binary_file_ingest_roundtrip(spark, tmp_path):
    """binaryFile source -> MEDIA_SCHEMA contract -> feature extraction:
    files written to disk come back as decodable media rows."""
    from lakehouse_architecture_spark.operators.multimodal import (
        encode_fake_image,
        extract_image_features,
    )
    from lakehouse_architecture_spark.sources.readers import (
        media_table_from_binary_files,
    )

    for i in range(3):
        (tmp_path / f"img_{i}.fake").write_bytes(encode_fake_image(8, 6, seed=i))
    (tmp_path / "notes.txt").write_text("not an image")

    media = media_table_from_binary_files(
        spark, str(tmp_path) + "/*.fake", kind="image", fmt="fake"
    )
    rows = media.collect()
    assert len(rows) == 3  # glob excluded the .txt
    assert len({r.media_id for r in rows}) == 3  # stable distinct ids
    assert all(r.kind == "image" and r.payload is not None for r in rows)

    feats = extract_image_features(media).collect()
    assert sorted((f.decoded_width, f.decoded_height) for f in feats) == [(8, 6)] * 3


# ---------------------------------------------------------------------------
# dHash perceptual near-dup + spectral audio features
# ---------------------------------------------------------------------------


def _gradient_png(seed: int = 0, flip: int = 0) -> bytes:
    """A 32x24 RGB gradient PNG; ``flip`` perturbs that many pixels by
    a small amount (dHash must survive it), seed shifts the ramp."""
    import numpy as np

    from lakehouse_architecture_spark.operators.codecs import encode_png

    h, w = 24, 32
    y, x = np.mgrid[0:h, 0:w]
    px = np.stack(
        [(x * 8 + seed) % 256, (y * 10 + seed) % 256, (x * 3 + y * 5) % 256],
        axis=2,
    ).astype(np.uint8)
    rng = np.random.RandomState(42)
    for _ in range(flip):
        py, pxx = rng.randint(0, h), rng.randint(0, w)
        px[py, pxx] = np.clip(px[py, pxx].astype(int) + 4, 0, 255)
    return encode_png(px)


def test_image_dhash_deterministic_and_discriminative():
    from lakehouse_architecture_spark.operators.multimodal import image_dhash

    a = image_dhash(_gradient_png())
    assert a is not None and a == image_dhash(_gradient_png())
    # a tiny perturbation keeps the hash within a small Hamming ball
    b = image_dhash(_gradient_png(flip=5))
    assert bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1") <= 4
    # an inverted image lands far away
    import numpy as np

    from lakehouse_architecture_spark.operators.codecs import (
        decode_png,
        encode_png,
    )

    inv = encode_png(255 - decode_png(_gradient_png()))
    c = image_dhash(inv)
    assert bin((a ^ c) & 0xFFFFFFFFFFFFFFFF).count("1") > 10


def test_image_dhash_format_invariance():
    """The same pixels hash identically regardless of container format."""
    import numpy as np

    from lakehouse_architecture_spark.operators.codecs import (
        decode_png,
        encode_png,
    )
    from lakehouse_architecture_spark.operators.multimodal import image_dhash

    px = decode_png(_gradient_png())
    assert image_dhash(encode_png(px)) == image_dhash(
        encode_png(px.copy())
    )


def test_image_near_dup_pairs(spark):
    from lakehouse_architecture_spark.operators.multimodal import (
        extract_image_dhash,
        image_near_dup_pairs,
    )

    rows = [
        (1, _gradient_png()),
        (2, _gradient_png(flip=5)),        # near-dup of 1
        (3, _gradient_png(seed=97)),       # different ramp
        (4, None),                          # null payload: dropped
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    hashes = extract_image_dhash(df)
    pairs = image_near_dup_pairs(hashes, max_hamming=4).collect()
    found = {(r.media_a, r.media_b) for r in pairs}
    assert (1, 2) in found
    for r in pairs:
        assert r.hamming <= 4
    # identical payloads are always found (hamming 0)
    df2 = spark.createDataFrame(
        [(10, _gradient_png()), (11, _gradient_png())],
        "media_id long, payload binary",
    )
    exact = image_near_dup_pairs(extract_image_dhash(df2), max_hamming=0)
    assert [(r.media_a, r.media_b, r.hamming) for r in exact.collect()] == [
        (10, 11, 0)
    ]


def test_image_near_dup_threshold_guard(spark):
    import pytest as _pytest

    from lakehouse_architecture_spark.operators.multimodal import (
        image_near_dup_pairs,
    )

    df = spark.createDataFrame([(1, 0)], "media_id long, dhash long")
    with _pytest.raises(ValueError):
        image_near_dup_pairs(df, max_hamming=8)


def test_audio_spectral_features_pure_tone(spark):
    import numpy as np

    from lakehouse_architecture_spark.operators.codecs import encode_wav
    from lakehouse_architecture_spark.operators.multimodal import (
        audio_spectral_features,
        extract_audio_spectral_features,
    )

    sr = 8000
    t = np.arange(sr)  # 1 second
    tone = (np.sin(2 * np.pi * 1000 * t / sr) * 20000).astype(np.int64)
    feats = audio_spectral_features(encode_wav(tone, sr))
    # a 1 kHz tone at 8 kHz: 2 crossings per cycle -> ZCR = 2*f/sr
    assert abs(feats["zcr"] - 0.25) < 0.01
    assert abs(feats["spectral_centroid_hz"] - 1000) < 25
    # a higher tone moves the centroid up
    hi = (np.sin(2 * np.pi * 3000 * t / sr) * 20000).astype(np.int64)
    hi_feats = audio_spectral_features(encode_wav(hi, sr))
    assert hi_feats["spectral_centroid_hz"] > feats["spectral_centroid_hz"]
    # and through the mapInPandas stage
    df = spark.createDataFrame(
        [(1, encode_wav(tone, sr)), (2, None)], "media_id long, payload binary"
    )
    rows = {r.media_id: r for r in extract_audio_spectral_features(df).collect()}
    assert abs(rows[1].zcr - 0.25) < 0.01
    assert rows[2].spectral_centroid_hz is None


def test_image_dedup_keep_one(spark):
    """dHash -> components -> keep-one: a 3-variant near-dup family
    collapses to its min id; distinct and undecodable images survive."""
    from lakehouse_architecture_spark.operators.multimodal import (
        image_dedup_keep_one,
    )

    rows = [
        (1, _gradient_png()),
        (2, _gradient_png(flip=3)),       # near-dup of 1
        (3, _gradient_png(flip=6)),       # near-dup of 1 (and of 2)
        (10, _gradient_png(seed=97)),     # distinct ramp
        (11, None),                        # undecodable: kept
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    kept = sorted(r.media_id for r in image_dedup_keep_one(df).collect())
    assert kept == [1, 10, 11]


def test_media_feature_extractors_survive_fuzz():
    """Header parsers and the dHash/spectral feature functions must
    handle garbage payloads without unexpected exception types — the
    mapInPandas stages run them over scraped corpora."""
    import random

    from lakehouse_architecture_spark.operators.multimodal import (
        audio_spectral_features,
        decode_audio,
        decode_image,
        image_dhash,
        parse_image_header,
        parse_wav_header,
    )

    rng = random.Random(7)
    magics = [
        b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff\xe0", b"GIF89a", b"BM",
        b"RIFF", b"RIFFxxxxWAVE", b"",
    ]
    for _ in range(120):
        blob = rng.choice(magics) + bytes(
            rng.randrange(256) for _ in range(rng.randrange(0, 200))
        )
        parse_image_header(blob)
        parse_wav_header(blob)
        try:
            decode_image(blob)
        except NotImplementedError:
            pass
        try:
            image_dhash(blob)
        except NotImplementedError:
            pass
        try:
            decode_audio(blob)
        except NotImplementedError:
            pass
        audio_spectral_features(blob)
