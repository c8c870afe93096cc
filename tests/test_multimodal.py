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


def test_decode_stub_rejects_real_codecs():
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"\x89PNG\r\n\x1a\n....")


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
