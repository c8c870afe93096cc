"""Pure-Python PNG/WAV codec tests: filter round-trips against a
reference encoder, palette expansion, PCM loudness, and the Spark
resize stage doing real pixel work."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from lakehouse_architecture_spark.operators.codecs import (
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
    resize_nearest,
)

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _reference_filter(pixels: np.ndarray, filt: int) -> bytes:
    """Independently apply one PNG filter to every scanline (the
    encoder side of the spec, so decode must invert it exactly)."""
    h, w, ch = pixels.shape
    stride = w * ch
    flat = pixels.reshape(h, stride).astype(np.int32)
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        row = flat[y]
        enc = np.zeros(stride, dtype=np.int32)
        for x in range(stride):
            a = int(row[x - ch]) if x >= ch else 0
            b = int(prev[x])
            c = int(prev[x - ch]) if x >= ch else 0
            if filt == 0:
                pred = 0
            elif filt == 1:
                pred = a
            elif filt == 2:
                pred = b
            elif filt == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            enc[x] = (int(row[x]) - pred) & 0xFF
        out += bytes([filt]) + enc.astype(np.uint8).tobytes()
        prev = row
    return bytes(out)


def _png_from_raw(w: int, h: int, color: int, raw: bytes, plte=None) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    body = _chunk(b"IHDR", ihdr)
    if plte is not None:
        body += _chunk(b"PLTE", plte)
    return (
        _PNG_MAGIC
        + body
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_png_decode_inverts_every_filter(filt):
    rng = np.random.default_rng(42 + filt)
    px = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    payload = _png_from_raw(7, 5, 2, _reference_filter(px, filt))
    assert np.array_equal(decode_png(payload), px)


def test_png_encode_decode_roundtrip_all_channel_counts():
    rng = np.random.default_rng(7)
    for ch in (1, 2, 3, 4):
        px = rng.integers(0, 256, size=(6, 4, ch), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(px)), px)


def test_png_palette_expansion():
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)[:, :, None]
    payload = _png_from_raw(2, 2, 3, _reference_filter(idx, 0), plte=pal)
    px = decode_png(payload)
    assert px.shape == (2, 2, 3)
    assert tuple(px[0, 0]) == (255, 0, 0)
    assert tuple(px[0, 1]) == (0, 255, 0)
    assert tuple(px[1, 0]) == (0, 0, 255)


def test_png_rejects_unsupported_variants():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    # sub-byte depths (1/2/4-bit) remain unsupported and raise loudly
    ihdr = struct.pack(">IIBBBBB", 1, 1, 4, 0, 0, 0, 0)
    p4 = _PNG_MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError):
        decode_png(p4)


def test_resize_nearest_bounds_and_content():
    px = np.arange(8 * 4 * 3, dtype=np.uint8).reshape(8, 4, 3)
    out = resize_nearest(px, 4)
    assert out.shape == (4, 2, 3)
    assert np.array_equal(out[0, 0], px[0, 0])  # top-left preserved
    assert resize_nearest(px, 100).shape == (8, 4, 3)  # no upscale


def _bmp_bytes(px: np.ndarray, top_down: bool = False) -> bytes:
    """Hand-built uncompressed 24-bit BMP (BGR rows, 4-byte padding)."""
    h, w, _ = px.shape
    row_bytes = (w * 3 + 3) & ~3
    rows = px[:, :, ::-1]  # RGB -> BGR
    if not top_down:
        rows = rows[::-1]
    body = b"".join(
        rows[y].tobytes() + b"\x00" * (row_bytes - w * 3) for y in range(h)
    )
    hs = -h if top_down else h
    info = struct.pack("<IiiHHIIiiII", 40, w, hs, 1, 24, 0, len(body), 0, 0, 0, 0)
    header = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
    return header + info + body


def test_bmp_decode_both_row_orders():
    from lakehouse_architecture_spark.operators.codecs import decode_bmp

    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(3, 5, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(_bmp_bytes(px)), px)
    assert np.array_equal(decode_bmp(_bmp_bytes(px, top_down=True)), px)
    with pytest.raises(ValueError):
        decode_bmp(_bmp_bytes(px)[:-8])  # truncated pixel data


def test_bmp_decode_rle8():
    """RLE8-compressed paletted BMP: encoded runs, absolute mode with
    word alignment, end-of-line, delta skip, end-of-bitmap — each
    opcode exercised, expected pixels hand-computable."""
    from lakehouse_architecture_spark.operators.codecs import decode_bmp

    # palette: 0 black, 1 red, 2 green (stored BGRA)
    pal = bytes([0, 0, 0, 0]) + bytes([0, 0, 255, 0]) + bytes([0, 255, 0, 0])
    # 5x3, bottom-up. Stored rows (bottom first):
    #  row0: run(5,1)                      -> 1 1 1 1 1
    #  row1: abs(3:[2,0,2])+pad, run(2,1)  -> 2 0 2 1 1
    #  row2: run(2,2), delta(+2,+0), run(1,1), EOB -> 2 2 0 0 1
    rle = bytes(
        [5, 1, 0, 0]
        + [0, 3, 2, 0, 2, 0]  # absolute 3 + pad byte
        + [2, 1, 0, 0]
        + [2, 2, 0, 2, 2, 0, 1, 1, 0, 1]
    )
    info = struct.pack("<IiiHHIIiiII", 40, 5, 3, 1, 8, 1, len(rle), 0, 0, 3, 0)
    off = 54 + len(pal)
    payload = (
        b"BM" + struct.pack("<IHHI", off + len(rle), 0, 0, off) + info
        + pal + rle
    )
    px = decode_bmp(payload)
    assert px.shape == (3, 5, 3)
    RED, GREEN, BLACK = (255, 0, 0), (0, 255, 0), (0, 0, 0)
    # top display row = stored row 2
    assert [tuple(c) for c in px[0]] == [GREEN, GREEN, BLACK, BLACK, RED]
    assert [tuple(c) for c in px[1]] == [GREEN, BLACK, GREEN, RED, RED]
    assert [tuple(c) for c in px[2]] == [RED] * 5


def test_bmp_decode_8bit_palette():
    from lakehouse_architecture_spark.operators.codecs import decode_bmp

    # 2x2 indices into a 2-entry palette; rows padded to 4 bytes,
    # bottom-up; palette entries are BGRA quads
    pal = bytes([0, 0, 255, 0]) + bytes([0, 255, 0, 0])  # red, green (BGR)
    rows = bytes([0, 1, 0, 0]) + bytes([1, 0, 0, 0])  # bottom row first
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 0, len(rows), 0, 0, 2, 0)
    off = 54 + len(pal)
    payload = (
        b"BM" + struct.pack("<IHHI", off + len(rows), 0, 0, off) + info
        + pal + rows
    )
    px = decode_bmp(payload)
    assert px.shape == (2, 2, 3)
    assert tuple(px[0, 0]) == (0, 255, 0)   # top row = second data row
    assert tuple(px[1, 1]) == (0, 255, 0)
    assert tuple(px[1, 0]) == (255, 0, 0)


def _gif_lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    """Test-side GIF LZW encoder emitting CLEAR + literals + END,
    mirroring the decoder's code-width growth rule."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    bits: list[int] = []

    def emit(code: int, width: int) -> None:
        for k in range(width):
            bits.append((code >> k) & 1)

    width = min_code_size + 1
    emit(clear, width)
    table_len = clear + 2
    for j, idx in enumerate(indices):
        emit(idx, width)
        if j > 0:  # decoder appends an entry per code after the first
            table_len += 1
            if table_len == (1 << width) and width < 12:
                width += 1
    emit(end, width)
    out = bytearray()
    for k in range(0, len(bits), 8):
        out.append(sum(b << i for i, b in enumerate(bits[k : k + 8])))
    return bytes(out)


def _gif_bytes(idx: np.ndarray, palette: bytes, interlaced: bool = False) -> bytes:
    h, w = idx.shape
    n_colors = len(palette) // 3
    depth = max((n_colors - 1).bit_length(), 1)
    lsd_flags = 0x80 | (depth - 1)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, lsd_flags, 0, 0)
    out += palette + b"\x00" * ((2 << (depth - 1)) * 3 - len(palette))
    grid = idx
    if interlaced:
        order = (
            list(range(0, h, 8)) + list(range(4, h, 8))
            + list(range(2, h, 4)) + list(range(1, h, 2))
        )
        grid = idx[order]
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlaced else 0)
    min_code = max(depth, 2)
    out += bytes([min_code])
    lzw = _gif_lzw_encode([int(v) for v in grid.flatten()], min_code)
    for k in range(0, len(lzw), 255):
        blk = lzw[k : k + 255]
        out += bytes([len(blk)]) + blk
    out += b"\x00\x3b"
    return bytes(out)


def test_gif_decode_plain_and_interlaced():
    from lakehouse_architecture_spark.operators.codecs import decode_gif

    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
    rng = np.random.default_rng(11)
    idx = rng.integers(0, 4, size=(10, 6), dtype=np.uint8)
    expect = np.frombuffer(pal, dtype=np.uint8).reshape(-1, 3)[idx]
    got = decode_gif(_gif_bytes(idx, pal))
    assert np.array_equal(got, expect)
    got_i = decode_gif(_gif_bytes(idx, pal, interlaced=True))
    assert np.array_equal(got_i, expect)
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a" + b"\x00" * 20)


def test_gif_lzw_table_growth_paths():
    """A stream long enough to force several code-width bumps: the
    decoder's table-growth / width-transition bookkeeping must stay in
    lockstep with the (literal-only) encoder across 4->5->...->11 bit
    widths or the pixel indices shear mid-image."""
    from lakehouse_architecture_spark.operators.codecs import decode_gif

    pal = bytes([0, 0, 0, 255, 255, 255])
    idx = np.tile(np.array([0, 1], dtype=np.uint8), 600).reshape(30, 40)
    got = decode_gif(_gif_bytes(idx, pal))
    expect = np.frombuffer(pal, dtype=np.uint8).reshape(-1, 3)[idx]
    assert np.array_equal(got, expect)


def test_decode_image_full_pixels_for_bmp_and_gif():
    from lakehouse_architecture_spark.operators.multimodal import decode_image

    px = np.full((4, 4, 3), 100, dtype=np.uint8)
    out = decode_image(_bmp_bytes(px))
    assert (out["width"], out["height"]) == (4, 4)
    assert out["mean_pixel"] == 100.0
    pal = bytes([10, 10, 10, 30, 30, 30])
    idx = np.zeros((2, 2), dtype=np.uint8)
    out = decode_image(_gif_bytes(idx, pal))
    assert out["mean_pixel"] == 10.0


# ---- JPEG fixtures: hand-assembled baseline streams with custom tiny
# Huffman tables, so expected pixels are computable by hand/numpy ----

# DC table: categories 0/1/2 at code length 2 -> "00","01","10"
_JPG_DC = (bytes([0, 3] + [0] * 14), bytes([0, 1, 2]))
# AC table: EOB (0x00) and run0/size1 (0x01) at length 2; ZRL unused
_JPG_AC = (bytes([0, 2] + [0] * 14), bytes([0x00, 0x01]))


def _jpeg_segments(w, h, comps, q=16):
    out = bytearray(b"\xff\xd8")

    def seg(marker, body):
        out.extend(bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body)

    seg(0xDB, bytes([0]) + bytes([q] * 64))  # DQT id 0
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hs, vs in comps:
        sof += bytes([cid, (hs << 4) | vs, 0])
    seg(0xC0, sof)
    seg(0xC4, bytes([0x00]) + _JPG_DC[0] + _JPG_DC[1])  # DC table 0
    seg(0xC4, bytes([0x10]) + _JPG_AC[0] + _JPG_AC[1])  # AC table 0
    sos = bytes([len(comps)])
    for cid, _hs, _vs in comps:
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)
    return out


def _pack_bits(bits: str) -> bytes:
    bits += "1" * (-len(bits) % 8)  # pad with 1s per spec
    raw = bytes(int(bits[k : k + 8], 2) for k in range(0, len(bits), 8))
    return raw.replace(b"\xff", b"\xff\x00")  # byte stuffing


def _jpeg_bytes(w, h, comps, bits: str, q=16) -> bytes:
    return bytes(_jpeg_segments(w, h, comps, q) + _pack_bits(bits) + b"\xff\xd9")


def _ref_idct(coeff: np.ndarray) -> np.ndarray:
    """Independent direct-cosine-sum IDCT (orthonormal), for expected
    pixel values."""
    out = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8)
                    cv = np.sqrt(1 / 8) if v == 0 else np.sqrt(2 / 8)
                    s += (
                        cu * cv * coeff[u, v]
                        * np.cos((2 * y + 1) * u * np.pi / 16)
                        * np.cos((2 * x + 1) * v * np.pi / 16)
                    )
            out[y, x] = s
    return out + 128.0


# Progressive AC table: EOB0 (0x00) and run0/size1 (0x01) at length 2,
# EOB1 (0x10) at length 3 ("100") so EOB-run coverage is testable.
_JPG_AC_PROG = (bytes([0, 2, 1] + [0] * 13), bytes([0x00, 0x01, 0x10]))


def _jpeg_prog_bytes(w, h, comps, scans, q=16) -> bytes:
    """Assemble a PROGRESSIVE (SOF2) stream: shared tables + one SOS
    per (component_ids, Ss, Se, Ah, Al, bits) scan tuple."""
    out = bytearray(b"\xff\xd8")

    def seg(marker, body):
        out.extend(bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body)

    seg(0xDB, bytes([0]) + bytes([q] * 64))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hs, vs in comps:
        sof += bytes([cid, (hs << 4) | vs, 0])
    seg(0xC2, sof)  # SOF2: progressive
    seg(0xC4, bytes([0x00]) + _JPG_DC[0] + _JPG_DC[1])
    seg(0xC4, bytes([0x10]) + _JPG_AC_PROG[0] + _JPG_AC_PROG[1])
    for cids, ss, se, ah, al, bits in scans:
        sos = bytes([len(cids)])
        for cid in cids:
            sos += bytes([cid, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        seg(0xDA, sos)
        out.extend(_pack_bits(bits))
    out.extend(b"\xff\xd9")
    return bytes(out)


def test_jpeg_progressive_dc_successive_approximation():
    """DC first scan at Al=1 plus a refinement scan must reconstruct
    DC=3 exactly (2 from the shifted first pass | 1 correction bit):
    uniform 128 + 3*16/8 = 134."""
    from lakehouse_architecture_spark.operators.codecs import decode_jpeg

    px = decode_jpeg(
        _jpeg_prog_bytes(
            8, 8, [(1, 1, 1)],
            [
                ([1], 0, 0, 0, 1, "01" + "1"),  # DC first: +1 -> coef 2
                ([1], 0, 0, 1, 0, "1"),         # DC refine: |1 -> coef 3
                ([1], 1, 63, 0, 0, "00"),       # AC first: EOB
            ],
        )
    )
    assert px.shape == (8, 8, 1)
    assert np.all(px == 134)


def test_jpeg_progressive_ac_eobrun_and_refinement():
    """Two blocks; the AC first scan places k=1 at Al=1 and covers the
    second block with an EOB run (EOB1); the refinement scan corrects
    k=1 upward and inserts a brand-new k=2 coefficient. Expected pixels
    from the independent cosine-sum IDCT."""
    from lakehouse_architecture_spark.operators.codecs import decode_jpeg

    px = decode_jpeg(
        _jpeg_prog_bytes(
            16, 8, [(1, 1, 1)],
            [
                ([1], 0, 0, 0, 0, "00" + "00"),  # DC first: both DC=0
                # AC first, Al=1: blk1 k1=+1<<1=2, then EOB1(+0 bits)=1
                # -> blk2 entirely skipped
                ([1], 1, 63, 0, 1, "01" + "1" + "100" + "0"),
                # AC refine, Al=0: blk1: new k2=+1 ("01","1"), correction
                # bit 1 for k1 (2->3), EOB0; blk2: EOB0
                ([1], 1, 63, 1, 0, "01" + "1" + "1" + "00" + "00"),
            ],
        )
    )
    assert px.shape == (8, 16, 1)
    mat = np.zeros((8, 8))
    mat[0, 1] = 3 * 16  # zigzag k=1
    mat[1, 0] = 1 * 16  # zigzag k=2
    expected = np.clip(np.round(_ref_idct(mat)), 0, 255)
    assert np.array_equal(px[:, :8, 0], expected)
    assert np.all(px[:, 8:, 0] == 128)


def test_jpeg_progressive_interleaved_color_420():
    """Interleaved DC scan over 4:2:0 MCUs (4 Y + Cb + Cr blocks) plus
    per-component AC scans: uniform Y=132, neutral chroma."""
    from lakehouse_architecture_spark.operators.codecs import decode_jpeg

    px = decode_jpeg(
        _jpeg_prog_bytes(
            16, 16, [(1, 2, 2), (2, 1, 1), (3, 1, 1)],
            [
                # DC interleaved: Y diffs +2,0,0,0; Cb 0; Cr 0
                ([1, 2, 3], 0, 0, 0, 0, "10" + "10" + "00" * 3 + "00" + "00"),
                ([1], 1, 63, 0, 0, "00" * 4),
                ([2], 1, 63, 0, 0, "00"),
                ([3], 1, 63, 0, 0, "00"),
            ],
        )
    )
    assert px.shape == (16, 16, 3)
    assert np.all(px == 132)


# ---- test-side JPEG encoders for the baseline-vs-progressive
# equivalence property: same coefficients, two codings, one answer ----

# DC categories 0..6 at code length 3; AC: EOB, ZRL and (run,size) for
# run 0..15 x size 1..3 at code length 8 (canonical, order as listed)
_PROP_DC = (bytes([0, 0, 7] + [0] * 13), bytes(range(7)))
_PROP_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 4)
]
_PROP_AC = (
    bytes([0, 0, 0, 0, 0, 0, 0, len(_PROP_AC_SYMS)] + [0] * 8),
    bytes(_PROP_AC_SYMS),
)


def _enc_codes(counts, symbols):
    """symbol -> canonical bitstring (the encoder mirror of the
    decoder's _build_huffman)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[k]] = format(code, f"0{length}b")
            code += 1
            k += 1
        code <<= 1
    return out


_DC_CODE = _enc_codes(_PROP_DC[0], _PROP_DC[1])
_AC_CODE = _enc_codes(_PROP_AC[0], _PROP_AC[1])


def _cat_bits(v: int) -> tuple[int, str]:
    """JPEG category + magnitude bits for a signed value."""
    if v == 0:
        return 0, ""
    cat = abs(v).bit_length()
    mag = v if v > 0 else v + (1 << cat) - 1
    return cat, format(mag, f"0{cat}b")


def _enc_baseline_blocks(blocks) -> str:
    """blocks: list of length-64 int arrays (zigzag order)."""
    bits, pred = "", 0
    for zz in blocks:
        cat, mag = _cat_bits(int(zz[0]) - pred)
        pred = int(zz[0])
        bits += _DC_CODE[cat] + mag
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                bits += _AC_CODE[0xF0]
                run -= 16
            cat, mag = _cat_bits(v)
            bits += _AC_CODE[(run << 4) | cat] + mag
            run = 0
        if run:
            bits += _AC_CODE[0x00]
    return bits


def _enc_prog_scans(blocks):
    """Progressive coding of the same blocks, mirroring the spec's
    (and libjpeg's) successive-approximation encoders: DC first at
    Al=1 (arithmetic >> like the decoder's <<) + DC refine bit, AC
    first (band 1-63) at Al=1 with magnitude truncation toward zero
    + AC refine at Al=0 with ZRL/EOB correction-bit buffering. Returns
    the four scans' bit strings."""
    dc1, dcr, pred = "", "", 0
    for zz in blocks:
        hi = int(zz[0]) >> 1  # arithmetic (floor) shift, both signs
        cat, mag = _cat_bits(hi - pred)
        pred = hi
        dc1 += _DC_CODE[cat] + mag
        dcr += str(int(zz[0]) & 1)

    ac1 = ""
    for zz in blocks:  # AC first, Al=1: magnitudes truncated toward 0
        run, last_nz = 0, 0
        for k in range(1, 64):
            v = int(zz[k])
            hi = (abs(v) >> 1) * (1 if v > 0 else -1)
            if hi == 0:
                run += 1
                continue
            while run > 15:
                ac1 += _AC_CODE[0xF0]
                run -= 16
            cat, mag = _cat_bits(hi)
            ac1 += _AC_CODE[(run << 4) | cat] + mag
            run = 0
            last_nz = k
        if last_nz < 63:
            ac1 += _AC_CODE[0x00]  # EOB (covers this block)

    acr = ""
    for zz in blocks:  # AC refine, Al=0: history = |v|>>1 magnitudes
        temps = [abs(int(zz[k])) for k in range(64)]
        eob_pos = max((k for k in range(1, 64) if temps[k] == 1), default=0)
        run, br = 0, ""
        for k in range(1, 64):
            t = temps[k]
            if t == 0:
                run += 1
                continue
            while run > 15 and k <= eob_pos:
                acr += _AC_CODE[0xF0] + br
                br = ""
                run -= 16
            if t > 1:  # already significant: one correction bit
                br += str(t & 1)
                continue
            acr += (
                _AC_CODE[(run << 4) | 1]
                + ("1" if int(zz[k]) > 0 else "0")
                + br
            )
            br, run = "", 0
        if run > 0 or br:
            acr += _AC_CODE[0x00] + br  # EOB + trailing correction bits
    return dc1, dcr, ac1, acr


def test_jpeg_progressive_equals_baseline_on_random_blocks():
    """Property: encoding the SAME coefficient blocks as a baseline
    stream and as a 4-scan progressive stream (DC/AC successive
    approximation at Al=1 with refinement) must decode to identical
    pixels — the decoders share only the IDCT tail, so agreement
    exercises the whole progressive scan machinery."""
    from lakehouse_architecture_spark.operators.codecs import decode_jpeg

    rng = np.random.default_rng(7)
    for trial in range(40):
        nblocks = int(rng.integers(1, 4))
        blocks = []
        for _ in range(nblocks):
            zz = np.zeros(64, dtype=np.int64)
            zz[0] = int(rng.integers(-7, 8))
            for k in rng.choice(
                np.arange(1, 64), size=int(rng.integers(0, 8)), replace=False
            ):
                zz[k] = int(rng.integers(-7, 8))
            blocks.append(zz)
        w, h = 8 * nblocks, 8

        def seg_stream(sof_marker, scans):
            out = bytearray(b"\xff\xd8")

            def seg(marker, body):
                out.extend(
                    bytes([0xFF, marker])
                    + struct.pack(">H", len(body) + 2)
                    + body
                )

            seg(0xDB, bytes([0]) + bytes([16] * 64))
            seg(0xC0 if sof_marker == 0xC0 else 0xC2,
                struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
            seg(0xC4, bytes([0x00]) + _PROP_DC[0] + _PROP_DC[1])
            seg(0xC4, bytes([0x10]) + _PROP_AC[0] + _PROP_AC[1])
            for ss, se, ah, al, bits in scans:
                seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))
                out.extend(_pack_bits(bits))
            out.extend(b"\xff\xd9")
            return bytes(out)

        base = seg_stream(0xC0, [(0, 63, 0, 0, _enc_baseline_blocks(blocks))])
        dc1, dcr, ac1, acr = _enc_prog_scans(blocks)
        prog = seg_stream(
            0xC2,
            [
                (0, 0, 0, 1, dc1),
                (0, 0, 1, 0, dcr),
                (1, 63, 0, 1, ac1),
                (1, 63, 1, 0, acr),
            ],
        )
        px_base = decode_jpeg(base)
        px_prog = decode_jpeg(prog)
        assert np.array_equal(px_base, px_prog), f"trial {trial}"


def test_jpeg_grayscale_dc_only():
    from lakehouse_architecture_spark.operators.codecs import decode_jpeg

    # all-zero coefficients: uniform mid-gray 128
    px = decode_jpeg(_jpeg_bytes(8, 8, [(1, 1, 1)], bits="00" + "00"))
    assert px.shape == (8, 8, 1)
    assert np.all(px == 128)
    # DC diff +2 (category 2, bits "10"): DC=2, q=16 -> uniform
    # 128 + 32/8 = 132
    px = decode_jpeg(_jpeg_bytes(8, 8, [(1, 1, 1)], bits="10" + "10" + "00"))
    assert np.all(px == 132)


def test_jpeg_single_ac_coefficient_matches_reference_idct():
    from lakehouse_architecture_spark.operators.codecs import decode_jpeg

    # DC cat0, then AC (run0,size1) value +1 at zigzag index 1 -> EOB
    px = decode_jpeg(
        _jpeg_bytes(8, 8, [(1, 1, 1)], bits="00" + "01" + "1" + "00")
    )
    coeff = np.zeros((8, 8))
    coeff[0, 1] = 16  # dequantized: 1 * q
    expect = np.clip(np.round(_ref_idct(coeff)), 0, 255).astype(np.uint8)
    assert np.array_equal(px[:, :, 0], expect)


def test_jpeg_color_420_uniform():
    from lakehouse_architecture_spark.operators.codecs import decode_jpeg

    # 16x16, Y at 2x2 sampling, Cb/Cr at 1x1 (4:2:0). One MCU:
    # 4 Y blocks (DC 0) then Cb DC +2 then Cr DC 0.
    bits = ("00" + "00") * 4 + ("10" + "10" + "00") + ("00" + "00")
    px = decode_jpeg(
        _jpeg_bytes(16, 16, [(1, 2, 2), (2, 1, 1), (3, 1, 1)], bits=bits)
    )
    assert px.shape == (16, 16, 3)
    # uniform: y=128, cb=132, cr=128 -> r=128, g=round(128-.344136*4),
    # b=round(128+1.772*4)
    assert np.all(px[:, :, 0] == 128)
    assert np.all(px[:, :, 1] == round(128 - 0.344136 * 4))
    assert np.all(px[:, :, 2] == round(128 + 1.772 * 4))


def test_jpeg_restart_intervals_reset_dc_prediction():
    from lakehouse_architecture_spark.operators.codecs import decode_jpeg

    # 16x8 grayscale = 2 MCUs with DRI=1: each MCU is its own entropy
    # segment; the DC predictor resets at the RST marker, so two
    # identical DC-diff codes yield the SAME level twice (without the
    # reset the second block would accumulate to 136).
    out = bytearray(b"\xff\xd8")

    def seg(marker, body):
        out.extend(
            bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body
        )

    seg(0xDB, bytes([0]) + bytes([16] * 64))
    seg(0xC0, struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0]))
    seg(0xC4, bytes([0x00]) + _JPG_DC[0] + _JPG_DC[1])
    seg(0xC4, bytes([0x10]) + _JPG_AC[0] + _JPG_AC[1])
    seg(0xDD, struct.pack(">H", 1))  # DRI: restart every MCU
    seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    mcu = _pack_bits("10" + "10" + "00")  # DC diff +2, EOB
    out += mcu + b"\xff\xd0" + mcu + b"\xff\xd9"
    px = decode_jpeg(bytes(out))
    assert px.shape == (8, 16, 1)
    assert np.all(px == 132)  # both MCUs at DC=2, predictor reset


def test_gif_animated_first_frame_and_extensions():
    """Graphic-control extensions are skipped and only the FIRST frame
    of an animation is decoded."""
    from lakehouse_architecture_spark.operators.codecs import decode_gif

    pal = bytes([7, 7, 7, 200, 200, 200])
    f0 = np.zeros((3, 3), dtype=np.uint8)
    f1 = np.ones((3, 3), dtype=np.uint8)
    base = bytearray(_gif_bytes(f0, pal))
    # splice: [header+lsd+gct] [GCE ext] [img0] [GCE ext] [img1] [trailer]
    hdr_end = 13 + len(pal)
    img0 = bytes(base[hdr_end:-1])  # image block without trailer
    img1 = bytes(bytearray(_gif_bytes(f1, pal))[hdr_end:-1])
    gce = b"\x21\xf9\x04\x00\x0a\x00\x00\x00"  # graphic control ext
    animated = bytes(base[:hdr_end]) + gce + img0 + gce + img1 + b"\x3b"
    px = decode_gif(animated)
    assert np.all(px == 7)  # first frame's palette entry 0
    import pytest as _pytest

    from lakehouse_architecture_spark.operators.codecs import decode_jpeg

    # progressive (SOF2) now decodes; a DC-only stream flipped to SOF2
    # reads the same DC coefficient as a DC scan — uniform mid-gray
    raw = bytearray(_jpeg_bytes(8, 8, [(1, 1, 1)], bits="0000"))
    idx = bytes(raw).find(b"\xff\xc0")
    raw[idx + 1] = 0xC2
    assert np.all(decode_jpeg(bytes(raw)) == 128)
    # arithmetic-coded frames (SOF9) remain a loud NotImplementedError
    raw[idx + 1] = 0xC9
    with _pytest.raises(NotImplementedError):
        decode_jpeg(bytes(raw))


def test_decode_image_real_jpeg_pixels():
    from lakehouse_architecture_spark.operators.multimodal import decode_image

    out = decode_image(_jpeg_bytes(8, 8, [(1, 1, 1)], bits="00" + "00"))
    assert (out["width"], out["height"], out["mean_pixel"]) == (8, 8, 128.0)


def test_avi_mjpeg_frame_sampling():
    """Round-trip: pack hand-built JPEG frames into an MJPEG AVI,
    sample every 2nd frame, decode to known pixel values."""
    from lakehouse_architecture_spark.operators.codecs import (
        avi_mjpeg_frames,
        encode_avi_mjpeg,
        sample_mjpeg_avi,
    )

    # 4 frames of uniform gray at distinct DC levels (128 and 132)
    f128 = _jpeg_bytes(8, 8, [(1, 1, 1)], bits="00" + "00")
    f132 = _jpeg_bytes(8, 8, [(1, 1, 1)], bits="10" + "10" + "00")
    avi = encode_avi_mjpeg([f128, f132, f128, f132])
    assert avi_mjpeg_frames(avi) == [f128, f132, f128, f132]
    sampled = sample_mjpeg_avi(avi, every_n=2)
    assert len(sampled) == 2
    assert np.all(sampled[0] == 128)
    assert np.all(sampled[1] == 128)  # frames 0 and 2
    allf = sample_mjpeg_avi(avi)
    assert np.all(allf[1] == 132)
    with pytest.raises(ValueError):
        avi_mjpeg_frames(b"RIFFxxxxWAVEnope")


def test_decode_image_survives_corrupt_streams():
    """Scraped-corpus posture: random garbage behind every known magic
    must degrade (header metadata or NotImplementedError), never leak
    KeyError/struct.error/IndexError out of a batch stage."""
    import random

    from lakehouse_architecture_spark.operators.multimodal import decode_image

    random.seed(7)
    magics = [b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff\xe0", b"GIF89a", b"BM"]
    for m in magics:
        for _ in range(100):
            junk = m + bytes(
                random.getrandbits(8) for _ in range(random.randint(0, 120))
            )
            try:
                decode_image(junk)
            except NotImplementedError:
                pass  # the one allowed signal


def test_wav_roundtrip_and_rms():
    # full-scale square wave: rms == peak == 1.0 exactly
    sq = np.where(np.arange(1000) % 2 == 0, 32767, -32767).astype(np.int32)
    d = decode_wav(encode_wav(sq, 16000))
    assert (d["sample_rate"], d["n_samples"], d["n_channels"]) == (16000, 1000, 1)
    assert d["rms"] == pytest.approx(1.0)
    assert d["peak"] == pytest.approx(1.0)
    # silence: rms 0
    z = decode_wav(encode_wav(np.zeros(100, dtype=np.int32), 8000))
    assert z["rms"] == 0.0
    # stereo preserves shape
    st = decode_wav(
        encode_wav(np.zeros((50, 2), dtype=np.int32), 44100)
    )
    assert st["samples"].shape == (50, 2)
    # every PCM width decodes to the documented int32 dtype — 32-bit
    # PCM widened to int64 once and silently broke fixed-schema callers
    for width, val in ((1, 100), (2, 20000), (4, 2_000_000_000)):
        full = np.full(16, val, dtype=np.int64 if width == 4 else np.int32)
        got = decode_wav(encode_wav(full, 8000, sampwidth=width))
        assert got["samples"].dtype == np.int32, width
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxWAVEnot really")


def test_spark_resize_stage_really_resizes_png(spark):
    """The resize stage must rewrite PNG payload bytes (decode ->
    downscale -> re-encode), not just metadata."""
    from lakehouse_architecture_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_image_features,
        resize_images,
    )

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(64, 48, 3), dtype=np.uint8)
    payload = encode_png(px)
    df = spark.createDataFrame(
        [(1, "image", "png", bytearray(payload), 48, 64, None)], MEDIA_SCHEMA
    )
    out = resize_images(df, max_dim=16).collect()[0]
    assert (out.width, out.height) == (12, 16)
    back = decode_png(bytes(out.payload))
    assert back.shape == (16, 12, 3)
    assert np.array_equal(back, resize_nearest(px, 16))
    # and the feature stage reads REAL pixel stats off the resized PNG
    feats = extract_image_features(
        resize_images(df, max_dim=16)
    ).collect()[0]
    assert (feats.decoded_width, feats.decoded_height) == (12, 16)
    assert feats.mean_pixel == f"{resize_nearest(px, 16).mean():.4f}"


def test_spark_video_frame_features(spark):
    """The video stage decodes sampled MJPEG-AVI frames with real
    pixel stats and skips undecodable payloads."""
    from lakehouse_architecture_spark.operators.codecs import encode_avi_mjpeg
    from lakehouse_architecture_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_video_frame_features,
    )

    f128 = _jpeg_bytes(8, 8, [(1, 1, 1)], bits="00" + "00")
    f132 = _jpeg_bytes(8, 8, [(1, 1, 1)], bits="10" + "10" + "00")
    avi = encode_avi_mjpeg([f128, f132, f128])
    df = spark.createDataFrame(
        [
            (1, "video", "avi", bytearray(avi), None, None, 120),
            (2, "video", "???", bytearray(b"garbage"), None, None, 10),
        ],
        MEDIA_SCHEMA,
    )
    rows = sorted(
        extract_video_frame_features(df, every_n=2).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [(r.media_id, r.frame_idx, r.frame_mean_pixel) for r in rows] == [
        (1, 0, "128.0000"),
        (1, 2, "128.0000"),
    ]


def test_spark_audio_features_real_rms(spark):
    from lakehouse_architecture_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_audio_features,
    )

    sq = np.where(np.arange(8000) % 2 == 0, 32767, -32767).astype(np.int32)
    df = spark.createDataFrame(
        [(1, "audio", "wav", bytearray(encode_wav(sq, 8000)), None, None, 1000)],
        MEDIA_SCHEMA,
    )
    row = extract_audio_features(df).collect()[0]
    assert (row.sample_rate, row.n_samples) == (8000, 8000)
    assert row.duration_computed_ms == 1000
    assert row.rms == "1.0000"


def test_png_adam7_interlaced_roundtrip():
    """Adam7: split an image into the 7 sub-images, filter each pass
    independently (mixed filter types to prove per-pass filter-state
    isolation), deflate, decode — must equal the original. Covers
    dimensions where some passes are empty."""
    from lakehouse_architecture_spark.operators.codecs import _adam7_passes

    rng = np.random.default_rng(11)
    for (h, w, ch, color) in ((9, 5, 3, 2), (3, 3, 1, 0), (8, 8, 4, 6)):
        px = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
        raw = bytearray()
        for i, (x0, y0, dx, dy, pw, ph) in enumerate(
            _adam7_passes(w, h)
        ):
            sub = px[y0::dy, x0::dx]
            assert sub.shape[:2] == (ph, pw)
            raw += _reference_filter(sub, i % 5)  # rotate filter types
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 1)
        payload = (
            _PNG_MAGIC
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b"")
        )
        assert np.array_equal(decode_png(payload), px), (h, w, ch)


def test_bmp_decode_rle4():
    """RLE4: encoded runs alternate the value byte's two nibbles and
    absolute mode packs indices two per byte (word-aligned)."""
    from lakehouse_architecture_spark.operators.codecs import decode_bmp

    pal = bytes([0, 0, 0, 0]) + bytes([0, 0, 255, 0]) + bytes([0, 255, 0, 0])
    # 4x2 bottom-up. Stored rows:
    #  row0: run(4, 0x12)                  -> 1 2 1 2
    #  row1: abs(3: nibbles 1,0,2), run(1, 0x22), EOB -> 1 0 2 2
    rle = bytes(
        [4, 0x12, 0, 0]
        + [0, 3, 0x10, 0x20]
        + [1, 0x22, 0, 1]
    )
    info = struct.pack("<IiiHHIIiiII", 40, 4, 2, 1, 4, 2, len(rle), 0, 0, 3, 0)
    off = 54 + len(pal)
    payload = (
        b"BM" + struct.pack("<IHHI", off + len(rle), 0, 0, off) + info
        + pal + rle
    )
    px = decode_bmp(payload)
    RED, GREEN, BLACK = (255, 0, 0), (0, 255, 0), (0, 0, 0)
    assert [tuple(c) for c in px[0]] == [RED, BLACK, GREEN, GREEN]
    assert [tuple(c) for c in px[1]] == [RED, GREEN, RED, GREEN]


def test_png_16bit_decodes_to_high_bytes():
    """16-bit PNG: filters run over the full 2-byte-per-sample algebra
    (bpp = channels*2), then samples reduce to their high byte. The
    reference filter is applied to the raw BYTE matrix with the 16-bit
    bpp, so a filter-offset bug cannot cancel out."""
    from lakehouse_architecture_spark.operators.codecs import decode_png

    rng = np.random.default_rng(23)
    for ch, color in ((1, 0), (3, 2)):
        # big-endian sample bytes as an (h, w, ch*2) byte image
        byte_img = rng.integers(0, 256, size=(5, 4, ch * 2), dtype=np.uint8)
        for filt in (0, 1, 2, 4):
            raw = _reference_filter(byte_img, filt)
            ihdr = struct.pack(">IIBBBBB", 4, 5, 16, color, 0, 0, 0)
            payload = (
                _PNG_MAGIC
                + _chunk(b"IHDR", ihdr)
                + _chunk(b"IDAT", zlib.compress(raw))
                + _chunk(b"IEND", b"")
            )
            px = decode_png(payload)
            assert px.shape == (5, 4, ch)
            assert np.array_equal(px, byte_img[:, :, 0::2]), (ch, filt)


# ---------------------------------------------------------------------------
# Fuzz robustness: scraped-corpus garbage must fail CLEANLY
# ---------------------------------------------------------------------------


def test_decoders_survive_fuzzed_payloads():
    """Random bytes, magic-prefixed random bytes, and truncations of
    VALID streams must either decode or raise something inside
    DECODE_ERRORS — never an unexpected exception type and never a
    hang. This is the contract every Arrow batch stage relies on when
    it catches DECODE_ERRORS over scraped data."""
    import random

    import numpy as np

    from lakehouse_architecture_spark.operators import codecs

    rng = random.Random(1234)
    decoders = {
        "png": codecs.decode_png,
        "bmp": codecs.decode_bmp,
        "gif": codecs.decode_gif,
        "jpeg": codecs.decode_jpeg,
    }
    magics = {
        "png": b"\x89PNG\r\n\x1a\n",
        "bmp": b"BM",
        "gif": b"GIF89a",
        "jpeg": b"\xff\xd8\xff\xe0",
    }
    px = np.arange(96, dtype=np.uint8).reshape(8, 4, 3)
    idx = (np.arange(24, dtype=np.uint8) % 4).reshape(6, 4)
    valid = {
        "png": codecs.encode_png(px),
        "bmp": _bmp_bytes(px),
        "gif": _gif_bytes(idx, bytes(range(12))),
        "jpeg": None,  # assembled per-test via _jpeg_bytes; header fuzz covers it
    }

    def attempt(fmt, payload):
        try:
            out = decoders[fmt](payload)
            assert out is not None
        except codecs.DECODE_ERRORS:
            pass  # the documented clean-failure contract

    for fmt in decoders:
        for trial in range(50):
            blob = bytes(rng.randrange(256) for _ in range(rng.randrange(4, 300)))
            attempt(fmt, blob)                      # pure garbage
            attempt(fmt, magics[fmt] + blob)        # right magic, junk body
        if valid[fmt]:
            full = valid[fmt]
            for cut in range(0, len(full), max(1, len(full) // 40)):
                attempt(fmt, full[:cut])            # every truncation point
            # single-byte corruptions of a valid stream
            for _ in range(60):
                i = rng.randrange(len(full))
                corrupted = full[:i] + bytes([rng.randrange(256)]) + full[i + 1:]
                attempt(fmt, corrupted)


def test_wav_decoder_survives_fuzz():
    import random

    import numpy as np

    from lakehouse_architecture_spark.operators.codecs import (
        decode_wav,
        encode_wav,
    )

    rng = random.Random(99)
    valid = encode_wav(np.arange(-500, 500, dtype=np.int64), 8000)

    def attempt(payload):
        try:
            decode_wav(payload)
        except ValueError:
            pass

    for cut in range(0, len(valid), max(1, len(valid) // 40)):
        attempt(valid[:cut])
    for _ in range(80):
        i = rng.randrange(len(valid))
        attempt(valid[:i] + bytes([rng.randrange(256)]) + valid[i + 1:])
    for _ in range(40):
        attempt(b"RIFF" + bytes(rng.randrange(256) for _ in range(rng.randrange(4, 200))))
