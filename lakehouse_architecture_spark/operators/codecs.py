"""Pure-Python media codecs (stdlib + numpy only).

The multimodal pipeline (operators/multimodal.py) treats payloads as
opaque bytes; this module does the actual pixel/waveform work with no
codec library:

- PNG: full decoder (zlib IDAT inflate + all 5 scanline filters,
  8- and 16-bit depth — 16-bit reduces to the high byte after the full
  2-byte filter algebra — color types 0/2/3/4/6, Adam7 interlacing
  with per-pass filter state) and a filter-0 encoder, so decode ->
  transform -> re-encode round-trips without Pillow.
- BMP: uncompressed 8/24/32-bit plus RLE8/RLE4 paletted streams.
- GIF: first-frame decode (variable-width LZW, interlacing, local and
  global palettes).
- JPEG: full BASELINE (SOF0) and PROGRESSIVE (SOF2) decode — Huffman
  entropy decode, spectral-selection/successive-approximation scans
  with EOB runs, dequantization, IDCT, chroma upsampling, restart
  intervals. Arithmetic coding / 12-bit / hierarchical raise.
- AVI: RIFF container walk to per-frame MJPEG samples.
- WAV: integer-PCM decode via the stdlib ``wave`` reader to a numpy
  sample matrix (frames x channels), for loudness/duration features.

Scale: these run inside Arrow-batched ``mapInPandas`` stages, one
payload at a time per batch row — throughput is bounded by zlib /
Huffman bit-reading and the inherently sequential spec loops (PNG
filters 3/4, JPEG entropy decode); scanline math and the IDCT are
numpy-vectorized. Fine for feature extraction; bulk image
preprocessing at 100 TB would swap in a native codec behind the same
signatures.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# The full set of exceptions a CORRUPT (not merely unsupported) stream
# can raise out of these decoders: malformed structures surface as
# ValueError, but truncated segments hit struct/IndexError, bad table
# references hit KeyError, and bad deflate streams hit zlib.error.
# Batch stages that must tolerate scraped garbage catch THIS, not a
# hand-maintained subset.
DECODE_ERRORS = (
    NotImplementedError,
    ValueError,
    KeyError,
    IndexError,
    struct.error,
    zlib.error,
)


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a PNG to a (height, width, channels) uint8 array —
    8- or 16-bit samples, sequential or Adam7-interlaced (each of the 7 sub-images is
    unfiltered independently and scattered into place, per spec).

    Palette images (color type 3) are expanded through their PLTE to
    RGB. 16-bit samples decode through the full 2-byte-per-sample
    filter algebra and are then reduced to their HIGH byte (the
    standard 16->8 downconversion; documented precision loss — feature
    extraction, not archival). Raises ``ValueError`` for a non-PNG or
    corrupt stream.
    """
    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG stream")
    i = 8
    idat = bytearray()
    plte = None
    ihdr = None
    while i + 8 <= len(payload):
        clen = struct.unpack(">I", payload[i : i + 4])[0]
        ctype = payload[i + 4 : i + 8]
        data = payload[i + 8 : i + 8 + clen]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        i += 12 + clen
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth not in (8, 16):
        raise NotImplementedError(f"PNG bit depth {depth}")
    if depth == 16 and color == 3:
        raise ValueError("PNG 16-bit palette images are not legal")
    if interlace not in (0, 1):
        raise ValueError(f"unknown PNG interlace method {interlace}")
    if color not in _CHANNELS:
        raise ValueError(f"unknown PNG color type {color}")
    ch = _CHANNELS[color]
    bps = depth // 8  # bytes per sample; filters offset by ch*bps
    raw = zlib.decompress(bytes(idat))
    if interlace == 0:
        if len(raw) != h * (w * ch * bps + 1):
            raise ValueError("PNG IDAT length mismatch")
        px = _png_unfilter(raw, 0, w, h, ch, bps)[0].reshape(
            h, w, ch, bps
        )[..., 0]
    else:  # Adam7: 7 independently-filtered sub-images, scattered
        expected = sum(
            ph * (pw * ch * bps + 1)
            for _x0, _y0, _dx, _dy, pw, ph in _adam7_passes(w, h)
        )
        if len(raw) != expected:
            raise ValueError("PNG IDAT length mismatch")
        px = np.zeros((h, w, ch), dtype=np.uint8)
        pos = 0
        for x0, y0, dx, dy, pw, ph in _adam7_passes(w, h):
            sub, pos = _png_unfilter(raw, pos, pw, ph, ch, bps)
            px[y0::dy, x0::dx] = sub.reshape(ph, pw, ch, bps)[..., 0]
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        px = pal[px[..., 0]]
    return px


def _adam7_passes(w: int, h: int):
    """The 7 Adam7 sub-image geometries as (x0, y0, dx, dy, pw, ph),
    empty passes skipped."""
    for x0, y0, dx, dy in (
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    ):
        pw = -(-(w - x0) // dx) if w > x0 else 0
        ph = -(-(h - y0) // dy) if h > y0 else 0
        if pw and ph:
            yield x0, y0, dx, dy, pw, ph


def _png_unfilter(raw: bytes, pos: int, w: int, h: int, ch: int, bps: int = 1):
    """Reverse PNG scanline filtering for one (sub-)image of w x h
    pixels starting at byte ``pos``; returns ((h, w*ch*bps) uint8
    array, next position). PNG filters operate on BYTES with a
    bpp = ch*bps left-neighbour offset, so 16-bit samples reuse the
    same algebra. Filter state (prev row) is local to the image, per
    spec — each Adam7 pass filters independently."""
    stride = w * ch * bps
    ch = ch * bps  # the filters' byte offset (bpp)
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = raw[pos]
        pos += 1
        row = np.frombuffer(raw[pos : pos + stride], dtype=np.uint8).astype(
            np.int32
        )
        pos += stride
        if f == 0:  # None
            cur = row
        elif f == 2:  # Up
            cur = (row + prev) & 0xFF
        elif f == 1:  # Sub: per-channel prefix sum (vectorized — the
            # recurrence cur[x] = row[x] + cur[x-ch] mod 256 is a
            # cumsum over each stride-ch residue class)
            cur = row.copy()
            for r in range(ch):
                cur[r::ch] = np.cumsum(row[r::ch], dtype=np.int64) & 0xFF
        elif f in (3, 4):  # Average / Paeth: inherently sequential in x
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                if f == 3:
                    pred = (a + b) >> 1
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                cur[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f} on row {y}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out, pos


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode a (h, w) or (h, w, channels) uint8 array as a filter-0
    PNG (greyscale / grey+alpha / RGB / RGBA by channel count)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    stride = w * ch
    flat = px.reshape(h, stride)
    raw = b"".join(b"\x00" + flat[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def resize_nearest(pixels: np.ndarray, max_dim: int) -> np.ndarray:
    """Nearest-neighbor downscale so max(h, w) <= max_dim (no-op if
    already within bounds) — deterministic integer index grid, the
    standard cheap pre-filter before a learned resizer."""
    h, w = pixels.shape[:2]
    scale = min(1.0, max_dim / max(h, w))
    if scale >= 1.0:
        return pixels
    nh, nw = max(int(h * scale), 1), max(int(w * scale), 1)
    ys = (np.arange(nh) * (h / nh)).astype(np.int64)
    xs = (np.arange(nw) * (w / nw)).astype(np.int64)
    return pixels[ys][:, xs]


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode a BMP to (h, w, channels) uint8.

    Supports the common cases: uncompressed (BI_RGB) 24-bit BGR,
    32-bit BGRA and 8-bit paletted, plus RLE8- and RLE4-compressed
    paletted streams — bottom-up or top-down row order, 4-byte row
    padding. Other compressions / bit depths raise
    ``NotImplementedError``.
    """
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP stream")
    data_off = struct.unpack("<I", payload[10:14])[0]
    hdr_size = struct.unpack("<I", payload[14:18])[0]
    w, h_signed = struct.unpack("<ii", payload[18:26])
    bits, compression = struct.unpack("<HI", payload[28:34])
    h = abs(h_signed)
    top_down = h_signed < 0
    if compression == 1:  # BI_RLE8
        if bits != 8:
            raise ValueError(f"BMP RLE8 with bit depth {bits}")
        idx = _bmp_rle8_rows(payload[data_off:], w, h)
    elif compression == 2:  # BI_RLE4: expand nibble indices to bytes
        if bits != 4:
            raise ValueError(f"BMP RLE4 with bit depth {bits}")
        idx = _bmp_rle4_rows(payload[data_off:], w, h)
        bits = 8  # palette path below indexes per byte
    elif compression != 0:
        raise NotImplementedError(f"BMP compression {compression}")
    elif bits not in (8, 24, 32):
        raise NotImplementedError(f"BMP bit depth {bits}")
    else:
        row_bytes = (w * bits // 8 + 3) & ~3
        if len(payload) < data_off + row_bytes * h:
            raise ValueError("truncated BMP pixel data")
        idx = np.frombuffer(
            payload, dtype=np.uint8, count=row_bytes * h, offset=data_off
        ).reshape(h, row_bytes)
    if not top_down:
        idx = idx[::-1]
    if bits == 8:
        pal_off = 14 + hdr_size
        n_colors = struct.unpack("<I", payload[46:50])[0] or 256
        pal = np.frombuffer(
            payload, dtype=np.uint8, count=n_colors * 4, offset=pal_off
        ).reshape(-1, 4)[:, [2, 1, 0]]  # BGRA entries -> RGB
        return pal[idx[:, :w]]
    ch = bits // 8
    px = idx[:, : w * ch].reshape(h, w, ch)
    # BMP stores BGR(A); emit RGB(A)
    order = [2, 1, 0] if ch == 3 else [2, 1, 0, 3]
    return np.ascontiguousarray(px[:, :, order])


def _bmp_rle4_rows(data: bytes, w: int, h: int) -> np.ndarray:
    """Expand a BI_RLE4 stream into an (h, w) per-pixel index raster in
    stored row order. Encoded runs alternate the two nibbles of the
    value byte; absolute mode packs indices two-per-byte, padded to a
    word boundary; control opcodes match RLE8."""
    out = np.zeros((h, w), dtype=np.uint8)
    x = y = i = 0
    n = len(data)
    while i + 1 < n and y < h:
        count, val = data[i], data[i + 1]
        i += 2
        if count:  # encoded run alternating high/low nibble
            hi, lo = val >> 4, val & 15
            for j in range(count):
                if x >= w:
                    break
                out[y, x] = hi if j % 2 == 0 else lo
                x += 1
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            break
        elif val == 2:  # delta
            if i + 1 >= n:
                raise ValueError("truncated BMP RLE4 delta")
            x = min(x + data[i], w)
            y += data[i + 1]
            i += 2
        else:  # absolute: val nibbles, stored 2/byte, word-aligned
            nbytes = (val + 1) // 2
            if i + nbytes > n:
                raise ValueError("truncated BMP RLE4 absolute run")
            for j in range(val):
                if x >= w:
                    break
                b = data[i + j // 2]
                out[y, x] = b >> 4 if j % 2 == 0 else b & 15
                x += 1
            i += nbytes + (nbytes & 1)
    return out


def _bmp_rle8_rows(data: bytes, w: int, h: int) -> np.ndarray:
    """Expand a BI_RLE8 stream into an (h, w) index raster in STORED
    row order (caller flips for bottom-up). Implements encoded runs,
    absolute mode (word-aligned), end-of-line (0,0), end-of-bitmap
    (0,1) and delta (0,2). Unwritten pixels stay 0 per the format's
    'delta skips leave gaps' convention."""
    out = np.zeros((h, w), dtype=np.uint8)
    x = y = i = 0
    n = len(data)
    while i + 1 < n and y < h:
        count, val = data[i], data[i + 1]
        i += 2
        if count:  # encoded run
            end = min(x + count, w)
            out[y, x:end] = val
            x = end
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            break
        elif val == 2:  # delta: skip right/up in stored order
            if i + 1 >= n:
                raise ValueError("truncated BMP RLE8 delta")
            x = min(x + data[i], w)
            y += data[i + 1]
            i += 2
        else:  # absolute mode: val literal bytes, word-aligned
            if i + val > n:
                raise ValueError("truncated BMP RLE8 absolute run")
            end = min(x + val, w)
            out[y, x:end] = np.frombuffer(
                data, dtype=np.uint8, count=end - x, offset=i
            )
            x = end
            i += val + (val & 1)
    return out


def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-flavor LZW: variable-width codes, CLEAR/END, table growth to
    12 bits. Returns the decoded index stream."""
    clear = 1 << min_code_size
    end = clear + 1
    bitpos = 0
    nbits = len(data) * 8

    def read_code(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > nbits:
            return end  # truncated stream: treat as end-of-information
        v = 0
        for k in range(width):
            byte = data[(bitpos + k) >> 3]
            v |= ((byte >> ((bitpos + k) & 7)) & 1) << k
        bitpos += width
        return v

    out: list[int] = []
    table: list[list[int]] = []
    width = min_code_size + 1
    prev: list[int] | None = None
    while True:
        code = read_code(width)
        if code == clear:
            table = [[i] for i in range(clear)] + [[], []]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + [entry[0]])
        elif code == len(table):
            entry = prev + [prev[0]]
            table.append(entry)
        else:
            raise ValueError(f"corrupt LZW stream: code {code}")
        out.extend(entry)
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return out


def decode_gif(payload: bytes) -> np.ndarray:
    """Decode the FIRST frame of a GIF87a/89a to (h, w, 3) uint8 RGB.

    Walks the block stream (extensions skipped), honors local color
    tables and Adam-style 4-pass interlacing, and LZW-decompresses the
    image data. Animated GIFs yield frame 0 composited on nothing —
    the usual training-corpus treatment.
    """
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    flags = payload[10]
    gct_size = 2 << (flags & 7) if flags & 0x80 else 0
    i = 13
    gct = np.frombuffer(
        payload, dtype=np.uint8, count=gct_size * 3, offset=i
    ).reshape(-1, 3) if gct_size else None
    i += gct_size * 3
    while i < len(payload):
        b = payload[i]
        if b == 0x21:  # extension: label + sub-blocks
            i += 2
            while i < len(payload) and payload[i] != 0:
                i += 1 + payload[i]
            i += 1
        elif b == 0x2C:  # image descriptor
            _x, _y, w, h = struct.unpack("<HHHH", payload[i + 1 : i + 9])
            iflags = payload[i + 9]
            i += 10
            pal = gct
            if iflags & 0x80:  # local color table
                lct_size = 2 << (iflags & 7)
                pal = np.frombuffer(
                    payload, dtype=np.uint8, count=lct_size * 3, offset=i
                ).reshape(-1, 3)
                i += lct_size * 3
            if pal is None:
                raise ValueError("GIF image with no color table")
            min_code = payload[i]
            i += 1
            lzw = bytearray()
            while i < len(payload) and payload[i] != 0:
                n = payload[i]
                lzw += payload[i + 1 : i + 1 + n]
                i += 1 + n
            idx = np.array(_lzw_decode(bytes(lzw), min_code), dtype=np.int32)
            if idx.size < w * h:
                raise ValueError("truncated GIF pixel data")
            grid = idx[: w * h].reshape(h, w)
            if iflags & 0x40:  # interlaced: rows arrive in 4 passes
                order = (
                    list(range(0, h, 8))
                    + list(range(4, h, 8))
                    + list(range(2, h, 4))
                    + list(range(1, h, 2))
                )
                un = np.empty_like(grid)
                un[order] = grid
                grid = un
            return pal[np.clip(grid, 0, len(pal) - 1)]
        elif b == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
    raise ValueError("GIF contains no image data")


_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Orthonormal 8-point DCT-II basis; IDCT of block B is M.T @ B @ M.
_DCT_M = np.array(
    [
        [
            (np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
            * np.cos((2 * n + 1) * k * np.pi / 16)
            for n in range(8)
        ]
        for k in range(8)
    ]
)


class _BitReader:
    """MSB-first entropy-segment reader with 0xFF00 unstuffing; stops
    at any real marker (leaving it unconsumed) and can resync past
    RSTn restart markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bit = 0

    def read_bit(self) -> int:
        d = self.data
        while True:
            if self.pos >= len(d):
                raise ValueError("JPEG entropy stream truncated")
            byte = d[self.pos]
            if byte == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    pass  # stuffed 0xFF data byte
                else:
                    raise ValueError("JPEG entropy stream ran into a marker")
            b = (byte >> (7 - self.bit)) & 1
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1 + (1 if byte == 0xFF else 0)  # skip stuffing
            return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_past_rst(self) -> None:
        """Byte-align and consume an RSTn marker (restart interval)."""
        self.bit = 0
        d = self.data
        while self.pos + 1 < len(d) and not (
            d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7
        ):
            self.pos += 1
        self.pos += 2


def _build_huffman(counts: bytes, symbols: bytes) -> dict:
    """Canonical JPEG Huffman table: (length, code) -> symbol."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(r: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    """JPEG receive/extend: t-bit magnitude v to a signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a BASELINE (SOF0) or PROGRESSIVE (SOF2) JPEG to
    (h, w, 3) RGB or (h, w, 1) grayscale uint8 — 8-bit Huffman, 1 or 3
    components, any sampling factors (nearest-neighbor chroma
    upsampling), restart intervals; progressive spectral selection and
    successive approximation (DC/AC first + refinement scans, EOB
    runs). Arithmetic coding, hierarchical, lossless and 12-bit frames
    raise ``NotImplementedError``.
    """
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    progressive = False
    restart = 0
    prog: _ProgState | None = None
    i = 2
    while i + 4 <= len(payload):
        if payload[i] != 0xFF:
            i += 1
            continue
        marker = payload[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:
            break
        seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
        seg = payload[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit JPEG quant table")
                qt[tq] = np.frombuffer(
                    seg, dtype=np.uint8, count=64, offset=j + 1
                ).astype(np.int32)
                j += 65
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                counts = seg[j + 1 : j + 17]
                n = sum(counts)
                tbl = _build_huffman(counts, seg[j + 17 : j + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = tbl
                j += 17 + n
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec}")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (h, w, comps)
            progressive = marker == 0xC2
            if progressive:
                prog = _ProgState(frame)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(
                f"unsupported JPEG frame (SOF marker 0xC{marker & 15:X})"
            )
        elif marker == 0xDD:  # DRI
            restart = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS: entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan_tbl = {}
            scan_order = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c : 3 + 2 * c]
                scan_tbl[cs] = (tdta >> 4, tdta & 15)
                scan_order.append(cs)
            if not progressive:
                return _decode_scan(
                    payload, i + 2 + seg_len, frame, scan_tbl, qt,
                    huff_dc, huff_ac, restart,
                )
            ss, se, ahl = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            i = _decode_progressive_scan(
                payload, i + 2 + seg_len, prog, scan_order, scan_tbl,
                ss, se, ahl >> 4, ahl & 15, huff_dc, huff_ac, restart,
            )
            continue
        i += 2 + seg_len
    if progressive and prog is not None and prog.any_scan:
        return _assemble_planes(frame, prog.dequantized(qt))
    raise ValueError("JPEG contains no scan")


def _decode_scan(
    payload, pos, frame, scan_tbl, qt, huff_dc, huff_ac, restart
) -> np.ndarray:
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {}
    for cid, ch, cv, _tq in comps:
        planes[cid] = np.zeros((mcuy * cv * 8, mcux * ch * 8), dtype=np.float64)
    r = _BitReader(payload, pos)
    pred = {cid: 0 for cid, *_ in comps}
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and n_mcu and n_mcu % restart == 0:
                r.align_past_rst()
                pred = {cid: 0 for cid, *_ in comps}
            n_mcu += 1
            for cid, ch, cv, tq in comps:
                td, ta = scan_tbl[cid]
                for by in range(cv):
                    for bx in range(ch):
                        zz = np.zeros(64, dtype=np.int32)
                        t = _huff_decode(r, huff_dc[td])
                        diff = _extend(r.read_bits(t), t)
                        pred[cid] += diff
                        zz[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(r, huff_ac[ta])
                            rl, sz = rs >> 4, rs & 15
                            if rs == 0:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += rl
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            zz[k] = _extend(r.read_bits(sz), sz)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[_ZIGZAG] = zz * qt[tq]
                        b = block.reshape(8, 8)
                        px = _DCT_M.T @ b @ _DCT_M + 128.0
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = px
    return _assemble_planes(frame, planes)


def _assemble_planes(frame, planes) -> np.ndarray:
    """Upsample subsampled component pixel planes to full resolution,
    crop padding, and color-convert (shared by the baseline single-scan
    path and the progressive multi-scan path)."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    out_planes = []
    for cid, ch, cv, _tq in comps:
        p = planes[cid]
        if ch != hmax or cv != vmax:  # nearest-neighbor upsample
            p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        y = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return y[:, :, None]
    y, cb, cr = out_planes
    cb = cb - 128.0
    cr = cr - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


class _ProgState:
    """Coefficient accumulator for a progressive frame: per component,
    the zigzag-order DCT coefficients of every block in the padded MCU
    grid, built up across scans (spectral bands x approximation bits)
    and turned into pixel planes once all scans are read."""

    def __init__(self, frame):
        h, w, comps = frame
        self.frame = frame
        self.hmax = max(c[1] for c in comps)
        self.vmax = max(c[2] for c in comps)
        self.mcux = -(-w // (8 * self.hmax))
        self.mcuy = -(-h // (8 * self.vmax))
        self.coef: dict[int, np.ndarray] = {}
        self.nblocks: dict[int, tuple[int, int]] = {}
        self.eobrun = 0
        self.any_scan = False
        for cid, ch, cv, _tq in comps:
            self.coef[cid] = np.zeros(
                (self.mcuy * cv, self.mcux * ch, 64), dtype=np.int32
            )
            # non-interleaved scans cover the component's REAL block
            # grid (from its scaled dimensions), not the padded one
            cw = -(-w * ch // self.hmax)
            chh = -(-h * cv // self.vmax)
            self.nblocks[cid] = (-(-chh // 8), -(-cw // 8))

    def dequantized(self, qt) -> dict[int, np.ndarray]:
        _h, _w, comps = self.frame
        planes = {}
        for cid, _ch, _cv, tq in comps:
            zz = self.coef[cid] * qt[tq]  # (by, bx, 64)
            blocks = np.zeros(zz.shape[:2] + (8, 8), dtype=np.float64)
            blocks.reshape(zz.shape[:2] + (64,))[
                :, :, _ZIGZAG
            ] = zz.astype(np.float64)
            px = (
                np.einsum("ij,byjk,kl->byil", _DCT_M.T, blocks, _DCT_M)
                + 128.0
            )
            by, bx = zz.shape[:2]
            planes[cid] = px.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        return planes


def _decode_progressive_scan(
    payload, pos, prog, scan_order, scan_tbl, ss, se, ah, al,
    huff_dc, huff_ac, restart,
) -> int:
    """Decode one progressive SOS entropy segment into ``prog``'s
    coefficient state; returns the payload offset just past the
    segment (at the next marker). Implements all four scan kinds: DC
    first/refine (optionally interleaved over MCUs) and AC
    first/refine (always single-component, with EOB runs)."""
    h, w, comps = prog.frame
    by_cid = {c[0]: c for c in comps}
    r = _BitReader(payload, pos)
    prog.eobrun = 0
    prog.any_scan = True
    pred = {cid: 0 for cid in scan_order}
    n_units = 0

    def maybe_restart():
        nonlocal pred
        if restart and n_units and n_units % restart == 0:
            r.align_past_rst()
            pred = {cid: 0 for cid in scan_order}
            prog.eobrun = 0

    if ss == 0:  # DC scan (interleaved or not); Se must be 0
        if len(scan_order) > 1:
            for my in range(prog.mcuy):
                for mx in range(prog.mcux):
                    maybe_restart()
                    n_units += 1
                    for cid in scan_order:
                        _cid, ch, cv, _tq = by_cid[cid]
                        td, _ta = scan_tbl[cid]
                        for byy in range(cv):
                            for bxx in range(ch):
                                _dc_unit(
                                    r, prog.coef[cid],
                                    my * cv + byy, mx * ch + bxx,
                                    huff_dc.get(td), pred, cid, ah, al,
                                )
        else:
            cid = scan_order[0]
            nby, nbx = prog.nblocks[cid]
            td, _ta = scan_tbl[cid]
            for byy in range(nby):
                for bxx in range(nbx):
                    maybe_restart()
                    n_units += 1
                    _dc_unit(
                        r, prog.coef[cid], byy, bxx,
                        huff_dc.get(td), pred, cid, ah, al,
                    )
    else:  # AC scan: always one component
        cid = scan_order[0]
        nby, nbx = prog.nblocks[cid]
        _td, ta = scan_tbl[cid]
        tbl = huff_ac[ta]
        for byy in range(nby):
            for bxx in range(nbx):
                maybe_restart()
                n_units += 1
                blk = prog.coef[cid][byy, bxx]
                if ah == 0:
                    _ac_first(r, blk, tbl, ss, se, al, prog)
                else:
                    _ac_refine(r, blk, tbl, ss, se, al, prog)

    # step past any partial byte, then to the next marker
    i = r.pos if r.bit == 0 else r.pos + 1
    while i + 1 < len(payload) and not (
        payload[i] == 0xFF and payload[i + 1] not in (0x00,)
    ):
        i += 1
    return i


def _dc_unit(r, coef, byy, bxx, dc_tbl, pred, cid, ah, al) -> None:
    if ah == 0:  # first DC scan: diff-coded magnitude, shifted up
        t = _huff_decode(r, dc_tbl)
        pred[cid] += _extend(r.read_bits(t), t)
        coef[byy, bxx, 0] = pred[cid] << al
    else:  # refinement: one correction bit per block
        if r.read_bit():
            coef[byy, bxx, 0] |= 1 << al


def _ac_first(r, blk, tbl, ss, se, al, prog) -> None:
    if prog.eobrun > 0:
        prog.eobrun -= 1
        return
    k = ss
    while k <= se:
        rs = _huff_decode(r, tbl)
        rl, sz = rs >> 4, rs & 15
        if sz == 0:
            if rl == 15:  # ZRL
                k += 16
                continue
            prog.eobrun = (1 << rl) - 1
            if rl:
                prog.eobrun += r.read_bits(rl)
            break
        k += rl
        if k > se:
            raise ValueError("JPEG AC index overflow")
        blk[k] = _extend(r.read_bits(sz), sz) << al
        k += 1


def _ac_refine(r, blk, tbl, ss, se, al, prog) -> None:
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if prog.eobrun == 0:
        while k <= se:
            rs = _huff_decode(r, tbl)
            rl, sz = rs >> 4, rs & 15
            val = 0
            if sz == 0:
                if rl < 15:  # EOB run: refine the rest of the band below
                    prog.eobrun = 1 << rl
                    if rl:
                        prog.eobrun += r.read_bits(rl)
                    break
                # rl == 15: ZRL — advance over 16 zero-history coeffs
            else:
                if sz != 1:
                    raise ValueError("JPEG AC refinement size != 1")
                val = p1 if r.read_bit() else m1
            while k <= se:
                if blk[k]:
                    if r.read_bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] > 0 else m1
                else:
                    if rl == 0:
                        break
                    rl -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if prog.eobrun > 0:
        while k <= se:
            if blk[k]:
                if r.read_bit() and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] > 0 else m1
            k += 1
        prog.eobrun -= 1


def avi_mjpeg_frames(payload: bytes) -> list[bytes]:
    """Extract the JPEG payload of every video frame from an MJPEG AVI
    (RIFF container): walks the chunk tree to the ``movi`` list and
    collects ``..dc``/``..db`` stream chunks. Returns raw JPEG bytes
    per frame (decode with :func:`decode_jpeg`). Non-AVI input raises
    ``ValueError``; an AVI whose frames aren't JPEG simply yields
    chunks that ``decode_jpeg`` will reject."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI stream")
    frames: list[bytes] = []

    def walk(start: int, end: int) -> None:
        i = start
        while i + 8 <= end:
            cid = payload[i : i + 4]
            clen = struct.unpack("<I", payload[i + 4 : i + 8])[0]
            body_start = i + 8
            if cid == b"LIST":
                ltype = payload[body_start : body_start + 4]
                if ltype in (b"movi", b"rec "):
                    walk(body_start + 4, body_start + clen)
            elif cid[2:4] in (b"dc", b"db") and clen > 0:
                frames.append(payload[body_start : body_start + clen])
            i = body_start + clen + (clen & 1)  # word-aligned

    walk(12, len(payload))
    return frames


def sample_mjpeg_avi(payload: bytes, every_n: int = 1) -> list[np.ndarray]:
    """Decode every ``every_n``-th frame of an MJPEG AVI to pixel
    arrays — the REAL frame-sampling path behind the video plumbing in
    operators/multimodal.py."""
    return [
        decode_jpeg(f) for f in avi_mjpeg_frames(payload)[::every_n]
    ]


def encode_avi_mjpeg(frames: list[bytes], fps: int = 25) -> bytes:
    """Minimal MJPEG AVI writer (enough container for the reader and
    for test fixtures): avih + one video stream + movi chunks."""
    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) & 1))

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1000000 // fps, 0, 0, 0x10, len(frames), 0, 1, 0, 0, 0, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps,
                                        0, len(frames), 0, 0, 0, 0)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, 0, 0, 1, 24, b"MJPG", 0, 0, 0, 0, 0)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> dict:
    """Decode integer-PCM WAV bytes to samples + features.

    Returns {sample_rate, n_samples, n_channels, samples (frames x
    channels int32 ndarray), rms, peak} — rms/peak are computed over
    all channels on amplitude normalized to [-1, 1]. Raises
    ``ValueError`` on non-PCM or unsupported sample widths.
    """
    try:
        with wave.open(io.BytesIO(payload), "rb") as f:
            rate = f.getframerate()
            n = f.getnframes()
            ch = f.getnchannels()
            width = f.getsampwidth()
            frames = f.readframes(n)
    except (wave.Error, EOFError, RuntimeError) as exc:
        # the stdlib reader escapes its own wave.Error on malformed
        # streams: EOFError when a chunk header truncates, and a bare
        # RuntimeError from _Chunk.seek when a garbage chunk size seeks
        # past the stream — both found by the fuzz test; caught here so
        # scraped junk degrades like any other malformed WAV instead of
        # crashing the Arrow batch
        raise ValueError(f"not a PCM WAV stream: {exc}") from exc
    if len(frames) != n * ch * width:
        # declared frame count exceeds the bytes present — a truncated
        # capture; partial loudness stats would be silently wrong
        raise ValueError(
            f"truncated WAV: header declares {n} frames, "
            f"payload holds {len(frames) // max(ch * width, 1)}"
        )
    if width == 1:  # 8-bit WAV is unsigned
        samples = (
            np.frombuffer(frames, dtype=np.uint8).astype(np.int32) - 128
        )
        full = 127.0
    elif width == 2:
        samples = np.frombuffer(frames, dtype="<i2").astype(np.int32)
        full = 32767.0
    elif width == 4:
        # stays int32 (the documented dtype): 32-bit PCM values already
        # fit, and widening to int64 silently broke fixed-schema callers
        samples = np.frombuffer(frames, dtype="<i4").astype(np.int32)
        full = 2147483647.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    samples = samples.reshape(-1, ch)
    norm = samples / full
    rms = float(np.sqrt(np.mean(norm**2))) if samples.size else None
    peak = float(np.max(np.abs(norm))) if samples.size else None
    return {
        "sample_rate": rate,
        "n_samples": n,
        "n_channels": ch,
        "samples": samples,
        "rms": rms,
        "peak": peak,
    }


def encode_wav(
    samples: np.ndarray, sample_rate: int, sampwidth: int = 2
) -> bytes:
    """Encode a (frames,) or (frames, channels) int array as PCM WAV."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    dtype = {1: np.uint8, 2: "<i2", 4: "<i4"}[sampwidth]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(s.shape[1])
        f.setsampwidth(sampwidth)
        f.setframerate(sample_rate)
        f.writeframes(np.ascontiguousarray(s.astype(dtype)).tobytes())
    return buf.getvalue()
