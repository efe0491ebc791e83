"""Pure-Python/numpy media codecs: netpbm (PPM/PGM), BMP, PNG, and WAV.

These are REAL decoders — they parse genuine file headers (magic, comments,
dimension tokens, CRC'd chunk walks, row padding, bottom-up row order,
zlib-deflated filtered scanlines) and reject malformed input — not the
deterministic stand-ins the container's missing codec libraries previously
forced (see multimodal.FAKE_DECODERS, kept only for the legacy
``format='fake'`` blobs).  netpbm/BMP/WAV are uncompressed and PNG's
compression is stdlib zlib, so a correct decoder needs no external
library: the arithmetic is exact and bit-reproducible, which is what lets
the driver rows carry integer-exact DuckDB oracles over the same blobs.

Reference parity: the reference treats blobs as opaque hex/base64 text
(pkg/snowsql/sql.go:119-121 ``TO_BINARY($n,'HEX')``) and never decodes
them; decode/feature/resize are part of this engine's training-data layer,
which goes beyond the reference by design.

All decoders work on ``bytes``/``bytearray``/``memoryview`` and return
numpy arrays; encoders are the exact inverses used by the resize operator
and the test fixtures.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


class CodecError(ValueError):
    """Malformed or unsupported media blob."""


# ---------------------------------------------------------------------------
# Format sniffing
# ---------------------------------------------------------------------------
def sniff_format(blob) -> str | None:
    """Best-effort container detection from magic bytes."""
    if blob is None:
        return None
    b = bytes(blob[:16])
    if b[:8] == _PNG_SIG:
        return "png"
    if b[:2] == b"BM":
        return "bmp"
    if b[:1] == b"P" and b[1:2] in (b"2", b"3", b"5", b"6"):
        return "ppm" if b[1:2] in (b"3", b"6") else "pgm"
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return "wav"
    return None


# ---------------------------------------------------------------------------
# netpbm (PPM P6/P3, PGM P5/P2)
# ---------------------------------------------------------------------------
def _pnm_header_tokens(buf: bytes, count: int) -> tuple[list[bytes], int]:
    """Read *count* whitespace-separated header tokens, honouring ``#``
    comments, returning (tokens, offset one whitespace byte past the last
    token) — the netpbm spec says exactly one whitespace byte separates the
    maxval from the raster."""
    toks: list[bytes] = []
    i = 0
    n = len(buf)
    while len(toks) < count:
        while i < n and buf[i : i + 1].isspace():
            i += 1
        if i < n and buf[i : i + 1] == b"#":
            while i < n and buf[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < n and not buf[j : j + 1].isspace():
            j += 1
        if j == i:
            raise CodecError("truncated netpbm header")
        toks.append(buf[i:j])
        i = j
    if i >= n or not buf[i : i + 1].isspace():
        raise CodecError("netpbm header not followed by whitespace")
    return toks, i + 1


def decode_pnm(blob) -> np.ndarray:
    """Decode P6/P3 (RGB) and P5/P2 (gray) to a (h, w, 3) uint8 array;
    grayscale replicates into 3 channels so downstream feature code sees one
    shape.  Only maxval ≤ 255 (8-bit) rasters are supported."""
    buf = bytes(blob)
    magic = buf[:2]
    if magic not in (b"P2", b"P3", b"P5", b"P6"):
        raise CodecError(f"not a supported netpbm magic: {magic!r}")
    channels = 3 if magic in (b"P3", b"P6") else 1
    binary = magic in (b"P5", b"P6")
    toks, off = _pnm_header_tokens(buf[2:], 3)
    try:
        w, h, maxval = (int(t) for t in toks)
    except ValueError as e:
        raise CodecError(f"non-numeric netpbm header token: {toks}") from e
    if w <= 0 or h <= 0:
        raise CodecError(f"invalid netpbm dimensions {w}x{h}")
    if not 0 < maxval <= 255:
        raise CodecError(f"unsupported netpbm maxval {maxval} (8-bit only)")
    need = w * h * channels
    if binary:
        raster = buf[2 + off : 2 + off + need]
        if len(raster) < need:
            raise CodecError(
                f"netpbm raster truncated: need {need} bytes, have {len(raster)}"
            )
        arr = np.frombuffer(raster, dtype=np.uint8, count=need)
    else:
        vals = buf[2 + off :].split()
        if len(vals) < need:
            raise CodecError(
                f"netpbm ascii raster truncated: need {need} values, have {len(vals)}"
            )
        try:
            arr = np.array([int(v) for v in vals[:need]], dtype=np.int64)
        except ValueError as e:
            raise CodecError("non-numeric ascii raster value") from e
        if arr.min() < 0 or arr.max() > maxval:
            raise CodecError("ascii raster value out of range")
        arr = arr.astype(np.uint8)
    arr = arr.reshape(h, w, channels)
    if channels == 1:
        arr = np.repeat(arr, 3, axis=2)
    return arr


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary P6."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise CodecError(f"encode_ppm wants (h, w, 3), got {arr.shape}")
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed BITMAPINFOHEADER)
# ---------------------------------------------------------------------------
def decode_bmp(blob) -> np.ndarray:
    """Decode an uncompressed 24-bit BMP to (h, w, 3) uint8 RGB.  Handles
    4-byte row padding, bottom-up (positive height) and top-down (negative
    height) row order, and BGR→RGB channel swap."""
    buf = bytes(blob)
    if buf[:2] != b"BM" or len(buf) < 54:
        raise CodecError("not a BMP (missing 'BM' magic or truncated header)")
    data_offset = struct.unpack_from("<I", buf, 10)[0]
    dib_size = struct.unpack_from("<I", buf, 14)[0]
    if dib_size < 40:
        raise CodecError(f"unsupported DIB header size {dib_size} (<40)")
    w, h_raw = struct.unpack_from("<ii", buf, 18)
    bpp = struct.unpack_from("<H", buf, 28)[0]
    compression = struct.unpack_from("<I", buf, 30)[0]
    if bpp != 24 or compression != 0:
        raise CodecError(f"only 24bpp BI_RGB supported (bpp={bpp}, comp={compression})")
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    if w <= 0 or h <= 0:
        raise CodecError(f"invalid BMP dimensions {w}x{h_raw}")
    row_size = (w * 3 + 3) // 4 * 4
    need = row_size * h
    raster = buf[data_offset : data_offset + need]
    if len(raster) < need:
        raise CodecError(f"BMP raster truncated: need {need}, have {len(raster)}")
    rows = np.frombuffer(raster, dtype=np.uint8, count=need).reshape(h, row_size)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    if not top_down:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → bottom-up 24-bit BMP with row padding."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise CodecError(f"encode_bmp wants (h, w, 3), got {arr.shape}")
    h, w = arr.shape[:2]
    row_size = (w * 3 + 3) // 4 * 4
    raster = np.zeros((h, row_size), dtype=np.uint8)
    raster[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)
    data = raster.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + dib + data


# ---------------------------------------------------------------------------
# PNG (8-bit gray / RGB / RGBA, non-interlaced — stdlib zlib inflate)
# ---------------------------------------------------------------------------
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunks(buf: bytes):
    pos = 8
    while pos + 8 <= len(buf):
        (length,) = struct.unpack_from(">I", buf, pos)
        ctype = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + length]
        if len(data) < length or pos + 12 + length > len(buf):
            raise CodecError(f"PNG chunk {ctype!r} truncated")
        (crc,) = struct.unpack_from(">I", buf, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise CodecError(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, data
        pos += 12 + length


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(blob) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG (colour types 0 gray, 2 RGB,
    6 RGBA — alpha dropped) to (h, w, 3) uint8 RGB.  A REAL decoder:
    chunk walk with CRC verification, zlib inflate of the IDAT stream,
    and per-scanline reversal of all five filter types (None/Sub/Up/
    Average/Paeth).  The unfilter loop is pure Python — O(pixels) with a
    real constant; swap in PIL where throughput matters.  Palette (3) and
    interlaced images are rejected explicitly."""
    buf = bytes(blob)
    if buf[:8] != _PNG_SIG:
        raise CodecError("not a PNG (bad signature)")
    ihdr = None
    idat = bytearray()
    for ctype, data in _png_chunks(buf):
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or len(ihdr) < 13:
        raise CodecError("PNG missing IHDR")
    w, h, depth, ctype_n, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr[:13])
    if w <= 0 or h <= 0:
        raise CodecError(f"invalid PNG dimensions {w}x{h}")
    if depth != 8:
        raise CodecError(f"unsupported PNG bit depth {depth} (8 only)")
    if ctype_n not in (0, 2, 6):
        raise CodecError(f"unsupported PNG colour type {ctype_n} (0/2/6 only)")
    if comp != 0 or filt != 0:
        raise CodecError("non-standard PNG compression/filter method")
    if interlace != 0:
        raise CodecError("interlaced PNG unsupported")
    channels = {0: 1, 2: 3, 6: 4}[ctype_n]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise CodecError(f"PNG IDAT inflate failed: {e}") from e
    stride = w * channels
    if len(raw) < h * (stride + 1):
        raise CodecError("PNG scanline data truncated")
    out = bytearray(h * stride)
    prev = bytearray(stride)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ft == 1:  # Sub
            for x in range(channels, stride):
                line[x] = (line[x] + line[x - channels]) & 0xFF
        elif ft == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif ft == 3:  # Average
            for x in range(stride):
                left = line[x - channels] if x >= channels else 0
                line[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(stride):
                left = line[x - channels] if x >= channels else 0
                ul = prev[x - channels] if x >= channels else 0
                line[x] = (line[x] + _paeth(left, prev[x], ul)) & 0xFF
        elif ft != 0:
            raise CodecError(f"unknown PNG filter type {ft}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    arr = np.frombuffer(bytes(out), dtype=np.uint8).reshape(h, w, channels)
    if channels == 1:
        arr = np.repeat(arr, 3, axis=2)
    elif channels == 4:
        arr = arr[:, :, :3]
    return np.ascontiguousarray(arr)


def encode_png(arr: np.ndarray, level: int = 6) -> bytes:
    """(h, w, 3) uint8 RGB → non-interlaced PNG (filter 0 scanlines)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise CodecError(f"encode_png wants (h, w, 3), got {arr.shape}")
    h, w = arr.shape[:2]
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, level))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# Image transforms
# ---------------------------------------------------------------------------
def decode_image(blob) -> np.ndarray:
    """Dispatch on magic: netpbm, BMP or PNG → (h, w, 3) uint8 RGB."""
    fmt = sniff_format(blob)
    if fmt in ("ppm", "pgm"):
        return decode_pnm(blob)
    if fmt == "bmp":
        return decode_bmp(blob)
    if fmt == "png":
        return decode_png(blob)
    raise CodecError(f"undecodable image blob (format={fmt})")


def resize_nearest(arr: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Deterministic nearest-neighbour resample: output pixel (y, x) takes
    source pixel (y*h//th, x*w//tw) — pure integer index math, so the same
    mapping is reproducible in a SQL oracle."""
    if target_w <= 0 or target_h <= 0:
        raise CodecError(f"invalid resize target {target_w}x{target_h}")
    h, w = arr.shape[:2]
    ys = (np.arange(target_h) * h) // target_h
    xs = (np.arange(target_w) * w) // target_w
    return np.ascontiguousarray(arr[ys][:, xs])


# ---------------------------------------------------------------------------
# WAV (RIFF, PCM)
# ---------------------------------------------------------------------------
def decode_wav(blob) -> tuple[int, np.ndarray]:
    """Walk the RIFF chunk list; return (sample_rate, samples[int16, frames
    × channels]).  Only format tag 1 (PCM) at 16 bits is supported; chunk
    sizes are honoured (incl. odd-size pad bytes), so files with extra
    chunks (LIST, fact, …) decode correctly."""
    buf = bytes(blob)
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise CodecError("not a RIFF/WAVE blob")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        size = struct.unpack_from("<I", buf, pos + 4)[0]
        body = buf[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise CodecError(f"WAV chunk {cid!r} truncated")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise CodecError("WAV missing fmt or data chunk")
    if len(fmt) < 16:
        raise CodecError("WAV fmt chunk too short")
    audio_format, channels, sample_rate, _, _, bits = struct.unpack_from(
        "<HHIIHH", fmt, 0
    )
    if audio_format != 1 or bits != 16:
        raise CodecError(
            f"only 16-bit PCM supported (format={audio_format}, bits={bits})"
        )
    if channels < 1:
        raise CodecError("WAV channels < 1")
    n = len(data) // (2 * channels) * channels
    samples = np.frombuffer(data, dtype="<i2", count=n)
    return sample_rate, samples.reshape(-1, channels)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(frames,) or (frames, channels) int16 → canonical 44-byte-header
    PCM WAV."""
    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr.reshape(-1, 1)
    channels = arr.shape[1]
    data = arr.tobytes()
    block_align = 2 * channels
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align, block_align, 16
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
