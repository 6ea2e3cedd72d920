"""PNG codec — 8-bit truecolor (RGB/RGBA), non-interlaced, pure Python.

Clean-room implementation of the public PNG format (ISO/IEC 15948 /
W3C PNG specification, second edition), covering the subset a
training-data pipeline's image columns need:

- 8-byte signature ``\\x89PNG\\r\\n\\x1a\\n``; chunk stream of
  (u32 BE length, 4-byte type, data, u32 BE CRC-32 over type+data).
- IHDR: u32 width, u32 height, bit depth 8, color type 2 (RGB) or
  6 (RGBA), compression 0 (zlib/DEFLATE, RFC 1950 framing — unlike
  Avro's raw RFC 1951 blocks), filter method 0, interlace 0 only
  (Adam7 rejected with a clear error).
- IDAT (one or more, concatenated): zlib stream of scanlines, each a
  filter-type byte (0 None, 1 Sub, 2 Up, 3 Average, 4 Paeth) followed
  by width*channels filtered bytes.
- IEND terminates; ancillary chunks are skipped; every chunk CRC is
  verified.

``decode_png`` inverts all five scanline filters (the Paeth predictor
per the spec's reference pseudocode) and returns row-major top-down
(r, g, b) pixels — alpha, when present, is dropped after decode so the
pipeline shape matches ``decode_bmp``. ``encode_png`` is the matching
writer used to synthesize fixture payloads; ``filter_mode="cycle"``
assigns filter type ``y % 5`` per scanline so a round trip exercises
every filter path.
"""

from __future__ import annotations

import struct
import zlib

# Ships by value to executor Python workers (called from mapInPandas
# batch loops) — same rationale as codecs/bmp.py.
import sys as _sys

from pyspark import cloudpickle as _cloudpickle

_cloudpickle.register_pickle_by_value(_sys.modules[__name__])

SIGNATURE = b"\x89PNG\r\n\x1a\n"
_COLOR_CHANNELS = {2: 3, 6: 4}  # truecolor, truecolor+alpha

# Fail-closed ceiling on one image's decoded bytes: a crafted IHDR (or
# a zlib bomb behind a small IDAT) must be rejected before the decoder
# allocates, not after inflating an unbounded stream in an executor.
_MAX_DECODED_BYTES = 1 << 27  # 128 MiB


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    # the spec's reference predictor: left, up, upper-left
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_row(ftype: int, raw: bytes, prev: bytes, bpp: int) -> bytes:
    out = bytearray(len(raw))
    for i, x in enumerate(raw):
        a = raw[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        elif ftype == 4:
            pred = _paeth(a, b, c)
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[i] = (x - pred) & 0xFF
    return bytes(out)


def _unfilter_row(ftype: int, filt: bytes, prev: bytes, bpp: int) -> bytes:
    out = bytearray(len(filt))
    for i, x in enumerate(filt):
        a = out[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        elif ftype == 4:
            pred = _paeth(a, b, c)
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[i] = (x + pred) & 0xFF
    return bytes(out)


def encode_png(
    width: int,
    height: int,
    pixels: list[tuple[int, int, int]],
    filter_mode: str = "none",
) -> bytes:
    """Serialize row-major top-down (r, g, b) pixels as an 8-bit RGB
    (color type 2) non-interlaced PNG. ``filter_mode``: "none" writes
    every scanline with filter 0; "cycle" uses filter ``y % 5`` so all
    five filter types appear (decode-path exercise)."""
    if width <= 0 or height <= 0:
        raise ValueError(f"invalid dimensions {width}x{height}")
    if len(pixels) != width * height:
        raise ValueError(f"expected {width * height} pixels, got {len(pixels)}")
    if filter_mode not in ("none", "cycle"):
        raise ValueError(f"bad filter_mode {filter_mode!r}")
    bpp = 3
    raw_prev = bytes(width * bpp)
    scanlines = bytearray()
    for y in range(height):
        row = pixels[y * width : (y + 1) * width]
        raw = bytes(v for px in row for v in px)
        ftype = (y % 5) if filter_mode == "cycle" else 0
        scanlines.append(ftype)
        scanlines += _filter_row(ftype, raw, raw_prev, bpp)
        raw_prev = raw
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(scanlines), 9))
        + _chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> tuple[int, int, list[tuple[int, int, int]]]:
    """Parse an 8-bit truecolor non-interlaced PNG; returns (width,
    height, pixels) row-major top-down (r, g, b) — alpha dropped for
    color type 6. Verifies the signature, every chunk CRC, and the
    IHDR constraints; raises ValueError on anything else."""
    if payload[: len(SIGNATURE)] != SIGNATURE:
        raise ValueError("bad PNG signature")
    pos = len(SIGNATURE)
    ihdr = None
    idat = bytearray()
    seen_iend = False
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise ValueError("truncated PNG: chunk header short")
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(payload):
            raise ValueError("truncated PNG: chunk data short")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC for chunk {ctype!r}")
        pos += 12 + length
        if ctype == b"IHDR":
            # spec: IHDR is the first chunk and appears exactly once
            if ihdr is not None:
                raise ValueError("duplicate IHDR chunk")
            ihdr = data
        elif ihdr is None:
            raise ValueError(f"chunk {ctype!r} before IHDR")
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            seen_iend = True
            break
        # ancillary chunks skipped (CRC still verified above)
    if seen_iend and pos != len(payload):
        raise ValueError("trailing bytes after IEND")
    if ihdr is None:
        raise ValueError("missing IHDR")
    if len(ihdr) != 13:
        raise ValueError(f"IHDR must be 13 bytes, got {len(ihdr)}")
    if not idat:
        raise ValueError("missing IDAT")
    if not seen_iend:
        raise ValueError("missing IEND")
    width, height, depth, ctype_v, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if width <= 0 or height <= 0:
        raise ValueError(f"invalid dimensions {width}x{height}")
    if depth != 8:
        raise ValueError(f"unsupported bit depth {depth} (8-bit only)")
    if ctype_v not in _COLOR_CHANNELS:
        raise ValueError(f"unsupported color type {ctype_v} (RGB/RGBA only)")
    if comp != 0 or filt != 0:
        raise ValueError("unsupported compression/filter method")
    if interlace != 0:
        raise ValueError("interlaced (Adam7) PNG not supported")
    bpp = _COLOR_CHANNELS[ctype_v]
    stride = width * bpp
    expected = height * (1 + stride)
    # Bound the inflate by the size the declared dimensions imply: a
    # crafted zlib bomb (or a huge IHDR) must fail closed BEFORE the
    # allocation, not after inflating an unbounded stream into memory.
    if expected > _MAX_DECODED_BYTES:
        raise ValueError(
            f"declared dimensions {width}x{height} exceed the decode budget"
        )
    dobj = zlib.decompressobj()
    raw = dobj.decompress(bytes(idat), expected)
    if dobj.unconsumed_tail:
        raise ValueError("IDAT inflates past the declared dimensions")
    if not dobj.eof:
        # never reached end-of-stream: truncated deflate data, or the
        # adler32 was never verified — fail closed like full inflate did
        raise ValueError("IDAT zlib stream truncated")
    if dobj.unused_data:
        raise ValueError("trailing bytes after the IDAT zlib stream")
    if len(raw) != expected:
        raise ValueError("IDAT length does not match dimensions")
    pixels: list[tuple[int, int, int]] = []
    prev = bytes(stride)
    for y in range(height):
        off = y * (1 + stride)
        row = _unfilter_row(raw[off], raw[off + 1 : off + 1 + stride], prev, bpp)
        prev = row
        for x in range(width):
            o = x * bpp
            pixels.append((row[o], row[o + 1], row[o + 2]))
    return width, height, pixels
