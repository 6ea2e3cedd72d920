"""Windows BMP (DIB) codec — 24-bit uncompressed, pure Python.

Clean-room implementation of the public BMP file format (Windows
BITMAPFILEHEADER + BITMAPINFOHEADER layout, as documented in the
Microsoft Windows GDI specification and the public file-format
literature):

- 14-byte file header: magic ``BM``, little-endian u32 file size, two
  reserved u16s, u32 offset to the pixel array.
- 40-byte BITMAPINFOHEADER: u32 header size (40), i32 width, i32
  height (positive = bottom-up rows, negative = top-down), u16 planes
  (1), u16 bits-per-pixel (24 here), u32 compression (0 = BI_RGB),
  u32 image size (may be 0 for BI_RGB), resolution and palette fields.
- Pixel array: rows of ``width`` pixels stored as B,G,R byte triples,
  each row zero-padded to a 4-byte boundary.

``decode_bmp`` is the REAL decode step behind
``operators.multimodal.decode_image``: it parses the headers,
validates magic/bpp/compression, honors the row padding and the
bottom-up/top-down sign, and returns pixels in row-major TOP-DOWN
(r, g, b) order regardless of on-disk row order. ``encode_bmp`` is the
matching writer (always bottom-up, the common form) used to synthesize
fixture payloads.
"""

from __future__ import annotations

import struct

# These codec functions run INSIDE executor Python workers (called from
# mapInPandas batch loops). Executor workers don't inherit the driver's
# sys.path, so the module must ship by value with the task, same as
# operators/multimodal.py itself.
import sys as _sys

from pyspark import cloudpickle as _cloudpickle

_cloudpickle.register_pickle_by_value(_sys.modules[__name__])

# plain format strings, not struct.Struct objects: this module ships to
# executor workers by value, and compiled Struct objects don't pickle
_FILE_HEADER_FMT = "<2sIHHI"  # magic, file size, res1, res2, data offset
_INFO_HEADER_FMT = "<IiiHHIIiiII"

_FILE_HEADER_SIZE = 14
_INFO_HEADER_SIZE = 40
_BI_RGB = 0


def _row_stride(width: int) -> int:
    return (width * 3 + 3) & ~3


def encode_bmp(width: int, height: int, pixels: list[tuple[int, int, int]]) -> bytes:
    """Serialize row-major top-down (r, g, b) pixels as a 24-bit BI_RGB
    BMP with bottom-up row order (positive height), 4-byte row padding."""
    if width <= 0 or height <= 0:
        raise ValueError(f"invalid dimensions {width}x{height}")
    if len(pixels) != width * height:
        raise ValueError(f"expected {width * height} pixels, got {len(pixels)}")
    stride = _row_stride(width)
    data_offset = _FILE_HEADER_SIZE + _INFO_HEADER_SIZE
    file_size = data_offset + stride * height
    out = bytearray(file_size)
    struct.pack_into(_FILE_HEADER_FMT, out, 0, b"BM", file_size, 0, 0, data_offset)
    struct.pack_into(
        _INFO_HEADER_FMT, out, _FILE_HEADER_SIZE,
        _INFO_HEADER_SIZE, width, height, 1, 24, _BI_RGB,
        stride * height, 2835, 2835, 0, 0,
    )
    for y in range(height):
        # top-down input row y lands at bottom-up disk row (height-1-y)
        row_off = data_offset + (height - 1 - y) * stride
        for x in range(width):
            r, g, b = pixels[y * width + x]
            o = row_off + x * 3
            out[o] = b
            out[o + 1] = g
            out[o + 2] = r
    return bytes(out)


def decode_bmp(payload: bytes) -> tuple[int, int, list[tuple[int, int, int]]]:
    """Parse a 24-bit BI_RGB BMP; returns (width, height, pixels) with
    pixels row-major TOP-DOWN (r, g, b) whatever the stored row order."""
    if len(payload) < _FILE_HEADER_SIZE + _INFO_HEADER_SIZE:
        raise ValueError("truncated BMP: missing headers")
    magic, _file_size, _r1, _r2, data_offset = struct.unpack_from(_FILE_HEADER_FMT, payload, 0)
    if magic != b"BM":
        raise ValueError(f"bad BMP magic {magic!r}")
    (
        hdr_size, width, height, planes, bpp, compression,
        _img_size, _xppm, _yppm, _ncolors, _nimportant,
    ) = struct.unpack_from(_INFO_HEADER_FMT, payload, _FILE_HEADER_SIZE)
    if hdr_size < _INFO_HEADER_SIZE:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    if planes != 1:
        raise ValueError(f"bad planes count {planes}")
    if bpp != 24:
        raise ValueError(f"unsupported bits-per-pixel {bpp} (24-bit only)")
    if compression != _BI_RGB:
        raise ValueError(f"unsupported compression {compression} (BI_RGB only)")
    top_down = height < 0
    abs_h = -height if top_down else height
    if width <= 0 or abs_h <= 0:
        raise ValueError(f"invalid dimensions {width}x{height}")
    stride = _row_stride(width)
    if data_offset < _FILE_HEADER_SIZE + hdr_size:
        raise ValueError(
            f"bad BMP data offset {data_offset}: overlaps the headers"
        )
    if data_offset + stride * abs_h > len(payload):
        raise ValueError("truncated BMP: pixel array short")
    pixels: list[tuple[int, int, int]] = []
    for y in range(abs_h):
        disk_row = y if top_down else abs_h - 1 - y
        row_off = data_offset + disk_row * stride
        for x in range(width):
            o = row_off + x * 3
            pixels.append((payload[o + 2], payload[o + 1], payload[o]))
    return width, abs_h, pixels
