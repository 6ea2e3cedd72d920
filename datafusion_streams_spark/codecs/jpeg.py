"""Baseline JPEG codec (grayscale, sequential DCT), pure Python.

Clean-room implementation of the PUBLIC JPEG specification (ITU-T
T.81 / ISO 10918-1), baseline sequential process, single-component
(grayscale) 8-bit images — the last image format this repo documented
as a library swap-in, now implemented natively like bmp/png/wav:

- marker stream: SOI, DQT (zigzag-ordered 8-bit tables), SOF0
  (baseline, 1 component enforced), DHT (arbitrary canonical Huffman
  tables rebuilt from the spec's BITS/HUFFVAL lists), SOS, entropy
  data with 0xFF 0x00 byte stuffing, EOI; APPn/COM skipped;
- entropy coding: per-block DC difference (category + extend-coded
  magnitude bits) and AC run-length (RRRRSSSS symbols, EOB, ZRL);
- transform: level shift, 8x8 forward/inverse DCT (separable,
  orthonormal), quantization with round-half-up.

Determinism note (the repo's float-parity discipline): the DC
coefficient of ANY block is computed in exact INTEGER arithmetic
(the DCT-II (0,0) basis is a constant, so F(0,0) = sum(f-128)/8 and
quantization is floor((2*sum + 8*Q)/(16*Q))), and blocks whose AC
coefficients are all zero are reconstructed on an integer-only path
(pixel = clip(floor((S*Q + 4)/8) + 128)). Piecewise-flat images
therefore round-trip EXACTLY and a SQL oracle can recompute the
decoded output — that is what `multimodal_jpeg_decode` hash-checks.
The float DCT only decides coefficients whose quantized value is
far from a rounding boundary in those fixtures (|AC| < 1e-9 vs a
0.5 threshold), so engine parity never rides on float summation
order; general (non-flat) content is accuracy-bounded in pytest
instead of oracle-matched, as lossy content must be.

The encoder exists to synthesize test payloads (and pins the writer
side of the spec); the decoder is the product path and accepts any
baseline grayscale file: arbitrary DHT/DQT tables, partial edge
blocks (cropped per SOF dimensions), stuffed bytes, skipped
ancillary segments. Progressive (SOF2), multi-component scans, and
restart intervals raise clear errors — documented scope, as with
the other codecs here.
"""

from __future__ import annotations

import math
import struct

# Ships by value to executor Python workers (mapInPandas batch loops) —
# same rationale as codecs/bmp.py.
import sys as _sys

from pyspark import cloudpickle as _cloudpickle

_cloudpickle.register_pickle_by_value(_sys.modules[__name__])

# Zigzag scan order: ZIGZAG[k] = raster index of the k-th coefficient.
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# The spec's example luminance quantization table (Annex K) in raster
# order. Q[0] = 16 is a power of two, which keeps every closed-form
# oracle division exact in binary floating point.
STD_QUANT = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

# This encoder's Huffman tables, in the spec's (BITS, HUFFVAL) form.
# Deliberately simple canonical tables rather than the Annex K
# examples: every DC category 0..11 at 4 bits, every AC RRRRSSSS
# symbol at 8 bits (162 symbols < 255, so the all-ones code stays
# unused as the spec's table-building procedure requires). The decoder
# does not care — it rebuilds whatever tables the DHT segments
# declare, which the handwritten-vector tests exercise with entirely
# different table shapes.
_ENC_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_VALUES = list(range(12))
_ENC_AC_VALUES = sorted([0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
])
_ENC_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_ENC_AC_VALUES), 0, 0, 0, 0, 0, 0, 0, 0]

# Orthonormal DCT-II basis: C[u][x] = c_u/2 * cos((2x+1) u pi / 16).
_DCT_C = [
    [
        (math.sqrt(0.5) if u == 0 else 1.0) / 2.0
        * math.cos((2 * x + 1) * u * math.pi / 16.0)
        for x in range(8)
    ]
    for u in range(8)
]


def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (length, code) per the spec's canonical assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (length, code)
            code += 1
            k += 1
        # canonical validity: every code assigned at this length must fit
        # in `length` bits (code counter <= 2^length after assignment)
        if code > (1 << length):
            raise ValueError(
                "jpeg: Huffman code counts overflow the canonical code space"
            )
        code <<= 1
    if len(codes) != k:
        raise ValueError("jpeg: duplicate symbol in Huffman table")
    return codes


def _decode_table(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for the bit-serial decoder."""
    return {lc: sym for sym, lc in _canonical_codes(bits, values).items()}


def _category(v: int) -> int:
    """SSSS of a DC difference / AC coefficient: bit length of |v|."""
    return abs(v).bit_length()


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._nbits = 0

    def put(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._nbits += length
        while self._nbits >= 8:
            self._nbits -= 8
            byte = (self._acc >> self._nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
        self._acc &= (1 << self._nbits) - 1

    def flush(self) -> None:
        if self._nbits:
            pad = 8 - self._nbits
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per spec


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._nbits = 0

    def take(self, length: int) -> int:
        while self._nbits < length:
            if self.pos >= len(self.data):
                raise ValueError("jpeg: entropy stream truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("jpeg: entropy stream truncated at 0xFF")
                marker = self.data[self.pos]
                if marker == 0x00:
                    self.pos += 1  # stuffed data byte
                else:
                    raise ValueError(
                        f"jpeg: unexpected marker 0xFF{marker:02X} inside scan"
                    )
            self._acc = (self._acc << 8) | b
            self._nbits += 8
        self._nbits -= length
        v = (self._acc >> self._nbits) & ((1 << length) - 1)
        self._acc &= (1 << self._nbits) - 1
        return v

    def read_code(self, table: dict[tuple[int, int], int]) -> int:
        length = 0
        code = 0
        while length < 16:
            code = (code << 1) | self.take(1)
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("jpeg: invalid Huffman code in scan")


def _extend(bits: int, t: int) -> int:
    """Spec EXTEND(): recover a signed value from its t magnitude bits."""
    if t == 0:
        return 0
    return bits if bits >= 1 << (t - 1) else bits - (1 << t) + 1


# ---------------------------------------------------------------------------
# forward path (encoder)
# ---------------------------------------------------------------------------


def _fdct_ac(block: list[int]) -> list[float]:
    """Separable forward DCT of (pixel - 128); entries in raster order.
    Only the AC entries of the result are consumed — DC is recomputed
    exactly in integers by the caller."""
    shifted = [v - 128 for v in block]
    # rows
    tmp = [0.0] * 64
    for y in range(8):
        row = shifted[y * 8 : y * 8 + 8]
        for u in range(8):
            cu = _DCT_C[u]
            acc = 0.0
            for x in range(8):
                acc += row[x] * cu[x]
            tmp[y * 8 + u] = acc
    out = [0.0] * 64
    for u in range(8):
        col = [tmp[y * 8 + u] for y in range(8)]
        for v in range(8):
            cv = _DCT_C[v]
            acc = 0.0
            for y in range(8):
                acc += col[y] * cv[y]
            out[v * 8 + u] = acc
    return out


def _quantize_block(block: list[int], quant: list[int]) -> list[int]:
    """Quantized coefficients in raster order; round-half-up. DC goes
    through exact integer arithmetic (see module docstring)."""
    coeffs = [0] * 64
    total = sum(block) - 128 * 64
    q0 = quant[0]
    coeffs[0] = (2 * total + 8 * q0) // (16 * q0)
    if min(block) != max(block):
        fl = _fdct_ac(block)
        for i in range(1, 64):
            f = fl[i]
            q = quant[i]
            coeffs[i] = math.floor(f / q + 0.5)
    return coeffs


def encode_jpeg_gray(
    width: int, height: int, pixels: list[int], quant: list[int] | None = None
) -> bytes:
    """Serialize an 8-bit grayscale image as a baseline JPEG. ``pixels``
    is row-major, length width*height; partial edge blocks are padded
    by edge replication before the transform (the standard approach —
    the decoder crops back to the SOF dimensions)."""
    if width <= 0 or height <= 0 or width > 0xFFFF or height > 0xFFFF:
        raise ValueError(f"invalid dimensions {width}x{height}")
    if len(pixels) != width * height:
        raise ValueError(f"expected {width * height} pixels, got {len(pixels)}")
    for p in pixels:
        if not 0 <= p <= 255:
            raise ValueError(f"pixel {p} out of 8-bit range")
    quant = list(STD_QUANT) if quant is None else list(quant)
    if len(quant) != 64 or any(not 1 <= q <= 255 for q in quant):
        raise ValueError("quant table must be 64 entries in 1..255")

    out = bytearray(b"\xff\xd8")  # SOI
    # DQT: Pq=0 (8-bit), Tq=0, zigzag order
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00"
    out += bytes(quant[ZIGZAG[k]] for k in range(64))
    # SOF0: baseline, 8-bit, 1 component (id 1, sampling 1x1, table 0)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, height, width, 1)
    out += b"\x01\x11\x00"
    # DHT segments
    for tc_th, bits, values in (
        (0x00, _ENC_DC_BITS, _ENC_DC_VALUES),
        (0x10, _ENC_AC_BITS, _ENC_AC_VALUES),
    ):
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(values), tc_th)
        out += bytes(bits) + bytes(values)
    # SOS: 1 component, DC table 0 / AC table 0, full spectral selection
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + b"\x01\x00\x00\x3f\x00"

    dc_codes = _canonical_codes(_ENC_DC_BITS, _ENC_DC_VALUES)
    ac_codes = _canonical_codes(_ENC_AC_BITS, _ENC_AC_VALUES)
    writer = _BitWriter()
    pred = 0
    for by in range((height + 7) // 8):
        for bx in range((width + 7) // 8):
            x0, y0 = 8 * bx, 8 * by
            if x0 + 8 <= width and y0 + 8 <= height:
                block = []
                for y in range(8):
                    base = (y0 + y) * width + x0
                    block.extend(pixels[base : base + 8])
            else:  # edge block: pad by edge replication
                block = [
                    pixels[min(y0 + y, height - 1) * width + min(x0 + x, width - 1)]
                    for y in range(8)
                    for x in range(8)
                ]
            coeffs = _quantize_block(block, quant)
            # DC difference
            diff = coeffs[0] - pred
            pred = coeffs[0]
            t = _category(diff)
            if t > 11:
                raise ValueError("jpeg: DC difference exceeds baseline range")
            length, code = dc_codes[t]
            writer.put(code, length)
            if t:
                writer.put(diff if diff > 0 else diff + (1 << t) - 1, t)
            # AC run-length in zigzag order
            run = 0
            for k in range(1, 64):
                c = coeffs[ZIGZAG[k]]
                if c == 0:
                    run += 1
                    continue
                while run > 15:
                    length, code = ac_codes[0xF0]  # ZRL
                    writer.put(code, length)
                    run -= 16
                s = _category(c)
                if s > 10:
                    raise ValueError("jpeg: AC coefficient exceeds baseline range")
                length, code = ac_codes[(run << 4) | s]
                writer.put(code, length)
                writer.put(c if c > 0 else c + (1 << s) - 1, s)
                run = 0
            if run:
                length, code = ac_codes[0x00]  # EOB
                writer.put(code, length)
    writer.flush()
    out += writer.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# inverse path (decoder)
# ---------------------------------------------------------------------------


def _idct_block(coeffs: list[int]) -> list[int]:
    """Inverse DCT of dequantized raster-order coefficients -> clipped
    pixels. DC-only blocks take the exact integer path (see module
    docstring)."""
    if not any(coeffs[1:]):
        # floor((r + 4) / 8) in exact integers (Python // floors)
        val = (coeffs[0] + 4) // 8 + 128
        val = 0 if val < 0 else 255 if val > 255 else val
        return [val] * 64
    # columns then rows
    tmp = [0.0] * 64
    for u in range(8):
        col = [coeffs[v * 8 + u] for v in range(8)]
        for y in range(8):
            acc = 0.0
            for v in range(8):
                acc += col[v] * _DCT_C[v][y]
            tmp[y * 8 + u] = acc
    out = [0] * 64
    for y in range(8):
        row = tmp[y * 8 : y * 8 + 8]
        for x in range(8):
            acc = 0.0
            for u in range(8):
                acc += row[u] * _DCT_C[u][x]
            val = math.floor(acc + 0.5) + 128
            out[y * 8 + x] = 0 if val < 0 else 255 if val > 255 else val
    return out


def decode_jpeg_gray(payload: bytes) -> tuple[int, int, list[int]]:
    """Decode a baseline sequential grayscale JPEG -> (width, height,
    row-major pixel list). Raises ValueError on anything outside the
    documented scope with a message naming the problem."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("jpeg: bad SOI magic")
    pos = 2
    quant: dict[int, list[int]] = {}
    dc_tables: dict[int, dict[tuple[int, int], int]] = {}
    ac_tables: dict[int, dict[tuple[int, int], int]] = {}
    width = height = 0
    comp_tq = 0
    while True:
        if pos + 4 > len(payload):
            raise ValueError("jpeg: truncated before SOS")
        if payload[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at byte {pos}")
        # T.81 B.1.1.2: a marker may be preceded by any number of 0xFF
        # fill bytes — skip them so a spec-valid padded file decodes
        while pos < len(payload) and payload[pos] == 0xFF:
            pos += 1
        if pos >= len(payload):
            raise ValueError("jpeg: truncated in marker fill bytes")
        marker = payload[pos]
        if marker == 0x00:
            raise ValueError("jpeg: stuffed 0xFF00 outside entropy-coded data")
        pos += 1
        if marker == 0xD9:
            raise ValueError("jpeg: EOI before any scan")
        # fill-byte skipping may have consumed the slack the loop-top
        # guard checked; re-check before the 2-byte length read
        if pos + 2 > len(payload):
            raise ValueError("jpeg: truncated before segment length")
        (seglen,) = struct.unpack_from(">H", payload, pos)
        if seglen < 2 or pos + seglen > len(payload):
            raise ValueError("jpeg: segment overruns file")
        body = payload[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                if pq != 0:
                    raise ValueError("jpeg: only 8-bit quant tables supported")
                if b + 65 > len(body):
                    raise ValueError("jpeg: DQT table truncated")
                zz = body[b + 1 : b + 65]
                table = [0] * 64
                for k in range(64):
                    table[ZIGZAG[k]] = zz[k]
                quant[tq] = table
                b += 65
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                if b + 17 > len(body):
                    raise ValueError("jpeg: DHT header truncated")
                tc, th = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                if n > 256:
                    raise ValueError("jpeg: DHT declares more than 256 codes")
                values = list(body[b + 17 : b + 17 + n])
                if len(values) != n:
                    raise ValueError("jpeg: DHT table truncated")
                (dc_tables if tc == 0 else ac_tables)[th] = _decode_table(
                    bits, values
                )
                b += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            if len(body) < 9:
                raise ValueError("jpeg: SOF0 segment truncated")
            precision, height, width, ncomp = struct.unpack_from(">BHHB", body, 0)
            if precision != 8:
                raise ValueError("jpeg: only 8-bit precision supported")
            if ncomp != 1:
                raise ValueError(
                    f"jpeg: {ncomp} components — this decoder is grayscale-only"
                )
            if width == 0 or height == 0:
                raise ValueError("jpeg: zero dimension in SOF")
            h_i, v_i = body[7] >> 4, body[7] & 0x0F
            if not (1 <= h_i <= 4 and 1 <= v_i <= 4):
                raise ValueError(
                    f"jpeg: sampling factors {h_i}x{v_i} outside the spec's 1-4"
                )
            comp_tq = body[8]  # after component id + sampling factors
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(
                f"jpeg: SOF{marker - 0xC0} not supported (baseline sequential only)"
            )
        elif marker == 0xDD:
            raise ValueError("jpeg: restart intervals (DRI) not supported")
        elif marker == 0xDA:  # SOS
            if len(body) < 6:
                raise ValueError("jpeg: SOS segment truncated")
            if width == 0:
                raise ValueError("jpeg: SOS before SOF")
            ns = body[0]
            if ns != 1:
                raise ValueError("jpeg: multi-component scan unsupported")
            td, ta = body[2] >> 4, body[2] & 0x0F
            if td not in dc_tables or ta not in ac_tables:
                raise ValueError("jpeg: scan references undefined Huffman table")
            if comp_tq not in quant:
                raise ValueError("jpeg: component references undefined quant table")
            return _decode_scan(
                payload, pos, width, height,
                quant[comp_tq], dc_tables[td], ac_tables[ta],
            )
        elif 0xE0 <= marker <= 0xEF or marker == 0xFE:
            continue  # APPn / COM: ancillary, skipped
        else:
            raise ValueError(f"jpeg: unsupported marker 0xFF{marker:02X}")


def _decode_scan(payload, pos, width, height, quant, dc_table, ac_table):
    reader = _BitReader(payload, pos)
    bw = (width + 7) // 8
    bh = (height + 7) // 8
    # every decoded block consumes >=2 bits of entropy data (a DC code
    # and an EOB are each >=1 bit), so declared dims the remaining bytes
    # cannot back must be rejected BEFORE the width*height allocation —
    # a ~200-byte file claiming 65535x65535 would otherwise reserve
    # ~4.3e9 pixels first and fail on truncation only afterwards
    if bw * bh > 4 * max(0, len(payload) - pos):
        raise ValueError("jpeg: dimensions exceed entropy data capacity")
    # the entropy bound scales with payload size, so a multi-MB crafted
    # file could still demand a ~34 GB pixel list; the python-list
    # output representation makes >2**26 pixels (a 540 MB list) an
    # implementation limit regardless of file validity
    if width * height > 1 << 26:
        raise ValueError(
            f"jpeg: {width}x{height} exceeds the supported "
            f"{1 << 26}-pixel decode limit"
        )
    pixels = [0] * (width * height)
    pred = 0
    for by in range(bh):
        for bx in range(bw):
            coeffs = [0] * 64
            t = reader.read_code(dc_table)
            if t > 11:
                raise ValueError("jpeg: DC category out of range")
            pred += _extend(reader.take(t), t)
            coeffs[0] = pred * quant[0]
            k = 1
            while k < 64:
                rs = reader.read_code(ac_table)
                if rs == 0x00:  # EOB
                    break
                if rs == 0xF0:  # ZRL
                    k += 16
                    continue
                k += rs >> 4
                s = rs & 0x0F
                if k > 63:
                    raise ValueError("jpeg: AC run overflows block")
                coeffs[ZIGZAG[k]] = _extend(reader.take(s), s) * quant[ZIGZAG[k]]
                k += 1
            block = _idct_block(coeffs)
            x0 = 8 * bx
            ncols = min(8, width - x0)
            for y in range(min(8, height - 8 * by)):
                base = (8 * by + y) * width + x0
                row = y * 8
                pixels[base : base + ncols] = block[row : row + ncols]
    return width, height, pixels
