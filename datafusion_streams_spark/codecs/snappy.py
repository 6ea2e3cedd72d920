"""Snappy block-format codec, pure Python.

Clean-room implementation of the PUBLIC snappy format specification
(google/snappy ``format_description.txt``) — the raw block format used
by the Avro object-container ``snappy`` codec (each Avro block is one
snappy-compressed blob followed by a big-endian CRC32 of the
UNCOMPRESSED bytes, per the Avro 1.11 spec). No snappy library ships
in this container, so this module is what lets ``sources/avro_py.py``
speak the codec at all. Reference parity note: the reference only ever
feature-flagged avro (/root/reference/Cargo.toml:7) and never wired a
codec; this closes the spark-avro-jar gap natively.

Format recap (all little-endian):

- Preamble: uncompressed length as a varint (7 bits per byte, high bit
  = continuation).
- Element stream; each element starts with a tag byte whose low 2 bits
  select the type:

  * ``00`` literal: length-1 in the high 6 bits when < 60; tag values
    60..63 mean length-1 follows in the next 1..4 bytes (LE).
  * ``01`` copy, 1-byte offset: length 4..11 = 4 + bits[2:5]; offset
    1..2047 = (bits[5:8] << 8) | next byte.
  * ``10`` copy, 2-byte offset: length 1..64 = 1 + bits[2:8]; offset
    in the next 2 bytes.
  * ``11`` copy, 4-byte offset: length as ``10``; offset in the next
    4 bytes.

- Copies may overlap their output (offset < length): the semantics are
  byte-at-a-time, i.e. the referenced pattern repeats.

``compress`` is a real greedy LZ77 matcher (4-byte hash table with the
spec'd skip acceleration on incompressible input), not a literal-only
shell: repetitive input genuinely shrinks, which the conformance tests
assert. ``decompress`` handles every element type and validates the
preamble, offsets, and stream bounds strictly.
"""

from __future__ import annotations

# Ships by value to executor Python workers (Avro DataSource blocks are
# compressed in write tasks) — same rationale as codecs/bmp.py.
import sys as _sys

from pyspark import cloudpickle as _cloudpickle

_cloudpickle.register_pickle_by_value(_sys.modules[__name__])

_MIN_MATCH = 4
_MAX_COPY_LEN = 64


def _emit_varint(out: bytearray, n: int) -> None:
    while n >= 0x80:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("snappy: truncated varint preamble")
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 35:
            raise ValueError("snappy: varint preamble too long")


def _emit_literal(out: bytearray, data: bytes, start: int, end: int) -> None:
    length = end - start
    if length <= 0:
        return
    n = length - 1
    if n < 60:
        out.append(n << 2)
    elif n < 1 << 8:
        out.append(60 << 2)
        out.append(n)
    elif n < 1 << 16:
        out.append(61 << 2)
        out += n.to_bytes(2, "little")
    elif n < 1 << 24:
        out.append(62 << 2)
        out += n.to_bytes(3, "little")
    else:
        out.append(63 << 2)
        out += n.to_bytes(4, "little")
    out += data[start:end]


def _emit_copy(out: bytearray, offset: int, length: int) -> None:
    """Emit one match as 2- or 4-byte-offset copy elements (<=64 each).

    Splitting 60-then-rest keeps every emitted element's length >= 4,
    which the 2-byte-offset tag can encode but keeps us honest about
    never emitting a degenerate sub-MIN_MATCH tail.
    """
    while length > _MAX_COPY_LEN:
        _emit_copy_one(out, offset, 60)
        length -= 60
    _emit_copy_one(out, offset, length)


def _emit_copy_one(out: bytearray, offset: int, length: int) -> None:
    if offset < 1 << 16:
        out.append(0x02 | ((length - 1) << 2))
        out += offset.to_bytes(2, "little")
    else:
        out.append(0x03 | ((length - 1) << 2))
        out += offset.to_bytes(4, "little")


def compress(data: bytes) -> bytes:
    """Compress ``data`` into a self-contained snappy block.

    Perf note (r8): a numpy-vectorized match finder (stable argsort
    grouping every position by its exact 4-byte value into a
    nearest-predecessor index) was built and measured AGAINST this
    loop on the sf0.1 avro bodies: 1.63 s vs 1.19 s — the array
    prep + per-element emit costs more than the dict probe it saves,
    so the scalar greedy loop stays.
    """
    out = bytearray()
    _emit_varint(out, len(data))
    n = len(data)
    if n < _MIN_MATCH:
        _emit_literal(out, data, 0, n)
        return bytes(out)

    table: dict[bytes, int] = {}
    pos = 0
    literal_start = 0
    # Skip acceleration per the spec'd reference behavior: after 32
    # consecutive misses start stepping further, bounding the match
    # search to O(n/step) on incompressible input.
    misses = 0
    limit = n - _MIN_MATCH
    while pos <= limit:
        key = data[pos : pos + _MIN_MATCH]
        cand = table.get(key)
        table[key] = pos
        # No verify compare needed: keys are the exact 4 bytes, so a
        # dict hit IS a byte-equal match at ``cand``.
        if cand is None:
            misses += 1
            pos += 1 + (misses >> 5)
            continue
        misses = 0
        # Extend the match forward, 8 bytes at a stride then singly.
        m = cand + _MIN_MATCH
        p = pos + _MIN_MATCH
        while p + 8 <= n and data[m : m + 8] == data[p : p + 8]:
            m += 8
            p += 8
        while p < n and data[m] == data[p]:
            m += 1
            p += 1
        _emit_literal(out, data, literal_start, pos)
        _emit_copy(out, pos - cand, p - pos)
        pos = p
        literal_start = p
    _emit_literal(out, data, literal_start, n)
    return bytes(out)


def decompress(data: bytes) -> bytes:
    """Decode a snappy block; raises ValueError on any malformation."""
    expected, pos = _read_varint(data, 0)
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        kind = tag & 0x03
        if kind == 0x00:  # literal
            length = (tag >> 2) + 1
            if length > 60:
                extra = length - 60
                if pos + extra > n:
                    raise ValueError("snappy: truncated literal length")
                length = int.from_bytes(data[pos : pos + extra], "little") + 1
                pos += extra
            if pos + length > n:
                raise ValueError("snappy: literal overruns input")
            out += data[pos : pos + length]
            pos += length
            continue
        if kind == 0x01:  # copy, 1-byte offset
            length = 4 + ((tag >> 2) & 0x07)
            if pos >= n:
                raise ValueError("snappy: truncated copy-1 offset")
            offset = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 0x02:  # copy, 2-byte offset
            length = (tag >> 2) + 1
            if pos + 2 > n:
                raise ValueError("snappy: truncated copy-2 offset")
            offset = int.from_bytes(data[pos : pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte offset
            length = (tag >> 2) + 1
            if pos + 4 > n:
                raise ValueError("snappy: truncated copy-4 offset")
            offset = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
        if offset == 0 or offset > len(out):
            raise ValueError(
                f"snappy: copy offset {offset} outside the {len(out)} "
                "bytes produced so far"
            )
        start = len(out) - offset
        if offset >= length:
            out += out[start : start + length]
        else:
            # Overlapping copy = the referenced pattern repeats.
            pattern = bytes(out[start:])
            reps = -(-length // offset)  # ceil
            out += (pattern * reps)[:length]
    if len(out) != expected:
        raise ValueError(
            f"snappy: preamble declared {expected} bytes, decoded {len(out)}"
        )
    return bytes(out)
