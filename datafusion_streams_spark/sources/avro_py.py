"""Pure-Python Avro object-container format support behind the Spark 4
Python DataSource API — ``format("avro_py")`` reads AND writes.

The reference carries Avro only as a DataFusion feature flag it never
exercises (`/root/reference/Cargo.toml:7`); Spark's own avro support
lives in the external spark-avro package, absent from this container
(and no Python avro library is installed either). Rather than leave
the format env-blocked, this module implements the published Avro 1.11
object-container spec (https://avro.apache.org/docs/1.11.1/specification/)
clean-room for the null, deflate, and snappy codecs and the primitive
types the fixtures need:

  - container file: ``Obj\\x01`` magic, file-metadata map
    (``avro.schema`` JSON + ``avro.codec`` = null | deflate | snappy),
    16-byte sync marker, then data blocks of (record count, byte size,
    possibly-compressed records, sync marker);
  - deflate codec (r6): raw RFC 1951 DEFLATE per block via stdlib
    zlib with wbits=-15 — the spec's "deflate" (NOT RFC 1950 zlib
    framing, no checksum);
  - snappy codec (r6): the raw snappy block format via the clean-room
    ``codecs/snappy.py`` (no snappy library ships here), each block
    suffixed with the spec's 4-byte BIG-endian CRC32 of the
    UNCOMPRESSED bytes, verified on read;
  - primitives: long/int as zigzag varints, double as little-endian
    IEEE-754, string/bytes as length-prefixed UTF-8;
  - logical type ``date`` (int days since epoch) <-> Spark DateType.

Scale posture: the writer runs INSIDE executor tasks (a pluggable
sink, one part file per partition — no driver collect), and the reader
maps one input partition per container file, decoding blocks
streamingly. Registered pickle-by-value like every pluggable
source/sink here, so executors need no package install.
"""

from __future__ import annotations

import io
import json
import os
import re
import struct
import uuid
import zlib
from datetime import date, timedelta

# Module-level on purpose: codecs/snappy.py registers itself
# pickle-by-value, so binding it as a global here ships it inside this
# module's by-value pickle to executor write/read tasks — a
# function-level import would run ON the executor, whose sys.path does
# not include the repo (see CLAUDE.md / sources/pysink.py).
from datafusion_streams_spark.codecs import snappy as _snappy

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

MAGIC = b"Obj\x01"
SYNC = bytes(range(16))  # deterministic sync marker
_EPOCH = date(1970, 1, 1)
# Wire-level value bounds: a 10-byte zigzag varint can carry up to 2**70,
# beyond what an avro long (int64) or date (int32 days, and further bounded
# by python's date range) may hold. Decoders must reject out-of-range values
# with ValueError (fail-closed), never leak OverflowError from downstream
# pa.array/timedelta construction.
_INT64_MIN, _INT64_MAX = -(1 << 63), (1 << 63) - 1
_DATE_DAYS_MIN = (date.min - _EPOCH).days
_DATE_DAYS_MAX = (date.max - _EPOCH).days
# Zero-field rows occupy zero block bytes, so a block's declared row
# count is unverifiable against its body; bound it so a corrupt header
# cannot demand an arbitrarily large allocation (any real writer's
# block is an in-memory buffer — counts beyond ~1M rows/block do not
# occur in practice).
_ZERO_FIELD_MAX_BLOCK_ROWS = 1 << 20
# Per-block decoded-bytes budget for the deflate codec: raw DEFLATE can
# expand ~1032x, so a 65KB crafted block would balloon to 64MB inside
# an unbounded zlib.decompress BEFORE any row/size validation runs.
# Real blocks here are 4096 rows (see write_avro_file*), orders of
# magnitude under this ceiling.
_MAX_BLOCK_DECODED_BYTES = 1 << 26  # 64 MiB
# Avro spec §Names: a name must match [A-Za-z_][A-Za-z0-9_]* — enforced
# at schema-parse time so a crafted name like "a bigint, b" cannot flow
# into the DDL string the DataSource builds (an injection would surface
# as an AnalysisException/schema-wire desync instead of fail-closed).
_AVRO_NAME_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*\Z")

# ---------------------------------------------------------------------------
# binary primitives (Avro spec §"Binary encoding")
# ---------------------------------------------------------------------------


def _write_long(buf: io.BytesIO, n: int) -> None:
    z = (n << 1) ^ (n >> 63)  # zigzag
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def _read_long(buf: io.BufferedReader) -> int:
    shift, acc = 0, 0
    while True:
        byte = buf.read(1)
        if not byte:
            raise ValueError("avro: truncated varint")
        b = byte[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 70:
            raise ValueError("avro: varint too long")
    return (acc >> 1) ^ -(acc & 1)  # un-zigzag


def _write_bytes(buf: io.BytesIO, data: bytes) -> None:
    _write_long(buf, len(data))
    buf.write(data)


def _read_exact(buf, n: int, what: str) -> bytes:
    """Read exactly ``n`` bytes in bounded chunks: a corrupt huge
    declared length must fail closed at EOF, not be handed to read()
    whole (which preallocates an n-sized buffer)."""
    chunks = []
    remaining = n
    while remaining > 0:
        c = buf.read(min(remaining, 1 << 20))
        if not c:
            raise ValueError(f"avro: {what} truncated")
        chunks.append(c)
        remaining -= len(c)
    return b"".join(chunks)


def _read_bytes(buf: io.BufferedReader) -> bytes:
    n = _read_long(buf)
    if n < 0:
        raise ValueError(f"avro: negative bytes length {n}")
    return _read_exact(buf, n, "bytes value")


# ---------------------------------------------------------------------------
# schema: (name, kind) pairs; kind in {"long", "double", "string", "date"}
# ---------------------------------------------------------------------------


def _avro_schema_json(fields: list[tuple[str, str]], name: str = "row") -> str:
    ftypes = {
        "long": "long",
        "double": "double",
        "string": "string",
        "date": {"type": "int", "logicalType": "date"},
    }
    return json.dumps(
        {
            "type": "record",
            "name": name,
            "fields": [{"name": n, "type": ftypes[k]} for n, k in fields],
        }
    )


def _fields_from_avro_json(schema_json: str) -> list[tuple[str, str]]:
    sch = json.loads(schema_json)  # JSONDecodeError is a ValueError
    try:
        out = []
        for f in sch["fields"]:
            name = f["name"]
            if not isinstance(name, str):
                raise ValueError(f"avro: non-string field name {name!r}")
            if not _AVRO_NAME_RE.match(name):
                # Avro's own name rule; also blocks DDL-string injection
                # through the Spark schema hook (see _AVRO_NAME_RE note)
                raise ValueError(f"avro: invalid field name {name!r}")
            t = f["type"]
            if isinstance(t, dict):
                # the spec allows wrapping any type in {"type": ...};
                # date is ONLY {"type":"int","logicalType":"date"} —
                # unknown logicalTypes fall back to the base type
                # (Avro 1.11 §Logical Types), and non-scalar bases
                # fail closed here rather than desync the decode
                base = t.get("type")
                if base == "int" and t.get("logicalType") == "date":
                    out.append((f["name"], "date"))
                elif base in ("int", "long"):
                    out.append((f["name"], "long"))
                elif base in ("double", "string"):
                    out.append((f["name"], base))
                else:
                    raise ValueError(f"avro: unsupported field type {t!r}")
            elif t in ("long", "int"):
                # a bare int is wire-identical to long (zigzag varint);
                # an external file's plain int column must NOT decode
                # as dates
                out.append((f["name"], "long"))
            elif t in ("double", "string"):
                out.append((f["name"], t))
            else:
                # whitelist at parse time: passing an unknown type
                # through would surface later as a decode-loop error
                # (or a raw KeyError from the DataSource schema hook)
                raise ValueError(f"avro: unsupported field type {t!r}")
        return out
    except (KeyError, TypeError) as exc:
        # corrupt metadata must fail closed as ValueError, the decoder
        # convention every codec here shares
        raise ValueError(f"avro: malformed schema JSON ({exc!r})") from exc


def _encode_block(rows, fields) -> bytes:
    """Hot path: encode a block of records into one bytes object.
    One bytearray with local bindings rather than per-value BytesIO
    writes — the per-value method dispatch dominated the container
    write at 150k+ rows."""
    out = bytearray()
    app = out.append
    ext = out.extend
    pack = struct.pack
    dcache: dict[date, int] = {}  # date->days memo (few distinct dates)

    def wlong(n: int) -> None:
        z = (n << 1) ^ (n >> 63)  # zigzag
        while z > 0x7F:
            app((z & 0x7F) | 0x80)
            z >>= 7
        app(z)

    for r in rows:
        for name, kind in fields:
            v = r[name]
            if kind == "long":
                v = int(v)
                if v > _INT64_MAX or v < _INT64_MIN:
                    raise ValueError("avro: long out of int64 range")
                wlong(v)
            elif kind == "date":
                n = dcache.get(v)
                if n is None:
                    n = dcache[v] = (v - _EPOCH).days
                wlong(n)
            elif kind == "double":
                ext(pack("<d", float(v)))
            elif kind == "string":
                b = str(v).encode("utf-8")
                wlong(len(b))
                ext(b)
            else:
                raise ValueError(f"unsupported avro kind: {kind}")
    return bytes(out)


def _decode_block_rows(data: bytes, fields: list[tuple[str, str]], n_rows: int):
    """Hot path: decode ``n_rows`` records from one decompressed block.
    A position scan over bytes rather than per-value BytesIO reads —
    byte-at-a-time reads cost a method call + allocation per byte.
    Out-of-range longs/dates from corrupt varints raise ValueError."""
    if not fields:
        # zero-field rows consume zero bytes: the count is the content
        if n_rows > _ZERO_FIELD_MAX_BLOCK_ROWS:
            raise ValueError("avro: zero-field block row count implausible")
        if data:
            raise ValueError("avro: block has trailing bytes after declared rows")
        return [()] * n_rows
    if n_rows * len(fields) > len(data):  # every field value >= 1 byte
        raise ValueError("avro: block row count exceeds block size")
    pos, end = 0, len(data)
    unpack_d = struct.Struct("<d").unpack_from
    kinds = [k for _, k in fields]
    rows = []
    # real tables hold few distinct dates relative to rows — memoize
    # the days->date construction per block
    dcache: dict[int, date] = {}
    for _ in range(n_rows):
        vals = []
        for kind in kinds:
            if kind == "double":
                if pos + 8 > end:
                    raise ValueError("avro: truncated double")
                vals.append(unpack_d(data, pos)[0])
                pos += 8
                continue
            # zigzag varint (long/date/string length); single-byte
            # values skip the shift loop entirely (most lengths/dates)
            if pos >= end:
                raise ValueError("avro: truncated varint")
            b = data[pos]
            pos += 1
            if b < 0x80:
                acc = b
            else:
                acc = b & 0x7F
                shift = 7
                while True:
                    if pos >= end:
                        raise ValueError("avro: truncated varint")
                    b = data[pos]
                    pos += 1
                    acc |= (b & 0x7F) << shift
                    if not b & 0x80:
                        break
                    shift += 7
                    if shift > 70:
                        raise ValueError("avro: varint too long")
            n = (acc >> 1) ^ -(acc & 1)
            if kind == "long":
                if n > _INT64_MAX or n < _INT64_MIN:
                    raise ValueError("avro: long out of int64 range")
                vals.append(n)
            elif kind == "date":
                if n > _DATE_DAYS_MAX or n < _DATE_DAYS_MIN:
                    raise ValueError("avro: date out of supported range")
                d = dcache.get(n)
                if d is None:
                    d = dcache[n] = _EPOCH + timedelta(days=n)
                vals.append(d)
            elif kind == "string":
                if n < 0:
                    raise ValueError(f"avro: negative bytes length {n}")
                if pos + n > end:
                    raise ValueError("avro: bytes value truncated")
                vals.append(data[pos : pos + n].decode("utf-8"))
                pos += n
            else:
                raise ValueError(f"unsupported avro kind: {kind}")
        rows.append(tuple(vals))
    if pos != end:
        raise ValueError("avro: block has trailing bytes after declared rows")
    return rows


def _decode_block_cols(data: bytes, fields: list[tuple[str, str]], n_rows: int):
    """Columnar twin of ``_decode_block_rows`` for the Arrow read path:
    returns one python list per field, with date columns as RAW int
    days-since-epoch (pyarrow date32 takes them directly — no date
    object is ever constructed). Same wire format, same ValueErrors."""
    if not fields:
        # a columnar return cannot carry a bare row count (no columns to
        # hold a length) — callers must branch first, the way
        # read_avro_batches does with column-less RecordBatches
        raise ValueError(
            "avro: zero-field block has no columnar form; "
            "use _decode_block_rows"
        )
    if n_rows * len(fields) > len(data):  # every field value >= 1 byte
        raise ValueError("avro: block row count exceeds block size")
    pos, end = 0, len(data)
    unpack_d = struct.Struct("<d").unpack_from
    kinds = [k for _, k in fields]
    cols: list[list] = [[] for _ in kinds]
    # flatten the per-value dispatch: bound appends and the (j, kind)
    # walk once per block, and take the single-byte varint fast path
    # (most string lengths and dates) without entering the shift loop
    plan = [(k, c.append) for k, c in zip(kinds, cols)]
    for _ in range(n_rows):
        for kind, ap in plan:
            if kind == "double":
                if pos + 8 > end:
                    raise ValueError("avro: truncated double")
                ap(unpack_d(data, pos)[0])
                pos += 8
                continue
            # zigzag varint (long/date/string length)
            if pos >= end:
                raise ValueError("avro: truncated varint")
            b = data[pos]
            pos += 1
            if b < 0x80:
                acc = b
            else:
                acc = b & 0x7F
                shift = 7
                while True:
                    if pos >= end:
                        raise ValueError("avro: truncated varint")
                    b = data[pos]
                    pos += 1
                    acc |= (b & 0x7F) << shift
                    if not b & 0x80:
                        break
                    shift += 7
                    if shift > 70:
                        raise ValueError("avro: varint too long")
            n = (acc >> 1) ^ -(acc & 1)
            if kind == "string":
                if n < 0:
                    raise ValueError(f"avro: negative bytes length {n}")
                if pos + n > end:
                    raise ValueError("avro: bytes value truncated")
                ap(data[pos : pos + n].decode("utf-8"))
                pos += n
            elif kind == "long":
                if n > _INT64_MAX or n < _INT64_MIN:
                    raise ValueError("avro: long out of int64 range")
                ap(n)
            elif kind == "date":
                if n > _DATE_DAYS_MAX or n < _DATE_DAYS_MIN:
                    raise ValueError("avro: date out of supported range")
                ap(n)
            else:
                raise ValueError(f"unsupported avro kind: {kind}")
    if pos != end:
        raise ValueError("avro: block has trailing bytes after declared rows")
    return cols


def _zigzag_bytes(n: int) -> bytes:
    """Zigzag varint of ``n`` as a bytes object (wire-identical to the
    byte-at-a-time writer; one object per value so columns can be
    pre-encoded and row-interleaved with a join)."""
    z = (n << 1) ^ (n >> 63)  # zigzag
    if z < 0x80:
        return bytes((z,))
    out = bytearray()
    while z > 0x7F:
        out.append((z & 0x7F) | 0x80)
        z >>= 7
    out.append(z)
    return bytes(out)


def _encode_cols(cols: list[list], kinds: list[str]) -> bytes:
    """Columnar twin of ``_encode_block`` for the Arrow write path:
    ``cols`` holds one python list per field, date columns already as
    RAW int days-since-epoch. Wire-identical output.

    Each column is encoded to per-value bytes first (dates and strings
    through a per-column memo — real tables repeat both heavily), then
    the row-major avro stream is one zip + join instead of a per-row
    per-field dispatch loop: ~2x on the sf0.1 orders body."""
    if not cols:
        return b""
    pack_d = struct.Struct("<d").pack
    encoded: list[list[bytes]] = []
    for j, kind in enumerate(kinds):
        col = cols[j]
        if kind == "long":
            enc = []
            ap = enc.append
            for v in col:
                v = int(v)
                if v > _INT64_MAX or v < _INT64_MIN:
                    raise ValueError("avro: long out of int64 range")
                ap(_zigzag_bytes(v))
        elif kind == "date":
            memo: dict[int, bytes] = {}
            get = memo.get
            enc = []
            ap = enc.append
            for v in col:
                v = int(v)
                e = get(v)
                if e is None:
                    if v > _DATE_DAYS_MAX or v < _DATE_DAYS_MIN:
                        raise ValueError("avro: date out of supported range")
                    e = memo[v] = _zigzag_bytes(v)
                ap(e)
        elif kind == "double":
            enc = [pack_d(float(v)) for v in col]
        elif kind == "string":
            smemo: dict[str, bytes] = {}
            sget = smemo.get
            enc = []
            ap = enc.append
            for v in col:
                v = str(v)
                e = sget(v)
                if e is None:
                    b = v.encode("utf-8")
                    e = smemo[v] = _zigzag_bytes(len(b)) + b
                ap(e)
        else:
            raise ValueError(f"unsupported avro kind: {kind}")
        encoded.append(enc)
    if len(encoded) == 1:
        return b"".join(encoded[0])
    # zip(*encoded) would silently truncate to the shortest column on a
    # ragged caller bug — fail loudly instead of emitting a short-but-
    # valid block
    n_rows = len(encoded[0])
    if any(len(e) != n_rows for e in encoded[1:]):
        raise ValueError(
            f"ragged column lengths: {[len(e) for e in encoded]}"
        )
    join = b"".join
    return join([join(row) for row in zip(*encoded)])


# ---------------------------------------------------------------------------
# container file
# ---------------------------------------------------------------------------


def _compress_block(body: bytes, codec: str) -> bytes:
    if codec == "null":
        return body
    if codec == "deflate":
        # Avro spec: raw RFC 1951 DEFLATE (no RFC 1950 zlib framing,
        # no checksum) — zlib with negative wbits. The spec names no
        # level; 6 (zlib default) compresses the sf0.1 orders body
        # 2.4x faster than 9 for a 1pp ratio loss (0.321 vs 0.310).
        c = zlib.compressobj(6, zlib.DEFLATED, -15)
        return c.compress(body) + c.flush()
    if codec == "snappy":
        # Avro spec: snappy-compressed data followed by a 4-byte
        # BIG-endian CRC32 of the UNCOMPRESSED data
        return _snappy.compress(body) + struct.pack(">I", zlib.crc32(body))
    raise ValueError(f"unsupported avro codec: {codec!r}")


def _decompress_block(data: bytes, codec: str) -> bytes:
    if codec == "null":
        return data
    if codec == "deflate":
        # Bounded inflate (mirrors codecs/png.py): an unbounded
        # zlib.decompress allocates the full decoded size before any
        # row/size validation — a crafted block must fail closed at the
        # budget, not leak a MemoryError past the ValueError contract.
        try:
            d = zlib.decompressobj(-15)
            out = d.decompress(data, _MAX_BLOCK_DECODED_BYTES)
        except zlib.error as exc:
            raise ValueError(f"avro: corrupt deflate block ({exc})") from exc
        if d.unconsumed_tail or not d.eof:
            # capped mid-stream (bomb) or stream never reached its end
            # (truncated) — both fail closed
            raise ValueError(
                "avro: deflate block truncated or exceeds the "
                f"{_MAX_BLOCK_DECODED_BYTES}-byte decode budget"
            )
        if d.unused_data:
            raise ValueError("avro: trailing bytes after deflate block")
        return out
    if codec == "snappy":
        if len(data) < 4:
            raise ValueError("avro snappy block shorter than its CRC32")
        body = _snappy.decompress(data[:-4])
        (crc,) = struct.unpack(">I", data[-4:])
        if zlib.crc32(body) != crc:
            raise ValueError("avro snappy block CRC32 mismatch")
        return body
    raise ValueError(f"unsupported avro codec: {codec!r}")


def _write_container_header(f, fields: list[tuple[str, str]], codec: str) -> None:
    f.write(MAGIC)
    meta = io.BytesIO()
    _write_long(meta, 2)
    _write_bytes(meta, b"avro.schema")
    _write_bytes(meta, _avro_schema_json(fields).encode("utf-8"))
    _write_bytes(meta, b"avro.codec")
    _write_bytes(meta, codec.encode("ascii"))
    _write_long(meta, 0)  # end of metadata map
    f.write(meta.getvalue())
    f.write(SYNC)


def _write_block(f, n_rows: int, body: bytes, codec: str) -> None:
    payload = _compress_block(body, codec)
    head = io.BytesIO()
    _write_long(head, n_rows)
    _write_long(head, len(payload))
    f.write(head.getvalue())
    f.write(payload)
    f.write(SYNC)


def write_avro_file_cols(
    path: str,
    fields: list[tuple[str, str]],
    col_blocks,
    block_rows: int = 4096,
    codec: str = "null",
) -> int:
    """Columnar writer for the Arrow sink path: ``col_blocks`` yields
    one python list per field (dates as raw int days). Emits the same
    container layout as ``write_avro_file`` (same header, same 4096-row
    block granularity)."""
    if codec not in ("null", "deflate", "snappy"):
        raise ValueError(f"unsupported avro codec: {codec!r}")
    if not fields:
        # no columns -> no way to carry the row count columnar-side
        raise ValueError("avro: zero-field schema; use write_avro_file")
    kinds = [k for _, k in fields]
    n = 0
    with open(path, "wb") as f:
        _write_container_header(f, fields, codec)
        for cols in col_blocks:
            rows_in = len(cols[0]) if cols else 0
            for off in range(0, rows_in, block_rows):
                sl = [c[off : off + block_rows] for c in cols]
                _write_block(f, len(sl[0]), _encode_cols(sl, kinds), codec)
                n += len(sl[0])
    return n


def write_avro_file(
    path: str,
    fields: list[tuple[str, str]],
    rows,
    block_rows: int = 4096,
    codec: str = "null",
) -> int:
    """Write an Avro object-container file (null, deflate, or snappy
    codec). Returns rows written. ``rows`` yields dicts or objects
    indexable by field name."""
    if codec not in ("null", "deflate", "snappy"):
        raise ValueError(f"unsupported avro codec: {codec!r}")
    n = 0
    with open(path, "wb") as f:
        _write_container_header(f, fields, codec)

        block: list = []

        def flush() -> None:
            if not block:
                return
            _write_block(f, len(block), _encode_block(block, fields), codec)
            block.clear()

        for r in rows:
            block.append(r)
            n += 1
            if len(block) >= block_rows:
                flush()
        flush()
    return n


def read_avro_meta(path: str) -> tuple[list[tuple[str, str]], str]:
    """Parse the file-metadata map; return (field list, codec)."""
    with open(path, "rb") as f:
        if f.read(4) != MAGIC:
            raise ValueError(f"{path}: not an Avro object container file")
        schema_json = None
        codec = "null"
        while True:
            count = _read_long(f)
            if count == 0:
                break
            if count < 0:
                # spec: a negative map-block count is followed by the
                # block's byte size as a long, then |count| pairs
                _read_long(f)
                count = -count
            for _ in range(count):
                k = _read_bytes(f)
                v = _read_bytes(f)
                if k == b"avro.schema":
                    schema_json = v.decode("utf-8")
                elif k == b"avro.codec":
                    if v not in (b"null", b"deflate", b"snappy", b""):
                        raise ValueError(f"unsupported avro codec: {v!r}")
                    codec = v.decode("ascii") or "null"
        if schema_json is None:
            raise ValueError(f"{path}: missing avro.schema")
        return _fields_from_avro_json(schema_json), codec


def read_avro_header(path: str) -> list[tuple[str, str]]:
    """Parse the file-metadata map; return the field list."""
    return read_avro_meta(path)[0]


def _iter_decompressed_blocks(path: str, codec: str):
    """Yield (n_rows, decompressed block bytes) from a container file —
    the framing shared by the row reader and the Arrow batch reader."""
    with open(path, "rb") as f:
        f.read(4)
        while True:  # skip metadata map again
            count = _read_long(f)
            if count == 0:
                break
            if count < 0:  # negative count: long byte size precedes pairs
                _read_long(f)
                count = -count
            for _ in range(count):
                _read_bytes(f)
                _read_bytes(f)
        f.read(16)  # sync
        while True:
            probe = f.read(1)
            if not probe:
                return
            f.seek(-1, 1)
            n_rows = _read_long(f)
            size = _read_long(f)
            if n_rows < 0 or size < 0:
                raise ValueError(
                    f"avro: negative block header ({n_rows} rows, {size} bytes)"
                )
            yield n_rows, _decompress_block(
                _read_exact(f, size, "block body"), codec
            )
            f.read(16)  # sync


def read_avro_file(path: str):
    """Yield tuples in field order from a container file (null,
    deflate, or snappy codec — blocks are read by their declared byte
    size and decompressed per the header codec)."""
    fields, codec = read_avro_meta(path)
    for n_rows, block in _iter_decompressed_blocks(path, codec):
        yield from _decode_block_rows(block, fields, n_rows)


def read_avro_batches(path: str):
    """Yield ``pyarrow.RecordBatch`` per container block — the Arrow
    read path the Spark DataSource uses (dates flow as raw date32 days,
    no per-value python objects cross into Spark)."""
    import pyarrow as pa

    fields, codec = read_avro_meta(path)
    if not fields:
        # zero-field rows occupy zero bytes: carry the bare block row
        # counts as column-less batches (struct<> arrays hold a length)
        for n_rows, block in _iter_decompressed_blocks(path, codec):
            if n_rows > _ZERO_FIELD_MAX_BLOCK_ROWS:
                raise ValueError("avro: zero-field block row count implausible")
            if block:
                raise ValueError("avro: zero-field block with trailing bytes")
            yield pa.RecordBatch.from_struct_array(
                pa.array([{}] * n_rows, type=pa.struct([]))
            )
        return
    pa_types = {
        "long": pa.int64(),
        "date": pa.date32(),
        "double": pa.float64(),
        "string": pa.string(),
    }
    try:
        types = [pa_types[k] for _, k in fields]
    except KeyError as exc:
        raise ValueError(f"unsupported avro kind: {exc.args[0]}") from exc
    schema = pa.schema([(n, t) for (n, _), t in zip(fields, types)])
    for n_rows, block in _iter_decompressed_blocks(path, codec):
        cols = _decode_block_cols(block, fields, n_rows)
        yield pa.RecordBatch.from_arrays(
            [pa.array(c, type=t) for c, t in zip(cols, types)], schema=schema
        )


# ---------------------------------------------------------------------------
# Spark DataSource: format("avro_py")
# ---------------------------------------------------------------------------


class _FileSplit(InputPartition):
    def __init__(self, path: str):
        self.path = path


class AvroPyReader(DataSourceReader):
    def __init__(self, options):
        self.path = options["path"]

    def partitions(self):
        return [
            _FileSplit(os.path.join(self.path, f))
            for f in sorted(os.listdir(self.path))
            if f.endswith(".avro")
        ]

    def read(self, split: _FileSplit):
        # Arrow batches instead of per-row tuples: the per-row pickle
        # hop between the python worker and Spark dominated the scan
        yield from read_avro_batches(split.path)


class AvroPyStreamReader(DataSourceStreamReader):
    """Micro-batch stream over a landing directory of container files.

    Offsets are positions in the SORTED file listing — each trigger
    plans at most ``maxFilesPerTrigger`` newly-arrived files (the
    planner-side bound, mirroring the reference's row-capped
    micro-batch planning, `/root/reference/src/kafka/execution.rs:87`),
    one input partition per file. Files are immutable once listed, so
    replaying an offset range after restart is deterministic — the
    property exactly-once delivery rides on."""

    def __init__(self, options):
        self.path = options["path"]
        self.max_files = int(options.get("maxFilesPerTrigger", "2"))
        self._planned = 0  # driver-held cursor, advanced per trigger
        # (same pattern as KafkaEmuStreamReader: latestOffset moves the
        # cursor itself — the engine does not feed the previous end back
        # into this call, and commit() is bookkeeping-only)

    def _listing(self) -> list[str]:
        return sorted(f for f in os.listdir(self.path) if f.endswith(".avro"))

    def initialOffset(self):
        return {"index": 0}

    def latestOffset(self):
        avail = len(self._listing())
        self._planned = min(avail, self._planned + self.max_files)
        return {"index": self._planned}

    def partitions(self, start, end):
        files = self._listing()[start["index"] : end["index"]]
        return [_FileSplit(os.path.join(self.path, f)) for f in files]

    def read(self, split):
        # Arrow batches per container block, like the batch reader —
        # the stream protocol ships RecordBatches columnar too (r8;
        # per-row pickling was the per-message cost before)
        yield from read_avro_batches(split.path)

    def commit(self, end):
        pass  # immutable landing files; nothing to clean up


class AvroPyCommit(WriterCommitMessage):
    def __init__(self, path: str, rows: int):
        self.path = path
        self.rows = rows


class AvroPyWriter(DataSourceArrowWriter):
    def __init__(self, options, fields):
        self.path = options["path"]
        self.fields = fields
        self.codec = options.get("codec", "null")

    def write(self, iterator):
        # Arrow batches in, columnar container blocks out — dates are
        # cast to raw date32 days so no date objects are materialized
        import pyarrow as pa

        os.makedirs(self.path, exist_ok=True)
        part = os.path.join(self.path, f"part-{uuid.uuid4().hex}.avro")
        kinds = [k for _, k in self.fields]

        def col_blocks():
            for batch in iterator:
                yield [
                    (
                        batch.column(j).cast(pa.int32()).to_pylist()
                        if kind == "date"
                        else batch.column(j).to_pylist()
                    )
                    for j, kind in enumerate(kinds)
                ]

        n = write_avro_file_cols(part, self.fields, col_blocks(), codec=self.codec)
        return AvroPyCommit(part, n)

    def commit(self, messages):
        pass  # part files are self-describing; nothing to finalize

    def abort(self, messages):
        for m in messages:
            if m is not None:
                try:
                    os.remove(m.path)
                except OSError:
                    pass


class AvroPyZeroFieldWriter(DataSourceWriter):
    """Writer for zero-field schemas, via the row protocol.

    KNOWN LIMIT (Spark-side): the Python DataSource channel ships the
    input to the worker as Arrow batches under BOTH writer protocols,
    and a zero-column Arrow batch carries no row count — so writes of
    zero-column frames land as empty containers (measured: 5-row
    zero-column df -> 0 rows on disk through either protocol). Reads
    are unaffected: ``read_avro_batches`` yields column-less
    RecordBatches whose counts Spark preserves (5-row module-written
    file -> 5 rows back through ``format("avro_py")``)."""

    def __init__(self, options):
        self.path = options["path"]
        self.codec = options.get("codec", "null")

    def write(self, iterator):
        os.makedirs(self.path, exist_ok=True)
        part = os.path.join(self.path, f"part-{uuid.uuid4().hex}.avro")
        n = write_avro_file(
            part, [], ({} for _ in iterator), codec=self.codec
        )
        return AvroPyCommit(part, n)

    def commit(self, messages):
        pass  # part files are self-describing; nothing to finalize

    def abort(self, messages):
        for m in messages:
            if m is not None:
                try:
                    os.remove(m.path)
                except OSError:
                    pass


def _spark_fields(schema) -> list[tuple[str, str]]:
    kinds = {"bigint": "long", "double": "double", "string": "string", "date": "date"}
    out = []
    for f in schema.fields:
        t = f.dataType.simpleString()
        if t not in kinds:
            raise ValueError(f"avro_py: unsupported Spark type {t} for {f.name}")
        out.append((f.name, kinds[t]))
    return out


class AvroPyDataSource(DataSource):
    @classmethod
    def name(cls):
        return "avro_py"

    def schema(self):
        # infer from the first container file's embedded schema
        path = self.options["path"]
        first = next(
            (os.path.join(path, f) for f in sorted(os.listdir(path)) if f.endswith(".avro")),
            None,
        )
        if first is None:
            raise FileNotFoundError(f"no .avro files under {path}")
        fields = read_avro_header(first)
        if not fields:
            # an empty DDL string is invalid; a zero-field StructType is
            from pyspark.sql.types import StructType

            return StructType([])
        spark_types = {"long": "bigint", "double": "double", "string": "string", "date": "date"}
        return ", ".join(f"{n} {spark_types[k]}" for n, k in fields)

    def reader(self, schema):
        return AvroPyReader(self.options)

    def streamReader(self, schema):
        return AvroPyStreamReader(self.options)

    def writer(self, schema, overwrite):
        fields = _spark_fields(schema)
        if not fields:
            return AvroPyZeroFieldWriter(self.options)
        return AvroPyWriter(self.options, fields)


def register_avro_py(spark) -> None:
    """Idempotent registration (pickle-by-value: see pysink)."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    try:
        spark.dataSource.register(AvroPyDataSource)
    except Exception:
        pass  # already registered in this session
