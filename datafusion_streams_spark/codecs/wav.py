"""WAV (RIFF) codec — 16-bit PCM, pure Python.

Clean-room implementation of the public WAVE file format (Microsoft
RIFF container as documented in the multimedia programming literature
and the public WAVE format specification):

- 12-byte RIFF header: ``RIFF`` magic, little-endian u32 payload size
  (file size - 8), ``WAVE`` form type.
- Chunk stream of (4-byte id, u32 LE size, data, zero pad byte when
  the size is odd — RIFF word alignment).
- ``fmt `` chunk: u16 format tag (1 = integer PCM), u16 channels,
  u32 sample rate, u32 byte rate (= rate * block align), u16 block
  align (= channels * bytes/sample), u16 bits per sample (16 here).
- ``data`` chunk: interleaved signed 16-bit little-endian samples.

``decode_wav`` validates the magics, the PCM format tag, the 16-bit
depth, the byte-rate/block-align consistency equations, and chunk
bounds; unknown chunks (LIST, fact, ...) are skipped per the RIFF
rules. ``encode_wav`` is the matching writer used to synthesize
fixture payloads.
"""

from __future__ import annotations

import struct

# Ships by value to executor Python workers (mapInPandas batch loops) —
# same rationale as codecs/bmp.py.
import sys as _sys

from pyspark import cloudpickle as _cloudpickle

_cloudpickle.register_pickle_by_value(_sys.modules[__name__])

_PCM_TAG = 1


def encode_wav(sample_rate: int, channels: int, samples: list[int]) -> bytes:
    """Serialize interleaved signed 16-bit samples as a PCM WAV file.
    ``len(samples)`` must be a multiple of ``channels``."""
    if sample_rate <= 0 or channels <= 0:
        raise ValueError(f"invalid rate/channels {sample_rate}/{channels}")
    if len(samples) % channels != 0:
        raise ValueError(
            f"sample count {len(samples)} not a multiple of {channels} channels"
        )
    for s in samples:
        if not -32768 <= s <= 32767:
            raise ValueError(f"sample {s} out of int16 range")
    block_align = channels * 2
    byte_rate = sample_rate * block_align
    fmt = struct.pack(
        "<HHIIHH", _PCM_TAG, channels, sample_rate, byte_rate, block_align, 16
    )
    data = struct.pack(f"<{len(samples)}h", *samples)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, int, list[int]]:
    """Parse a 16-bit PCM WAV; returns (sample_rate, channels,
    interleaved samples). Raises ValueError on anything outside the
    PCM16 subset or on malformed framing."""
    if payload[:4] != b"RIFF":
        raise ValueError("bad RIFF magic")
    if len(payload) < 12:
        raise ValueError("truncated WAV: missing RIFF header")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    if riff_size + 8 > len(payload):
        raise ValueError("truncated WAV: RIFF size exceeds payload")
    if payload[8:12] != b"WAVE":
        raise ValueError("bad WAVE form type")
    pos = 12
    end = 8 + riff_size
    fmt = None
    data = None
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        chunk = payload[pos + 8 : pos + 8 + size]
        if len(chunk) != size:
            raise ValueError(f"truncated WAV: chunk {cid!r} short")
        if cid == b"fmt ":
            fmt = chunk
        elif cid == b"data":
            data = chunk
        # unknown chunks (LIST, fact, cue ...) skipped per RIFF rules
        pos += 8 + size + (size % 2)  # odd sizes pad to word alignment
    if fmt is None:
        raise ValueError("missing fmt chunk")
    if data is None:
        raise ValueError("missing data chunk")
    if len(fmt) < 16:
        raise ValueError("fmt chunk too short")
    tag, channels, rate, byte_rate, block_align, bits = struct.unpack_from(
        "<HHIIHH", fmt, 0
    )
    if tag != _PCM_TAG:
        raise ValueError(f"unsupported format tag {tag} (integer PCM only)")
    if bits != 16:
        raise ValueError(f"unsupported bit depth {bits} (16-bit only)")
    if channels <= 0 or rate <= 0:
        raise ValueError(f"invalid rate/channels {rate}/{channels}")
    if block_align != channels * 2 or byte_rate != rate * block_align:
        raise ValueError("inconsistent fmt fields (block align / byte rate)")
    if len(data) % block_align != 0:
        raise ValueError("data chunk not frame-aligned")
    samples = list(struct.unpack(f"<{len(data) // 2}h", data))
    return rate, channels, samples
