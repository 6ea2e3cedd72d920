"""Deep mutation soak across every clean-room decode surface.

The committed pytest fuzz (tests/test_codecs.py, tests/test_sources_sinks.py)
uses small fixed seed sets so the suite stays fast and deterministic; this
tool is the long-soak companion — thousands of random byte flips,
truncations, insertions, and deletions per surface. The fail-closed
contract under test: a corrupted input either decodes or raises
ValueError; any other exception class (MemoryError, OverflowError,
struct.error, zlib.error, KeyError, IndexError...) is a worker crash at
corpus scale instead of a quarantinable row, and is reported as a LEAK.

    python tools/fuzz_soak.py                # 4000 iters/surface, fixed seed
    python tools/fuzz_soak.py -n 20000 -s 7  # deeper, different seed

Exits non-zero on any leak. The r7 soak found one real one (avro
declared-length preallocation -> MemoryError); keep running it whenever
a decode path changes.
"""

import argparse
import datetime
import os
import random
import struct
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_streams_spark.codecs import snappy as snap
from datafusion_streams_spark.codecs.bmp import decode_bmp, encode_bmp
from datafusion_streams_spark.codecs.jpeg import decode_jpeg_gray, encode_jpeg_gray
from datafusion_streams_spark.codecs.png import decode_png, encode_png
from datafusion_streams_spark.codecs.wav import decode_wav, encode_wav
from datafusion_streams_spark.sources import avro_py


def _mutate(rng: random.Random, b: bytes) -> bytes:
    b = bytearray(b)
    op = rng.randrange(4)
    if op == 0 and b:  # flip 1-4 bytes
        for _ in range(rng.randint(1, 4)):
            i = rng.randrange(len(b))
            b[i] ^= rng.randrange(1, 256)
    elif op == 1 and b:  # truncate
        del b[rng.randrange(len(b)):]
    elif op == 2:  # insert junk
        i = rng.randrange(len(b) + 1)
        b[i:i] = bytes(rng.randrange(256) for _ in range(rng.randint(1, 8)))
    elif b:  # delete a span
        i = rng.randrange(len(b))
        del b[i:min(len(b), i + rng.randint(1, 8))]
    return bytes(b)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-n", "--iters", type=int, default=4000,
                    help="mutations per surface")
    ap.add_argument("-s", "--seed", type=int, default=20260815)
    args = ap.parse_args()
    rng = random.Random(args.seed)

    px = [(x % 256, (x * 7) % 256, (x * 13) % 256) for x in range(24 * 16)]
    gray = [((x // 8) * 40) % 256 for x in range(64)]

    # r8: structured marker/chunk corpora. Random byte mutation of a
    # minimal file cannot REACH the ancillary-chunk and extra-marker
    # parsing surfaces, so seed bases that already carry them:
    #  - PNG with gAMA/tEXt/unknown-private chunks before IDAT and a
    #    tIME trailer after (all CRC-valid; decodes identically)
    #  - JPEG with APP0(JFIF)+COM segments (decodes identically)
    #  - the same JPEG with SOF0 flipped to SOF2 (progressive —
    #    fail-closed by contract) and with a DRI segment (fail-closed)
    from datafusion_streams_spark.codecs.png import _chunk as _png_chunk

    png_plain = encode_png(24, 16, px)
    png_anc = (
        png_plain[:33]  # signature + IHDR
        + _png_chunk(b"gAMA", struct.pack(">I", 45455))
        + _png_chunk(b"tEXt", b"Comment\x00fuzz soak")
        + _png_chunk(b"prIv", bytes(range(16)))
        + png_plain[33:-12]  # IDAT
        + _png_chunk(b"tIME", struct.pack(">HBBBBB", 2026, 8, 15, 0, 0, 0))
        + png_plain[-12:]  # IEND
    )
    assert decode_png(png_anc) == decode_png(png_plain)

    jpeg_plain = encode_jpeg_gray(8, 8, gray)
    app0 = (b"\xFF\xE0" + struct.pack(">H", 16)
            + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    com = b"\xFF\xFE" + struct.pack(">H", 12) + b"fuzz soak!"
    dri = b"\xFF\xDD" + struct.pack(">H", 4) + struct.pack(">H", 0)
    jpeg_marked = jpeg_plain[:2] + app0 + com + jpeg_plain[2:]
    assert decode_jpeg_gray(jpeg_marked) == decode_jpeg_gray(jpeg_plain)
    jpeg_progressive = jpeg_marked.replace(b"\xFF\xC0", b"\xFF\xC2", 1)
    jpeg_dri = jpeg_plain[:2] + dri + jpeg_plain[2:]

    surfaces = {
        "bmp": (encode_bmp(24, 16, px), decode_bmp),
        "png": (png_plain, decode_png),
        "png-ancillary": (png_anc, decode_png),
        "wav": (encode_wav(8000, 2, [i % 1000 - 500 for i in range(512)]),
                decode_wav),
        "jpeg": (jpeg_plain, decode_jpeg_gray),
        "jpeg-app-com": (jpeg_marked, decode_jpeg_gray),
        "jpeg-progressive": (jpeg_progressive, decode_jpeg_gray),
        "jpeg-dri": (jpeg_dri, decode_jpeg_gray),
        "snappy": (snap.compress(b"the quick brown fox " * 50),
                   snap.decompress),
    }

    tmpd = tempfile.mkdtemp(prefix="fuzz_soak_")
    avro_bases = {}
    # schema-shape diversity matters: the zero-field row-count bomb was
    # invisible to a soak whose corpus always had 4 fields
    shapes = {
        "4col": ([("k", "long"), ("d", "date"), ("s", "string"),
                  ("f", "double")],
                 [{"k": i, "d": datetime.date(2020, 1, 1), "s": f"s{i}",
                   "f": i / 7} for i in range(50)]),
        "1col": ([("s", "string")], [{"s": "x" * (i % 30)} for i in range(80)]),
        "0col": ([], [{} for _ in range(40)]),
    }
    for codec in ("null", "deflate", "snappy"):
        for shape, (fields, rows) in shapes.items():
            p = os.path.join(tmpd, f"valid_{codec}_{shape}.avro")
            avro_py.write_avro_file(p, fields, rows, codec=codec)
            with open(p, "rb") as f:
                avro_bases[f"{codec}-{shape}"] = f.read()

    leaks = 0

    def attempt(label, it, fn, *fargs):
        nonlocal leaks
        try:
            out = fn(*fargs)
            if hasattr(out, "__iter__") and not isinstance(out, (bytes, tuple)):
                list(out)
        except ValueError:
            pass
        except Exception as e:  # the leak class under test
            leaks += 1
            print(f"LEAK {label} iter {it}: {type(e).__name__}: {e}",
                  flush=True)

    for name, (base, dec) in surfaces.items():
        for t in range(args.iters):
            attempt(name, t, dec, _mutate(rng, base))
        print(f"{name}: {args.iters} mutations done", flush=True)

    mp = os.path.join(tmpd, "mutant.avro")
    for label, base in avro_bases.items():
        for t in range(args.iters):
            m = _mutate(rng, base)
            with open(mp, "wb") as f:
                f.write(m)
            attempt(f"avro-{label}-rows", t, avro_py.read_avro_file, mp)
            attempt(f"avro-{label}-batches", t, avro_py.read_avro_batches, mp)
        print(f"avro-{label}: {args.iters} mutations done", flush=True)

    print("soak done; leaks:", leaks)
    return 1 if leaks else 0


if __name__ == "__main__":
    raise SystemExit(main())
