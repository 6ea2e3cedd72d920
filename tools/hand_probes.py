"""Structured-corruption hand probes for the clean-room codecs.

Companion to tools/fuzz_soak.py: the soak does random byte mutation,
which can't reach shapes that need VALID framing with semantically
wrong fields (correct CRCs on out-of-order PNG chunks, canonical-space
overflow in a well-framed JPEG DHT, spec-field combinations). This
battery crafts those by hand. Any outcome other than ValueError is a
finding: another exception class = fail-closed leak; silent success on
invalid input = fail-open. Spec-LEGAL edge shapes (split IDAT zlib
stream, 2x2 sampling on a single-component scan) must keep decoding.

The r7 run of this battery found six fail-open accepts (PNG duplicate
IHDR / IDAT-before-IHDR / trailing bytes after IEND; JPEG >256-code
DHT / canonical-space overflow / sampling factor 0) — now fixed and
pinned in tests/test_codecs.py. Extend this file with new structured
shapes whenever a decode surface changes; exits non-zero on findings.
"""
import struct
import sys
import zlib

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))

from datafusion_streams_spark.codecs.bmp import decode_bmp, encode_bmp
from datafusion_streams_spark.codecs.jpeg import decode_jpeg_gray, encode_jpeg_gray
from datafusion_streams_spark.codecs.png import decode_png, encode_png
from datafusion_streams_spark.codecs.snappy import decompress as snappy_decompress
from datafusion_streams_spark.codecs.wav import decode_wav, encode_wav

FINDINGS = []


def probe(name, fn, *args):
    try:
        out = fn(*args)
        FINDINGS.append((name, "SILENT-SUCCESS", repr(out)[:120]))
    except ValueError as e:
        print(f"  ok  {name}: ValueError: {str(e)[:90]}")
    except Exception as e:
        FINDINGS.append((name, type(e).__name__, str(e)[:120]))


# ---------------------------------------------------------------- PNG
def chunk(ctype, data):
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def png_build(chunks):
    return b"\x89PNG\r\n\x1a\n" + b"".join(chunks)


ihdr_00 = struct.pack(">IIBBBBB", 0, 0, 8, 2, 0, 0, 0)
ihdr_w0 = struct.pack(">IIBBBBB", 0, 5, 8, 2, 0, 0, 0)
ihdr_11 = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0)
scan_11 = zlib.compress(bytes([0, 1, 2, 3]))

probe("png zero dims", decode_png, png_build([chunk(b"IHDR", ihdr_00), chunk(b"IDAT", zlib.compress(b"")), chunk(b"IEND", b"")]))
probe("png zero width", decode_png, png_build([chunk(b"IHDR", ihdr_w0), chunk(b"IDAT", zlib.compress(bytes(5))), chunk(b"IEND", b"")]))
probe("png missing IDAT", decode_png, png_build([chunk(b"IHDR", ihdr_11), chunk(b"IEND", b"")]))
probe("png double IHDR", decode_png, png_build([chunk(b"IHDR", ihdr_11), chunk(b"IHDR", ihdr_11), chunk(b"IDAT", scan_11), chunk(b"IEND", b"")]))
probe("png IDAT before IHDR", decode_png, png_build([chunk(b"IDAT", scan_11), chunk(b"IHDR", ihdr_11), chunk(b"IEND", b"")]))
# declared chunk length 0xFFFFFFF0 with 4 bytes of body
huge = struct.pack(">I", 0xFFFFFFF0) + b"IDAT" + scan_11[:4] + b"\x00" * 4
probe("png huge chunk len", decode_png, png_build([chunk(b"IHDR", ihdr_11), huge]))
probe("png short IHDR body", decode_png, png_build([chunk(b"IHDR", ihdr_11[:5]), chunk(b"IDAT", scan_11), chunk(b"IEND", b"")]))
probe("png trailing garbage after IEND", decode_png, png_build([chunk(b"IHDR", ihdr_11), chunk(b"IDAT", scan_11), chunk(b"IEND", b"")]) + b"XX")
probe("png missing IEND", decode_png, png_build([chunk(b"IHDR", ihdr_11), chunk(b"IDAT", scan_11)]))
# two IDATs whose concatenation is valid (spec-legal!) — should SUCCEED
g = encode_png(2, 1, [(1, 2, 3), (4, 5, 6)])
# rebuild manually: split the zlib stream across two IDAT chunks
raw = bytes([0, 1, 2, 3, 4, 5, 6])
z = zlib.compress(raw)
two_idat = png_build([chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0)),
                      chunk(b"IDAT", z[:3]), chunk(b"IDAT", z[3:]), chunk(b"IEND", b"")])
try:
    w, h, px = decode_png(two_idat)
    assert (w, h, px) == (2, 1, [(1, 2, 3), (4, 5, 6)]), (w, h, px)
    print("  ok  png split IDAT (spec-legal) decodes:", px)
except Exception as e:
    FINDINGS.append(("png split IDAT should decode", type(e).__name__, str(e)[:120]))

# ---------------------------------------------------------------- WAV
def wav_build(tag=1, ch=1, rate=8000, bits=16, block=None, brate=None, data=b"\x05\x00\x06\x00"):
    block = (ch * bits // 8) if block is None else block
    brate = rate * block if brate is None else brate
    fmt = struct.pack("<HHIIHH", tag, ch, rate, brate, block, bits)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


probe("wav zero channels", decode_wav, wav_build(ch=0, block=0, brate=0))
probe("wav zero block align", decode_wav, wav_build(block=0, brate=0))
probe("wav zero rate", decode_wav, wav_build(rate=0))
probe("wav 32767 channels", decode_wav, wav_build(ch=32767, block=65534, brate=(8000 * 65534) & 0xFFFFFFFF))
probe("wav fmt size < 16", decode_wav,
      b"RIFF" + struct.pack("<I", 24) + b"WAVE" + b"fmt " + struct.pack("<I", 8) + b"\x01\x00\x01\x00\x40\x1f\x00\x00"
      + b"data" + struct.pack("<I", 0))
probe("wav data size huge vs actual", decode_wav,
      wav_build()[:-8] + b"data" + struct.pack("<I", 0xFFFFFFF0) + b"\x05\x00")
probe("wav odd data size with 16-bit", decode_wav, wav_build(data=b"\x05\x00\x06"))
probe("wav missing data chunk", decode_wav,
      b"RIFF" + struct.pack("<I", 28) + b"WAVE" + b"fmt " + struct.pack("<I", 16)
      + struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16))

# ---------------------------------------------------------------- BMP
good_bmp = encode_bmp(2, 2, [(0, 0, 0)] * 4)
b = bytearray(good_bmp)
struct.pack_into("<i", b, 18, 0x40000000)  # width 2^30
probe("bmp width 2^30", decode_bmp, bytes(b))
b = bytearray(good_bmp)
struct.pack_into("<i", b, 18, -5)  # negative width
probe("bmp negative width", decode_bmp, bytes(b))
b = bytearray(good_bmp)
struct.pack_into("<i", b, 22, 0)  # zero height
probe("bmp zero height", decode_bmp, bytes(b))
b = bytearray(good_bmp)
struct.pack_into("<H", b, 26, 0)  # planes 0
probe("bmp planes 0", decode_bmp, bytes(b))
b = bytearray(good_bmp)
struct.pack_into("<I", b, 14, 12)  # BITMAPCOREHEADER size
probe("bmp core header size 12", decode_bmp, bytes(b))

# ---------------------------------------------------------------- snappy
probe("snappy copy-4 offset 0", snappy_decompress, b"\x06\x00ab\x0f\x00\x00\x00\x00")
probe("snappy huge declared len", snappy_decompress, b"\xff\xff\xff\xff\x0f" + b"\x00a" * 4)
probe("snappy declared len 2^35", snappy_decompress, b"\x80\x80\x80\x80\x80\x01" + b"\x00a")
probe("snappy literal-61 short header", snappy_decompress, b"\x05\xf0")
probe("snappy trailing byte after exact len", snappy_decompress, b"\x01\x00a\x00")

# ---------------------------------------------------------------- JPEG
good_j = encode_jpeg_gray(8, 8, [128] * 64)


def seg_idx(buf, marker):
    return buf.index(marker)


# SOS referencing undefined Huffman table id 3
i = good_j.index(b"\xff\xda")
sos_bad = good_j[:i] + b"\xff\xda\x00\x08\x01\x01\x33\x00\x3f\x00" + good_j[i + 10:]
probe("jpeg SOS undefined table id", decode_jpeg_gray, sos_bad)

# DHT whose 16 counts sum to 300 (> 256 symbols)
counts = [0] * 16
counts[7] = 255
counts[8] = 45
dht_syms = bytes(range(256)) + bytes(44)
dht = b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + 300) + b"\x00" + bytes(counts) + dht_syms
probe("jpeg DHT 300 codes", decode_jpeg_gray, good_j[:2] + dht + good_j[2:])

# DHT with counts that overflow the canonical code space (17 codes of len 4)
counts2 = [0] * 16
counts2[3] = 17
dht2 = b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + 17) + b"\x00" + bytes(counts2) + bytes(range(17))
probe("jpeg DHT overfull level", decode_jpeg_gray, good_j[:2] + dht2 + good_j[2:])

# SOF with zero width
i = good_j.index(b"\xff\xc0")
sof_zero = good_j[:i] + good_j[i:i+5] + b"\x00\x00" + good_j[i+7:]
probe("jpeg SOF zero height", decode_jpeg_gray, sof_zero)

# quant table id referenced but never defined: strip DQT
i_dqt = good_j.index(b"\xff\xdb")
dqt_len = struct.unpack(">H", good_j[i_dqt+2:i_dqt+4])[0]
no_dqt = good_j[:i_dqt] + good_j[i_dqt + 2 + dqt_len:]
probe("jpeg missing DQT", decode_jpeg_gray, no_dqt)

# DQT with precision=1 (16-bit) — baseline allows it; decoder scope?
i_dqt = good_j.index(b"\xff\xdb")
pq = bytearray(good_j)
pq[i_dqt + 4] = 0x10  # Pq=1, Tq=0
probe("jpeg 16-bit DQT (scope)", decode_jpeg_gray, bytes(pq))

# sampling factor 0 in SOF component spec
i = good_j.index(b"\xff\xc0")
sf0 = bytearray(good_j)
sf0[i + 11] = 0x00  # H=0,V=0
probe("jpeg sampling factor 0", decode_jpeg_gray, bytes(sf0))

# encoder: reject non-int / out-of-range pixels
probe("jpeg encode pixel 300", encode_jpeg_gray, 8, 8, [300] * 64)
probe("jpeg encode wrong count", encode_jpeg_gray, 8, 8, [1] * 63)

print()
if FINDINGS:
    print("FINDINGS:")
    for name, kind, detail in FINDINGS:
        print(f"  !! {name}: {kind}: {detail}")
    sys.exit(1)
print("ALL PROBES FAIL CLOSED (ValueError only, spec-legal shapes decode)")
