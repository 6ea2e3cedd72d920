"""Spec-level tests for the pure-Python codecs (BMP/PNG/WAV/snappy —
no Spark needed)."""

import random
import struct

import pytest

from datafusion_streams_spark.codecs.bmp import decode_bmp, encode_bmp


def _rand_pixels(rng, w, h):
    return [
        (rng.randrange(256), rng.randrange(256), rng.randrange(256))
        for _ in range(w * h)
    ]


def test_roundtrip_all_padding_cases():
    """widths 1..8 cover every stride padding (3*w mod 4 in 0..3)."""
    rng = random.Random(42)
    for w in range(1, 9):
        for h in (1, 2, 5):
            px = _rand_pixels(rng, w, h)
            assert decode_bmp(encode_bmp(w, h, px)) == (w, h, px)


def test_handwritten_bmp_pins_the_format():
    """A byte-level 2x2 image built straight from the public spec:
    bottom-up rows, BGR order, 2-byte row padding at width 2."""
    # pixels top-down: (r,g,b) = TL(1,2,3) TR(4,5,6) / BL(7,8,9) BR(10,11,12)
    stride = 8  # 2*3 rounded up to 4-byte boundary
    data_offset = 54
    payload = bytearray(data_offset + stride * 2)
    struct.pack_into("<2sIHHI", payload, 0, b"BM", len(payload), 0, 0, data_offset)
    struct.pack_into(
        "<IiiHHIIiiII", payload, 14, 40, 2, 2, 1, 24, 0, stride * 2, 0, 0, 0, 0
    )
    # disk row 0 = image BOTTOM row: BL then BR, as B,G,R
    payload[data_offset : data_offset + 6] = bytes([9, 8, 7, 12, 11, 10])
    # disk row 1 = image TOP row
    payload[data_offset + stride : data_offset + stride + 6] = bytes(
        [3, 2, 1, 6, 5, 4]
    )
    assert decode_bmp(bytes(payload)) == (
        2,
        2,
        [(1, 2, 3), (4, 5, 6), (7, 8, 9), (10, 11, 12)],
    )
    # the encoder must produce these exact pixel bytes too
    assert encode_bmp(2, 2, [(1, 2, 3), (4, 5, 6), (7, 8, 9), (10, 11, 12)])[
        data_offset:
    ] == bytes(payload[data_offset:])


def test_top_down_negative_height():
    """height < 0 = top-down row order (part of the public spec the
    encoder never emits but real files use)."""
    w, h = 3, 2
    px = [(i, i + 1, i + 2) for i in range(0, 18, 3)]
    up = bytearray(encode_bmp(w, h, px))
    # flip to top-down: negate height, swap the two rows
    struct.pack_into("<i", up, 22, -h)
    stride = 12
    row0 = bytes(up[54 : 54 + stride])
    row1 = bytes(up[54 + stride : 54 + 2 * stride])
    up[54 : 54 + stride] = row1
    up[54 + stride : 54 + 2 * stride] = row0
    assert decode_bmp(bytes(up)) == (w, h, px)


def test_decode_rejects_malformed():
    good = encode_bmp(2, 2, [(0, 0, 0)] * 4)
    with pytest.raises(ValueError, match="magic"):
        decode_bmp(b"PK" + good[2:])
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(good[:20])
    with pytest.raises(ValueError, match="pixel array short"):
        decode_bmp(good[:-4])
    bad_bpp = bytearray(good)
    struct.pack_into("<H", bad_bpp, 28, 8)
    with pytest.raises(ValueError, match="bits-per-pixel"):
        decode_bmp(bytes(bad_bpp))
    compressed = bytearray(good)
    struct.pack_into("<I", compressed, 30, 1)  # BI_RLE8
    with pytest.raises(ValueError, match="compression"):
        decode_bmp(bytes(compressed))
    # data_offset pointing INSIDE the headers must raise, not silently
    # decode header bytes as pixels (the payload is long enough that
    # only the lower-bound check can catch it)
    bad_off = bytearray(good + b"\x00" * 64)
    struct.pack_into("<I", bad_off, 10, 0)
    with pytest.raises(ValueError, match="data offset"):
        decode_bmp(bytes(bad_off))


def test_encoder_validates_input():
    with pytest.raises(ValueError, match="dimensions"):
        encode_bmp(0, 1, [])
    with pytest.raises(ValueError, match="expected 4 pixels"):
        encode_bmp(2, 2, [(0, 0, 0)])


# ---------------------------------------------------------------------------
# PNG (r6)
# ---------------------------------------------------------------------------


def test_png_roundtrip_all_filter_types():
    from datafusion_streams_spark.codecs.png import decode_png, encode_png

    for w, h in [(1, 1), (1, 7), (4, 5), (7, 6), (16, 5)]:
        pixels = [
            ((x * 31 + y * 7) % 256, (x * 5 + y * 13) % 256, (x + y * y) % 256)
            for y in range(h)
            for x in range(w)
        ]
        for mode in ("none", "cycle"):
            payload = encode_png(w, h, pixels, filter_mode=mode)
            assert decode_png(payload) == (w, h, pixels), (w, h, mode)


def test_handwritten_png_pins_the_format():
    """Hand-build a 2x1 PNG byte-by-byte (independent of encode_png):
    signature, IHDR fields, a filter-0 scanline zlib-compressed, IEND —
    decoding it pins signature/chunk/CRC/IHDR/scanline layout."""
    import struct
    import zlib

    from datafusion_streams_spark.codecs.png import decode_png

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0)
    scan = bytes([0, 255, 0, 0, 0, 0, 255])  # filter 0, red px, blue px
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )
    assert decode_png(payload) == (2, 1, [(255, 0, 0), (0, 0, 255)])


def test_png_rgba_alpha_dropped_and_ancillary_skipped():
    """Color type 6 (RGBA) decodes with alpha dropped; an ancillary
    chunk (tEXt) between IHDR and IDAT is skipped but CRC-checked."""
    import struct
    import zlib

    from datafusion_streams_spark.codecs.png import decode_png

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 1, 2, 8, 6, 0, 0, 0)
    scan = bytes([0, 10, 20, 30, 128]) + bytes([2, 1, 2, 3, 0])  # Up filter row 2
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"tEXt", b"Comment\x00skip me")
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )
    # row 2 is Up-filtered: raw = filt + prev = (1+10, 2+20, 3+30, 0+128)
    assert decode_png(payload) == (1, 2, [(10, 20, 30), (11, 22, 33)])


def test_png_zlib_bomb_and_oversized_ihdr_fail_before_allocating():
    """r6 ADVICE: the inflate is bounded by the size the declared
    dimensions imply. A 1x1 IHDR whose IDAT inflates to megabytes
    (zlib bomb) and an IHDR declaring absurd dimensions must both
    fail closed without the decoder allocating the full stream."""
    import struct
    import zlib

    from datafusion_streams_spark.codecs.png import decode_png

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    sig = b"\x89PNG\r\n\x1a\n"
    # (a) bomb: 1x1 RGB declares 4 raw bytes but IDAT inflates to 64 MiB
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0)
    bomb = sig + chunk(b"IHDR", ihdr) + chunk(
        b"IDAT", zlib.compress(b"\x00" * (64 << 20), 9)
    ) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="inflates past"):
        decode_png(bomb)
    # (b) huge IHDR: 1e9 x 1e9 exceeds the decode budget outright
    ihdr_huge = struct.pack(">IIBBBBB", 10**9, 10**9, 8, 2, 0, 0, 0)
    huge = sig + chunk(b"IHDR", ihdr_huge) + chunk(
        b"IDAT", zlib.compress(b"\x00")
    ) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="decode budget"):
        decode_png(huge)
    # (c) trailing bytes after a valid zlib stream also fail closed
    scan = bytes([0, 1, 2, 3])
    trailing = sig + chunk(b"IHDR", ihdr) + chunk(
        b"IDAT", zlib.compress(scan) + b"junk"
    ) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="trailing"):
        decode_png(trailing)
    # (d) a TRUNCATED zlib stream (end-of-stream marker and adler32
    # cut off, chunk CRC valid) must not decode — the bounded-inflate
    # path has to keep full inflate's integrity check
    for cut in (1, 3, 5):
        z = zlib.compress(scan)
        truncated = sig + chunk(b"IHDR", ihdr) + chunk(
            b"IDAT", z[: len(z) - cut]
        ) + chunk(b"IEND", b"")
        with pytest.raises(ValueError, match="truncated|does not match"):
            decode_png(truncated)
    # (e) an IHDR of the wrong length with a valid chunk CRC is a
    # ValueError, never struct.error
    with pytest.raises(ValueError, match="13 bytes"):
        decode_png(
            sig + chunk(b"IHDR", ihdr[:12]) + chunk(
                b"IDAT", zlib.compress(scan)
            ) + chunk(b"IEND", b"")
        )


def test_png_decode_rejects_malformed():
    import struct
    import zlib

    from datafusion_streams_spark.codecs.png import decode_png, encode_png

    good = encode_png(3, 2, [(i, i, i) for i in range(6)])
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"BM" + good[2:])
    with pytest.raises(ValueError, match="truncated"):
        decode_png(good[:20])
    corrupt = bytearray(good)
    corrupt[20] ^= 0xFF  # flip an IHDR byte -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(corrupt))

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    def build(depth=8, ctype_v=2, interlace=0, scan=None, w=1, h=1):
        ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype_v, 0, 0, interlace)
        scan = scan if scan is not None else bytes([0, 1, 2, 3])
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(scan))
            + chunk(b"IEND", b"")
        )

    with pytest.raises(ValueError, match="bit depth"):
        decode_png(build(depth=16))
    with pytest.raises(ValueError, match="color type"):
        decode_png(build(ctype_v=3))
    with pytest.raises(ValueError, match="interlaced"):
        decode_png(build(interlace=1))
    # overshoot is caught by the bounded inflate, undershoot by the
    # post-inflate length check — both fail closed
    with pytest.raises(ValueError, match="inflates past"):
        decode_png(build(scan=bytes([0, 1, 2, 3, 4, 5])))
    with pytest.raises(ValueError, match="does not match"):
        decode_png(build(scan=bytes([0, 1, 2])))
    with pytest.raises(ValueError, match="filter type"):
        decode_png(build(scan=bytes([7, 1, 2, 3])))


def test_png_chunk_order_and_trailing_bytes_fail_closed():
    """Structured corruption a random mutator can't reach (the chunks
    stay individually CRC-valid): duplicate IHDR, data chunks before
    IHDR, and bytes after IEND are all spec-invalid and must be
    rejected — while the spec-LEGAL split of one zlib stream across
    several IDAT chunks must keep decoding (r7 hand-probe findings)."""
    import struct
    import zlib

    from datafusion_streams_spark.codecs.png import decode_png

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0))
    idat = chunk(b"IDAT", zlib.compress(bytes([0, 1, 2, 3])))
    iend = chunk(b"IEND", b"")

    with pytest.raises(ValueError, match="duplicate IHDR"):
        decode_png(sig + ihdr + ihdr + idat + iend)
    with pytest.raises(ValueError, match="before IHDR"):
        decode_png(sig + idat + ihdr + iend)
    with pytest.raises(ValueError, match="trailing bytes after IEND"):
        decode_png(sig + ihdr + idat + iend + b"XX")
    # a second CONCATENATED png after IEND is also trailing bytes
    with pytest.raises(ValueError, match="trailing bytes after IEND"):
        decode_png(sig + ihdr + idat + iend + sig + ihdr + idat + iend)

    # spec-legal: one zlib stream split across two IDAT chunks
    z = zlib.compress(bytes([0, 10, 20, 30]))
    split = (
        sig + ihdr + chunk(b"IDAT", z[:3]) + chunk(b"IDAT", z[3:]) + iend
    )
    assert decode_png(split) == (1, 1, [(10, 20, 30)])


# ---------------------------------------------------------------------------
# WAV (r6)
# ---------------------------------------------------------------------------


def test_wav_roundtrip():
    from datafusion_streams_spark.codecs.wav import decode_wav, encode_wav

    for rate, ch, n in [(8000, 1, 5), (16000, 2, 8), (44100, 1, 1)]:
        samples = [((i * 9973) % 65536) - 32768 for i in range(n * ch)]
        payload = encode_wav(rate, ch, samples)
        assert decode_wav(payload) == (rate, ch, samples)


def test_handwritten_wav_pins_the_format():
    """Hand-build a 2-frame mono PCM16 WAV byte-by-byte (independent
    of encode_wav), with an unknown LIST chunk and an ODD-sized chunk
    to exercise RIFF word-alignment padding."""
    import struct

    from datafusion_streams_spark.codecs.wav import decode_wav

    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    data = struct.pack("<2h", -1, 32767)
    odd = b"junk" + struct.pack("<I", 3) + b"abc" + b"\x00"  # padded odd chunk
    body = (
        b"WAVE"
        + odd
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"LIST" + struct.pack("<I", 4) + b"INFO"
        + b"data" + struct.pack("<I", len(data)) + data
    )
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    assert decode_wav(payload) == (8000, 1, [-1, 32767])


def test_wav_decode_rejects_malformed():
    import struct

    from datafusion_streams_spark.codecs.wav import decode_wav, encode_wav

    good = encode_wav(8000, 1, [0, 1, 2, 3])
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"RIFX" + good[4:])
    with pytest.raises(ValueError, match="WAVE"):
        decode_wav(good[:8] + b"AVI " + good[12:])
    with pytest.raises(ValueError, match="size exceeds"):
        decode_wav(good[:-4])

    def build(tag=1, bits=16, block=2, brate=16000):
        fmt = struct.pack("<HHIIHH", tag, 1, 8000, brate, block, bits)
        data = struct.pack("<2h", 5, 6)
        body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(data)) + data)
        return b"RIFF" + struct.pack("<I", len(body)) + body

    with pytest.raises(ValueError, match="format tag"):
        decode_wav(build(tag=3))  # IEEE float
    with pytest.raises(ValueError, match="bit depth"):
        decode_wav(build(bits=8))
    with pytest.raises(ValueError, match="inconsistent"):
        decode_wav(build(brate=999))
    with pytest.raises(ValueError, match="int16 range"):
        encode_wav(8000, 1, [40000])
    with pytest.raises(ValueError, match="multiple"):
        encode_wav(8000, 2, [1, 2, 3])


# ---------------------------------------------------------------------------
# snappy block format (codecs/snappy.py) — the Avro "snappy" codec body
# ---------------------------------------------------------------------------

from datafusion_streams_spark.codecs.snappy import (  # noqa: E402
    compress as snappy_compress,
    decompress as snappy_decompress,
)


def test_snappy_handwritten_vectors_pin_the_format():
    """Hand-assembled streams per format_description.txt: every element
    type a decoder must accept, including the copy-1 tag the compressor
    never emits and the overlapping-copy repeat semantics."""
    # literal(3 "abc") + copy-2(len 2, off 3) -> "abcab"
    assert snappy_decompress(b"\x05\x08abc\x06\x03\x00") == b"abcab"
    # literal(1 "a") + copy-2(len 4, off 1): overlap repeats the pattern
    assert snappy_decompress(b"\x05\x00a\x0e\x01\x00") == b"aaaaa"
    # copy-1 tag (01): len = 4+bits[2:5] = 7, off = bits[5:8]<<8 | next
    assert snappy_decompress(b"\x08\x00a\x0d\x01") == b"aaaaaaaa"
    # copy-1 with len 4, off 4 after a 4-byte literal
    assert snappy_decompress(b"\x08\x0cabcd\x01\x04") == b"abcdabcd"
    # copy-4 tag (11): len 2, 4-byte LE offset 4
    assert snappy_decompress(b"\x06\x0cabcd\x07\x04\x00\x00\x00") == b"abcdab"
    # extended literal length: tag 60<<2, 1 extra byte holding len-1
    body = bytes(range(61))
    assert snappy_decompress(bytes([61, 60 << 2, 60]) + body) == body
    # empty input: bare zero preamble
    assert snappy_decompress(b"\x00") == b""


def test_snappy_roundtrip_and_real_compression():
    rng = random.Random(1234)
    cases = [
        b"",
        b"x",
        b"abc",
        b"ab" * 5000,
        bytes(rng.randrange(256) for _ in range(4096)),  # incompressible
        bytes(rng.randrange(4) for _ in range(50000)),  # mildly repetitive
        b"the quick brown fox " * 512,
        bytes(100000),  # zeros: long overlapping runs
    ]
    for payload in cases:
        z = snappy_compress(payload)
        assert snappy_decompress(z) == payload
    # a real matcher, not a literal-only shell: repetitive input shrinks
    assert len(snappy_compress(b"ab" * 5000)) < 10000 // 10
    # zero runs: one literal + offset-1 copies, <=64 decoded bytes per
    # 3-byte element -> bounded near 100000*3/60
    assert len(snappy_compress(bytes(100000))) < 100000 // 15
    # incompressible input must not blow up (spec: <= ~1.17x + preamble)
    rnd = bytes(rng.randrange(256) for _ in range(10000))
    assert len(snappy_compress(rnd)) < 10000 * 1.2


def test_snappy_compressor_emits_only_spec_elements():
    """Walk the compressor's own output element by element — every tag
    must be a literal or a 2/4-byte-offset copy with length <= 64 and
    an offset inside the produced prefix (a structural spec audit,
    independent of the decoder's permissiveness)."""
    payload = (b"seg-%d " % 7) * 300 + bytes(range(256)) * 4
    z = snappy_compress(payload)
    # skip the varint preamble
    pos = 0
    while z[pos] & 0x80:
        pos += 1
    pos += 1
    produced = 0
    while pos < len(z):
        tag = z[pos]
        pos += 1
        kind = tag & 3
        assert kind in (0, 2, 3), "compressor never emits copy-1"
        if kind == 0:
            length = (tag >> 2) + 1
            if length > 60:
                extra = length - 60
                length = int.from_bytes(z[pos : pos + extra], "little") + 1
                pos += extra
            pos += length
        else:
            length = (tag >> 2) + 1
            assert 4 <= length <= 64
            width = 2 if kind == 2 else 4
            offset = int.from_bytes(z[pos : pos + width], "little")
            pos += width
            assert 1 <= offset <= produced
        produced += length
    assert produced == len(payload)


def test_snappy_decode_rejects_malformed():
    good = snappy_compress(b"hello world, hello world, hello world")
    with pytest.raises(ValueError, match="varint"):
        snappy_decompress(b"")
    with pytest.raises(ValueError, match="varint"):
        snappy_decompress(b"\xff\xff\xff\xff\xff\xff")
    with pytest.raises(ValueError, match="literal overruns"):
        snappy_decompress(b"\x05\x10ab")  # literal len 5, 2 bytes left
    with pytest.raises(ValueError, match="offset"):
        snappy_decompress(b"\x05\x00a\x0e\x05\x00")  # off 5 > 1 produced
    with pytest.raises(ValueError, match="offset"):
        snappy_decompress(b"\x05\x00a\x0e\x00\x00")  # off 0 invalid
    with pytest.raises(ValueError, match="truncated copy"):
        snappy_decompress(b"\x05\x00a\x0e\x01")  # copy-2 missing a byte
    with pytest.raises(ValueError, match="declared"):
        snappy_decompress(good[:-1] if good[-1:] != b"\x00" else good + b"\x00a")
    # declared-vs-decoded mismatch, explicit: preamble says 9, body has 5
    with pytest.raises(ValueError, match="declared"):
        snappy_decompress(b"\x09\x10hello")


# ---------------------------------------------------------------------------
# baseline JPEG (codecs/jpeg.py) — grayscale sequential DCT
# ---------------------------------------------------------------------------

from datafusion_streams_spark.codecs.jpeg import (  # noqa: E402
    STD_QUANT,
    decode_jpeg_gray,
    encode_jpeg_gray,
)


def _flat_expected(d, w, h):
    """The integer closed form the DuckDB oracle mirrors."""
    out = []
    for y in range(h):
        for x in range(w):
            v = (17 * d + 29 * (x // 8) + 43 * (y // 8)) % 256
            s = (2 * 64 * (v - 128) + 8 * STD_QUANT[0]) // (16 * STD_QUANT[0])
            p = (s * STD_QUANT[0] + 4) // 8 + 128
            out.append(min(255, max(0, p)))
    return out


def test_jpeg_flat_blocks_roundtrip_exactly():
    """Piecewise-flat images (constant per 8x8 block) are DC-only, so
    the lossy pipeline is EXACT — including non-multiple-of-8
    dimensions whose edge blocks are pad-replicated then cropped.
    This is precisely what multimodal_jpeg_decode's oracle recomputes."""
    for d in range(24):
        w = 8 * (1 + d % 3) - (d % 5)
        h = 8 * (1 + d % 2) - (d % 3)
        px = [
            (17 * d + 29 * (x // 8) + 43 * (y // 8)) % 256
            for y in range(h)
            for x in range(w)
        ]
        assert decode_jpeg_gray(encode_jpeg_gray(w, h, px)) == (
            w,
            h,
            _flat_expected(d, w, h),
        ), d


def test_jpeg_handwritten_vector_with_foreign_tables():
    """A byte-level minimal JPEG assembled straight from the spec,
    using Huffman tables SHAPED NOTHING LIKE the encoder's (two
    length-2 DC codes, one length-2 AC code) — decoding it proves the
    decoder rebuilds canonical tables from DHT instead of assuming its
    own: scan bits are DC code '01' (category 1) + '1' (diff=+1) +
    AC '00' (EOB) + '111' padding = 0x67; S=1, Q0=16 -> every pixel
    floor((16+4)/8)+128 = 130."""
    vec = (
        b"\xff\xd8"
        + b"\xff\xdb\x00\x43\x00" + b"\x10" * 64
        + b"\xff\xc0\x00\x0b\x08\x00\x08\x00\x08\x01\x01\x11\x00"
        + b"\xff\xc4\x00\x15\x00" + bytes([0, 2] + [0] * 14) + b"\x00\x01"
        + b"\xff\xc4\x00\x14\x10" + bytes([0, 1] + [0] * 14) + b"\x00"
        + b"\xff\xda\x00\x08\x01\x01\x00\x00\x3f\x00"
        + b"\x67"
        + b"\xff\xd9"
    )
    assert decode_jpeg_gray(vec) == (8, 8, [130] * 64)


def test_jpeg_general_content_bounded_error():
    """Non-flat content through the full float DCT paths: with a
    unit quant table the only loss is coefficient rounding, bounding
    pixel error by a couple of levels; the std table on a smooth
    gradient must stay visually lossless (PSNR > 40 dB)."""
    import math

    rng = random.Random(3)
    w, h = 24, 16
    px = [rng.randrange(100, 157) for _ in range(w * h)]
    gw, gh, out = decode_jpeg_gray(encode_jpeg_gray(w, h, px, quant=[1] * 64))
    assert (gw, gh) == (w, h)
    assert max(abs(a - b) for a, b in zip(px, out)) <= 3

    w, h = 32, 24
    grad = [
        min(255, max(0, int(128 + 60 * (x / w - 0.5) + 40 * (y / h - 0.5))))
        for y in range(h)
        for x in range(w)
    ]
    _, _, out = decode_jpeg_gray(encode_jpeg_gray(w, h, grad))
    mse = sum((a - b) ** 2 for a, b in zip(grad, out)) / len(grad)
    assert 10 * math.log10(255**2 / mse) > 40


def test_jpeg_byte_stuffing_in_scan():
    """seed 6 at quant=1 produces an entropy stream containing a raw
    0xFF data byte — the writer must stuff 0x00 after it and the
    reader must swallow the pair (and the decode stays within the
    unit-quant error bound)."""
    rng = random.Random(6)
    px = [rng.randrange(256) for _ in range(16 * 8)]
    payload = encode_jpeg_gray(16, 8, px, quant=[1] * 64)
    scan = payload[payload.index(b"\xff\xda") + 10 : -2]
    assert b"\xff\x00" in scan
    _, _, out = decode_jpeg_gray(payload)
    assert max(abs(a - b) for a, b in zip(px, out)) <= 3


def test_jpeg_fill_bytes_before_markers_accepted():
    """r6 ADVICE: T.81 B.1.1.2 permits any number of 0xFF fill bytes
    preceding a marker. A spec-valid padded file must decode to the
    same pixels as the unpadded one (the pre-fix decoder raised
    'unsupported marker 0xFFFF')."""
    good = encode_jpeg_gray(8, 8, [128] * 64)
    base = decode_jpeg_gray(good)
    # pad before the first DQT marker and before the SOS marker
    padded = good.replace(b"\xff\xdb", b"\xff\xff\xff\xff\xdb", 1).replace(
        b"\xff\xda", b"\xff\xff\xff\xda", 1
    )
    assert len(padded) == len(good) + 5
    assert decode_jpeg_gray(padded) == base
    # a stuffed 0xFF00 OUTSIDE the entropy stream is still malformed
    with pytest.raises(ValueError, match="stuffed"):
        decode_jpeg_gray(good.replace(b"\xff\xdb", b"\xff\x00\xff\xdb", 1))
    # a file ending inside fill bytes / right after a padded marker
    # must still be a ValueError, never struct/IndexError
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg_gray(b"\xff\xd8\xff\xff\xff\xdb\x00")
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg_gray(b"\xff\xd8\xff\xff\xff\xff")


def test_jpeg_decode_rejects_malformed():
    good = encode_jpeg_gray(8, 8, [128] * 64)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_gray(b"PK" + good[2:])
    with pytest.raises(ValueError, match="overruns"):
        decode_jpeg_gray(good[:10])  # DQT length field exceeds the file
    # progressive SOF2
    prog = bytearray(good)
    prog[prog.index(b"\xff\xc0") + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg_gray(bytes(prog))
    # 3-component SOF: grayscale-only decoder must say so
    i = good.index(b"\xff\xc0")
    sof3 = (
        good[:i]
        + b"\xff\xc0\x00\x11\x08\x00\x08\x00\x08\x03"
        + b"\x01\x11\x00\x02\x11\x00\x03\x11\x00"
        + good[i + 13 :]
    )
    with pytest.raises(ValueError, match="grayscale"):
        decode_jpeg_gray(sof3)
    # restart intervals are out of scope, loudly
    dri = good[:i] + b"\xff\xdd\x00\x04\x00\x08" + good[i:]
    with pytest.raises(ValueError, match="DRI"):
        decode_jpeg_gray(dri)
    # truncated entropy stream
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg_gray(good[:-3])
    # short DHT / SOF / SOS bodies must raise ValueError, not IndexError
    for seg, msg in ((b"\xff\xc4\x00\x05\x00\x01\x02", "DHT header"),
                     (b"\xff\xc0\x00\x06\x08\x00\x08\x00", "SOF0 segment"),
                     (b"\xff\xda\x00\x04\x01\x01", "SOS segment")):
        with pytest.raises(ValueError, match=msg):
            decode_jpeg_gray(good[:2] + seg + good[2:])
    # APPn and COM segments are skipped fine
    app = good[:2] + b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00" + good[2:]
    com = app[:2] + b"\xff\xfe\x00\x0chello jpeg" + app[2:]
    assert decode_jpeg_gray(com)[2] == decode_jpeg_gray(good)[2]


def test_jpeg_dimension_bomb_rejected_before_allocation():
    """A tiny crafted file whose SOF declares 65535x65535 must be
    rejected by the entropy-capacity bound (every block needs >=2 bits
    of scan data) BEFORE the width*height output allocation — the same
    fail-closed-first discipline as the bounded PNG inflate. The time
    bound pins the 'before allocation' part: reserving 4.3e9 pixels
    would take far longer (or OOM)."""
    import time

    good = encode_jpeg_gray(8, 8, [128] * 64)
    i = good.index(b"\xff\xc0")
    bomb = bytearray(good)
    bomb[i + 5 : i + 7] = b"\xff\xff"  # height
    bomb[i + 7 : i + 9] = b"\xff\xff"  # width
    t0 = time.monotonic()
    with pytest.raises(ValueError, match="entropy data capacity"):
        decode_jpeg_gray(bytes(bomb))
    assert time.monotonic() - t0 < 2.0

    # the entropy bound scales with payload size, so a multi-MB bomb
    # (~17 MB of padding "entropy" bytes) passes it — the absolute
    # pixel cap must reject it before the 4.3e9-slot allocation
    big_bomb = bytes(bomb) + b"\x00" * (17 << 20)
    t0 = time.monotonic()
    with pytest.raises(ValueError, match="pixel decode limit"):
        decode_jpeg_gray(big_bomb)
    assert time.monotonic() - t0 < 2.0


def test_jpeg_huffman_and_sof_field_validation():
    """Structured DHT/SOF corruption a random mutator can't reach (the
    marker framing stays valid): code counts summing past 256 symbols,
    counts that overflow the canonical code space (17 codes of length
    4), duplicated symbols, and sampling factors outside T.81's 1-4
    must all raise ValueError (r7 hand-probe findings)."""
    import struct

    good = encode_jpeg_gray(8, 8, [128] * 64)

    counts = [0] * 16
    counts[7], counts[8] = 255, 45  # 300 codes declared
    syms = bytes(range(256)) + bytes(44)
    dht = b"\xff\xc4" + struct.pack(">H", 2 + 17 + 300) + b"\x00" + bytes(counts) + syms
    with pytest.raises(ValueError, match="more than 256 codes"):
        decode_jpeg_gray(good[:2] + dht + good[2:])

    counts = [0] * 16
    counts[3] = 17  # 17 codes of length 4 > the 16 available
    dht = b"\xff\xc4" + struct.pack(">H", 2 + 17 + 17) + b"\x00" + bytes(counts) + bytes(range(17))
    with pytest.raises(ValueError, match="canonical code space"):
        decode_jpeg_gray(good[:2] + dht + good[2:])

    counts = [0] * 16
    counts[3] = 4
    dht = b"\xff\xc4" + struct.pack(">H", 2 + 17 + 4) + b"\x00" + bytes(counts) + bytes([7, 7, 8, 9])
    with pytest.raises(ValueError, match="duplicate symbol"):
        decode_jpeg_gray(good[:2] + dht + good[2:])

    i = good.index(b"\xff\xc0")
    for factors in (0x00, 0x50, 0x05, 0x10, 0x01):
        bad = bytearray(good)
        bad[i + 11] = factors
        with pytest.raises(ValueError, match="sampling factors"):
            decode_jpeg_gray(bytes(bad))
    # 2x2 is spec-valid for a single-component (non-interleaved) scan
    ok = bytearray(good)
    ok[i + 11] = 0x22
    assert decode_jpeg_gray(bytes(ok))[:2] == (8, 8)


def test_jpeg_encoder_validates_input():
    with pytest.raises(ValueError, match="dimensions"):
        encode_jpeg_gray(0, 8, [])
    with pytest.raises(ValueError, match="expected 64"):
        encode_jpeg_gray(8, 8, [0] * 63)
    with pytest.raises(ValueError, match="8-bit range"):
        encode_jpeg_gray(1, 1, [300])
    with pytest.raises(ValueError, match="quant table"):
        encode_jpeg_gray(1, 1, [0], quant=[0] * 64)


# ---------------------------------------------------------------------------
# generative properties (hypothesis) — no Spark needed
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=60, deadline=None)
@given(
    data=st.one_of(
        st.binary(max_size=2000),
        # repetitive payloads: a few short motifs tiled in random order,
        # exercising the copy/overlap paths hard
        st.lists(
            st.sampled_from([b"ab", b"abc", b"\x00", b"xyzw", b"q"]),
            min_size=0,
            max_size=400,
        ).map(b"".join),
    )
)
def test_snappy_roundtrip_property(data):
    assert snappy_decompress(snappy_compress(data)) == data


@settings(max_examples=40, deadline=None)
@given(
    bw=st.integers(1, 3),
    bh=st.integers(1, 3),
    crop_x=st.integers(0, 7),
    crop_y=st.integers(0, 7),
    vals=st.lists(st.integers(0, 255), min_size=9, max_size=9),
)
def test_jpeg_flat_block_exactness_property(bw, bh, crop_x, crop_y, vals):
    """ANY piecewise-flat image (any per-block values, any crop below
    a block multiple) round-trips through the lossy codec onto the
    integer closed form — the generative version of the oracle's
    premise, so the driver-checked fixture family isn't a special
    case."""
    w = 8 * bw - min(crop_x, 8 * bw - 1)
    h = 8 * bh - min(crop_y, 8 * bh - 1)
    grid = {(bx, by): vals[(by * 3 + bx) % 9] for bx in range(bw) for by in range(bh)}
    px = [grid[(x // 8, y // 8)] for y in range(h) for x in range(w)]
    exp = []
    q0 = STD_QUANT[0]
    for y in range(h):
        for x in range(w):
            v = grid[(x // 8, y // 8)]
            s = (2 * 64 * (v - 128) + 8 * q0) // (16 * q0)
            exp.append(min(255, max(0, (s * q0 + 4) // 8 + 128)))
    assert decode_jpeg_gray(encode_jpeg_gray(w, h, px)) == (w, h, exp)


def test_all_decoders_fail_closed_under_mutation():
    """Seeded byte-mutation fuzz across every codec: flips, deletions,
    and insertions on valid payloads must either decode or raise
    ValueError — never IndexError/struct.error/zlib.error. At corpus
    scale corrupt payloads are a certainty, and a leaked exception
    type is a worker-crash, not a quarantine row."""
    import random as _random

    from datafusion_streams_spark.codecs.png import decode_png, encode_png
    from datafusion_streams_spark.codecs.wav import decode_wav, encode_wav

    rng = _random.Random(99)
    px3 = [(rng.randrange(256),) * 3 for _ in range(48)]
    payloads = {
        "bmp": (decode_bmp, encode_bmp(8, 6, px3)),
        "png": (decode_png, encode_png(8, 6, px3)),
        "wav": (
            decode_wav,
            encode_wav(8000, 2, [rng.randrange(-1000, 1000) for _ in range(64)]),
        ),
        "jpeg": (
            decode_jpeg_gray,
            encode_jpeg_gray(16, 16, [rng.randrange(256) for _ in range(256)]),
        ),
        "snappy": (
            snappy_decompress,
            snappy_compress(bytes(rng.randrange(8) for _ in range(300))),
        ),
    }
    for name, (dec, good) in payloads.items():
        for _ in range(400):
            b = bytearray(good)
            for _ in range(rng.randrange(1, 4)):
                op = rng.randrange(3)
                if op == 0 and b:
                    b[rng.randrange(len(b))] = rng.randrange(256)
                elif op == 1 and len(b) > 1:
                    del b[rng.randrange(len(b))]
                else:
                    b.insert(rng.randrange(len(b) + 1), rng.randrange(256))
            try:
                dec(bytes(b))
            except ValueError:
                pass  # the contract: malformed input -> ValueError
