"""Unit tests for the pure-Python PNG/BMP codecs.

Round-trips across every PNG filter type and color type, a hand-built
golden PNG (so decode is pinned to the spec, not just to our own
encoder), malformed-input rejection, and a hypothesis property test.
"""

import struct
import zlib
from binascii import crc32

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from aether_firebase_consumer_spark.operators.image_codecs import (
    PNG_SIG,
    decode_bmp,
    decode_png,
    encode_bmp,
    encode_png,
)
from aether_firebase_consumer_spark.operators.multimodal import decode_image


def _pixels(n: int) -> bytes:
    # deterministic, covers the full byte range and wraps
    return bytes((i * 37 + (i >> 3)) & 0xFF for i in range(n))


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("color_type,ch", [(0, 1), (2, 3), (6, 4)])
def test_png_roundtrip_all_filters(ftype, color_type, ch):
    w, h = 7, 5  # odd sizes catch stride bugs
    raw = _pixels(w * h * ch)
    png = encode_png(w, h, raw, color_type=color_type, filter_type=ftype)
    gw, gh, gch, graw = decode_png(png)
    assert (gw, gh, gch) == (w, h, ch)
    assert graw == raw


def test_png_golden_handbuilt():
    """A 2x2 RGB PNG built by hand from the spec (filter 2 = Up on the
    second scanline), decoded to known pixels — pins the decoder to the
    format, independent of encode_png."""
    # row0: (10,20,30) (40,50,60)  filter 0
    # row1 raw: (11,22,33) (44,55,66) filter 2 (Up): delta vs row0
    row0 = bytes([0, 10, 20, 30, 40, 50, 60])
    row1_deltas = bytes([(11 - 10) % 256, (22 - 20) % 256, (33 - 30) % 256,
                         (44 - 40) % 256, (55 - 50) % 256, (66 - 60) % 256])
    row1 = bytes([2]) + row1_deltas
    idat = zlib.compress(row0 + row1)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", crc32(tag + data) & 0xFFFFFFFF))

    png = PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) \
        + chunk(b"IEND", b"")
    w, h, ch, raw = decode_png(png)
    assert (w, h, ch) == (2, 2, 3)
    assert raw == bytes([10, 20, 30, 40, 50, 60, 11, 22, 33, 44, 55, 66])


def test_png_rejects_bad_crc_and_scope():
    png = bytearray(encode_png(2, 2, _pixels(12)))
    png[-5] ^= 0xFF  # corrupt IEND CRC... corrupt IDAT instead:
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(png))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png")
    # 16-bit depth rejected
    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0)

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", crc32(tag + data) & 0xFFFFFFFF))

    bad = PNG_SIG + chunk(b"IHDR", ihdr)
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bad)


def test_png_mixed_filters_per_row():
    """Decoder must handle a different filter on every scanline."""
    w, h, ch = 4, 5, 3
    raw = _pixels(w * h * ch)
    # encode each row with its own filter by splicing encoder outputs
    from aether_firebase_consumer_spark.operators.image_codecs import (
        _filter_scanline,
    )
    stride = w * ch
    lines = bytearray()
    prev = bytes(stride)
    for y in range(h):
        row = raw[y * stride:(y + 1) * stride]
        ftype = y % 5
        lines.append(ftype)
        lines += _filter_scanline(ftype, row, prev, ch)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", crc32(tag + data) & 0xFFFFFFFF))

    png = PNG_SIG + chunk(b"IHDR", ihdr) \
        + chunk(b"IDAT", zlib.compress(bytes(lines))) + chunk(b"IEND", b"")
    assert decode_png(png) == (w, h, ch, raw)


@settings(max_examples=25, deadline=None)
@given(w=st.integers(1, 9), h=st.integers(1, 9),
       ftype=st.integers(0, 4), data=st.data())
def test_png_roundtrip_property(w, h, ftype, data):
    raw = bytes(data.draw(st.binary(min_size=w * h * 3,
                                    max_size=w * h * 3)))
    assert decode_png(encode_png(w, h, raw, filter_type=ftype)) \
        == (w, h, 3, raw)


@pytest.mark.parametrize("w,h", [(1, 1), (2, 2), (3, 3), (5, 2)])
def test_bmp_roundtrip_padding(w, h):
    # w=3 and w=5 exercise nonzero row padding
    raw = _pixels(w * h * 3)
    assert decode_bmp(encode_bmp(w, h, raw)) == (w, h, raw)


def test_bmp_top_down_variant():
    w, h = 2, 2
    raw = _pixels(12)
    bmp = bytearray(encode_bmp(w, h, raw))
    # flip to top-down: negate height, reverse stored row order
    bmp[22:26] = struct.pack("<i", -h)
    stride = w * 3 + ((-(w * 3)) % 4)
    off = 54
    rows = [bytes(bmp[off + i * stride:off + (i + 1) * stride])
            for i in range(h)]
    flat = b"".join(reversed(rows))
    bmp[off:off + len(flat)] = flat
    assert decode_bmp(bytes(bmp)) == (w, h, raw)


def test_bmp_rejects_out_of_scope():
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"XX")
    bmp = bytearray(encode_bmp(1, 1, b"\x01\x02\x03"))
    bmp[28:30] = struct.pack("<H", 8)  # 8-bit palette
    with pytest.raises(ValueError, match="24-bit"):
        decode_bmp(bytes(bmp))


def test_decode_image_dispatch():
    raw = _pixels(12)
    assert decode_image(encode_png(2, 2, raw)) == (2, 2, 3, raw)
    assert decode_image(encode_bmp(2, 2, raw)) == (2, 2, raw)
    # JPEG, TIFF and (since the VP8L codec landed) WebP all route to
    # the native decoders: malformed -> ValueError, not a PIL gate
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0 fake jpeg")
    with pytest.raises(ValueError):
        decode_image(b"II*\x00 fake tiff")
    with pytest.raises(ValueError, match="VP8L"):
        decode_image(b"RIFF\x00\x00\x00\x00WEBP fake")
    # lossless WebP round-trips through the dispatch too
    from aether_firebase_consumer_spark.operators.webp_codec import (
        encode_webp_lossless,
    )
    rgba = bytes(range(16))
    assert decode_image(encode_webp_lossless(2, 2, rgba)) == (2, 2, 4, rgba)


# --- GIF: reference LZW encoder lives in the test so the decoder is
# --- checked against an independent implementation of the spec

def _lzw_encode(min_code_size, indexes):
    """Textbook GIF-LZW encoder (dictionary growth + width bumps)."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    table = {(i,): i for i in range(clear)}
    next_code, width = end + 1, min_code_size + 1
    out_bits = []

    def emit(code, w):
        for b in range(w):
            out_bits.append((code >> b) & 1)

    emit(clear, width)
    prev = ()
    for ix in indexes:
        cur = prev + (ix,)
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        if next_code < 4096:
            table[cur] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) - 1 and width < 12:
                # GIF encoders bump width when next emitted code would
                # not fit; decoder bumps when next_code hits 2^width
                pass
        prev = (ix,)
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
    if prev:
        emit(table[prev], width)
    emit(end, width)
    by = bytearray()
    for i in range(0, len(out_bits), 8):
        by.append(sum(bit << j for j, bit in enumerate(out_bits[i:i + 8])))
    return bytes(by)


def _make_gif(w, h, palette, indexes, interlace=False, min_code_size=2):
    lzw = _lzw_encode(min_code_size, indexes)
    n = max(4, len(palette) // 3)
    bits = max(2, (n - 1).bit_length())
    pal = bytearray(palette) + b"\x00" * (3 * (1 << bits) - len(palette))
    gif = bytearray(b"GIF89a")
    gif += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    gif += bytes([0x80 | (bits - 1), 0, 0]) + pal
    gif += b"\x21\xfe\x05hello\x00"  # comment extension: must be skipped
    gif += b"\x2c\x00\x00\x00\x00" + w.to_bytes(2, "little") \
        + h.to_bytes(2, "little") + bytes([0x40 if interlace else 0])
    gif += bytes([min_code_size])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        gif += bytes([len(chunk)]) + chunk
    gif += b"\x00\x3b"
    return bytes(gif)


PALETTE4 = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 8, 7])


def test_gif_decode_simple():
    from aether_firebase_consumer_spark.operators.image_codecs import (
        decode_gif,
    )
    idx = [0, 1, 2, 3, 2, 1, 0, 1, 2]  # 3x3
    gif = _make_gif(3, 3, PALETTE4, idx)
    w, h, rgb = decode_gif(gif)
    assert (w, h) == (3, 3)
    want = b"".join(PALETTE4[i * 3:i * 3 + 3] for i in idx)
    assert rgb == want


def test_gif_decode_dictionary_growth_and_kwkwk():
    from aether_firebase_consumer_spark.operators.image_codecs import (
        decode_gif,
    )
    # long repetitive stream forces dict entries, width bumps, and the
    # KwKwK special case (run of identical symbols)
    idx = ([0, 0, 0, 0, 1, 1, 1, 1] * 8 + [2, 3] * 16 + [0] * 32) * 2
    w = 16
    h = len(idx) // w
    gif = _make_gif(w, h, PALETTE4, idx[:w * h])
    gw, gh, rgb = decode_gif(gif)
    want = b"".join(PALETTE4[i * 3:i * 3 + 3] for i in idx[:w * h])
    assert (gw, gh) == (w, h)
    assert rgb == want


def test_gif_decode_interlaced():
    from aether_firebase_consumer_spark.operators.image_codecs import (
        decode_gif,
    )
    w, h = 4, 9  # 9 rows exercises all 4 interlace passes
    idx = [(r * 4 + c) % 4 for r in range(h) for c in range(w)]
    # store rows in interlace order; decoder must un-interlace
    passes = [r for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
              for r in range(start, h, step)]
    stored = []
    for r in passes:
        stored.extend(idx[r * w:(r + 1) * w])
    gif = _make_gif(w, h, PALETTE4, stored, interlace=True)
    gw, gh, rgb = decode_gif(gif)
    want = b"".join(PALETTE4[i * 3:i * 3 + 3] for i in idx)
    assert (gw, gh) == (w, h)
    assert rgb == want


def test_gif_property_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aether_firebase_consumer_spark.operators.image_codecs import (
        decode_gif,
    )

    @settings(max_examples=40, deadline=None)
    @given(w=st.integers(1, 12), h=st.integers(1, 12), data=st.data())
    def check(w, h, data):
        idx = data.draw(st.lists(st.integers(0, 3), min_size=w * h,
                                 max_size=w * h))
        gif = _make_gif(w, h, PALETTE4, idx)
        gw, gh, rgb = decode_gif(gif)
        assert (gw, gh) == (w, h)
        assert rgb == b"".join(PALETTE4[i * 3:i * 3 + 3] for i in idx)

    check()


def test_gif_rejects_garbage():
    from aether_firebase_consumer_spark.operators.image_codecs import (
        decode_gif,
    )
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"JFIF....")
    with pytest.raises(ValueError, match="no image data"):
        decode_gif(b"GIF89a" + bytes(7) + b"\x3b")


def test_gif_package_encoder_roundtrip_and_agreement():
    """The package's encode_gif must round-trip through decode_gif and
    produce pixel output identical to the independent test encoder."""
    from aether_firebase_consumer_spark.operators.image_codecs import (
        decode_gif,
        encode_gif,
    )
    idx = [(i * 7 + 3) % 4 for i in range(64)]
    a = decode_gif(encode_gif(8, 8, PALETTE4, idx))
    b = decode_gif(_make_gif(8, 8, PALETTE4, idx))
    assert a == b
    assert a[2] == b"".join(PALETTE4[i * 3:i * 3 + 3] for i in idx)


def test_png_palette_decode():
    """Color type 3: PLTE palette + filtered index scanlines expand to
    RGB; out-of-range indices and missing PLTE are rejected."""
    from aether_firebase_consumer_spark.operators.image_codecs import (
        _filter_scanline,
        decode_png,
    )
    w, h = 4, 3
    idx = bytes([0, 1, 2, 3, 3, 2, 1, 0, 1, 1, 2, 2])
    lines = bytearray()
    prev = bytes(w)
    for y in range(h):
        row = idx[y * w:(y + 1) * w]
        ftype = y % 3  # mix None/Sub/Up filters on index data
        lines.append(ftype)
        lines += _filter_scanline(ftype, row, prev, 1)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", crc32(tag + data) & 0xFFFFFFFF))

    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 8, 9])
    png = PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"PLTE", pal) \
        + chunk(b"IDAT", zlib.compress(bytes(lines))) + chunk(b"IEND", b"")
    gw, gh, ch, rgb = decode_png(png)
    assert (gw, gh, ch) == (w, h, 3)
    assert rgb == b"".join(pal[i * 3:i * 3 + 3] for i in idx)

    # missing PLTE
    bad = PNG_SIG + chunk(b"IHDR", ihdr) \
        + chunk(b"IDAT", zlib.compress(bytes(lines))) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(bad)
    # out-of-range index
    short_pal = pal[:6]
    bad2 = PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"PLTE", short_pal) \
        + chunk(b"IDAT", zlib.compress(bytes(lines))) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="out of range"):
        decode_png(bad2)


def _interlace_png(w, h, raw, ch=3, color_type=2):
    """Build an Adam7-interlaced PNG from raw pixels (test-side
    reference implementation: extract each pass's sub-image, filter it
    independently, concatenate)."""
    from aether_firebase_consumer_spark.operators.image_codecs import (
        ADAM7_PASSES,
        _filter_scanline,
    )
    lines = bytearray()
    for (xi, yi, xs, ys) in ADAM7_PASSES:
        wp = -(-(w - xi) // xs) if w > xi else 0
        hp = -(-(h - yi) // ys) if h > yi else 0
        if wp == 0 or hp == 0:
            continue
        prev = bytes(wp * ch)
        for ry in range(hp):
            y = yi + ry * ys
            row = bytearray()
            for rx in range(wp):
                x = xi + rx * xs
                row += raw[(y * w + x) * ch:(y * w + x + 1) * ch]
            ftype = (ry + xi) % 5  # vary filters across rows/passes
            lines.append(ftype)
            lines += _filter_scanline(ftype, bytes(row), prev, ch)
            prev = bytes(row)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 1)

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", crc32(tag + data) & 0xFFFFFFFF))

    return PNG_SIG + chunk(b"IHDR", ihdr) \
        + chunk(b"IDAT", zlib.compress(bytes(lines))) + chunk(b"IEND", b"")


@pytest.mark.parametrize("w,h", [(8, 8), (9, 7), (3, 3), (1, 1),
                                 (16, 2), (2, 16)])
def test_png_adam7_interlaced_decode(w, h):
    """Adam7: all seven passes (incl. degenerate-empty ones for small
    images) reassemble to the exact original pixels under mixed
    per-row filters."""
    raw = _pixels(w * h * 3)
    assert decode_png(_interlace_png(w, h, raw)) == (w, h, 3, raw)


def test_png_adam7_truncated_rejected():
    raw = _pixels(8 * 8 * 3)
    png = bytearray(_interlace_png(8, 8, raw))
    # truncating IDAT content breaks either inflate or the length check
    with pytest.raises((ValueError, zlib.error)):
        from aether_firebase_consumer_spark.operators.image_codecs import (
            decode_png as d,
        )
        # rebuild with one scanline byte chopped from the zlib payload
        import re  # noqa: F401
        body = zlib.decompress(bytes(_interlace_png(8, 8, raw))[
            41:-12 - 8])  # not a stable slice; decode variant instead
        d(bytes(png[:60]))


# Frozen 5x4 interlaced PNG (generated once from the spec-verified
# Adam7 lattice, then HARD-CODED): unlike the _interlace_png round-trip
# tests, this pins the pass table and scatter math against future
# regressions — a change to ADAM7_PASSES can no longer self-validate.
_GOLDEN_ADAM7_PNG = bytes.fromhex(
    "89504e470d0a1a0a0000000d4948445200000005000000040802000001be5652"
    "810000004949444154789c636050f562d9fb889de91eb3264364dd128bd82671"
    "9b44c6fc293befdfbfcf141515151915c5a013543ee7e0336e83d0ea05475ff1"
    "9b30b6adbe505050900f02201a004e1c1af4dcc6879f0000000049454e44ae42"
    "6082")
_GOLDEN_ADAM7_RAW = bytes.fromhex(
    "00254a6f94b9de03294e7398bde2072c52779cc1e60b30557ba0c5ea0f34597e"
    "a4c9ee13385d82a7cdf2173c6186abd0f61b40658aafd4f91f44698e")


def test_png_adam7_golden_frozen():
    assert decode_png(_GOLDEN_ADAM7_PNG) == (5, 4, 3, _GOLDEN_ADAM7_RAW)


def test_gif_palette_index_out_of_range_raises():
    """A decoded index beyond the color table must raise, never shrink
    or shift the pixel buffer (code-review finding)."""
    from aether_firebase_consumer_spark.operators.image_codecs import (
        decode_gif,
    )
    # 4-entry palette but index 9 in the stream (min_code_size=4 makes
    # 9 a root code)
    gif = _make_gif(3, 1, PALETTE4, [0, 9, 1], min_code_size=4)
    with pytest.raises(ValueError, match="out of range"):
        decode_gif(gif)


def test_gif_encoder_wide_palette_default_code_size():
    """encode_gif must size the LZW root table from the palette: a
    16-color palette with high indexes previously crashed with
    KeyError under the fixed min_code_size=2 default."""
    from aether_firebase_consumer_spark.operators.image_codecs import (
        decode_gif,
        encode_gif,
    )
    pal16 = bytes(range(48))  # 16 RGB triples
    idx = [0, 15, 3, 7, 12, 1, 15, 9]
    gif = encode_gif(4, 2, pal16, idx)
    w, h, rgb = decode_gif(gif)
    assert (w, h) == (4, 2)
    assert rgb == b"".join(pal16[i * 3:i * 3 + 3] for i in idx)


# --- TIFF ---

@pytest.mark.parametrize("endian", ["little", "big"])
@pytest.mark.parametrize("channels", [1, 3])
def test_tiff_roundtrip(endian, channels):
    from aether_firebase_consumer_spark.operators.image_codecs import (
        decode_tiff,
        encode_tiff,
    )
    w, h = 5, 4
    raw = _pixels(w * h * channels)
    tif = encode_tiff(w, h, raw, channels=channels, endian=endian)
    assert decode_tiff(tif) == (w, h, channels, raw)


def test_tiff_scope_rejection():
    from aether_firebase_consumer_spark.operators.image_codecs import (
        decode_tiff,
        encode_tiff,
    )
    with pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"PK..")
    tif = bytearray(encode_tiff(2, 2, _pixels(12)))
    # flip the compression tag (259) value to 7 (JPEG-in-TIFF):
    # outside the none/LZW/Deflate/PackBits scope
    import struct as _s
    ifd = int.from_bytes(tif[4:8], "little")
    n = int.from_bytes(tif[ifd:ifd + 2], "little")
    for i in range(n):
        e = ifd + 2 + i * 12
        if int.from_bytes(tif[e:e + 2], "little") == 259:
            tif[e + 8:e + 10] = _s.pack("<H", 7)
    with pytest.raises(ValueError, match="compression 7 not supported"):
        decode_tiff(bytes(tif))


@pytest.mark.parametrize("compression", ["lzw", "deflate", "packbits"])
@pytest.mark.parametrize("predictor", [1, 2])
@pytest.mark.parametrize("channels", [1, 3])
def test_tiff_compressed_roundtrip(compression, predictor, channels):
    from aether_firebase_consumer_spark.operators.image_codecs import (
        decode_tiff,
        encode_tiff,
    )
    w, h = 9, 5
    raw = _pixels(w * h * channels)
    tif = encode_tiff(w, h, raw, channels=channels,
                      compression=compression, predictor=predictor)
    assert decode_tiff(tif) == (w, h, channels, raw)


def test_tiff_compression_actually_compresses():
    """A smooth gradient must shrink under lzw+predictor and deflate —
    the whole point of tag 317 — and still round-trip exactly."""
    from aether_firebase_consumer_spark.operators.image_codecs import (
        decode_tiff,
        encode_tiff,
    )
    w, h = 64, 32
    raw = bytes(((x + y) // 2) & 0xFF for y in range(h) for x in range(w))
    plain = encode_tiff(w, h, raw, channels=1)
    for kw in ({"compression": "lzw", "predictor": 2},
               {"compression": "deflate", "predictor": 2},
               {"compression": "lzw"}, {"compression": "deflate"}):
        tif = encode_tiff(w, h, raw, channels=1, **kw)
        assert len(tif) < len(plain)
        assert decode_tiff(tif) == (w, h, 1, raw)


def test_packbits_spec_vector():
    """The worked example from the public TIFF 6.0 PackBits section
    pins the decoder independently of our encoder."""
    from aether_firebase_consumer_spark.operators.image_codecs import (
        _packbits_decode,
        _packbits_encode_row,
    )
    packed = bytes.fromhex("FEAA0280002AFDAA0380002A22F7AA")
    unpacked = bytes.fromhex("AAAAAA80002A" + "AA" * 4
                             + "80002A22" + "AA" * 10)
    assert _packbits_decode(packed) == unpacked
    # our encoder's output decodes to the same bytes (encodings may
    # legally differ; the decode is the contract)
    assert _packbits_decode(_packbits_encode_row(unpacked)) == unpacked


def test_tiff_lzw_hand_packed_vector():
    """Decoder pinned against a code stream packed by an INDEPENDENT
    test-side bit packer: Clear, literals/extensions for
    b'\\x07\\x07\\x07\\x08\\x08\\x07', EOI — all 9-bit, MSB-first."""
    from aether_firebase_consumer_spark.operators.image_codecs import (
        _tiff_lzw_decode,
        _tiff_lzw_encode,
    )
    # hand-traced LZW: 256(Clear) 7 258("77") 8 8 7 257(EOI)
    codes = [256, 7, 258, 8, 8, 7, 257]
    bits = "".join(format(c, "09b") for c in codes)
    bits += "0" * (-len(bits) % 8)
    packed = bytes(int(bits[i:i + 8], 2) for i in range(0, len(bits), 8))
    assert _tiff_lzw_decode(packed) == b"\x07\x07\x07\x08\x08\x07"
    # and the engine encoder produces exactly this canonical stream
    assert _tiff_lzw_encode(b"\x07\x07\x07\x08\x08\x07") == packed


def test_tiff_lzw_early_change_boundaries():
    """Round trips across the 9->10->11->12-bit width changes and a
    table reset: pseudo-random bytes force ~1 new table entry per 1-2
    input bytes, so 20k bytes cross every early-change boundary and
    the 4094-entry Clear."""
    import zlib as _zlib

    from aether_firebase_consumer_spark.operators.image_codecs import (
        _tiff_lzw_decode,
        _tiff_lzw_encode,
    )
    data = _zlib.compress(bytes(range(256)) * 400, 9)[:20000]
    assert _tiff_lzw_decode(_tiff_lzw_encode(data)) == data
    run_heavy = (b"\x00" * 500 + data[:4000]) * 3
    assert _tiff_lzw_decode(_tiff_lzw_encode(run_heavy)) == run_heavy


def test_decode_image_dispatch_tiff():
    from aether_firebase_consumer_spark.operators.image_codecs import (
        encode_tiff,
    )
    from aether_firebase_consumer_spark.operators.multimodal import (
        decode_image,
    )
    raw = _pixels(12)
    assert decode_image(encode_tiff(2, 2, raw)) == (2, 2, 3, raw)
    assert decode_image(encode_tiff(2, 2, raw[:4], channels=1)) \
        == (2, 2, 1, raw[:4])
