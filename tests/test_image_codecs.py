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
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_image(b"\xff\xd8\xff\xe0 fake jpeg")
