"""Baseline JPEG codec tests: flat-block bit-exactness (DC-only
streams), PSNR-bounded lossy round-trips, bit-stuffing, scope
rejection, and standard-table conformance details."""

import math
import random

import pytest

from aether_firebase_consumer_spark.operators.jpeg_codec import (
    FLAT_QT,
    STD_LUMA_QT,
    decode_jpeg_gray,
    encode_jpeg_gray,
)


def psnr(a: bytes, b: bytes) -> float:
    mse = sum((x - y) ** 2 for x, y in zip(a, b)) / len(a)
    return float("inf") if mse == 0 else 10 * math.log10(255 ** 2 / mse)


@pytest.mark.parametrize("v", [0, 1, 127, 128, 200, 254, 255])
def test_flat_block_bit_exact(v):
    """A flat 8x8 block is DC-only: with the unit quant table the
    entire encode→decode path (DCT, Huffman, bitstream, IDCT) must
    reproduce the input EXACTLY."""
    px = bytes([v] * 64)
    assert decode_jpeg_gray(encode_jpeg_gray(8, 8, px)) == (8, 8, px)


def test_flat_multiblock_with_dc_prediction():
    """Different flat values per block exercise DC difference coding
    (incl. negative diffs) across blocks — still exact."""
    vals = [10, 250, 10, 130, 90, 200]
    w, h = 24, 16  # 3x2 blocks
    px = bytearray(w * h)
    for bi, v in enumerate(vals):
        by, bx = divmod(bi, 3)
        for y in range(8):
            for x in range(8):
                px[(by * 8 + y) * w + bx * 8 + x] = v
    got = decode_jpeg_gray(encode_jpeg_gray(w, h, bytes(px)))
    assert got == (w, h, bytes(px))


def test_lossy_roundtrip_psnr_unit_table():
    """Unit quant table: error only from DCT float rounding — PSNR
    must be extremely high on arbitrary content."""
    rng = random.Random(3)
    w, h = 16, 16
    px = bytes(rng.randrange(256) for _ in range(w * h))
    gw, gh, out = decode_jpeg_gray(encode_jpeg_gray(w, h, px))
    assert (gw, gh) == (w, h)
    assert psnr(px, out) > 45, psnr(px, out)


def test_lossy_roundtrip_psnr_standard_table():
    """Standard luminance table on smooth content: classic JPEG
    quality — smooth gradients survive well."""
    w, h = 32, 24
    px = bytes(min(255, (x * 3 + y * 2) % 256)
               for y in range(h) for x in range(w))
    gw, gh, out = decode_jpeg_gray(
        encode_jpeg_gray(w, h, px, qt=STD_LUMA_QT))
    assert (gw, gh) == (w, h)
    assert psnr(px, out) > 28, psnr(px, out)


def test_non_multiple_of_8_dimensions():
    rng = random.Random(9)
    w, h = 13, 11
    px = bytes(rng.randrange(256) for _ in range(w * h))
    gw, gh, out = decode_jpeg_gray(encode_jpeg_gray(w, h, px))
    assert (gw, gh) == (w, h)
    assert len(out) == w * h
    assert psnr(px, out) > 40


def test_byte_stuffing_roundtrip():
    """Content engineered to emit 0xFF bytes in the entropy stream
    must round-trip through the stuff/unstuff path. Brute-force over
    many random images guarantees stuffed bytes occur."""
    rng = random.Random(11)
    stuffed_seen = False
    for _ in range(30):
        px = bytes(rng.randrange(256) for _ in range(64))
        jpg = encode_jpeg_gray(8, 8, px)
        scan = jpg[jpg.find(b"\xff\xda") + 14:-2]
        if b"\xff\x00" in scan:
            stuffed_seen = True
        w, h, out = decode_jpeg_gray(jpg)
        assert psnr(px, out) > 40
    assert stuffed_seen


def test_scope_rejection():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_gray(b"nope")
    jpg = bytearray(encode_jpeg_gray(8, 8, bytes(64)))
    sof = jpg.find(b"\xff\xc0")
    jpg[sof + 1] = 0xC2  # pretend progressive
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg_gray(bytes(jpg))


def test_decode_image_dispatch_jpeg():
    from aether_firebase_consumer_spark.operators.multimodal import (
        decode_image,
    )
    px = bytes([77] * 64)
    assert decode_image(encode_jpeg_gray(8, 8, px)) == (8, 8, 1, px)


# --- color (YCbCr 4:4:4) ---

def test_color_flat_roundtrip_deterministic():
    """Flat-color images: DC-only in all three components; the decoded
    RGB equals the double round-trip through the exact JFIF formulas
    (floor(+0.5) convention) — deterministic, oracle-predictable."""
    from aether_firebase_consumer_spark.operators.jpeg_codec import (
        decode_jpeg,
        encode_jpeg_rgb,
        rgb_to_ycbcr,
        ycbcr_to_rgb,
    )
    for (r, g, b) in [(200, 30, 90), (0, 0, 0), (255, 255, 255),
                      (17, 204, 111)]:
        px = bytes([r, g, b] * 64)
        w, h, n, out = decode_jpeg(encode_jpeg_rgb(8, 8, px))
        assert (w, h, n) == (8, 8, 3)
        want = ycbcr_to_rgb(*rgb_to_ycbcr(r, g, b))
        assert out == bytes(want * 64)
        # color-convert round-trip error is at most 1/channel
        assert all(abs(a - e) <= 1 for a, e in zip(want, (r, g, b)))


def test_color_roundtrip_psnr():
    import random
    from aether_firebase_consumer_spark.operators.jpeg_codec import (
        decode_jpeg,
        encode_jpeg_rgb,
    )
    rng = random.Random(5)
    w, h = 16, 16
    px = bytes(rng.randrange(256) for _ in range(w * h * 3))
    gw, gh, n, out = decode_jpeg(encode_jpeg_rgb(w, h, px))
    assert (gw, gh, n) == (w, h, 3)
    assert psnr(px, out) > 38, psnr(px, out)  # color convert adds ~1LSB


def test_color_interleave_dc_prediction():
    """Two MCUs with very different colors: per-component DC
    predictors must track independently across interleaved blocks."""
    from aether_firebase_consumer_spark.operators.jpeg_codec import (
        decode_jpeg,
        encode_jpeg_rgb,
        rgb_to_ycbcr,
        ycbcr_to_rgb,
    )
    w, h = 16, 8
    left, right = (250, 10, 10), (10, 250, 10)
    px = bytearray(w * h * 3)
    for y in range(h):
        for x in range(w):
            c = left if x < 8 else right
            px[(y * w + x) * 3:(y * w + x) * 3 + 3] = bytes(c)
    gw, gh, n, out = decode_jpeg(encode_jpeg_rgb(w, h, bytes(px)))
    wl = ycbcr_to_rgb(*rgb_to_ycbcr(*left))
    wr = ycbcr_to_rgb(*rgb_to_ycbcr(*right))
    assert out[0:3] == bytes(wl) and out[8 * 3:8 * 3 + 3] == bytes(wr)


def test_decode_image_dispatch_color_jpeg():
    from aether_firebase_consumer_spark.operators.jpeg_codec import (
        encode_jpeg_rgb,
    )
    from aether_firebase_consumer_spark.operators.multimodal import (
        decode_image,
    )
    px = bytes([10, 20, 30] * 64)
    w, h, n, raw = decode_image(encode_jpeg_rgb(8, 8, px))
    assert (w, h, n) == (8, 8, 3)


# --- 4:2:0 chroma subsampling ---

def test_420_flat_roundtrip():
    """Flat color: subsampled chroma of a flat plane is the same flat
    plane, so 4:2:0 stays deterministic end to end."""
    from aether_firebase_consumer_spark.operators.jpeg_codec import (
        decode_jpeg,
        encode_jpeg_rgb,
        rgb_to_ycbcr,
        ycbcr_to_rgb,
    )
    r, g, b = 180, 60, 120
    px = bytes([r, g, b] * 256)  # 16x16 = one full MCU
    w, h, n, out = decode_jpeg(encode_jpeg_rgb(16, 16, px, subsample="420"))
    assert (w, h, n) == (16, 16, 3)
    want = ycbcr_to_rgb(*rgb_to_ycbcr(r, g, b))
    assert out == bytes(want * 256)


def test_420_roundtrip_psnr_smooth():
    """Smooth gradient: 4:2:0 chroma loss is modest on low-frequency
    content — PSNR-bounded round-trip through the full MCU layout
    (4 Y blocks + subsampled chroma, nearest upsample)."""
    from aether_firebase_consumer_spark.operators.jpeg_codec import (
        decode_jpeg,
        encode_jpeg_rgb,
    )
    w, h = 32, 32
    px = bytearray()
    for y in range(h):
        for x in range(w):
            px += bytes([(x * 8) % 256, (y * 8) % 256,
                         ((x + y) * 4) % 256])
    gw, gh, n, out = decode_jpeg(
        encode_jpeg_rgb(w, h, bytes(px), subsample="420"))
    assert (gw, gh, n) == (w, h, 3)
    assert psnr(bytes(px), out) > 30, psnr(bytes(px), out)


def test_420_non_multiple_of_16():
    from aether_firebase_consumer_spark.operators.jpeg_codec import (
        decode_jpeg,
        encode_jpeg_rgb,
    )
    import random
    rng = random.Random(13)
    w, h = 19, 13  # partial MCUs both axes
    # smooth-ish content (random chroma murders 4:2:0 by design)
    px = bytes(min(255, (i // 3) % 256 + rng.randrange(8))
               for i in range(w * h * 3))
    gw, gh, n, out = decode_jpeg(
        encode_jpeg_rgb(w, h, px, subsample="420"))
    assert (gw, gh, n) == (w, h, 3)
    assert psnr(px, out) > 28


def test_420_compresses_smaller_than_444():
    from aether_firebase_consumer_spark.operators.jpeg_codec import (
        STD_LUMA_QT,
        encode_jpeg_rgb,
    )
    import random
    rng = random.Random(17)
    w, h = 32, 32
    px = bytes(rng.randrange(256) for _ in range(w * h * 3))
    a = len(encode_jpeg_rgb(w, h, px, qt=STD_LUMA_QT, subsample="444"))
    b = len(encode_jpeg_rgb(w, h, px, qt=STD_LUMA_QT, subsample="420"))
    assert b < a  # half the chroma blocks must show up in the bytes


def test_restart_markers_roundtrip():
    """DRI/RSTn: flat multi-block image with restart interval 2 — the
    decoder must byte-align at each marker, verify RSTn, and reset DC
    predictors exactly when the encoder did."""
    from aether_firebase_consumer_spark.operators.jpeg_codec import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )
    vals = [10, 250, 30, 200, 90, 60]
    w, h = 48, 8  # 6 MCUs in a row
    px = bytearray(w * h)
    for bi, v in enumerate(vals):
        for y in range(8):
            for x in range(8):
                px[y * w + bi * 8 + x] = v
    jpg = encode_jpeg_gray(w, h, bytes(px), restart_interval=2)
    assert b"\xff\xdd" in jpg          # DRI present
    assert jpg.count(b"\xff\xd0") + jpg.count(b"\xff\xd1") \
        + jpg.count(b"\xff\xd2") >= 2  # RSTn markers in the scan
    assert decode_jpeg_gray(jpg) == (w, h, bytes(px))


def test_restart_markers_random_content():
    import random
    from aether_firebase_consumer_spark.operators.jpeg_codec import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )
    rng = random.Random(21)
    w, h = 32, 16
    px = bytes(rng.randrange(256) for _ in range(w * h))
    jpg = encode_jpeg_gray(w, h, px, restart_interval=3)
    gw, gh, out = decode_jpeg_gray(jpg)
    assert (gw, gh) == (w, h)
    assert psnr(px, out) > 40


def test_fill_bytes_before_markers_tolerated():
    """T.81 B.1.1.2: 0xFF fill bytes may precede any marker; the
    parser must skip them instead of misreading segment lengths
    (code-review finding)."""
    px = bytes([88] * 64)
    jpg = encode_jpeg_gray(8, 8, px)
    # inject fill bytes after SOI and before SOF0
    sof = jpg.find(b"\xff\xc0")
    padded = jpg[:2] + b"\xff\xff" + jpg[2:sof] + b"\xff" + jpg[sof:]
    assert decode_jpeg_gray(padded) == (8, 8, px)


def test_partial_sos_raises_clear_error():
    """SOS covering fewer components than SOF (non-interleaved
    multi-scan) must raise ValueError, not KeyError."""
    from aether_firebase_consumer_spark.operators.jpeg_codec import (
        decode_jpeg,
        encode_jpeg_rgb,
    )
    jpg = bytearray(encode_jpeg_rgb(8, 8, bytes([1, 2, 3] * 64)))
    sos = jpg.find(b"\xff\xda")
    # rewrite SOS: ns=1, only component 1
    jpg[sos:sos + 14] = b"\xff\xda\x00\x08\x01\x01\x00\x00\x3f\x00" \
        + jpg[sos + 14:sos + 18]
    with pytest.raises(ValueError, match="SOS|component|multi-scan"):
        decode_jpeg(bytes(jpg[:sos + 10]) + bytes(jpg[sos + 10:]))
