"""Pure-Python baseline JPEG codec (grayscale AND YCbCr color,
ITU T.81 Annex K tables) — no PIL, stdlib only.

Completes the native image-codec family (PPM/PNG/BMP/GIF): the decoder
handles the real baseline pipeline — marker parse, DQT/DHT table load,
Huffman bitstream decode with 0xFF00 byte-unstuffing, DC prediction,
dequantization, inverse zigzag, 2-D IDCT, level shift + clamp — and the
encoder produces spec-conformant streams the decoder (or any JPEG
reader) consumes.

Scope: baseline sequential DCT (SOF0), 1-component grayscale or
3-component YCbCr (4:4:4 and 4:2:0),
8-bit, with DRI/RSTn restart intervals. Progressive streams raise
``ValueError`` with a clear message. JPEG is lossy: round-trips are
near-exact (PSNR-bounded in tests); a FLAT 8x8 block is bit-exact
(DC-only coefficient, integer arithmetic end-to-end), which is what the
oracle-gated query pins.
"""

from __future__ import annotations

import math

# ITU T.81 Annex K.1 — standard luminance quantization table (zigzag
# order NOT applied; row-major 8x8).
STD_LUMA_QT = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

#: unit quantization (lossless-DC) table for exactness-sensitive uses
FLAT_QT = [1] * 64

# Annex K.3.1: luminance DC — BITS (counts per code length 1..16), VALS
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
# Annex K.3.2: luminance AC
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

_C = [1.0 / math.sqrt(2.0)] + [1.0] * 7
_COS = [[math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)]
        for u in range(8)]


def _dct2(block: list[float]) -> list[float]:
    out = [0.0] * 64
    for u in range(8):
        for v in range(8):
            s = 0.0
            for x in range(8):
                cu = _COS[u][x]
                for y in range(8):
                    s += block[x * 8 + y] * cu * _COS[v][y]
            out[u * 8 + v] = 0.25 * _C[u] * _C[v] * s
    return out


def _idct2(coef: list[float]) -> list[float]:
    out = [0.0] * 64
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                cu = _C[u] * _COS[u][x]
                for v in range(8):
                    s += cu * _C[v] * _COS[v][y] * coef[u * 8 + v]
            out[x * 8 + y] = 0.25 * s
    return out


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length) per T.81 C.2 canonical assignment."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _category(v: int) -> int:
    return v.bit_length() if v >= 0 else (-v).bit_length()


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        if self.n:
            self.acc <<= (8 - self.n)
            self.acc |= (1 << (8 - self.n)) - 1  # pad with 1s per spec
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read_bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG bitstream exhausted")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1  # unstuff
                else:
                    raise ValueError("unexpected marker inside scan")
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Consume an RSTn marker: discard pad bits to the byte
        boundary, expect FF D0..D7, continue after it."""
        self.n = 0  # drop remaining pad bits in the current byte
        if (self.pos + 1 < len(self.data)
                and self.data[self.pos] == 0xFF
                and 0xD0 <= self.data[self.pos + 1] <= 0xD7):
            self.pos += 2
            return
        raise ValueError("expected RSTn marker at restart interval")


def _extend(v: int, cat: int) -> int:
    """T.81 F.12: map cat-bit magnitude to signed value."""
    if cat == 0:
        return 0
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def _encode_block(bw: "_BitWriter", samples: list[int], qt: list[int],
                  prev_dc: int, dc_codes: dict, ac_codes: dict) -> int:
    """DCT → quantize → zigzag → Huffman one 8x8 block of level-shifted
    samples; returns the new DC predictor."""
    coef = _dct2([float(s) - 128.0 for s in samples])
    q = [int(round(coef[i] / qt[i])) for i in range(64)]
    zz = [q[ZIGZAG[i]] for i in range(64)]
    diff = zz[0] - prev_dc
    cat = _category(diff)
    code, length = dc_codes[cat]
    bw.write(code, length)
    if cat:
        mag = diff if diff >= 0 else diff + (1 << cat) - 1
        bw.write(mag, cat)
    run = 0
    for i in range(1, 64):
        v = zz[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]
            bw.write(code, length)
            run -= 16
        cat = _category(v)
        code, length = ac_codes[(run << 4) | cat]
        bw.write(code, length)
        mag = v if v >= 0 else v + (1 << cat) - 1
        bw.write(mag, cat)
        run = 0
    if run:
        code, length = ac_codes[0x00]
        bw.write(code, length)
    return zz[0]


def _block_at(plane: "list[int]", w: int, h: int, bx: int,
              by: int) -> list[int]:
    """8x8 block with edge replication for non-multiple-of-8 sizes."""
    out = []
    for y in range(8):
        sy = min(by + y, h - 1)
        for x in range(8):
            out.append(plane[sy * w + min(bx + x, w - 1)])
    return out


def rgb_to_ycbcr(r: int, g: int, b: int) -> tuple[int, int, int]:
    """JFIF (BT.601 full-range) forward transform, rounded with the
    engine's cross-engine-stable floor(x+0.5) convention."""
    y = math.floor(0.299 * r + 0.587 * g + 0.114 * b + 0.5)
    cb = math.floor(128 - 0.168736 * r - 0.331264 * g + 0.5 * b + 0.5)
    cr = math.floor(128 + 0.5 * r - 0.418688 * g - 0.081312 * b + 0.5)
    return _clamp8(y), _clamp8(cb), _clamp8(cr)


def ycbcr_to_rgb(y: int, cb: int, cr: int) -> tuple[int, int, int]:
    r = math.floor(y + 1.402 * (cr - 128) + 0.5)
    g = math.floor(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5)
    b = math.floor(y + 1.772 * (cb - 128) + 0.5)
    return _clamp8(r), _clamp8(g), _clamp8(b)


def _segment(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") \
        + payload


def _frame_headers(w: int, h: int, qt: list[int],
                   components: bytes) -> bytearray:
    """SOI + DQT + SOF0 + the two Annex-K DHT segments — the header
    prefix both encoders share (components = the SOF0 per-component
    id/sampling/qt triples)."""
    zz_qt = bytes([qt[ZIGZAG[i]] for i in range(64)])
    out = bytearray(b"\xff\xd8")
    out += _segment(0xDB, b"\x00" + zz_qt)
    out += _segment(0xC0, b"\x08" + h.to_bytes(2, "big")
                    + w.to_bytes(2, "big")
                    + bytes([len(components) // 3]) + components)
    out += _segment(0xC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
    out += _segment(0xC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    return out


def _clamp8(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def encode_jpeg_rgb(w: int, h: int, rgb: bytes,
                    qt: list[int] | None = None,
                    subsample: str = "444") -> bytes:
    """Encode RGB pixels (row-major, w*h*3) as a baseline COLOR JPEG:
    JFIF YCbCr transform, interleaved MCUs with per-component DC
    predictors. ``subsample``: "444" (one Y/Cb/Cr block per MCU) or
    "420" (the real-world default layout: 16x16 MCUs of four Y blocks
    plus one 2x2-box-averaged Cb and Cr block — half the chroma
    bytes). All three components reference the same Huffman/quant
    tables (spec-legal, keeps the jar-free codec small); any
    conformant decoder reads the result."""
    if len(rgb) != w * h * 3:
        raise ValueError("pixel buffer does not match w*h*3")
    if subsample not in ("444", "420"):
        raise ValueError("subsample must be '444' or '420'")
    qt = qt or FLAT_QT
    planes: list[list[int]] = [[0] * (w * h) for _ in range(3)]
    for i in range(w * h):
        y, cb, cr = rgb_to_ycbcr(rgb[i * 3], rgb[i * 3 + 1], rgb[i * 3 + 2])
        planes[0][i], planes[1][i], planes[2][i] = y, cb, cr
    dc_codes = _build_codes(DC_BITS, DC_VALS)
    ac_codes = _build_codes(AC_BITS, AC_VALS)
    bw = _BitWriter()
    prev = [0, 0, 0]
    if subsample == "444":
        luma_sampling = b"\x11"
        for by in range(0, h, 8):
            for bx in range(0, w, 8):
                for c in range(3):  # interleaved MCU: Y, Cb, Cr
                    prev[c] = _encode_block(
                        bw, _block_at(planes[c], w, h, bx, by), qt,
                        prev[c], dc_codes, ac_codes)
    else:
        luma_sampling = b"\x22"
        cw, chh = -(-w // 2), -(-h // 2)
        chroma = [[0] * (cw * chh), [0] * (cw * chh)]
        for cy in range(chh):
            for cx in range(cw):
                for k in (1, 2):  # 2x2 box average, edge-replicated
                    s = 0
                    for dy in (0, 1):
                        sy = min(cy * 2 + dy, h - 1)
                        for dx in (0, 1):
                            sx = min(cx * 2 + dx, w - 1)
                            s += planes[k][sy * w + sx]
                    chroma[k - 1][cy * cw + cx] = (s + 2) // 4
        for by in range(0, h, 16):
            for bx in range(0, w, 16):
                for (dy, dx) in ((0, 0), (0, 8), (8, 0), (8, 8)):
                    prev[0] = _encode_block(
                        bw, _block_at(planes[0], w, h, bx + dx, by + dy),
                        qt, prev[0], dc_codes, ac_codes)
                for c in (1, 2):
                    prev[c] = _encode_block(
                        bw, _block_at(chroma[c - 1], cw, chh,
                                      bx // 2, by // 2),
                        qt, prev[c], dc_codes, ac_codes)
    bw.flush()
    out = _frame_headers(w, h, qt,
                         b"\x01" + luma_sampling + b"\x00"
                         + b"\x02\x11\x00" + b"\x03\x11\x00")
    out += _segment(0xDA, b"\x03\x01\x00\x02\x00\x03\x00\x00\x3f\x00")
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_gray(w: int, h: int, pixels: bytes,
                     qt: list[int] | None = None,
                     restart_interval: int = 0) -> bytes:
    """Encode 8-bit grayscale pixels (row-major, w*h bytes) as a
    baseline JPEG. ``qt`` is the 64-entry row-major quantization table
    (default: unit table — numerically gentlest; pass STD_LUMA_QT for
    realistic compression). Edge blocks pad by edge replication.
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (DC predictors reset) — the layout camera/encoder
    pipelines use for error resilience."""
    if len(pixels) != w * h:
        raise ValueError("pixel buffer does not match w*h")
    qt = qt or FLAT_QT
    dc_codes = _build_codes(DC_BITS, DC_VALS)
    ac_codes = _build_codes(AC_BITS, AC_VALS)
    bw = _BitWriter()
    prev_dc = 0
    plane = list(pixels)
    mcu_i = 0
    rst_i = 0
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            if restart_interval and mcu_i \
                    and mcu_i % restart_interval == 0:
                bw.flush()  # byte-align (pad bits), then the marker
                bw.out += bytes([0xFF, 0xD0 + (rst_i % 8)])
                rst_i += 1
                prev_dc = 0
            mcu_i += 1
            prev_dc = _encode_block(bw, _block_at(plane, w, h, bx, by),
                                    qt, prev_dc, dc_codes, ac_codes)
    bw.flush()
    out = _frame_headers(w, h, qt, b"\x01\x11\x00")
    if restart_interval:
        out += _segment(0xDD, restart_interval.to_bytes(2, "big"))
    out += _segment(0xDA, b"\x01\x01\x00\x00\x3f\x00")
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def decode_jpeg(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline JPEG: returns (width, height, n_components,
    raw pixels row-major — grayscale bytes for 1 component, RGB bytes
    for 3 components via the JFIF inverse transform). Parses DQT/DHT
    from the stream (any spec-conformant tables, not just ours);
    handles 4:2:0/4:2:2 chroma subsampling (nearest upsample), DRI
    restart intervals, and 0xFF marker fill bytes; progressive and
    non-interleaved multi-scan streams raise ``ValueError``."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qts: dict[int, list[int]] = {}
    dc_tbl: dict[int, dict] = {}
    ac_tbl: dict[int, dict] = {}
    w = h = None
    comps: list[tuple] = []  # (component id, h_i, v_i, qt id) in SOF order
    restart_interval = 0
    scan = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker; skip them (some hardware encoders emit padding)
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        length = int.from_bytes(payload[pos + 2:pos + 4], "big")
        body = payload[pos + 4:pos + 2 + length]
        if marker == 0xDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq:
                    raise ValueError("16-bit quant tables not supported")
                zz = list(body[i + 1:i + 65])
                qt = [0] * 64
                for k in range(64):
                    qt[ZIGZAG[k]] = zz[k]
                qts[tq] = qt
                i += 65
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xC0:
            if body[0] != 8:
                raise ValueError("only 8-bit precision supported")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            n = body[5]
            if n not in (1, 3):
                raise ValueError(f"{n}-component JPEG not supported")
            for c in range(n):
                cid, sampling, tq = body[6 + c * 3:9 + c * 3]
                hi, vi = sampling >> 4, sampling & 0x0F
                if hi not in (1, 2) or vi not in (1, 2):
                    raise ValueError(
                        f"sampling factor {hi}x{vi} not supported "
                        "(4:4:4 / 4:2:0 / 4:2:2)")
                comps.append((cid, hi, vi, tq))
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1:i + 17])
                n = sum(bits)
                vals = list(body[i + 17:i + 17 + n])
                (ac_tbl if tc else dc_tbl)[th] = _build_decode(bits, vals)
                i += 17 + n
        elif marker == 0xDD:
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:
            ns = body[0]
            tables = {}
            for c in range(ns):
                cid, tt = body[1 + c * 2], body[2 + c * 2]
                tables[cid] = (tt >> 4, tt & 0x0F)
            scan_start = pos + 2 + length
            end = payload.rfind(b"\xff\xd9")
            scan = (payload[scan_start:end if end > 0 else len(payload)],
                    tables)
            break
        pos += 2 + length
    if w is None or scan is None or not comps:
        raise ValueError("JPEG missing SOF0 or SOS")
    data, sos_tables = scan
    br = _BitReader(data)

    def read_huff(tbl: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            if (length, code) in tbl:
                return tbl[(length, code)]
        raise ValueError("invalid Huffman code in scan")

    def read_block(dc: dict, ac: dict, qt: list[int],
                   prev_dc: int) -> tuple[list[float], int]:
        zz = [0] * 64
        cat = read_huff(dc)
        diff = _extend(br.read_bits(cat), cat) if cat else 0
        prev_dc += diff
        zz[0] = prev_dc
        i = 1
        while i < 64:
            rs = read_huff(ac)
            if rs == 0x00:
                break
            if rs == 0xF0:
                i += 16
                continue
            run, cat = rs >> 4, rs & 0x0F
            i += run
            if i > 63:
                raise ValueError("AC run overflows block")
            zz[i] = _extend(br.read_bits(cat), cat)
            i += 1
        coef = [0.0] * 64
        for k in range(64):
            coef[ZIGZAG[k]] = zz[k] * qt[ZIGZAG[k]]
        return _idct2(coef), prev_dc

    n_comp = len(comps)
    if set(sos_tables) != {c[0] for c in comps}:
        raise ValueError(
            "non-interleaved multi-scan JPEG not supported (SOS must "
            "cover every SOF component)")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    # per-component plane dimensions (ceil-scaled by sampling ratio)
    dims = [(-(-w * hi // hmax), -(-h * vi // vmax))
            for (_, hi, vi, _) in comps]
    mcu_cols = -(-w // (8 * hmax))
    mcu_rows = -(-h // (8 * vmax))
    planes = [[0] * (cw * chh) for (cw, chh) in dims]
    prev = [0] * n_comp
    mcu_i = 0
    for myi in range(mcu_rows):
        for mxi in range(mcu_cols):
            if restart_interval and mcu_i \
                    and mcu_i % restart_interval == 0:
                # DRI: byte-align, consume RSTn, reset DC predictors
                br.sync_restart()
                prev = [0] * n_comp
            mcu_i += 1
            for ci, (cid, hi, vi, tq) in enumerate(comps):
                td, ta = sos_tables[cid]
                cw, chh = dims[ci]
                for bv in range(vi):
                    for bh_ in range(hi):
                        px, prev[ci] = read_block(
                            dc_tbl[td], ac_tbl[ta], qts[tq], prev[ci])
                        oy = (myi * vi + bv) * 8
                        ox = (mxi * hi + bh_) * 8
                        plane = planes[ci]
                        for y in range(8):
                            sy = oy + y
                            if sy >= chh:
                                break
                            for x in range(8):
                                sx = ox + x
                                if sx >= cw:
                                    continue
                                v = int(round(px[y * 8 + x] + 128.0))
                                plane[sy * cw + sx] = \
                                    0 if v < 0 else (255 if v > 255 else v)
    if n_comp == 1:
        return w, h, 1, bytes(planes[0])
    out = bytearray(w * h * 3)
    for y in range(h):
        for x in range(w):
            vals = []
            for ci in range(3):
                _, hi, vi, _ = comps[ci]
                cw, chh = dims[ci]
                # nearest-neighbor chroma upsample
                sx = min(x * hi // hmax, cw - 1)
                sy = min(y * vi // vmax, chh - 1)
                vals.append(planes[ci][sy * cw + sx])
            r, g, b = ycbcr_to_rgb(*vals)
            i = y * w + x
            out[i * 3], out[i * 3 + 1], out[i * 3 + 2] = r, g, b
    return w, h, 3, bytes(out)


def decode_jpeg_gray(payload: bytes) -> tuple[int, int, bytes]:
    """Single-component wrapper over :func:`decode_jpeg` (the original
    grayscale API): raises for color streams."""
    w, h, n, raw = decode_jpeg(payload)
    if n != 1:
        raise ValueError("color JPEG: use decode_jpeg")
    return w, h, raw
