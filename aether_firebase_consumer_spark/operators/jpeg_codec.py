"""Pure-Python baseline JPEG codec (grayscale, ITU T.81 Annex K
tables) — no PIL, stdlib only.

Completes the native image-codec family (PPM/PNG/BMP/GIF): the decoder
handles the real baseline pipeline — marker parse, DQT/DHT table load,
Huffman bitstream decode with 0xFF00 byte-unstuffing, DC prediction,
dequantization, inverse zigzag, 2-D IDCT, level shift + clamp — and the
encoder produces spec-conformant streams the decoder (or any JPEG
reader) consumes.

Scope: baseline sequential DCT (SOF0), single component (grayscale),
8-bit, no restart markers. Color / progressive / restart raise
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


def _extend(v: int, cat: int) -> int:
    """T.81 F.12: map cat-bit magnitude to signed value."""
    if cat == 0:
        return 0
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def encode_jpeg_gray(w: int, h: int, pixels: bytes,
                     qt: list[int] | None = None) -> bytes:
    """Encode 8-bit grayscale pixels (row-major, w*h bytes) as a
    baseline JPEG. ``qt`` is the 64-entry row-major quantization table
    (default: unit table — numerically gentlest; pass STD_LUMA_QT for
    realistic compression). Edge blocks pad by edge replication."""
    if len(pixels) != w * h:
        raise ValueError("pixel buffer does not match w*h")
    qt = qt or FLAT_QT
    dc_codes = _build_codes(DC_BITS, DC_VALS)
    ac_codes = _build_codes(AC_BITS, AC_VALS)
    bw = _BitWriter()
    prev_dc = 0
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            block = []
            for y in range(8):
                sy = min(by + y, h - 1)
                for x in range(8):
                    sx = min(bx + x, w - 1)
                    block.append(float(pixels[sy * w + sx]) - 128.0)
            coef = _dct2(block)
            q = [int(round(coef[i] / qt[i])) for i in range(64)]
            zz = [q[ZIGZAG[i]] for i in range(64)]
            # DC
            diff = zz[0] - prev_dc
            prev_dc = zz[0]
            cat = _category(diff)
            code, length = dc_codes[cat]
            bw.write(code, length)
            if cat:
                mag = diff if diff >= 0 else diff + (1 << cat) - 1
                bw.write(mag, cat)
            # AC with run-lengths
            run = 0
            for i in range(1, 64):
                v = zz[i]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = ac_codes[0xF0]  # ZRL
                    bw.write(code, length)
                    run -= 16
                cat = _category(v)
                code, length = ac_codes[(run << 4) | cat]
                bw.write(code, length)
                mag = v if v >= 0 else v + (1 << cat) - 1
                bw.write(mag, cat)
                run = 0
            if run:
                code, length = ac_codes[0x00]  # EOB
                bw.write(code, length)
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") \
            + payload

    zz_qt = bytes([qt[ZIGZAG[i]] for i in range(64)])
    out = bytearray(b"\xff\xd8")                       # SOI
    out += seg(0xDB, b"\x00" + zz_qt)                  # DQT, table 0
    out += seg(0xC0, b"\x08" + h.to_bytes(2, "big")    # SOF0: 8-bit
               + w.to_bytes(2, "big") + b"\x01"        # 1 component
               + b"\x01\x11\x00")                      # id 1, 1x1, qt 0
    out += seg(0xC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
    out += seg(0xC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    out += seg(0xDA, b"\x01\x01\x00\x00\x3f\x00")      # SOS
    out += bw.out
    out += b"\xff\xd9"                                 # EOI
    return bytes(out)


def decode_jpeg_gray(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline grayscale JPEG: returns (width, height, raw
    8-bit pixels row-major). Parses DQT/DHT from the stream (any
    spec-conformant tables, not just ours); color, progressive, and
    restart-marker streams raise ``ValueError``."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qts: dict[int, list[int]] = {}
    dc_tbl: dict[int, dict] = {}
    ac_tbl: dict[int, dict] = {}
    w = h = None
    comp_qt = 0
    scan = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
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
            if body[5] != 1:
                raise ValueError("only grayscale (1 component) supported")
            if body[7] != 0x11:
                raise ValueError("subsampling not supported for gray")
            comp_qt = body[8]
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
            raise ValueError("restart markers not supported")
        elif marker == 0xDA:
            td, ta = body[2] >> 4, body[2] & 0x0F
            scan_start = pos + 2 + length
            end = payload.rfind(b"\xff\xd9")
            scan = (payload[scan_start:end if end > 0 else len(payload)],
                    td, ta)
            break
        pos += 2 + length
    if w is None or scan is None:
        raise ValueError("JPEG missing SOF0 or SOS")
    data, td, ta = scan
    dc = dc_tbl[td]
    ac = ac_tbl[ta]
    qt = qts[comp_qt]
    br = _BitReader(data)

    def read_huff(tbl: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            if (length, code) in tbl:
                return tbl[(length, code)]
        raise ValueError("invalid Huffman code in scan")

    bw_blocks = (w + 7) // 8
    bh_blocks = (h + 7) // 8
    out = bytearray(w * h)
    prev_dc = 0
    for byi in range(bh_blocks):
        for bxi in range(bw_blocks):
            zz = [0] * 64
            cat = read_huff(dc)
            diff = _extend(br.read_bits(cat), cat) if cat else 0
            prev_dc += diff
            zz[0] = prev_dc
            i = 1
            while i < 64:
                rs = read_huff(ac)
                if rs == 0x00:      # EOB
                    break
                if rs == 0xF0:      # ZRL
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
            px = _idct2(coef)
            for y in range(8):
                sy = byi * 8 + y
                if sy >= h:
                    break
                for x in range(8):
                    sx = bxi * 8 + x
                    if sx >= w:
                        continue
                    v = int(round(px[y * 8 + x] + 128.0))
                    out[sy * w + sx] = 0 if v < 0 else (255 if v > 255 else v)
    return w, h, bytes(out)
