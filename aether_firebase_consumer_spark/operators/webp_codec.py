"""Pure-Python WebP-lossless (VP8L) codec (stdlib only).

Implements the subset of the public WebP lossless bitstream
specification (developers.google.com/speed/webp/docs/webp_lossless_
bitstream_specification, RFC 9649) that covers archival RGBA storage,
the way ``flac_codec``/``image_codecs`` implement their formats:

- container: RIFF / WEBP / VP8L chunk, signature 0x2F, 14-bit
  dimensions;
- entropy coding: canonical prefix codes in both spec forms — the
  "simple" 1/2-symbol form and the full form whose code lengths are
  themselves prefix-coded with the 19-symbol code-length alphabet
  (DEFLATE-style 16/17/18 repeat codes, spec symbol order);
- spatial coding: the five prefix codes (green+length+cache, red,
  blue, alpha, distance), LZ77 backward references with the spec's
  2D distance mapping and extra-bit prefix values, and the color
  cache (32-bit ARGB, multiplicative hash);
- transforms (decode): SUBTRACT-GREEN and COLOR-INDEXING (palette as
  a recursively decoded 1×N sub-image, including the packed-pixel
  widths for ≤16-color palettes). The PREDICTOR and cross-COLOR
  transforms require entropy-image recursion this subset does not
  emit; they raise a clear error — the honest boundary, like the
  JPEG/TIFF/FLAC codecs'.
- encoder: literal pixels + greedy LZ77 + optional subtract-green,
  per-channel canonical prefix codes built from real histograms (no
  meta prefix images, no color cache).

Bit order per spec: the stream packs bits LSB-first; prefix-code
bits are read most-significant-code-bit first. Round trips are
property-tested; the decoder is additionally anchored on hand-built
spec bitstreams (tests/test_webp_codec.py), so both directions are
pinned independently of each other.
"""

from __future__ import annotations

import struct

__all__ = ["encode_webp_lossless", "decode_webp_lossless"]


# ------------------------------------------------------------- bits

class _LBitWriter:
    """LSB-first bit packer (VP8L convention)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, bits: int) -> None:
        """Write ``bits`` low bits of value, LSB first."""
        self._acc |= (value & ((1 << bits) - 1)) << self._n
        self._n += bits
        while self._n >= 8:
            self.buf.append(self._acc & 0xFF)
            self._acc >>= 8
            self._n -= 8

    def write_code(self, code: int, length: int) -> None:
        """Write a prefix code: most significant code bit first."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def done(self) -> bytes:
        if self._n:
            self.buf.append(self._acc & 0xFF)
            self._acc, self._n = 0, 0
        return bytes(self.buf)


class _LBitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0   # bit position

    def read(self, bits: int) -> int:
        out = 0
        for i in range(bits):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("vp8l: bitstream truncated")
            out |= ((self.data[byte] >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return out


# --------------------------------------------------- canonical codes

def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) per the canonical rule (shorter codes
    first, ties by symbol order) — the same rule as DEFLATE/the spec."""
    pairs = sorted((l, s) for s, l in enumerate(lengths) if l > 0)
    codes = {}
    code = 0
    prev_len = 0
    for l, s in pairs:
        code <<= (l - prev_len)
        codes[s] = (code, l)
        code += 1
        prev_len = l
    return codes


class _PrefixDecoder:
    """Bit-at-a-time canonical decoder (code extends MSB-first). A
    single-symbol code consumes ZERO bits per read, per the spec."""

    def __init__(self, lengths: list[int]) -> None:
        used = [s for s, l in enumerate(lengths) if l > 0]
        if not used:
            raise ValueError("vp8l: empty prefix code")
        self.single = used[0] if len(used) == 1 else None
        self.map = {(c, l): s
                    for s, (c, l) in _canonical_codes(lengths).items()}
        self.max_len = max(l for _c, l in self.map)

    def read(self, br: _LBitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for l in range(1, self.max_len + 1):
            code = (code << 1) | br.read(1)
            sym = self.map.get((code, l))
            if sym is not None:
                return sym
        raise ValueError("vp8l: invalid prefix code in stream")


def _build_lengths(freqs: list[int], max_len: int = 15) -> list[int]:
    """Deterministic length-limited prefix-code lengths from counts:
    Huffman by (weight, min-symbol) tiebreak, flattened if any length
    exceeds ``max_len`` (correctness never depends on optimality)."""
    syms = [s for s, f in enumerate(freqs) if f > 0]
    n = len(freqs)
    if not syms:
        return [0] * n
    if len(syms) == 1:
        out = [0] * n
        out[syms[0]] = 1
        return out
    import heapq
    heap = [(freqs[s], s, ("leaf", s)) for s in syms]
    heapq.heapify(heap)
    seq = n
    while len(heap) > 1:
        f1, t1, n1 = heapq.heappop(heap)
        f2, t2, n2 = heapq.heappop(heap)
        heapq.heappush(heap, (f1 + f2, seq, ("node", n1, n2)))
        seq += 1
    out = [0] * n

    def walk(node, depth):
        if node[0] == "leaf":
            out[node[1]] = max(depth, 1)
        else:
            walk(node[1], depth + 1)
            walk(node[2], depth + 1)

    walk(heap[0][2], 0)
    if max(out) > max_len:
        # flatten: fixed-length code over the used symbols
        bits = max(1, (len(syms) - 1).bit_length())
        out = [0] * n
        for s in syms:
            out[s] = bits
        # a fixed-length code is always a valid (complete or
        # over-complete-free) canonical code when 2^bits >= len(syms)
    return out


# VP8L code-length alphabet symbol order (spec kCodeLengthCodeOrder)
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10,
              11, 12, 13, 14, 15)


def _write_prefix_code(bw: _LBitWriter, lengths: list[int]) -> None:
    """Emit one prefix code per the spec: simple form for ≤2 symbols,
    else the full code-length-coded form (no 16/17/18 repeats — plain
    literal lengths; valid, just not maximally compact)."""
    used = [s for s, l in enumerate(lengths) if l > 0]
    if 1 <= len(used) <= 2 and max(used) < 256:
        bw.write(1, 1)                   # simple code
        bw.write(len(used) - 1, 1)       # num symbols - 1
        if used[0] < 2 and len(used) == 1:
            bw.write(0, 1)               # first symbol in 1 bit
            bw.write(used[0], 1)
        else:
            bw.write(1, 1)               # first symbol in 8 bits
            bw.write(used[0], 8)
        if len(used) == 2:
            bw.write(used[1], 8)
        return
    bw.write(0, 1)                       # normal code
    # code-length code: this encoder emits plain literal lengths (no
    # 16/17/18 repeats), so the CLC frequencies are just length counts
    freqs = [0] * 19
    for l in lengths:
        freqs[l] += 1
    cl_lengths = _build_lengths(freqs, max_len=7)
    # num_code_lengths: how many CLC_ORDER entries we transmit
    num = 19
    while num > 4 and cl_lengths[_CLC_ORDER[num - 1]] == 0:
        num -= 1
    bw.write(num - 4, 4)
    for i in range(num):
        bw.write(cl_lengths[_CLC_ORDER[i]], 3)
    codes = _canonical_codes(cl_lengths)
    bw.write(0, 1)                       # no max_symbol shortcut
    for l in lengths:
        c, cl = codes[l]
        bw.write_code(c, cl)


def _read_prefix_code(br: _LBitReader, alphabet_size: int
                      ) -> _PrefixDecoder:
    if br.read(1):                       # simple code
        nsym = br.read(1) + 1
        if br.read(1):
            first = br.read(8)
        else:
            first = br.read(1)
        lengths = [0] * alphabet_size
        if nsym == 1:
            lengths[first] = 1
        else:
            second = br.read(8)
            lengths[first] = 1
            lengths[second] = 1
        return _PrefixDecoder(lengths)
    num = br.read(4) + 4
    cl_lengths = [0] * 19
    for i in range(num):
        cl_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _PrefixDecoder(cl_lengths)
    use_max = br.read(1)
    if use_max:
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = br.read(length_nbits) + 2
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    i = 0
    while i < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        sym = clc.read(br)
        if sym < 16:
            lengths[i] = sym
            i += 1
            if sym:
                prev = sym
        elif sym == 16:
            for _ in range(br.read(2) + 3):
                if i < alphabet_size:
                    lengths[i] = prev
                    i += 1
        elif sym == 17:
            i += br.read(3) + 3
        else:                            # 18
            i += br.read(7) + 11
    return _PrefixDecoder(lengths)


# --------------------------------------------------- LZ77 helpers

#: the spec's 2D distance map for codes 1..120: (dx, dy) neighborhood
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]


def _dist_to_plane(dist: int, width: int) -> int:
    """Physical distance → coded distance: the first table entry whose
    (dx, dy) neighborhood offset realizes ``dist`` at this width, else
    the plain form ``dist + 120`` (always valid)."""
    for i, (dx, dy) in enumerate(_DIST_MAP):
        if dy * width + dx == dist:
            return i + 1
    return dist + 120


def _plane_to_dist(code: int, width: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    return max(1, dy * width + dx)


def _prefix_value(br: _LBitReader, sym: int) -> int:
    """Length/distance prefix symbol → value (spec extra-bits rule)."""
    if sym < 4:
        return sym + 1
    extra = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra
    return offset + br.read(extra) + 1


def _value_to_prefix(value: int) -> tuple[int, int, int]:
    """value → (symbol, extra_bits_value, extra_bits_count) — exact
    inverse of :func:`_prefix_value`."""
    if value <= 4:
        return value - 1, 0, 0
    w = value - 1                    # w ≥ 4
    extra = w.bit_length() - 2
    second = (w >> extra) & 1
    offset = (2 + second) << extra
    return 2 * extra + 2 + second, w - offset, extra


# ------------------------------------------------------------ encode

def _cache_hash(argb: int, bits: int) -> int:
    return ((argb * 0x1E35A7BD) & 0xFFFFFFFF) >> (32 - bits)


def encode_webp_lossless(width: int, height: int, rgba: bytes,
                         use_subtract_green: bool = True) -> bytes:
    """Encode RGBA bytes (len = w*h*4) as a lossless WebP: optional
    subtract-green transform, greedy LZ77 over ARGB pixels, canonical
    per-channel prefix codes, no color cache / meta codes."""
    if len(rgba) != width * height * 4:
        raise ValueError("rgba length must be width*height*4")
    if not (1 <= width <= 1 << 14 and 1 <= height <= 1 << 14):
        raise ValueError("vp8l: dimensions out of range")
    pix = []
    for i in range(0, len(rgba), 4):
        r, g, b, a = rgba[i], rgba[i + 1], rgba[i + 2], rgba[i + 3]
        if use_subtract_green:
            r = (r - g) & 0xFF
            b = (b - g) & 0xFF
        pix.append((a << 24) | (r << 16) | (g << 8) | b)

    # greedy LZ77 over pixels (match ≥3, window 2^20 per spec region)
    tokens = []           # ("lit", pixel) | ("copy", length, dist)
    table: dict[int, int] = {}
    i = 0
    n = len(pix)
    while i < n:
        cand = table.get(pix[i])
        if cand is not None and i - cand <= (1 << 20) - 120:
            ml = 0
            while (i + ml < n and pix[cand + ml] == pix[i + ml]
                   and ml < 4096):
                ml += 1
            if ml >= 3:
                tokens.append(("copy", ml, i - cand))
                for k in range(ml):
                    table[pix[i + k]] = i + k
                i += ml
                continue
        table[pix[i]] = i
        tokens.append(("lit", pix[i]))
        i += 1

    gfreq = [0] * 280
    rfreq = [0] * 256
    bfreq = [0] * 256
    afreq = [0] * 256
    dfreq = [0] * 40
    for t in tokens:
        if t[0] == "lit":
            p = t[1]
            gfreq[(p >> 8) & 0xFF] += 1
            rfreq[(p >> 16) & 0xFF] += 1
            bfreq[p & 0xFF] += 1
            afreq[(p >> 24) & 0xFF] += 1
        else:
            lsym, _lv, _lb = _value_to_prefix(t[1])
            gfreq[256 + lsym] += 1
            dcode = _dist_to_plane(t[2], width)
            dsym, _dv, _db = _value_to_prefix(dcode)
            dfreq[dsym] += 1
    if not any(rfreq):
        rfreq[0] = 1
    if not any(bfreq):
        bfreq[0] = 1
    if not any(afreq):
        afreq[0] = 1
    if not any(dfreq):
        dfreq[0] = 1

    bw = _LBitWriter()
    bw.write(0x2F, 8)                    # VP8L signature
    bw.write(width - 1, 14)
    bw.write(height - 1, 14)
    bw.write(0, 1)                       # alpha hint
    bw.write(0, 3)                       # version
    if use_subtract_green:
        bw.write(1, 1)                   # transform present
        bw.write(2, 2)                   # SUBTRACT_GREEN
    bw.write(0, 1)                       # no more transforms
    bw.write(0, 1)                       # no color cache
    bw.write(0, 1)                       # no meta prefix codes
    lengths = [_build_lengths(gfreq), _build_lengths(rfreq),
               _build_lengths(bfreq), _build_lengths(afreq),
               _build_lengths(dfreq)]
    for ls in lengths:
        _write_prefix_code(bw, ls)
    codes = []
    for ls in lengths:
        c = _canonical_codes(ls)
        if len(c) == 1:
            # single-symbol codes cost ZERO bits on the wire (spec)
            c = {s: (0, 0) for s in c}
        codes.append(c)
    gc, rc, bc, ac, dc = codes
    for t in tokens:
        if t[0] == "lit":
            p = t[1]
            c, l = gc[(p >> 8) & 0xFF]
            bw.write_code(c, l)
            c, l = rc[(p >> 16) & 0xFF]
            bw.write_code(c, l)
            c, l = bc[p & 0xFF]
            bw.write_code(c, l)
            c, l = ac[(p >> 24) & 0xFF]
            bw.write_code(c, l)
        else:
            lsym, lv, lb = _value_to_prefix(t[1])
            c, l = gc[256 + lsym]
            bw.write_code(c, l)
            if lb:
                bw.write(lv, lb)
            dcode = _dist_to_plane(t[2], width)
            dsym, dv, db = _value_to_prefix(dcode)
            c, l = dc[dsym]
            bw.write_code(c, l)
            if db:
                bw.write(dv, db)
    payload = bw.done()
    vp8l = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    if len(payload) & 1:
        vp8l += b"\x00"
    riff = b"WEBP" + vp8l
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff


# ------------------------------------------------------------ decode

def _decode_pixels(br: _LBitReader, width: int, height: int,
                   allow_cache: bool = True) -> list[int]:
    """One spatially-coded VP8L image region → ARGB pixel list."""
    cache_bits = 0
    if allow_cache and br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"vp8l: bad color-cache bits {cache_bits}")
    if br.read(1):
        raise ValueError("vp8l: meta prefix codes not supported "
                         "(this codec: single code group)")
    cache = [0] * (1 << cache_bits) if cache_bits else None
    gdec = _read_prefix_code(br, 256 + 24 + (1 << cache_bits
                                             if cache_bits else 0))
    rdec = _read_prefix_code(br, 256)
    bdec = _read_prefix_code(br, 256)
    adec = _read_prefix_code(br, 256)
    ddec = _read_prefix_code(br, 40)
    n = width * height
    out: list[int] = []
    while len(out) < n:
        g = gdec.read(br)
        if g < 256:
            r = rdec.read(br)
            b = bdec.read(br)
            a = adec.read(br)
            px = (a << 24) | (r << 16) | (g << 8) | b
            out.append(px)
            if cache is not None:
                cache[_cache_hash(px, cache_bits)] = px
        elif g < 280:
            length = _prefix_value(br, g - 256)
            dsym = ddec.read(br)
            dcode = _prefix_value(br, dsym)
            dist = _plane_to_dist(dcode, width)
            if dist > len(out):
                raise ValueError("vp8l: backward reference before "
                                 "image start")
            for _ in range(length):
                px = out[-dist]
                out.append(px)
                if cache is not None:
                    cache[_cache_hash(px, cache_bits)] = px
        else:
            if cache is None:
                raise ValueError("vp8l: cache symbol without cache")
            out.append(cache[g - 280])
    if len(out) != n:
        raise ValueError("vp8l: pixel count overrun")
    return out


def decode_webp_lossless(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a lossless WebP → (width, height, RGBA bytes).
    Supports the SUBTRACT-GREEN and COLOR-INDEXING transforms; the
    PREDICTOR/COLOR transforms raise a clear error."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("webp: not a RIFF/WEBP container")
    pos = 12
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        if cid == b"VP8L":
            data = payload[pos + 8:pos + 8 + size]
            break
        if cid in (b"VP8 ", b"VP8X"):
            raise ValueError(
                "webp: lossy/extended WebP not supported (this codec: "
                "VP8L lossless)")
        pos += 8 + size + (size & 1)
    if data is None:
        raise ValueError("webp: no VP8L chunk")
    br = _LBitReader(data)
    if br.read(8) != 0x2F:
        raise ValueError("vp8l: bad signature byte")
    width = br.read(14) + 1
    height = br.read(14) + 1
    br.read(1)                           # alpha hint
    if br.read(3) != 0:
        raise ValueError("vp8l: unsupported version")
    transforms = []
    palette = None
    eff_width = width
    while br.read(1):
        ttype = br.read(2)
        if ttype == 2:                   # SUBTRACT_GREEN
            transforms.append(("subtract_green",))
        elif ttype == 3:                 # COLOR_INDEXING
            psize = br.read(8) + 1
            pal_px = _decode_pixels(br, psize, 1, allow_cache=True)
            # palette entries are component-wise delta-coded
            palette = []
            prev = 0
            for p in pal_px:
                cur = 0
                for shift in (0, 8, 16, 24):
                    comp = (((prev >> shift) & 0xFF)
                            + ((p >> shift) & 0xFF)) & 0xFF
                    cur |= comp << shift
                palette.append(cur)
                prev = cur
            if psize <= 2:
                eff_width = (width + 7) // 8
                pack = 8
            elif psize <= 4:
                eff_width = (width + 3) // 4
                pack = 4
            elif psize <= 16:
                eff_width = (width + 1) // 2
                pack = 2
            else:
                pack = 1
            transforms.append(("palette", palette, pack))
        else:
            raise ValueError(
                "vp8l: predictor/color transforms not supported "
                "(this codec: subtract-green + color-indexing)")
    pix = _decode_pixels(br, eff_width, height)
    # undo transforms in reverse order
    for t in reversed(transforms):
        if t[0] == "palette":
            _pal, pack = t[1], t[2]
            out = []
            if pack == 1:
                for p in pix:
                    idx = (p >> 8) & 0xFF
                    if idx >= len(_pal):
                        raise ValueError("vp8l: palette index out of "
                                         "range")
                    out.append(_pal[idx])
            else:
                bits = 8 // pack
                mask = (1 << bits) - 1
                for y in range(height):
                    row = pix[y * eff_width:(y + 1) * eff_width]
                    cnt = 0
                    for p in row:
                        packed = (p >> 8) & 0xFF
                        for k in range(pack):
                            if cnt >= width:
                                break
                            idx = (packed >> (k * bits)) & mask
                            if idx >= len(_pal):
                                raise ValueError(
                                    "vp8l: palette index out of range")
                            out.append(_pal[idx])
                            cnt += 1
            pix = out
        elif t[0] == "subtract_green":
            out = []
            for p in pix:
                g = (p >> 8) & 0xFF
                r = (((p >> 16) & 0xFF) + g) & 0xFF
                b = ((p & 0xFF) + g) & 0xFF
                out.append((p & 0xFF000000) | (r << 16) | (g << 8) | b)
            pix = out
    if len(pix) != width * height:
        raise ValueError("vp8l: decoded pixel count mismatch")
    rgba = bytearray()
    for p in pix:
        rgba += bytes(((p >> 16) & 0xFF, (p >> 8) & 0xFF,
                       p & 0xFF, (p >> 24) & 0xFF))
    return width, height, bytes(rgba)
