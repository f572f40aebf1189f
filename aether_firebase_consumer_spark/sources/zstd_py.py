"""Pure-Python Zstandard codec (stdlib only): a complete RFC 8878
decoder and a compressing encoder (LZ77 match search + Huffman
literals + predefined-FSE sequences), plus the XXH64 hash the frame
checksum requires.

Kafka record batches (magic 2) mark compression in the batch
attributes' low bits; codec id 4 is zstd, and what brokers ship is the
standard Zstandard FRAME (magic 0xFD2FB528). The image has no zstd
bindings, so this module implements the format from the public
specification — RFC 8878 (datatracker.ietf.org/doc/html/rfc8878) and
the xxHash spec (github.com/Cyan4973/xxHash/blob/dev/doc/
xxhash_spec.md) — completing the codec matrix `snappy_py` and
`lz4_py` started: the jar-free Kafka stack now decodes every codec
real brokers commonly serve (none/gzip/snappy/lz4/zstd).

Decoder scope (everything a conforming encoder may emit):

- frames: header descriptor (all FCS field sizes, single-segment,
  dictionary-id fields rejected explicitly), raw / RLE / compressed
  blocks, content checksum (low 32 bits of XXH64), skippable frames,
  concatenated frames;
- literals: raw, RLE, Huffman-compressed (1- and 4-stream), and
  treeless (reusing the previous table) — with Huffman tree
  descriptions in both direct 4-bit-weight and FSE-compressed form
  (two interleaved states, backward bitstream);
- sequences: predefined / RLE / FSE-compressed / repeat table modes
  for all three of literal-length, offset, and match-length codes,
  the three-state interleaved backward bitstream, full repeat-offset
  semantics (including the ``litLength == 0`` shifted cases and the
  ``rep1 - 1`` corner), and cross-block table/offset persistence.

The ENCODER (round 8) emits, per 128 KiB chunk, the smallest of four
block shapes: RLE (one repeated byte), an LZ Compressed_Block (greedy
hash-of-4 match search → literals + (literal_len, match_len, offset)
sequences encoded with the spec's PREDEFINED FSE tables — mode byte
0x00, no table descriptions on the wire — as three interleaved
backward FSE states mirroring the decoder exactly), a literals-only
Compressed_Block (order-0 Huffman: length-limited canonical codes via
boundary package-merge, tree description in the direct 4-bit-weight
form when the last present byte is ≤ 128 and the FSE-compressed
two-state weight form otherwise), or a raw block. Repetitive payloads
shrink 10-100×, JSON ~5×, plain text entropy-bound ~2×; a cluster's
JVM path still ships zstd-jni for throughput — this tier exists so
jar-free codec-4 PRODUCE gets a real ratio (the decoder already reads
everything brokers serve). Output is a fully conforming frame the
reference decoder accepts (golden-tested against the reference CLI
when one is on PATH — building the sequence encoder this way exposed
and fixed a literal-length code-table transcription bug in the
DECODER: RFC table row 24 (baseline 48) was missing, shifting codes
≥ 24), with a 4-or-8-byte frame content size and an XXH64 content
checksum.

Decoding tables (FSE spread/step, Huffman canonical layout, the
literal-length / match-length / offset code baselines and the
predefined distributions) follow RFC 8878 §3.1.1.3.2 and §4 exactly;
fixed spec-built vectors in tests/test_zstd_py.py pin each layer
independently of the round-trip tests.
"""

from __future__ import annotations

import struct

__all__ = ["xxh64", "compress", "decompress"]

MAGIC = 0xFD2FB528
_SKIPPABLE_LO = 0x184D2A50
_SKIPPABLE_HI = 0x184D2A5F

# ----------------------------------------------------------- XXH64

_P1 = 11400714785074694791
_P2 = 14029467366897019727
_P3 = 1609587929392839161
_P4 = 9650029242287828579
_P5 = 2870177450012600261
_M64 = 0xFFFFFFFFFFFFFFFF


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _xxh64_round(acc: int, lane: int) -> int:
    return (_rotl64((acc + lane * _P2) & _M64, 31) * _P1) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    """XXH64 per the public xxHash specification. A zstd frame's
    optional content checksum is the LOW 32 bits of this value."""
    n = len(data)
    pos = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        limit = n - 32
        while pos <= limit:
            l1, l2, l3, l4 = struct.unpack_from("<QQQQ", data, pos)
            v1 = _xxh64_round(v1, l1)
            v2 = _xxh64_round(v2, l2)
            v3 = _xxh64_round(v3, l3)
            v4 = _xxh64_round(v4, l4)
            pos += 32
        acc = (_rotl64(v1, 1) + _rotl64(v2, 7)
               + _rotl64(v3, 12) + _rotl64(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            acc ^= _xxh64_round(0, v)
            acc = (acc * _P1 + _P4) & _M64
    else:
        acc = (seed + _P5) & _M64
    acc = (acc + n) & _M64
    while pos + 8 <= n:
        (lane,) = struct.unpack_from("<Q", data, pos)
        acc ^= _xxh64_round(0, lane)
        acc = (_rotl64(acc, 27) * _P1 + _P4) & _M64
        pos += 8
    if pos + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, pos)
        acc ^= (lane * _P1) & _M64
        acc = (_rotl64(acc, 23) * _P2 + _P3) & _M64
        pos += 4
    while pos < n:
        acc ^= (data[pos] * _P5) & _M64
        acc = (_rotl64(acc, 11) * _P1) & _M64
        pos += 1
    acc ^= acc >> 33
    acc = (acc * _P2) & _M64
    acc ^= acc >> 29
    acc = (acc * _P3) & _M64
    acc ^= acc >> 32
    return acc


# ------------------------------------------------- bit-level readers
#
# Bit index i lives in byte i//8 at in-byte position i%8 (LSB-first),
# for both directions — that is the format's single bit-numbering.


def _extract(data: bytes, p: int, n: int) -> int:
    """Bits [p, p+n) of ``data`` as an integer (bit p+n-1 is the MSB)."""
    if n == 0:
        return 0
    lo = p >> 3
    hi = (p + n + 7) >> 3
    return (int.from_bytes(data[lo:hi], "little") >> (p & 7)) \
        & ((1 << n) - 1)


class _FwdBits:
    """Forward LSB-first reader — FSE table descriptions only."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, n: int) -> int:
        v = _extract(self.data, self.pos, n)
        self.pos += n
        return v

    def rewind(self, n: int) -> None:
        self.pos -= n

    def byte_align(self) -> int:
        """Bytes consumed, rounding the bit position up."""
        return (self.pos + 7) >> 3


class _BackBits:
    """Backward reader: starts just below the 1-bit padding marker at
    the top of the last byte and reads downward. ``read_padded``
    implements the spec's "extra bits are assumed 0" tail semantics
    and lets ``pos`` go negative (the FSE termination signal);
    ``read`` is strict and raises on underrun."""

    def __init__(self, data: bytes):
        if not data:
            raise ValueError("zstd: empty bitstream")
        last = data[-1]
        if last == 0:
            raise ValueError("zstd: bitstream missing padding marker")
        self.data = data
        self.pos = (len(data) - 1) * 8 + (last.bit_length() - 1)

    def read(self, n: int) -> int:
        self.pos -= n
        if self.pos < 0:
            raise ValueError("zstd: bitstream underrun")
        return _extract(self.data, self.pos, n)

    def read_padded(self, n: int) -> int:
        self.pos -= n
        p = self.pos
        if p >= 0:
            return _extract(self.data, p, n)
        if n + p <= 0:
            return 0
        return _extract(self.data, 0, n + p) << (-p)

    def peek(self, n: int) -> int:
        p = self.pos
        if p >= n:
            return _extract(self.data, p - n, n)
        return _extract(self.data, 0, p) << (n - p)


# -------------------------------------------------------------- FSE

#: per-stream accuracy-log ceilings from the spec
_MAX_AL = {"ll": 9, "of": 8, "ml": 9, "weights": 6}


def fse_read_distribution(fwd: _FwdBits, max_al: int):
    """FSE table description (RFC 8878 §4.1.1): 4-bit accuracy log
    (+5), then variable-bit probabilities with the small-value
    optimization and 2-bit zero-run repeats. Returns (accuracy_log,
    frequencies) where -1 is the "less than one" probability."""
    al = fwd.read(4) + 5
    if al > max_al:
        raise ValueError(f"zstd: accuracy log {al} exceeds max {max_al}")
    remaining = 1 << al
    freqs: list[int] = []
    while remaining > 0 and len(freqs) < 256:
        mx = remaining + 1          # encoded values span 0..remaining+1
        bits = mx.bit_length()
        val = fwd.read(bits)
        lower_mask = (1 << (bits - 1)) - 1
        threshold = (1 << bits) - 1 - mx
        if (val & lower_mask) < threshold:
            fwd.rewind(1)
            val &= lower_mask
        elif val > lower_mask:
            val -= threshold
        prob = val - 1
        remaining -= -prob if prob < 0 else prob
        freqs.append(prob)
        if prob == 0:
            while True:
                rep = fwd.read(2)
                freqs.extend([0] * rep)
                if rep != 3:
                    break
    if remaining != 0:
        raise ValueError("zstd: FSE distribution does not sum to table")
    return al, freqs


def fse_build_table(freqs: list[int], al: int):
    """Decoding table per §4.1.1: -1 symbols one cell each from the
    table end; positives spread with the (size/2 + size/8 + 3) step
    skipping the high cells; then per-cell nbBits / baseline from the
    per-symbol state counters. Returns (symbols, nbits, base)."""
    size = 1 << al
    symbols = [0] * size
    high = size - 1
    counter = [0] * len(freqs)
    for s, f in enumerate(freqs):
        if f == -1:
            symbols[high] = s
            high -= 1
            counter[s] = 1
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    pos = 0
    for s, f in enumerate(freqs):
        if f <= 0:
            continue
        counter[s] = f
        for _ in range(f):
            symbols[pos] = s
            pos = (pos + step) & mask
            while pos > high:
                pos = (pos + step) & mask
    if pos != 0:
        raise ValueError("zstd: FSE table spread did not close")
    nbits = [0] * size
    base = [0] * size
    for i in range(size):
        s = symbols[i]
        d = counter[s]
        counter[s] += 1
        nb = al - (d.bit_length() - 1)
        nbits[i] = nb
        base[i] = (d << nb) - size
    return symbols, nbits, base


class _FSETable:
    __slots__ = ("al", "symbols", "nbits", "base")

    def __init__(self, freqs: list[int], al: int):
        self.al = al
        self.symbols, self.nbits, self.base = fse_build_table(freqs, al)

    @classmethod
    def read(cls, fwd: _FwdBits, max_al: int) -> "_FSETable":
        al, freqs = fse_read_distribution(fwd, max_al)
        return cls(freqs, al)

    @classmethod
    def rle(cls, symbol: int) -> "_FSETable":
        # accuracy log 0: one state, zero update bits
        t = cls.__new__(cls)
        t.al = 0
        t.symbols = [symbol]
        t.nbits = [0]
        t.base = [0]
        return t


def _fse_decode_interleaved2(table: _FSETable, data: bytes,
                             max_out: int) -> list[int]:
    """Two alternating states over one backward stream (the Huffman
    weight encoding, §4.2.1.1): when a state update runs past the
    start of the stream, the OTHER state's symbol is the last."""
    bs = _BackBits(data)
    s1 = bs.read(table.al)
    s2 = bs.read(table.al)
    out: list[int] = []
    while len(out) < max_out:
        out.append(table.symbols[s1])
        s1 = table.base[s1] + bs.read_padded(table.nbits[s1])
        if bs.pos < 0:
            out.append(table.symbols[s2])
            break
        out.append(table.symbols[s2])
        s2 = table.base[s2] + bs.read_padded(table.nbits[s2])
        if bs.pos < 0:
            out.append(table.symbols[s1])
            break
    else:
        raise ValueError("zstd: more than 255 Huffman weights")
    return out


# ---------------------------------------------------------- Huffman

_HUF_MAX_BITS = 11


class _HufTable:
    """Canonical table per §4.2.1: longest codes occupy the lowest
    indices of a 2^max_bits lookup; decode = peek max_bits, consume
    the entry's own length."""

    __slots__ = ("max_bits", "symbols", "nbits")

    def __init__(self, weights: list[int]):
        total = sum((1 << (w - 1)) for w in weights if w > 0)
        if total == 0:
            raise ValueError("zstd: empty Huffman weights")
        max_bits = total.bit_length()
        left = (1 << max_bits) - total
        if left & (left - 1):
            raise ValueError("zstd: Huffman weights not normalizable")
        weights = weights + [left.bit_length()]
        if max_bits > _HUF_MAX_BITS:
            raise ValueError(f"zstd: Huffman code over {_HUF_MAX_BITS} bits")
        bits = [max_bits + 1 - w if w > 0 else 0 for w in weights]
        rank_count = [0] * (max_bits + 1)
        for b in bits:
            rank_count[b] += 1
        rank_idx = [0] * (max_bits + 1)
        for b in range(max_bits, 1, -1):
            rank_idx[b - 1] = rank_idx[b] \
                + rank_count[b] * (1 << (max_bits - b))
        size = 1 << max_bits
        self.max_bits = max_bits
        self.symbols = [0] * size
        self.nbits = [0] * size
        for sym, b in enumerate(bits):
            if b == 0:
                continue
            start = rank_idx[b]
            span = 1 << (max_bits - b)
            for j in range(start, start + span):
                self.symbols[j] = sym
                self.nbits[j] = b
            rank_idx[b] = start + span

    def decode_stream(self, data: bytes, n_out: int) -> bytearray:
        bs = _BackBits(data)
        out = bytearray()
        mb = self.max_bits
        while len(out) < n_out:
            idx = bs.peek(mb)
            out.append(self.symbols[idx])
            bs.pos -= self.nbits[idx]
            if bs.pos < 0:
                raise ValueError("zstd: Huffman stream underrun")
        if bs.pos != 0:
            raise ValueError("zstd: Huffman stream not fully consumed")
        return out


def _read_huf_tree(data: bytes) -> tuple[_HufTable, int]:
    """Huffman_Tree_Description: header byte >= 128 → direct 4-bit
    weights ((hb - 127) of them); < 128 → hb bytes of FSE-compressed
    weights, two interleaved states. Returns (table, bytes consumed).
    The LAST weight is never transmitted — it completes the sum to a
    power of two."""
    if not data:
        raise ValueError("zstd: missing Huffman tree description")
    hb = data[0]
    if hb >= 128:
        n = hb - 127
        nbytes = (n + 1) >> 1
        if len(data) < 1 + nbytes:
            raise ValueError("zstd: truncated Huffman weights")
        weights = []
        for i in range(n):
            b = data[1 + (i >> 1)]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0x0F))
        return _HufTable(weights), 1 + nbytes
    if len(data) < 1 + hb:
        raise ValueError("zstd: truncated FSE weight stream")
    fwd = _FwdBits(data[1:1 + hb])
    table = _FSETable.read(fwd, _MAX_AL["weights"])
    stream = data[1 + fwd.byte_align():1 + hb]
    weights = _fse_decode_interleaved2(table, stream, 255)
    return _HufTable(weights), 1 + hb


# ------------------------------------------------ sequence code maps

_LL_EXTRA = [0] * 16 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11,
                        12, 13, 14, 15, 16]
_LL_BASE = list(range(16)) + [16, 18, 20, 22, 24, 28, 32, 40, 48, 64,
                              128, 256, 512, 1024, 2048, 4096, 8192,
                              16384, 32768, 65536]
_ML_EXTRA = [0] * 32 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10,
                        11, 12, 13, 14, 15, 16]
_ML_BASE = list(range(3, 35)) + [35, 37, 39, 41, 43, 47, 51, 59, 67,
                                 83, 99, 131, 259, 515, 1027, 2051,
                                 4099, 8195, 16387, 32771, 65539]

#: predefined distributions, RFC 8878 §3.1.1.3.2.2
_LL_DEFAULT = ([4, 3] + [2] * 11 + [1] * 3 + [2] * 9 + [3, 2]
               + [1] * 5 + [-1] * 4)
_ML_DEFAULT = [1, 4, 3] + [2] * 6 + [1] * 37 + [-1] * 7
_OF_DEFAULT = [1] * 6 + [2] * 3 + [1] * 15 + [-1] * 5

_LL_DEFAULT_AL = 6
_ML_DEFAULT_AL = 6
_OF_DEFAULT_AL = 5


def _check_defaults() -> None:
    for dist, al in ((_LL_DEFAULT, 6), (_ML_DEFAULT, 6), (_OF_DEFAULT, 5)):
        assert sum(abs(p) for p in dist) == 1 << al
    assert len(_LL_DEFAULT) == 36 and len(_LL_BASE) == 36
    assert len(_ML_DEFAULT) == 53 and len(_ML_BASE) == 53
    assert len(_OF_DEFAULT) == 29


_check_defaults()

_DEFAULT_TABLES: dict[str, _FSETable] = {}


def _default_table(which: str) -> _FSETable:
    t = _DEFAULT_TABLES.get(which)
    if t is None:
        dist, al = {"ll": (_LL_DEFAULT, _LL_DEFAULT_AL),
                    "ml": (_ML_DEFAULT, _ML_DEFAULT_AL),
                    "of": (_OF_DEFAULT, _OF_DEFAULT_AL)}[which]
        t = _FSETable(dist, al)
        _DEFAULT_TABLES[which] = t
    return t


# -------------------------------------------------- frame decoding


class _FrameCtx:
    """State that persists across the blocks of one frame: the output
    window, the three repeat offsets, the last Huffman table (for
    treeless literals) and the last FSE tables (for repeat mode)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.reps = [1, 4, 8]
        self.huf: _HufTable | None = None
        self.ll: _FSETable | None = None
        self.of: _FSETable | None = None
        self.ml: _FSETable | None = None


def _decode_literals(block: bytes, ctx: _FrameCtx) -> tuple[bytes, int]:
    if not block:
        raise ValueError("zstd: empty compressed block")
    b0 = block[0]
    ltype = b0 & 3
    sf = (b0 >> 2) & 3
    if ltype <= 1:                     # Raw / RLE
        if sf & 1 == 0:
            regen, hdr = b0 >> 3, 1
        elif sf == 1:
            if len(block) < 2:
                raise ValueError("zstd: truncated literals header")
            regen, hdr = (b0 >> 4) | (block[1] << 4), 2
        else:
            if len(block) < 3:
                raise ValueError("zstd: truncated literals header")
            regen = (b0 >> 4) | (block[1] << 4) | (block[2] << 12)
            hdr = 3
        if ltype == 0:
            if len(block) < hdr + regen:
                raise ValueError("zstd: truncated raw literals")
            return bytes(block[hdr:hdr + regen]), hdr + regen
        if len(block) < hdr + 1:
            raise ValueError("zstd: truncated RLE literal")
        return bytes([block[hdr]]) * regen, hdr + 1
    # Compressed / Treeless
    if sf == 0:
        hdr, rbits, streams = 3, 10, 1
    elif sf == 1:
        hdr, rbits, streams = 3, 10, 4
    elif sf == 2:
        hdr, rbits, streams = 4, 14, 4
    else:
        hdr, rbits, streams = 5, 18, 4
    if len(block) < hdr:
        raise ValueError("zstd: truncated literals header")
    h = int.from_bytes(block[:hdr], "little")
    regen = (h >> 4) & ((1 << rbits) - 1)
    csize = (h >> (4 + rbits)) & ((1 << rbits) - 1)
    if len(block) < hdr + csize:
        raise ValueError("zstd: truncated compressed literals")
    payload = bytes(block[hdr:hdr + csize])
    if ltype == 2:
        huf, consumed = _read_huf_tree(payload)
        ctx.huf = huf
        payload = payload[consumed:]
    else:
        huf = ctx.huf
        if huf is None:
            raise ValueError("zstd: treeless literals with no prior table")
    if streams == 1:
        lits = huf.decode_stream(payload, regen)
    else:
        if len(payload) < 6:
            raise ValueError("zstd: truncated 4-stream jump table")
        s1, s2, s3 = struct.unpack_from("<HHH", payload, 0)
        body = payload[6:]
        if s1 + s2 + s3 > len(body):
            raise ValueError("zstd: jump table exceeds literals payload")
        part = (regen + 3) >> 2
        last = regen - 3 * part
        if last < 0:
            raise ValueError("zstd: 4-stream regenerated size too small")
        cuts = [0, s1, s1 + s2, s1 + s2 + s3, len(body)]
        lits = bytearray()
        for i in range(4):
            seg = body[cuts[i]:cuts[i + 1]]
            lits += huf.decode_stream(seg, part if i < 3 else last)
    if len(lits) != regen:
        raise ValueError("zstd: literals size mismatch")
    return bytes(lits), hdr + csize


def _read_seq_table(which: str, mode: int, fwd: _FwdBits,
                    data: bytes, ctx: _FrameCtx,
                    max_sym: int) -> _FSETable:
    if mode == 0:                      # predefined
        return _default_table(which)
    if mode == 1:                      # RLE: one byte, byte-aligned
        idx = fwd.byte_align()
        if idx >= len(data):
            raise ValueError("zstd: truncated RLE sequence table")
        sym = data[idx]
        fwd.pos = (idx + 1) * 8
        if sym > max_sym:
            raise ValueError(f"zstd: {which} RLE symbol {sym} out of range")
        return _FSETable.rle(sym)
    if mode == 2:                      # FSE-compressed
        fwd.pos = fwd.byte_align() * 8
        return _FSETable.read(fwd, _MAX_AL[which])
    prev = getattr(ctx, which)         # repeat
    if prev is None:
        raise ValueError(f"zstd: {which} repeat mode with no prior table")
    return prev


def _decode_sequences(data: bytes, ctx: _FrameCtx,
                      lits: bytes) -> None:
    """Parse and EXECUTE the sequences section against ctx.out
    (§3.1.1.3.2): per-sequence reads are OF extra bits, then ML, then
    LL; state updates LL → ML → OF after every sequence but the last;
    repeat offsets resolve against the current literal length."""
    if not data:
        raise ValueError("zstd: missing sequences section")
    b0 = data[0]
    if b0 < 128:
        nseq, pos = b0, 1
    elif b0 < 255:
        if len(data) < 2:
            raise ValueError("zstd: truncated sequence count")
        nseq, pos = ((b0 - 128) << 8) | data[1], 2
    else:
        if len(data) < 3:
            raise ValueError("zstd: truncated sequence count")
        nseq, pos = data[1] | (data[2] << 8) | 0x7F00, 3
    if nseq == 0:
        # no sequences: the block regenerates to its literals, and
        # tables/offsets carry over untouched
        if pos != len(data):
            raise ValueError("zstd: trailing bytes after empty sequences")
        ctx.out += lits
        return
    if len(data) < pos + 1:
        raise ValueError("zstd: missing compression modes byte")
    modes = data[pos]
    pos += 1
    if modes & 3:
        raise ValueError("zstd: reserved sequence mode bits set")
    tbl = data[pos:]
    fwd = _FwdBits(tbl)
    ll_t = _read_seq_table("ll", (modes >> 6) & 3, fwd, tbl, ctx, 35)
    of_t = _read_seq_table("of", (modes >> 4) & 3, fwd, tbl, ctx, 31)
    ml_t = _read_seq_table("ml", (modes >> 2) & 3, fwd, tbl, ctx, 52)
    ctx.ll, ctx.of, ctx.ml = ll_t, of_t, ml_t
    stream = tbl[fwd.byte_align():]
    bs = _BackBits(stream)
    ll_s = bs.read(ll_t.al)
    of_s = bs.read(of_t.al)
    ml_s = bs.read(ml_t.al)
    out = ctx.out
    reps = ctx.reps
    lit_pos = 0
    for i in range(nseq):
        of_code = of_t.symbols[of_s]
        if of_code > 31:
            raise ValueError("zstd: offset code out of range")
        ofv = (1 << of_code) + bs.read(of_code)
        ml_code = ml_t.symbols[ml_s]
        ml = _ML_BASE[ml_code] + bs.read(_ML_EXTRA[ml_code])
        ll_code = ll_t.symbols[ll_s]
        ll = _LL_BASE[ll_code] + bs.read(_LL_EXTRA[ll_code])
        if ofv > 3:
            offset = ofv - 3
            reps[2] = reps[1]
            reps[1] = reps[0]
            reps[0] = offset
        else:
            idx = ofv - 1 if ll != 0 else ofv
            if idx == 0:
                offset = reps[0]
            elif idx == 1:
                offset = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
            elif idx == 2:
                offset = reps[2]
                reps[2] = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
            else:                      # ll == 0 and ofv == 3
                offset = reps[0] - 1
                if offset == 0:
                    raise ValueError("zstd: repeat offset underflow")
                reps[2] = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
        if lit_pos + ll > len(lits):
            raise ValueError("zstd: literal run past literals buffer")
        out += lits[lit_pos:lit_pos + ll]
        lit_pos += ll
        if offset > len(out):
            raise ValueError("zstd: match offset past window start")
        remaining = ml
        while remaining > 0:
            src = len(out) - offset
            take = min(remaining, offset)
            out += out[src:src + take]
            remaining -= take
        if i != nseq - 1:
            ll_s = ll_t.base[ll_s] + bs.read(ll_t.nbits[ll_s])
            ml_s = ml_t.base[ml_s] + bs.read(ml_t.nbits[ml_s])
            of_s = of_t.base[of_s] + bs.read(of_t.nbits[of_s])
    if bs.pos != 0:
        raise ValueError("zstd: sequence bitstream not fully consumed")
    out += lits[lit_pos:]


def _decode_frame(data: bytes, pos: int) -> tuple[bytes, int]:
    if len(data) < pos + 2:
        raise ValueError("zstd: truncated frame header")
    fhd = data[pos]
    pos += 1
    fcs_code = fhd >> 6
    single_segment = bool(fhd & 0x20)
    if fhd & 0x08:
        raise ValueError("zstd: reserved frame header bit set")
    has_checksum = bool(fhd & 0x04)
    did_size = (0, 1, 2, 4)[fhd & 3]
    if not single_segment:
        pos += 1                       # window descriptor: no limit here
    if did_size:
        raise ValueError("zstd: dictionary frames not supported")
    fcs = None
    if fcs_code == 0:
        if single_segment:
            fcs = data[pos]
            pos += 1
    elif fcs_code == 1:
        (v,) = struct.unpack_from("<H", data, pos)
        fcs = v + 256
        pos += 2
    elif fcs_code == 2:
        (fcs,) = struct.unpack_from("<I", data, pos)
        pos += 4
    else:
        (fcs,) = struct.unpack_from("<Q", data, pos)
        pos += 8
    ctx = _FrameCtx()
    while True:
        if len(data) < pos + 3:
            raise ValueError("zstd: truncated block header")
        bh = data[pos] | (data[pos + 1] << 8) | (data[pos + 2] << 16)
        pos += 3
        last = bh & 1
        btype = (bh >> 1) & 3
        bsize = bh >> 3
        if btype == 0:                 # raw
            if len(data) < pos + bsize:
                raise ValueError("zstd: truncated raw block")
            ctx.out += data[pos:pos + bsize]
            pos += bsize
        elif btype == 1:               # RLE: size = REGENERATED size
            if len(data) < pos + 1:
                raise ValueError("zstd: truncated RLE block")
            ctx.out += bytes([data[pos]]) * bsize
            pos += 1
        elif btype == 2:               # compressed
            if len(data) < pos + bsize:
                raise ValueError("zstd: truncated compressed block")
            block = data[pos:pos + bsize]
            pos += bsize
            lits, consumed = _decode_literals(block, ctx)
            _decode_sequences(block[consumed:], ctx, lits)
        else:
            raise ValueError("zstd: reserved block type")
        if last:
            break
    if has_checksum:
        if len(data) < pos + 4:
            raise ValueError("zstd: truncated content checksum")
        (want,) = struct.unpack_from("<I", data, pos)
        pos += 4
        got = xxh64(bytes(ctx.out)) & 0xFFFFFFFF
        if got != want:
            raise ValueError("zstd: content checksum mismatch")
    if fcs is not None and fcs != len(ctx.out):
        raise ValueError("zstd: frame content size mismatch "
                         f"(declared {fcs}, got {len(ctx.out)})")
    return bytes(ctx.out), pos


def decompress(data: bytes) -> bytes:
    """Decode a Zstandard payload: one or more concatenated frames,
    skippable frames ignored, per RFC 8878."""
    out = bytearray()
    pos = 0
    n = len(data)
    if n == 0:
        raise ValueError("zstd: empty input")
    try:
        while pos < n:
            if n - pos < 4:
                raise ValueError("zstd: truncated frame magic")
            (magic,) = struct.unpack_from("<I", data, pos)
            pos += 4
            if _SKIPPABLE_LO <= magic <= _SKIPPABLE_HI:
                if n - pos < 4:
                    raise ValueError("zstd: truncated skippable frame")
                (sz,) = struct.unpack_from("<I", data, pos)
                pos += 4 + sz
                if pos > n:
                    raise ValueError("zstd: skippable frame past end")
                continue
            if magic != MAGIC:
                raise ValueError(f"zstd: bad frame magic 0x{magic:08X}")
            frame, pos = _decode_frame(data, pos)
            out += frame
    except (struct.error, IndexError) as exc:
        raise ValueError(f"zstd: truncated input ({exc})") from exc
    return bytes(out)


# -------------------------------------------------- frame encoding

_BLOCK_MAX = 128 << 10


def _pm_lengths(freq: dict[int, int], limit: int) -> dict[int, int]:
    """Optimal length-limited prefix-code lengths via boundary
    package-merge (Larmore & Hirschberg 1990, public algorithm): L-1
    rounds of pair-and-remerge, then each symbol's code length is how
    often it appears in the cheapest 2n-2 items. The result is always
    a COMPLETE code (Kraft sum exactly 1) — which the zstd weight
    encoding requires, since the last symbol's weight is implied by
    completion to a power of two (RFC 8878 §4.2.1)."""
    leaves = sorted((f, (s,)) for s, f in freq.items())
    lst = leaves
    for _ in range(limit - 1):
        packages = [(a[0] + b[0], a[1] + b[1])
                    for a, b in zip(lst[::2], lst[1::2])]
        lst = sorted(leaves + packages)
    lengths = dict.fromkeys(freq, 0)
    for _f, syms in lst[:2 * len(leaves) - 2]:
        for s in syms:
            lengths[s] += 1
    return lengths


def _huf_codes(lengths: dict[int, int]) -> tuple[int, list[int],
                                                 list[int]]:
    """Canonical code values matching :class:`_HufTable`'s layout:
    symbol order within a rank, longest codes at the low end of the
    peek space. Returns (max_bits, code_by_byte, bits_by_byte)."""
    max_bits = max(lengths.values())
    rank_count = [0] * (max_bits + 1)
    for b in lengths.values():
        rank_count[b] += 1
    rank_idx = [0] * (max_bits + 2)
    for b in range(max_bits, 1, -1):
        rank_idx[b - 1] = rank_idx[b] + rank_count[b] * (
            1 << (max_bits - b))
    codes = [0] * 256
    bits = [0] * 256
    for sym in sorted(lengths):
        b = lengths[sym]
        codes[sym] = rank_idx[b] >> (max_bits - b)
        bits[sym] = b
        rank_idx[b] += 1 << (max_bits - b)
    return max_bits, codes, bits


def _huf_write_stream(chunk: bytes, codes: list[int],
                      bits: list[int]) -> bytes:
    """One Huffman bitstream as the decoder reads it: the FIRST
    symbol's code sits in the topmost bits under the 1-bit sentinel,
    so the writer emits symbols in reverse, packing LSB-up, and the
    backward reader consumes them in forward order ending exactly at
    bit 0 (``decode_stream`` rejects leftovers)."""
    acc = 0
    nbits = 0
    out = bytearray()
    for s in reversed(chunk):
        acc |= codes[s] << nbits
        nbits += bits[s]
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    acc |= 1 << nbits
    nbits += 1
    while nbits > 0:
        out.append(acc & 0xFF)
        acc >>= 8
        nbits -= 8
    return bytes(out)


def _fse_normalize(freq: dict[int, int], size: int) -> dict[int, int]:
    """Probabilities ≥ 1 per present symbol summing exactly to the
    table size (no -1 low-prob cells — each would cost AL bits per
    occurrence, and the weight alphabet is small enough not to need
    them)."""
    total = sum(freq.values())
    probs = {v: max(1, (f * size) // total) for v, f in freq.items()}
    diff = size - sum(probs.values())
    if diff > 0:
        probs[max(freq, key=freq.get)] += diff
    while diff < 0:
        v = max(probs, key=lambda s: probs[s])
        take = min(-diff, probs[v] - 1)
        probs[v] -= take
        diff += take
    return probs


def _fse_write_distribution(freqs: list[int], al: int) -> bytes:
    """Inverse of :func:`fse_read_distribution`: 4-bit accuracy log
    (+5), then per-symbol probabilities with the small-value
    optimization and 2-bit zero-run repeats, forward LSB-first,
    zero-padded to a byte boundary."""
    acc = al - 5
    nbits = 4
    out = bytearray()

    def put(v: int, n: int) -> None:
        nonlocal acc, nbits
        acc |= v << nbits
        nbits += n
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    remaining = 1 << al
    i = 0
    while remaining > 0:
        prob = freqs[i]
        mx = remaining + 1
        bits = mx.bit_length()
        lower_mask = (1 << (bits - 1)) - 1
        threshold = (1 << bits) - 1 - mx
        v = prob + 1
        if v < threshold:
            put(v, bits - 1)
        elif v <= lower_mask:
            put(v, bits)
        else:
            put(v + threshold, bits)
        remaining -= prob
        i += 1
        if prob == 0:
            z = 0
            while i + z < len(freqs) and freqs[i + z] == 0:
                z += 1
            i += z
            while True:
                r = min(z, 3)
                put(r, 2)
                z -= r
                if r != 3:
                    break
    if nbits > 0:
        out.append(acc & 0xFF)
    return bytes(out)


def _fse_encode_weights(weights: list[int]) -> "bytes | None":
    """Huffman_Tree_Description in the FSE-compressed form (RFC 8878
    §4.2.1.1): the transmitted weights (symbols 0..last-1, the last
    present symbol's weight implied) as a two-state interleaved
    backward FSE stream over a ≤64-cell table. Built as the exact
    inverse of :func:`_fse_decode_interleaved2`: the even-index chain
    rides state 1, the odd chain state 2, updates alternate starting
    with the even chain, all bits are consumed exactly, and the
    decoder's first read past bit 0 is its termination signal.
    Returns None when the form can't apply (fewer than 2 distinct
    weight values — the degenerate full-table FSE symbol would make
    zero-bit state updates loop forever — or a description that
    doesn't fit the < 128-byte header-byte budget)."""
    n = len(weights)
    freq: dict[int, int] = {}
    for w in weights:
        freq[w] = freq.get(w, 0) + 1
    if len(freq) < 2:
        return None
    al = _MAX_AL["weights"]
    probs = _fse_normalize(freq, 1 << al)
    freqs = [probs.get(v, 0) for v in range(max(freq) + 1)]
    symbols, nbits, base = fse_build_table(freqs, al)
    cells: dict[int, list[tuple[int, int, int]]] = {}
    for i, s in enumerate(symbols):
        cells.setdefault(s, []).append((i, base[i], nbits[i]))

    def chain(syms: list[int]) -> tuple[int, list[tuple[int, int]]]:
        """Backward state walk: returns (initial state, update bits
        as (value, width) in decode-read order)."""
        x = cells[syms[-1]][0][0]
        ups: list[tuple[int, int]] = []
        for k in range(len(syms) - 2, -1, -1):
            for i, b, nb in cells[syms[k]]:
                if b <= x < b + (1 << nb):
                    ups.append((x - b, nb))
                    x = i
                    break
            else:  # pragma: no cover — cells partition the space
                raise AssertionError("FSE cell cover hole")
        ups.reverse()
        return x, ups

    e0, be = chain(weights[0::2])
    o0, bo = chain(weights[1::2])
    acc = 1                                    # sentinel bit
    acc = (acc << al) | e0
    acc = (acc << al) | o0
    for j in range(max(len(be), len(bo))):
        if j < len(be):
            v, w = be[j]
            acc = (acc << w) | v
        if j < len(bo):
            v, w = bo[j]
            acc = (acc << w) | v
    stream = acc.to_bytes((acc.bit_length() + 7) // 8, "little")
    body = _fse_write_distribution(freqs, al) + stream
    if len(body) >= 128:
        return None
    return bytes([len(body)]) + body


def _huffman_literals_section(lits: bytes) -> "bytes | None":
    """Literals_Section with Huffman-compressed literals (type 2) —
    order-0 entropy coding. The tree description uses the direct
    4-bit-weight form when the last present symbol is ≤ 128 (its cap)
    and the FSE-compressed weight form otherwise — high bytes are the
    NORM for Kafka record batches (varint framing), so the FSE form
    carries the production case. Returns None when the form can't
    apply (single distinct byte, FSE-inexpressible weights, header
    size fields overflowed)."""
    freq: dict[int, int] = {}
    for b in lits:
        freq[b] = freq.get(b, 0) + 1
    if len(freq) < 2:
        return None
    last_sym = max(freq)
    lengths = _pm_lengths(freq, _HUF_MAX_BITS)
    max_bits, codes, bits = _huf_codes(lengths)
    # weights for symbols 0..last-1 (absent symbols weigh 0); the
    # last present symbol's weight is implied by power-of-2 completion
    weights = [(max_bits + 1 - lengths[s]) if s in lengths else 0
               for s in range(last_sym)]
    if last_sym <= 128:
        tree = bytearray([127 + last_sym])
        for i in range(0, last_sym, 2):
            hi = weights[i] << 4
            lo = weights[i + 1] if i + 1 < last_sym else 0
            tree.append(hi | lo)
        tree = bytes(tree)
    else:
        tree = _fse_encode_weights(weights)
        if tree is None:
            return None
    regen = len(lits)
    if regen <= 1023:
        payload = bytes(tree) + _huf_write_stream(lits, codes, bits)
        csize = len(payload)
        if csize > 1023:
            return None
        h = 2 | (regen << 4) | (csize << 14)       # Size_Format 00
        return h.to_bytes(3, "little") + payload
    part = (regen + 3) >> 2
    streams = [_huf_write_stream(lits[i * part:(i + 1) * part],
                                 codes, bits) for i in range(4)]
    if max(len(s) for s in streams[:3]) > 0xFFFF:
        return None
    jump = struct.pack("<HHH", len(streams[0]), len(streams[1]),
                       len(streams[2]))
    payload = bytes(tree) + jump + b"".join(streams)
    csize = len(payload)
    if regen <= 16383 and csize <= 16383:
        h = 2 | (2 << 2) | (regen << 4) | (csize << 18)
        return h.to_bytes(4, "little") + payload
    if csize <= 262143:
        h = 2 | (3 << 2) | (regen << 4) | (csize << 22)
        return h.to_bytes(5, "little") + payload
    return None


def _plain_literals_section(lits: bytes) -> bytes:
    """Raw (type 0) or RLE (type 1) Literals_Section — always
    expressible; the fallback the entropy forms compete against."""
    regen = len(lits)
    if regen > 1 and lits.count(lits[0]) == regen:
        body, ltype = lits[:1], 1
    else:
        body, ltype = lits, 0
    if regen <= 31:
        hdr = bytes([ltype | (regen << 3)])
    elif regen <= 4095:
        h = ltype | (1 << 2) | (regen << 4)
        hdr = h.to_bytes(2, "little")
    else:
        h = ltype | (3 << 2) | (regen << 4)
        hdr = h.to_bytes(3, "little")
    return hdr + body


def _literals_section(lits: bytes) -> bytes:
    huf = _huffman_literals_section(lits)
    plain = _plain_literals_section(lits)
    return plain if huf is None or len(plain) <= len(huf) else huf


def _match_len(data: bytes, a: int, b: int, limit: int) -> int:
    """Length of the common prefix of data[a:] and data[b:], ≤ limit —
    64-byte slice strides, then bytewise tail (slice compares run in
    C; a per-byte loop would dominate the matcher)."""
    n = 0
    while n + 64 <= limit and data[a + n:a + n + 64] == \
            data[b + n:b + n + 64]:
        n += 64
    while n < limit and data[a + n] == data[b + n]:
        n += 1
    return n


def _find_sequences(chunk: bytes
                    ) -> "tuple[list[tuple[int, int, int]], bytes] | None":
    """Greedy LZ77 match search: a hash-of-4 table of last positions,
    matches ≥ 4 bytes taken greedily (no lazy evaluation — ratio left
    on the table in exchange for one pass). Returns (sequences,
    literals) where sequences are (literal_len, match_len, offset) and
    literals is every unmatched byte in order (trailing run included —
    the decoder appends ``lits[lit_pos:]`` after the last sequence)."""
    n = len(chunk)
    if n < 16:
        return None
    table: dict[bytes, int] = {}
    seqs: list[tuple[int, int, int]] = []
    lits = bytearray()
    lit_start = 0
    pos = 0
    while pos + 4 <= n:
        key = chunk[pos:pos + 4]
        cand = table.get(key)
        table[key] = pos
        if cand is not None:
            mlen = 4 + _match_len(chunk, cand + 4, pos + 4,
                                  n - pos - 4)
            lits += chunk[lit_start:pos]
            seqs.append((pos - lit_start, mlen, pos - cand))
            pos += mlen
            lit_start = pos
        else:
            pos += 1
    if not seqs:
        return None
    lits += chunk[lit_start:]
    return seqs, bytes(lits)


def _fse_cells(freqs: list[int], al: int
               ) -> dict[int, list[tuple[int, int, int]]]:
    """symbol → [(state, baseline, nbits)] from the decoding table —
    the encoder walks these backward (see :func:`_fse_encode_weights`;
    each symbol's cells partition the state space, so exactly one
    covers any successor state)."""
    symbols, nbits, base = fse_build_table(freqs, al)
    cells: dict[int, list[tuple[int, int, int]]] = {}
    for i, s in enumerate(symbols):
        cells.setdefault(s, []).append((i, base[i], nbits[i]))
    return cells


def _fse_chain(cells: dict[int, list[tuple[int, int, int]]],
               syms: list[int]) -> tuple[int, list[tuple[int, int]]]:
    """Backward state walk over one symbol chain: (initial state,
    update-bit fields in decode-read order)."""
    x = cells[syms[-1]][0][0]
    ups: list[tuple[int, int]] = []
    for k in range(len(syms) - 2, -1, -1):
        for i, b, nb in cells[syms[k]]:
            if b <= x < b + (1 << nb):
                ups.append((x - b, nb))
                x = i
                break
        else:  # pragma: no cover — cells partition the space
            raise AssertionError("FSE cell cover hole")
    ups.reverse()
    return x, ups


def _code_of(v: int, bases: list[int]) -> int:
    import bisect
    return bisect.bisect_right(bases, v) - 1


def _encode_sequences(seqs: list[tuple[int, int, int]]) -> bytes:
    """Sequences_Section with ALL-PREDEFINED tables (mode byte 0x00 —
    no table descriptions on the wire; both ends build the RFC
    §3.1.1.3.2.2 default distributions): three interleaved FSE states
    over one backward bitstream, written as the exact inverse of
    ``_decode_sequences``'s read order — init states LL/OF/ML, then
    per sequence OF/ML/LL extra bits and (except after the last)
    LL/ML/OF state updates. Offsets are always emitted in the
    offset+3 form (no repeat-offset codes — simpler, always valid)."""
    n = len(seqs)
    ll_codes, of_codes, ml_codes = [], [], []
    extras: list[tuple[int, int, int, int, int, int]] = []
    for ll, ml, offset in seqs:
        ofv = offset + 3
        of_c = ofv.bit_length() - 1
        ml_c = _code_of(ml, _ML_BASE)
        ll_c = _code_of(ll, _LL_BASE)
        ll_codes.append(ll_c)
        of_codes.append(of_c)
        ml_codes.append(ml_c)
        extras.append((ofv - (1 << of_c), of_c,
                       ml - _ML_BASE[ml_c], _ML_EXTRA[ml_c],
                       ll - _LL_BASE[ll_c], _LL_EXTRA[ll_c]))
    ll_cells = _fse_cells(_LL_DEFAULT, _LL_DEFAULT_AL)
    of_cells = _fse_cells(_OF_DEFAULT, _OF_DEFAULT_AL)
    ml_cells = _fse_cells(_ML_DEFAULT, _ML_DEFAULT_AL)
    ll_x0, ll_ups = _fse_chain(ll_cells, ll_codes)
    of_x0, of_ups = _fse_chain(of_cells, of_codes)
    ml_x0, ml_ups = _fse_chain(ml_cells, ml_codes)
    acc = 1                                   # sentinel bit
    fields = [(ll_x0, _LL_DEFAULT_AL), (of_x0, _OF_DEFAULT_AL),
              (ml_x0, _ML_DEFAULT_AL)]
    for i in range(n):
        of_e, of_w, ml_e, ml_w, ll_e, ll_w = extras[i]
        fields.append((of_e, of_w))
        fields.append((ml_e, ml_w))
        fields.append((ll_e, ll_w))
        if i != n - 1:
            fields.append(ll_ups[i])
            fields.append(ml_ups[i])
            fields.append(of_ups[i])
    for v, w in fields:
        acc = (acc << w) | v
    stream = acc.to_bytes((acc.bit_length() + 7) // 8, "little")
    if n < 128:
        head = bytes([n])
    elif n < 0x7F00:
        head = bytes([128 + (n >> 8), n & 0xFF])
    else:
        lo = n - 0x7F00
        head = bytes([255, lo & 0xFF, (lo >> 8) & 0xFF])
    return head + b"\x00" + stream            # modes byte: predefined


def _compressed_block(chunk: bytes) -> "bytes | None":
    """Best Compressed_Block for a chunk, or None when raw/RLE wins:
    the LZ candidate (greedy matches + entropy-or-plain literals +
    predefined-FSE sequences) competes against the literals-only
    candidate (Huffman literals, zero sequences) and the winner must
    beat the raw block."""
    candidates: list[bytes] = []
    huf_only = _huffman_literals_section(chunk)
    if huf_only is not None:
        candidates.append(huf_only + b"\x00")
    found = _find_sequences(chunk)
    if found is not None:
        seqs, lits = found
        candidates.append(_literals_section(lits)
                          + _encode_sequences(seqs))
    if not candidates:
        return None
    best = min(candidates, key=len)
    return best if len(best) < len(chunk) else None


def compress(data: bytes, *, checksum: bool = True,
             entropy: bool = True) -> bytes:
    """Encode a conforming Zstandard frame. Per 128 KiB chunk, the
    best of four block shapes: RLE (single repeated byte), LZ matches
    + predefined-FSE sequences, Huffman literals only, or raw (see
    :func:`_compressed_block` for the competition). ``entropy=False``
    restores the store-only tier. Frame content size is always present
    (4- or 8-byte field); output is a conforming frame any reference
    decoder accepts (CLI golden-tested). On a cluster the JVM path
    ships zstd-jni for throughput; this exists so jar-free produce
    gets a real compression ratio."""
    n = len(data)
    if n <= 0xFFFFFFFF:
        fhd = (2 << 6) | ((1 << 2) if checksum else 0)
        fcs = struct.pack("<I", n)
    else:
        fhd = (3 << 6) | ((1 << 2) if checksum else 0)
        fcs = struct.pack("<Q", n)
    # window descriptor: 128 KiB (exponent 17) — matches never occur,
    # the window only bounds a streaming decoder's buffer
    out = bytearray(struct.pack("<I", MAGIC))
    out.append(fhd)
    out.append((17 - 10) << 3)
    out += fcs
    if n == 0:
        out += (1).to_bytes(3, "little")        # last, raw, size 0
    else:
        for b0 in range(0, n, _BLOCK_MAX):
            chunk = data[b0:b0 + _BLOCK_MAX]
            last = 1 if b0 + _BLOCK_MAX >= n else 0
            if len(chunk) > 1 and chunk.count(chunk[0]) == len(chunk):
                bh = last | (1 << 1) | (len(chunk) << 3)
                out += bh.to_bytes(3, "little")
                out.append(chunk[0])
                continue
            coded = _compressed_block(chunk) if entropy \
                else None
            if coded is not None:
                bh = last | (2 << 1) | (len(coded) << 3)
                out += bh.to_bytes(3, "little")
                out += coded
            else:
                bh = last | (len(chunk) << 3)
                out += bh.to_bytes(3, "little")
                out += chunk
    if checksum:
        out += struct.pack("<I", xxh64(data) & 0xFFFFFFFF)
    return bytes(out)
