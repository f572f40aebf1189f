"""Pure-Python LZ4 codec (stdlib only): block format, frame format,
and the XXH32 hash the frame header requires.

Kafka record batches (magic 2) mark compression in the batch
attributes' low bits; codec id 3 is LZ4 — and what real brokers ship
for magic ≥ 1 is the standard LZ4 FRAME format (magic 0x184D2204,
frame descriptor with an XXH32 header checksum, compressed data
blocks, end mark, optional content checksum), NOT a bare block. The
image has no ``lz4`` package, so this module implements all three
layers from the public specifications —
lz4.github.io/lz4/lz4_Block_format.html,
lz4.github.io/lz4/lz4_Frame_format.html, and the xxHash spec
(github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md) — exactly
like ``snappy_py`` implements Snappy's block format (and
``zstd_py`` implements RFC 8878). With it the jar-free Kafka stack
covers every codec real brokers commonly serve.

Block format recap (all public):

- a sequence of SEQUENCES: token byte whose high nibble is the
  literal length (15 ⇒ extra 255-continuation bytes follow), the
  literals, a 2-byte little-endian match offset (1..65535), and the
  match length as low nibble + 4 (15 ⇒ continuation bytes);
- the last sequence is literals-only (no offset/matchlen);
- end-of-block rules an ENCODER must obey (decoders of our output may
  be the reference implementation): the last 5 bytes are always
  literals, and the last match must not start within the last 12
  bytes.

Matches may overlap their output (offset < length — the RLE idiom),
and with ``dict_`` a block may reference the tail of previously
decoded output (frame block-dependency), so the decoder copies
byte-ranges in bounded chunks over a virtual (dict + output) stream.

The compressor is the reference scheme reduced to its core: a
1-entry-per-bucket hash table over 4-byte sequences, greedy match
extension, end-of-block guards. Any literal/match partition
respecting the guards is valid LZ4, so correctness never depends on
match quality; round trips are property-tested and the decompressor
is additionally pinned against fixed spec-built vectors
(tests/test_lz4_py.py), anchoring both directions independently.
"""

from __future__ import annotations

import struct

__all__ = [
    "xxh32",
    "compress_block",
    "decompress_block",
    "compress_frame",
    "decompress_frame",
]

_MIN_MATCH = 4
#: encoder guards from the block spec: last 5 bytes literal, no match
#: starting in the last 12 bytes
_LAST_LITERALS = 5
_MFLIMIT = 12

FRAME_MAGIC = 0x184D2204

# ----------------------------------------------------------- XXH32

_PRIME1 = 2654435761
_PRIME2 = 2246822519
_PRIME3 = 3266489917
_PRIME4 = 668265263
_PRIME5 = 374761393
_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    """XXH32 per the public xxHash specification (the frame header
    checksum is ``(xxh32(descriptor) >> 8) & 0xFF``; the optional
    content checksum is xxh32 of the whole decompressed payload)."""
    n = len(data)
    pos = 0
    if n >= 16:
        v1 = (seed + _PRIME1 + _PRIME2) & _M32
        v2 = (seed + _PRIME2) & _M32
        v3 = seed & _M32
        v4 = (seed - _PRIME1) & _M32
        limit = n - 16
        while pos <= limit:
            l1, l2, l3, l4 = struct.unpack_from("<IIII", data, pos)
            v1 = (_rotl32((v1 + l1 * _PRIME2) & _M32, 13) * _PRIME1) & _M32
            v2 = (_rotl32((v2 + l2 * _PRIME2) & _M32, 13) * _PRIME1) & _M32
            v3 = (_rotl32((v3 + l3 * _PRIME2) & _M32, 13) * _PRIME1) & _M32
            v4 = (_rotl32((v4 + l4 * _PRIME2) & _M32, 13) * _PRIME1) & _M32
            pos += 16
        acc = (_rotl32(v1, 1) + _rotl32(v2, 7)
               + _rotl32(v3, 12) + _rotl32(v4, 18)) & _M32
    else:
        acc = (seed + _PRIME5) & _M32
    acc = (acc + n) & _M32
    while pos + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, pos)
        acc = (_rotl32((acc + lane * _PRIME3) & _M32, 17) * _PRIME4) & _M32
        pos += 4
    while pos < n:
        acc = (_rotl32((acc + data[pos] * _PRIME5) & _M32, 11)
               * _PRIME1) & _M32
        pos += 1
    acc ^= acc >> 15
    acc = (acc * _PRIME2) & _M32
    acc ^= acc >> 13
    acc = (acc * _PRIME3) & _M32
    acc ^= acc >> 16
    return acc


# ------------------------------------------------------------ block

def decompress_block(data: bytes, dict_: bytes = b"") -> bytes:
    """Decode one LZ4 block. ``dict_`` is the tail of previously
    decoded output (block-dependent frames); matches may reach into
    it. Raises ``ValueError`` on any framing error."""
    out = bytearray()
    dlen = len(dict_)
    pos = 0
    n = len(data)
    if n == 0:
        raise ValueError("lz4: empty block")
    while True:
        token = data[pos]
        pos += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                if pos >= n:
                    raise ValueError("lz4: truncated literal length")
                b = data[pos]
                pos += 1
                lit_len += b
                if b != 255:
                    break
        if pos + lit_len > n:
            raise ValueError("lz4: literal run past end of block")
        out += data[pos:pos + lit_len]
        pos += lit_len
        if pos == n:
            # last sequence: literals only — the spec's only legal end
            return bytes(out)
        if pos + 2 > n:
            raise ValueError("lz4: truncated match offset")
        offset = data[pos] | (data[pos + 1] << 8)
        pos += 2
        if offset == 0:
            raise ValueError("lz4: match offset 0 is invalid")
        mlen = (token & 0x0F) + _MIN_MATCH
        if (token & 0x0F) == 15:
            while True:
                if pos >= n:
                    raise ValueError("lz4: truncated match length")
                b = data[pos]
                pos += 1
                mlen += b
                if b != 255:
                    break
        start = len(out) - offset
        if start + dlen < 0:
            raise ValueError("lz4: match offset reaches before stream")
        remaining = mlen
        while remaining > 0:
            src = len(out) - offset
            if src < 0:
                # from the external dictionary (block-dependent frame)
                take = min(remaining, -src)
                out += dict_[dlen + src:dlen + src + take]
            else:
                take = min(remaining, offset)
                out += out[src:src + take]
            remaining -= take


def compress_block(data: bytes) -> bytes:
    """Encode one LZ4 block (greedy hash-table matcher, end-of-block
    guards per the spec so reference decoders accept the output)."""
    n = len(data)
    out = bytearray()

    def emit(lit_start: int, lit_end: int, offset: int, mlen: int) -> None:
        lit_len = lit_end - lit_start
        token_lit = 15 if lit_len >= 15 else lit_len
        if mlen:
            ml = mlen - _MIN_MATCH
            token_mat = 15 if ml >= 15 else ml
        else:
            token_mat = 0
        out.append((token_lit << 4) | token_mat)
        if lit_len >= 15:
            rest = lit_len - 15
            while rest >= 255:
                out.append(255)
                rest -= 255
            out.append(rest)
        out.extend(data[lit_start:lit_end])
        if mlen:
            out.append(offset & 0xFF)
            out.append(offset >> 8)
            if mlen - _MIN_MATCH >= 15:
                rest = mlen - _MIN_MATCH - 15
                while rest >= 255:
                    out.append(255)
                    rest -= 255
                out.append(rest)

    if n < _MFLIMIT + 1:
        # too short for any legal match — one literal-only sequence
        emit(0, n, 0, 0)
        return bytes(out)

    table: dict[int, int] = {}
    anchor = 0
    i = 0
    match_limit = n - _LAST_LITERALS      # matches may not END past this
    start_limit = n - _MFLIMIT            # ... nor START at/after this
    while i < start_limit:
        key = data[i:i + _MIN_MATCH]
        # deterministic multiplicative hash (python's hash() is
        # seed-randomized per process — compressed bytes must not be)
        (v,) = struct.unpack_from("<I", data, i)
        slot = ((v * _PRIME1) & _M32) >> 16
        cand = table.get(slot)
        table[slot] = i
        if (cand is not None and i - cand <= 0xFFFF
                and data[cand:cand + _MIN_MATCH] == key):
            mlen = _MIN_MATCH
            while (i + mlen < match_limit
                   and data[cand + mlen] == data[i + mlen]):
                mlen += 1
            emit(anchor, i, i - cand, mlen)
            i += mlen
            anchor = i
        else:
            i += 1
    emit(anchor, n, 0, 0)
    return bytes(out)


# ------------------------------------------------------------ frame

#: BD block-max-size codes from the frame spec
_BD_SIZES = {4: 64 << 10, 5: 256 << 10, 6: 1 << 20, 7: 4 << 20}


def compress_frame(data: bytes, *, block_size_code: int = 4,
                   content_checksum: bool = True) -> bytes:
    """Encode an LZ4 FRAME (what Kafka codec id 3 actually carries):
    magic, descriptor (version 01, block-independent, content
    checksum flag, XXH32 header checksum byte), compressed-or-stored
    data blocks, end mark, content checksum. Blocks that don't shrink
    are stored uncompressed with the high size bit set, per spec."""
    if block_size_code not in _BD_SIZES:
        raise ValueError(f"invalid BD block size code {block_size_code}")
    bmax = _BD_SIZES[block_size_code]
    flg = (1 << 6) | (1 << 5) | ((1 << 2) if content_checksum else 0)
    bd = block_size_code << 4
    descriptor = bytes([flg, bd])
    hc = (xxh32(descriptor) >> 8) & 0xFF
    out = bytearray(struct.pack("<I", FRAME_MAGIC))
    out += descriptor
    out.append(hc)
    for b0 in range(0, len(data), bmax):
        chunk = data[b0:b0 + bmax]
        comp = compress_block(chunk)
        if len(comp) < len(chunk):
            out += struct.pack("<I", len(comp))
            out += comp
        else:
            out += struct.pack("<I", len(chunk) | 0x80000000)
            out += chunk
    out += struct.pack("<I", 0)           # EndMark
    if content_checksum:
        out += struct.pack("<I", xxh32(data))
    return bytes(out)


def decompress_frame(data: bytes) -> bytes:
    """Decode an LZ4 frame: validates magic, version, the header
    checksum, per-block sizes against BD, block checksums when
    present, and the content checksum when present. Handles both
    block-independent and block-dependent frames (matches into the
    64 KB tail of prior output) and an optional content-size field."""
    if len(data) < 7:
        raise ValueError("lz4: frame shorter than header")
    (magic,) = struct.unpack_from("<I", data, 0)
    if magic != FRAME_MAGIC:
        raise ValueError(f"lz4: bad frame magic 0x{magic:08X}")
    flg = data[4]
    bd = data[5]
    if (flg >> 6) != 1:
        raise ValueError(f"lz4: unsupported frame version {flg >> 6}")
    b_indep = bool(flg & (1 << 5))
    b_checksum = bool(flg & (1 << 4))
    c_size = bool(flg & (1 << 3))
    c_checksum = bool(flg & (1 << 2))
    if flg & 1:
        raise ValueError("lz4: dictionary frames not supported")
    code = (bd >> 4) & 0x07
    if code not in _BD_SIZES:
        raise ValueError(f"lz4: invalid BD block size code {code}")
    bmax = _BD_SIZES[code]
    pos = 6
    declared = None
    if c_size:
        (declared,) = struct.unpack_from("<Q", data, pos)
        pos += 8
    hc = data[pos]
    if ((xxh32(data[4:pos]) >> 8) & 0xFF) != hc:
        raise ValueError("lz4: frame header checksum mismatch")
    pos += 1
    out = bytearray()
    while True:
        if pos + 4 > len(data):
            raise ValueError("lz4: truncated block size")
        (bsize,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if bsize == 0:                     # EndMark
            break
        stored = bool(bsize & 0x80000000)
        bsize &= 0x7FFFFFFF
        if bsize > bmax:
            raise ValueError("lz4: block larger than BD maximum")
        if pos + bsize > len(data):
            raise ValueError("lz4: truncated data block")
        block = data[pos:pos + bsize]
        pos += bsize
        if b_checksum:
            if pos + 4 > len(data):
                raise ValueError("lz4: truncated block checksum")
            (bsum,) = struct.unpack_from("<I", data, pos)
            pos += 4
            if xxh32(block) != bsum:
                raise ValueError("lz4: block checksum mismatch")
        if stored:
            out += block
        else:
            dict_ = b"" if b_indep else bytes(out[-(64 << 10):])
            out += decompress_block(block, dict_)
    if c_checksum:
        if pos + 4 > len(data):
            raise ValueError("lz4: truncated content checksum")
        (csum,) = struct.unpack_from("<I", data, pos)
        if xxh32(bytes(out)) != csum:
            raise ValueError("lz4: content checksum mismatch")
    if declared is not None and declared != len(out):
        raise ValueError("lz4: content size mismatch "
                         f"(declared {declared}, got {len(out)})")
    return bytes(out)
