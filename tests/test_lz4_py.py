"""Tests for the pure-Python LZ4 codec (block + frame + XXH32) and
its Kafka record-batch integration (codec id 3).

XXH32 is pinned against the published reference vectors; the block
decompressor against hand-built spec vectors (token nibbles,
length-continuation bytes, overlapping RLE matches, end-of-block
literal rule); frames against structural vectors (header checksum,
stored-block bit, EndMark, content checksum). The compressor is then
property-tested through round trips — the same anchoring scheme as
``tests/test_snappy_py.py``.
"""

from __future__ import annotations

import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from aether_firebase_consumer_spark.sources.lz4_py import (
    FRAME_MAGIC,
    compress_block,
    compress_frame,
    decompress_block,
    decompress_frame,
    xxh32,
)


# ------------------------------------------------------ XXH32 vectors

def test_xxh32_reference_vectors():
    # published test vectors (xxHash repo / RFC draft)
    assert xxh32(b"") == 0x02CC5D05
    assert xxh32(b"a") == 0x550D7456
    assert xxh32(b"abc") == 0x32D153FF
    assert xxh32(b"message digest") == 0x7C948494
    assert xxh32(b"abcdefghijklmnopqrstuvwxyz") == 0x63A14D5F
    # seeded path: no published vector at hand — the seed-0 vectors
    # above anchor the algorithm; pin divergence + current value as a
    # regression guard (the LZ4 frame format only ever uses seed 0)
    assert xxh32(b"a", seed=1) != xxh32(b"a")
    assert xxh32(b"a", seed=1) == 0xF514706F


def test_xxh32_covers_all_paths():
    # ≥16 bytes engages the 4-lane loop; tails hit the 4-byte and
    # 1-byte finishers
    for n in (15, 16, 17, 31, 32, 100):
        data = bytes(range(n))
        # self-consistency across chunk boundaries is implicit in the
        # reference vectors; here just pin determinism
        assert xxh32(data) == xxh32(bytes(data))


# ------------------------------------------------- block spec vectors

def test_block_literal_only_vector():
    # token: 5 literals, no match (last sequence)
    assert decompress_block(bytes([5 << 4]) + b"abcde") == b"abcde"


def test_block_long_literal_vector():
    # 20 literals: token nibble 15 + continuation byte 5
    body = bytes(range(20))
    vec = bytes([15 << 4, 5]) + body
    assert decompress_block(vec) == body


def test_block_match_vector():
    # "abcd" + match(offset=4, len=4) + final literal "x"
    vec = (bytes([(4 << 4) | 0]) + b"abcd"
           + struct.pack("<H", 4)
           + bytes([1 << 4]) + b"x")
    assert decompress_block(vec) == b"abcdabcdx"


def test_block_overlapping_rle_match():
    # "ab" + match(offset=2, len=18) -> "ab"*10, then final literal
    vec = (bytes([(2 << 4) | (18 - 4)]) + b"ab"
           + struct.pack("<H", 2)
           + bytes([1 << 4]) + b"!")
    assert decompress_block(vec) == b"ab" * 10 + b"!"


def test_block_match_length_continuation():
    # matchlen nibble 15 + continuation 4 -> 4+15+4 = 23
    vec = (bytes([(1 << 4) | 15]) + b"z"
           + struct.pack("<H", 1) + bytes([4])
           + bytes([1 << 4]) + b"q")
    assert decompress_block(vec) == b"z" * 24 + b"q"


def test_block_dictionary_match():
    # match reaching into the external dict (block-dependent frames)
    vec = (bytes([(0 << 4) | 0])              # no literals
           + struct.pack("<H", 8)             # offset 8 into the dict
           + bytes([2 << 4]) + b"##")
    assert decompress_block(vec, dict_=b"ABCDEFGH") == b"ABCD##"


@pytest.mark.parametrize("bad,msg", [
    (b"", "empty block"),
    (bytes([5 << 4]) + b"abc", "literal run past end"),
    (bytes([(1 << 4) | 0]) + b"a" + b"\x01", "truncated match offset"),
    (bytes([(1 << 4) | 0]) + b"a" + struct.pack("<H", 0) + bytes([0]),
     "offset 0"),
    (bytes([(1 << 4) | 0]) + b"a" + struct.pack("<H", 5) + bytes([0]),
     "before stream"),
])
def test_block_malformed(bad, msg):
    with pytest.raises(ValueError, match=msg):
        decompress_block(bad)


# ------------------------------------------------- block round trips

def test_block_roundtrip_compresses_redundancy():
    data = b"spark " * 400
    comp = compress_block(data)
    assert len(comp) < len(data) // 4
    assert decompress_block(comp) == data


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=4096))
def test_block_roundtrip_random(data):
    assert decompress_block(compress_block(data)) == data


@pytest.mark.parametrize("period,reps", [(1, 100), (3, 67), (7, 40),
                                         (64, 10), (255, 5)])
def test_block_roundtrip_periodic(period, reps):
    data = bytes(range(period)) * reps
    assert decompress_block(compress_block(data)) == data


def test_block_roundtrip_boundary_sizes():
    # 12/13 straddle the no-match MFLIMIT guard; 15/19 the literal
    # continuation; 65535 the offset ceiling
    for n in (0, 1, 11, 12, 13, 14, 15, 16, 19, 20, 255, 256, 270,
              65535, 65536, 70000):
        data = bytes((i * 7) & 0xFF for i in range(n))
        assert decompress_block(compress_block(data)) == data


def test_block_roundtrip_incompressible():
    data = zlib.compress(bytes(range(256)) * 64, 9)
    assert decompress_block(compress_block(data)) == data


def test_block_end_guards_hold():
    """Spec guards the reference decoder relies on: the final
    sequence is literals-only covering ≥5 bytes, and no match starts
    in the last 12 bytes."""
    data = b"abcdabcdabcdabcdabcdabcd"  # highly matchable incl. tail
    comp = compress_block(data)
    # walk the sequences; collect (lit_len, match_start_positions)
    pos, out_len, last_lit = 0, 0, None
    while pos < len(comp):
        token = comp[pos]
        pos += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = comp[pos]
                pos += 1
                lit += b
                if b != 255:
                    break
        pos += lit
        out_len += lit
        if pos == len(comp):
            last_lit = lit
            break
        pos += 2
        ml = (token & 0x0F) + 4
        if (token & 0x0F) == 15:
            while True:
                b = comp[pos]
                pos += 1
                ml += b
                if b != 255:
                    break
        assert out_len < len(data) - 12   # match starts before limit
        out_len += ml
        assert out_len <= len(data) - 5   # match ends before the tail
    assert last_lit is not None and last_lit >= 5


# ------------------------------------------------------------ frames

def test_frame_roundtrip_and_structure():
    data = b"the quick brown fox " * 200
    frame = compress_frame(data)
    (magic,) = struct.unpack_from("<I", frame, 0)
    assert magic == FRAME_MAGIC
    flg = frame[4]
    assert flg >> 6 == 1                   # version
    assert flg & (1 << 5)                  # block-independent
    assert flg & (1 << 2)                  # content checksum present
    assert ((xxh32(frame[4:6]) >> 8) & 0xFF) == frame[6]
    assert decompress_frame(frame) == data
    assert frame.endswith(struct.pack("<I", xxh32(data)))


def test_frame_incompressible_stored_block():
    import hashlib
    # sha256 chain: genuinely incompressible (zlib of a periodic
    # pattern still carries LZ4-findable repeats)
    data = b"".join(hashlib.sha256(bytes([i])).digest()
                    for i in range(64))
    frame = compress_frame(data, content_checksum=False)
    (bsize,) = struct.unpack_from("<I", frame, 7)
    assert bsize & 0x80000000              # stored, high bit set
    assert decompress_frame(frame) == data


def test_frame_multi_block():
    # 64 KiB BD code 4 → 3 blocks for 150 000 bytes
    data = bytes((i * 13) & 0xFF for i in range(150_000))
    frame = compress_frame(data)
    assert decompress_frame(frame) == data


@settings(max_examples=30, deadline=None)
@given(st.binary(min_size=0, max_size=2048))
def test_frame_roundtrip_random(data):
    assert decompress_frame(compress_frame(data)) == data


def test_frame_block_dependent_decode():
    """Hand-built block-DEPENDENT frame (B.Indep clear): the second
    block's match reaches into block 1's output."""
    flg = (1 << 6)                         # v1, dependent, no checksums
    bd = 4 << 4
    desc = bytes([flg, bd])
    hc = (xxh32(desc) >> 8) & 0xFF
    blk1 = bytes([(8 << 4)]) + b"ABCDEFGH"            # literals only
    # block 2: match(offset 8, len 4) then 5 final literals
    blk2 = (bytes([(0 << 4) | 0]) + struct.pack("<H", 8)
            + bytes([(5 << 4)]) + b"12345")
    frame = (struct.pack("<I", FRAME_MAGIC) + desc + bytes([hc])
             + struct.pack("<I", len(blk1)) + blk1
             + struct.pack("<I", len(blk2)) + blk2
             + struct.pack("<I", 0))
    assert decompress_frame(frame) == b"ABCDEFGH" + b"ABCD" + b"12345"


@pytest.mark.parametrize("mutate,msg", [
    (lambda f: b"\x00" + f[1:], "magic"),
    (lambda f: f[:4] + bytes([f[4] ^ 0xC0]) + f[5:], "version"),
    (lambda f: f[:6] + bytes([f[6] ^ 0xFF]) + f[7:], "header checksum"),
    (lambda f: f[:-4] + b"\x00\x00\x00\x00", "content checksum"),
    (lambda f: f[:-8], "truncated"),
])
def test_frame_malformed(mutate, msg):
    frame = compress_frame(b"hello world " * 50)
    with pytest.raises(ValueError, match=msg):
        decompress_frame(mutate(frame))


# --------------------------------------------- Kafka record batches

def test_lz4_record_batches_end_to_end():
    """codec id 3: lz4-frame produce → broker decode → lz4 fetch
    responses → client decode; CRC covers the compressed body."""
    from aether_firebase_consumer_spark.sources.kafka_wire import (
        KafkaWireClient,
        MiniKafkaBroker,
        decode_record_batches,
        encode_record_batch,
    )

    entries = [(0, 100, b"k" * 50, b"v" * 500), (1, 200, None, b"w" * 500)]
    plain = encode_record_batch(entries)
    lz = encode_record_batch(entries, codec="lz4")
    assert len(lz) < len(plain)            # it actually compressed
    assert decode_record_batches(lz) == entries
    bad = bytearray(lz)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC32C"):
        decode_record_batches(bytes(bad))

    with MiniKafkaBroker(clock=lambda: 1, fetch_codec="lz4") as b:
        with KafkaWireClient(b.host, b.port) as c:
            c.produce_records("lz.t", 0,
                              [(b"a", b"x" * 1000, 11),
                               (b"b", b"y" * 1000, 22)], codec="lz4")
            c.produce("lz.t", 0, [(b"c", b"z")])   # v0 interop too
            got = c.fetch_records("lz.t", 0, 0)
    assert got == [(0, 11, b"a", b"x" * 1000), (1, 22, b"b", b"y" * 1000),
                   (2, 1, b"c", b"z")]
