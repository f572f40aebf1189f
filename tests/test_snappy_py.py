"""Tests for the pure-Python Snappy block codec and its Kafka
record-batch integration (codec id 2).

The decompressor is pinned against hand-built spec vectors (format
description: literal / copy-1 / copy-2 / copy-4 tags, varint
preamble, overlapping RLE copies) so it is anchored independently of
our own compressor; the compressor is then property-tested through
round trips over adversarial inputs (runs, periodic patterns, random
bytes, all sizes crossing the 60-literal and 64-copy boundaries).
"""

from __future__ import annotations

import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from aether_firebase_consumer_spark.sources.snappy_py import (
    compress,
    decompress,
)


# ------------------------------------------------------- spec vectors

def test_empty_input():
    assert compress(b"") == b"\x00"
    assert decompress(b"\x00") == b""


def test_decompress_literal_vector():
    # preamble 5, literal tag (len-1=4)<<2, body
    assert decompress(b"\x05" + bytes([4 << 2]) + b"abcde") == b"abcde"


def test_decompress_long_literal_vector():
    # 100-byte literal: len-1=99 needs the 1-extra-byte form (tag 60)
    body = bytes(range(100)) * 1
    vec = b"\x64" + bytes([60 << 2, 99]) + body
    assert decompress(vec) == body


def test_decompress_copy1_vector():
    # "abcd" literal then copy-1 offset=4 len=4 -> "abcdabcd"
    vec = (b"\x08" + bytes([3 << 2]) + b"abcd"
           + bytes([0x01 | ((4 - 4) << 2) | ((4 >> 8) << 5), 4 & 0xFF]))
    assert decompress(vec) == b"abcdabcd"


def test_decompress_copy2_overlapping_rle():
    # "ab" then copy-2 offset=2 len=18 -> "ab"*10 (self-overlap)
    vec = (b"\x14" + bytes([1 << 2]) + b"ab"
           + bytes([0x02 | ((18 - 1) << 2)]) + (2).to_bytes(2, "little"))
    assert decompress(vec) == b"ab" * 10


def test_decompress_copy4_vector():
    vec = (b"\x08" + bytes([3 << 2]) + b"wxyz"
           + bytes([0x03 | ((4 - 1) << 2)]) + (4).to_bytes(4, "little"))
    assert decompress(vec) == b"wxyzwxyz"


@pytest.mark.parametrize("bad,msg", [
    (b"", "varint"),                                   # no preamble
    (b"\x80\x80\x80\x80\x80\x80", "varint"),           # unterminated
    (b"\x05" + bytes([4 << 2]) + b"ab", "literal"),    # short body
    (b"\x04" + bytes([0x01 | 0 << 2, 9]), "offset"),   # copy before start
    (b"\x03" + bytes([1 << 2]) + b"ab", "length"),     # preamble mismatch
])
def test_decompress_malformed(bad, msg):
    with pytest.raises(ValueError, match=msg):
        decompress(bad)


# ------------------------------------------------------- round trips

def test_roundtrip_compresses_redundancy():
    data = (b"the quick brown fox " * 200) + bytes(500)
    blob = compress(data)
    assert decompress(blob) == data
    assert len(blob) < len(data) // 4          # real compression


@given(st.binary(min_size=0, max_size=300))
@settings(max_examples=150, deadline=None)
def test_roundtrip_random(data):
    assert decompress(compress(data)) == data


@given(st.integers(1, 5), st.integers(1, 400))
@settings(max_examples=80, deadline=None)
def test_roundtrip_periodic(period, reps):
    # periodic data exercises overlapping copies and the 64-byte
    # copy-split path (incl. the must-leave->=4-remainder fixup)
    data = (bytes(range(65, 65 + period)) * reps)
    assert decompress(compress(data)) == data


def test_roundtrip_boundary_sizes():
    # literal-length encoding boundaries: 60/61 tag forms, 256, 65536
    for n in (1, 59, 60, 61, 255, 256, 257, 65535, 65536, 65537):
        data = bytes((i * 7) & 0xFF for i in range(n))
        assert decompress(compress(data)) == data


def test_roundtrip_incompressible():
    # pseudo-random via zlib of a counter — no 4-byte repeats likely
    data = zlib.compress(bytes(range(256)) * 64, 9)
    assert decompress(compress(data)) == data


# --------------------------------------------- Kafka record batches

def test_snappy_record_batches_end_to_end():
    """codec id 2: snappy produce → broker decode → snappy fetch
    responses → client decode; CRC covers the compressed body."""
    from aether_firebase_consumer_spark.sources.kafka_wire import (
        KafkaWireClient,
        MiniKafkaBroker,
        decode_record_batches,
        encode_record_batch,
    )

    entries = [(0, 100, b"k" * 50, b"v" * 500), (1, 200, None, b"w" * 500)]
    plain = encode_record_batch(entries)
    sn = encode_record_batch(entries, codec="snappy")
    assert len(sn) < len(plain)            # it actually compressed
    assert decode_record_batches(sn) == entries
    bad = bytearray(sn)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC32C"):
        decode_record_batches(bytes(bad))

    with MiniKafkaBroker(clock=lambda: 1, fetch_codec="snappy") as b:
        with KafkaWireClient(b.host, b.port) as c:
            c.produce_records("sn.t", 0,
                              [(b"a", b"x" * 1000, 11),
                               (b"b", b"y" * 1000, 22)], codec="snappy")
            c.produce("sn.t", 0, [(b"c", b"z")])   # v0 interop too
            got = c.fetch_records("sn.t", 0, 0)
    assert got == [(0, 11, b"a", b"x" * 1000), (1, 22, b"b", b"y" * 1000),
                   (2, 1, b"c", b"z")]
