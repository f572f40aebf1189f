"""Tests for the pure-Python Zstandard codec (RFC 8878).

Anchoring scheme (the same as test_lz4_py / test_snappy_py): every
layer is pinned by HAND-BUILT spec vectors first — FSE distribution
bitstream, FSE decoding-table contents, canonical Huffman layout,
Huffman stream decode, and a full hand-assembled frame exercising the
sequence path including repeat offsets — so correctness never rests
on round trips alone. Round trips then cover the encoder, and when a
reference ``zstd`` CLI is on PATH the golden tests cross-check both
directions against the real implementation across compression levels
(which exercises FSE-compressed tables, 4-stream Huffman literals,
treeless/repeat modes, and multi-block table persistence with
real-encoder bit patterns no hand vector reaches).
"""

import json
import os
import random
import shutil
import struct
import subprocess

import pytest

from aether_firebase_consumer_spark.sources import zstd_py
from aether_firebase_consumer_spark.sources.zstd_py import (
    _BackBits,
    _FwdBits,
    _HufTable,
    fse_build_table,
    fse_read_distribution,
    xxh64,
)

ZSTD_CLI = shutil.which("zstd")


# ------------------------------------------------------------ xxh64

def test_xxh64_empty_spec_vector():
    # the one universally published vector; the CLI goldens below pin
    # the rest (a frame checksum is the low 32 bits of xxh64)
    assert xxh64(b"") == 0xEF46DB3751D8E999


def test_xxh64_all_length_branches_distinct():
    data = bytes(range(256)) * 2
    seen = {xxh64(data[:n]) for n in (0, 1, 3, 4, 7, 8, 15, 16, 31,
                                      32, 33, 63, 64, 100, 512)}
    assert len(seen) == 15


# ----------------------------------------------- FSE spec vectors

def test_fse_distribution_hand_vector():
    # AL=5, freqs [16, 8, 8]: hand-packed per §4.1.1 including the
    # small-value optimization (16 → 5 bits) and the large form
    # (the second 8 needs val+threshold = 15 in 4 bits)
    fwd = _FwdBits(bytes([0x10, 0xF3, 0x01]))
    al, freqs = fse_read_distribution(fwd, 6)
    assert al == 5
    assert freqs == [16, 8, 8]
    assert fwd.byte_align() == 3


def test_fse_table_hand_vector():
    # freqs [2,1,1] at AL=2: spread step 5 places [s0,s0,s1,s2];
    # per-cell nbBits/baseline from the state counters
    symbols, nbits, base = fse_build_table([2, 1, 1], 2)
    assert symbols == [0, 0, 1, 2]
    assert nbits == [1, 1, 2, 2]
    assert base == [0, 2, 0, 0]


def test_fse_low_prob_symbols_at_table_end():
    # -1 probabilities take one cell each from the END, nbBits = AL
    symbols, nbits, base = fse_build_table([2, -1, -1], 2)
    assert symbols[3] == 1 and symbols[2] == 2
    assert nbits[3] == 2 and nbits[2] == 2


# ------------------------------------------- Huffman spec vectors

def test_huffman_canonical_layout_hand_vector():
    # transmitted weights [4,3,2,0,1] → inferred last weight 1,
    # max_bits 4; longest codes occupy the LOWEST table indices
    t = _HufTable([4, 3, 2, 0, 1])
    assert t.max_bits == 4
    assert t.symbols == [4, 5, 2, 2, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0]
    assert t.nbits[:4] == [4, 4, 3, 3]
    assert t.nbits[8] == 1


def test_huffman_stream_hand_vector():
    # codes from the table above: s0='1' (1 bit), s1='01' (2 bits);
    # stream for decode order [s0, s1, s0] packed below a marker bit
    t = _HufTable([4, 3, 2, 0, 1])
    assert bytes(t.decode_stream(bytes([0b11011]), 3)) == bytes([0, 1, 0])


def test_backward_reader_padding_semantics():
    bs = _BackBits(bytes([0xFF, 0x01]))    # marker at bit 8 → 8 bits
    assert bs.pos == 8
    assert bs.read(8) == 0xFF
    assert bs.pos == 0
    with pytest.raises(ValueError):
        bs.read(1)


# ----------------------------------------- hand-assembled frames

def _frame(blocks: bytes, fcs: int) -> bytes:
    # single-segment frame, 1-byte FCS, no checksum
    return struct.pack("<I", zstd_py.MAGIC) + bytes([0x20, fcs]) + blocks


def test_sequence_path_hand_frame():
    # raw literals "abcdef"; one sequence with RLE tables:
    # ll=4, of_code=2 with extra bits 0b01 → offset_value 5 → offset 2,
    # ml code 0 → match 3.  Execution: "abcd" + copy(2,3)="cdc" + "ef"
    lits = bytes([6 << 3]) + b"abcdef"
    seqs = bytes([1, 0x54, 4, 2, 0, 0b101])
    block = lits + seqs
    bh = 1 | (2 << 1) | (len(block) << 3)
    frame = _frame(bh.to_bytes(3, "little") + block, 9)
    assert zstd_py.decompress(frame) == b"abcdcdcef"


def test_repeat_offset_hand_frame():
    # two sequences, all-RLE tables, of_code 0 → offset_value 1 →
    # repeat offset 1 (initial rep list [1,4,8]): each sequence
    # repeats its last literal 3 times
    lits = bytes([2 << 3]) + b"ab"
    seqs = bytes([2, 0x54, 1, 0, 0, 0x01])
    block = lits + seqs
    bh = 1 | (2 << 1) | (len(block) << 3)
    frame = _frame(bh.to_bytes(3, "little") + block, 8)
    assert zstd_py.decompress(frame) == b"aaaabbbb"


def test_rle_literals_and_rle_block():
    # RLE literals type inside a compressed block
    lits = bytes([(5 << 3) | 0x01]) + b"z"     # type=1, regen=5
    seqs = bytes([0])                           # no sequences
    block = lits + seqs
    bh = 1 | (2 << 1) | (len(block) << 3)
    assert zstd_py.decompress(_frame(bh.to_bytes(3, "little") + block,
                                     5)) == b"zzzzz"
    # RLE block type at frame level: size field is the REGENERATED size
    bh = 1 | (1 << 1) | (7 << 3)
    assert zstd_py.decompress(_frame(bh.to_bytes(3, "little") + b"q",
                                     7)) == b"qqqqqqq"


def test_frame_content_size_mismatch_raises():
    bh = 1 | (3 << 3)                           # raw block "abc"
    frame = _frame(bh.to_bytes(3, "little") + b"abc", 99)
    with pytest.raises(ValueError, match="content size"):
        zstd_py.decompress(frame)


# ------------------------------------------------- encoder round trip

PAYLOADS = [
    b"",
    b"a",
    b"hello world " * 400,
    bytes(200_000),                            # RLE blocks
    bytes(range(256)) * 700,                   # > one 128 KiB block
]


@pytest.mark.parametrize("payload", PAYLOADS, ids=lambda p: str(len(p)))
def test_round_trip(payload):
    enc = zstd_py.compress(payload)
    assert zstd_py.decompress(enc) == payload


def test_round_trip_random():
    rng = random.Random(1234)
    for _ in range(20):
        n = rng.randrange(0, 5000)
        payload = bytes(rng.randrange(256) for _ in range(n))
        assert zstd_py.decompress(zstd_py.compress(payload)) == payload


def test_rle_chunk_shrinks():
    z = bytes(100_000)
    assert len(zstd_py.compress(z)) < 100


def test_checksum_detects_corruption():
    # store-only frame: a flipped literal bit is structurally valid,
    # so ONLY the XXH64 content checksum can catch it (an entropy-
    # coded frame usually dies earlier, in the Huffman stream)
    enc = bytearray(zstd_py.compress(b"payload under test " * 50,
                                     entropy=False))
    enc[-6] ^= 0x40                            # flip a content bit
    with pytest.raises(ValueError, match="checksum"):
        zstd_py.decompress(bytes(enc))


def test_entropy_frame_corruption_detected():
    # entropy-coded frame: corruption anywhere still surfaces as a
    # ValueError (stream structure or checksum), never wrong bytes
    data = b"payload under test " * 50
    enc = bytearray(zstd_py.compress(data))
    assert len(enc) < len(data)                # it actually compressed
    enc[-6] ^= 0x40
    with pytest.raises(ValueError):
        zstd_py.decompress(bytes(enc))


def test_no_checksum_flag():
    enc = zstd_py.compress(b"x" * 100, checksum=False)
    assert zstd_py.decompress(enc) == b"x" * 100


def test_truncation_raises():
    enc = zstd_py.compress(os.urandom(1000))
    for cut in (3, 5, 9, len(enc) // 2, len(enc) - 1):
        with pytest.raises(ValueError):
            zstd_py.decompress(enc[:cut])


def test_concatenated_and_skippable_frames():
    f1 = zstd_py.compress(b"hello ")
    skip = struct.pack("<II", 0x184D2A50, 5) + b"XXXXX"
    f2 = zstd_py.compress(b"world")
    assert zstd_py.decompress(f1 + skip + f2) == b"hello world"


# --------------------------------------------------- CLI goldens

needs_cli = pytest.mark.skipif(ZSTD_CLI is None,
                               reason="no reference zstd CLI on PATH")


def _cli(args, data):
    p = subprocess.run([ZSTD_CLI, "-c"] + args, input=data,
                       capture_output=True)
    assert p.returncode == 0, p.stderr.decode()
    return p.stdout


@needs_cli
def test_golden_reference_decodes_our_frames():
    for payload in (b"", b"abc", bytes(500_000), os.urandom(300_000),
                    b"spam and eggs " * 20_000):
        p = subprocess.run([ZSTD_CLI, "-d", "-c"],
                           input=zstd_py.compress(payload),
                           capture_output=True)
        assert p.returncode == 0, p.stderr.decode()
        assert p.stdout == payload


@needs_cli
@pytest.mark.parametrize("level", ["-1", "-3", "-9", "-19"])
def test_golden_we_decode_reference_frames(level):
    rng = random.Random(99)
    words = [b"alpha", b"beta", b"gamma", b"delta", b"epsilon"]
    payloads = [
        b" ".join(rng.choice(words) for _ in range(120_000)),  # ~700KB
        bytes(rng.randrange(256) for _ in range(80_000)),
        bytes(300_000),
        b"A" * 17,
    ]
    for payload in payloads:
        assert zstd_py.decompress(_cli([level], payload)) == payload


@needs_cli
def test_golden_long_window_and_no_check():
    rng = random.Random(5)
    payload = b"".join(rng.choice([b"foo", b"bar", b"baz"])
                       for _ in range(400_000))                # ~1.2MB
    assert zstd_py.decompress(
        _cli(["-6", "--long=20"], payload)) == payload
    assert zstd_py.decompress(
        _cli(["-9", "--no-check"], payload)) == payload


@needs_cli
def test_golden_checksum_parity_with_reference():
    # the reference VERIFIES our xxh64-based content checksum (it
    # errors on mismatch), pinning xxh64 beyond the "" vector
    payload = os.urandom(100_000)
    enc = bytearray(zstd_py.compress(payload))
    p = subprocess.run([ZSTD_CLI, "-d", "-c"], input=bytes(enc),
                       capture_output=True)
    assert p.returncode == 0
    enc[-1] ^= 0x01                            # break the checksum
    p = subprocess.run([ZSTD_CLI, "-d", "-c"], input=bytes(enc),
                       capture_output=True)
    assert p.returncode != 0


# --------------------------------------------- Kafka record batches

def test_zstd_record_batches_end_to_end():
    """codec id 4: zstd-frame produce → broker decode → zstd fetch
    responses → client decode; CRC covers the compressed body. The
    store-only encoder still shrinks repetitive payloads via RLE
    blocks, and the decode path accepts real-encoder frames (the
    golden tests above)."""
    from aether_firebase_consumer_spark.sources.kafka_wire import (
        KafkaWireClient,
        MiniKafkaBroker,
        decode_record_batches,
        encode_record_batch,
    )

    entries = [(0, 100, b"k" * 50, b"\x00" * 500), (1, 200, None, b"w")]
    zs = encode_record_batch(entries, codec="zstd")
    assert decode_record_batches(zs) == entries
    bad = bytearray(zs)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC32C"):
        decode_record_batches(bytes(bad))

    with MiniKafkaBroker(clock=lambda: 1, fetch_codec="zstd") as b:
        with KafkaWireClient(b.host, b.port) as c:
            c.produce_records("zs.t", 0,
                              [(b"a", b"x" * 1000, 11),
                               (b"b", b"y" * 1000, 22)], codec="zstd")
            c.produce("zs.t", 0, [(b"c", b"z")])   # v0 interop too
            got = c.fetch_records("zs.t", 0, 0)
    assert got == [(0, 11, b"a", b"x" * 1000), (1, 22, b"b", b"y" * 1000),
                   (2, 1, b"c", b"z")]


@needs_cli
def test_zstd_batch_payload_is_reference_decodable():
    """The RECORDS section of a codec-4 batch is a standard frame a
    real consumer's zstd library can decode: body starts at byte 21,
    records payload at body+40 (magic-2 fixed layout)."""
    from aether_firebase_consumer_spark.sources.kafka_wire import (
        encode_record_batch,
    )

    entries = [(0, 1, b"key", b"value " * 100)]
    batch = encode_record_batch(entries, codec="zstd")
    payload = batch[21 + 40:]
    p = subprocess.run([ZSTD_CLI, "-d", "-c"], input=payload,
                       capture_output=True)
    assert p.returncode == 0, p.stderr.decode()
    plain = encode_record_batch(entries)
    assert p.stdout == plain[21 + 40:]


# ----------------------------------------- entropy (Huffman) encoder

def test_entropy_tier_compresses_text():
    """The round-8 tier: order-0 Huffman literals (zero sequences)
    give a real ratio on text — the store-only encoder never did."""
    text = b"the quick brown fox jumps over the lazy dog. " * 2000
    enc = zstd_py.compress(text)
    assert len(enc) < 0.7 * len(text)
    assert zstd_py.decompress(enc) == text


def test_entropy_tier_roundtrip_matrix():
    """Both literal stream layouts (1-stream <=1023, 4-stream above),
    boundary sizes, skewed and uniform histograms, two-symbol
    degenerate codes, and the fallbacks (high bytes -> raw block,
    incompressible -> raw block) all round-trip bit-exactly."""
    rng = random.Random(8)
    cases = [
        b"ab",                                  # 2 symbols, 1 bit each
        b"ab" * 511 + b"c",                     # exactly 1023 literals
        b"ab" * 512,                            # smallest 4-stream
        bytes(rng.choice(b"abcdefgh") for _ in range(16384)) + b"Z",
        bytes(rng.randrange(32, 127) for _ in range(200_000)),
        bytes(rng.randrange(256) for _ in range(50_000)),   # raw path
        (b"skew" + b"e" * 37) * 3000,           # deep code lengths
        bytes([0, 128]) * 4000,                 # last symbol == 128
        bytes([0, 129]) * 4000,                 # >128 -> raw fallback
        json.dumps({"k": list(range(5000))}).encode(),
    ]
    for payload in cases:
        enc = zstd_py.compress(payload)
        assert zstd_py.decompress(enc) == payload
        enc2 = zstd_py.compress(payload, entropy=False)
        assert zstd_py.decompress(enc2) == payload
        assert len(enc) <= len(enc2)


def test_package_merge_lengths_complete_and_limited():
    """The length-limited code is COMPLETE (Kraft sum exactly 1 —
    required by the implied-last-weight encoding) and respects the
    11-bit zstd ceiling even on maximally skewed histograms."""
    from aether_firebase_consumer_spark.sources.zstd_py import (
        _pm_lengths,
    )

    fib = {i: max(1, 2 ** i) for i in range(40)}    # forces deep codes
    lengths = _pm_lengths(fib, 11)
    assert max(lengths.values()) <= 11
    assert sum(2 ** -l for l in lengths.values()) == 1.0
    flat = {i: 1 for i in range(256)}
    lengths = _pm_lengths(flat, 11)
    assert set(lengths.values()) == {8}


@needs_cli
def test_golden_reference_decodes_entropy_frames():
    """The reference CLI accepts and exactly inverts our
    Huffman-literals blocks — the encoder emits spec frames, not just
    frames our own decoder happens to accept."""
    rng = random.Random(44)
    for payload in (b"json-ish " * 50_000,
                    bytes(rng.choice(b"aaaabbbccd") for _ in
                          range(150_000)),
                    json.dumps([{"k": i} for i in range(9000)]).encode()):
        enc = zstd_py.compress(payload)
        assert len(enc) < len(payload)
        p = subprocess.run([ZSTD_CLI, "-d", "-c"], input=enc,
                           capture_output=True)
        assert p.returncode == 0, p.stderr.decode()
        assert p.stdout == payload


def test_fse_weight_tree_roundtrip():
    """Payloads whose last present byte exceeds 128 force the
    FSE-compressed Huffman tree description (direct 4-bit weights cap
    at 128) — the Kafka production case, since record-batch varint
    framing always contains high bytes."""
    rng = random.Random(21)
    for payload in (
            bytes([200, 201]) * 3000,            # 2 weights, both high
            bytes([255, 0, 1]) * 2000,           # last symbol 255
            bytes(rng.choice(b"\x86\x8e\x03 etaoinshrdlu") for _ in
                  range(50_000)),
            bytes(rng.randrange(128, 256) for _ in range(2000))
            + b"json tail " * 500):
        enc = zstd_py.compress(payload)
        assert len(enc) < len(payload)
        assert zstd_py.decompress(enc) == payload


def test_fse_weight_distribution_writer_inverts_reader():
    """_fse_write_distribution is the exact inverse of
    fse_read_distribution across normalizations with zero runs and
    the small-value optimization."""
    from aether_firebase_consumer_spark.sources.zstd_py import (
        _fse_normalize,
        _fse_write_distribution,
    )

    rng = random.Random(5)
    for _ in range(50):
        nsyms = rng.randrange(2, 13)
        freq = {rng.randrange(0, 13): rng.randrange(1, 1000)
                for _ in range(nsyms)}
        if len(freq) < 2:
            continue
        probs = _fse_normalize(freq, 64)
        assert sum(probs.values()) == 64
        assert all(p >= 1 for p in probs.values())
        freqs = [probs.get(v, 0) for v in range(max(freq) + 1)]
        enc = _fse_write_distribution(freqs, 6)
        al, got = fse_read_distribution(_FwdBits(enc), 6)
        assert al == 6
        # reader may stop before our trailing zeros; the positives
        # and their positions must match exactly
        assert got == freqs[:len(got)]
        assert all(f == 0 for f in freqs[len(got):])


@needs_cli
def test_golden_reference_decodes_fse_weight_frames():
    rng = random.Random(77)
    for payload in (bytes([254, 1, 7]) * 40_000,
                    bytes(rng.choice(bytes(range(120, 256))) for _ in
                          range(80_000))):
        enc = zstd_py.compress(payload)
        p = subprocess.run([ZSTD_CLI, "-d", "-c"], input=enc,
                           capture_output=True)
        assert p.returncode == 0, p.stderr.decode()
        assert p.stdout == payload


# --------------------------------------- LZ sequences (round 8, pt 2)

def test_ll_code_table_matches_spec():
    """Regression pin for the table bug the sequence ENCODER exposed:
    the literal-length code table skipped the spec's code-24 row
    (baseline 48, 4 extra bits) and appended a spurious 131072, so
    codes >= 24 were all shifted — reference frames carrying literal
    runs >= 48 inside a sequence misdecoded. Values per RFC 8878
    §3.1.1.3.2.1.1's Literals_Length_Code table."""
    from aether_firebase_consumer_spark.sources.zstd_py import (
        _LL_BASE,
        _LL_EXTRA,
        _ML_BASE,
        _ML_EXTRA,
    )

    assert _LL_BASE[22:28] == [32, 40, 48, 64, 128, 256]
    assert _LL_EXTRA[22:28] == [3, 3, 4, 6, 7, 8]
    assert _LL_BASE[-1] == 65536 and _LL_EXTRA[-1] == 16
    assert len(_LL_BASE) == len(_LL_EXTRA) == 36
    # ML spot rows (these were transcribed correctly; keep them pinned)
    assert _ML_BASE[39:43] == [59, 67, 83, 99]
    assert _ML_EXTRA[39:43] == [3, 4, 4, 5]


def test_big_literal_run_sequence_decodes():
    """A hand-built frame whose one sequence carries ll = 100 (code 24
    after the fix: 48 + 52 in 4+... 100 -> code 25, and 50 -> code 24)
    regenerates correctly — the shapes the shifted table corrupted."""
    for ll in (48, 50, 63, 64, 100, 300):
        lits = bytes((65 + i % 26) for i in range(ll))
        enc_seq = zstd_py._encode_sequences([(ll, 4, 4)])
        content = zstd_py._plain_literals_section(lits) + enc_seq
        bh = 1 | (2 << 1) | (len(content) << 3)
        frame = struct.pack("<I", zstd_py.MAGIC) + bytes([0x00, 0x38])
        frame += struct.pack("<I", ll + 4)[:0]  # no FCS: fcs flag 0
        # single-byte FCS form instead: regen <= 255 only for small ll
        # -> use the 4-byte FCS header shape shared by compress()
        hdr = struct.pack("<I", zstd_py.MAGIC) + bytes([2 << 6, 0x38])
        hdr += struct.pack("<I", ll + 4)
        frame = hdr + bh.to_bytes(3, "little") + content
        out = zstd_py.decompress(frame)
        assert out == lits + lits[-4:], ll


def test_lz_sequences_round_trip_and_ratio():
    """The LZ tier: matches shrink repetitive payloads far below the
    entropy-only bound, and every shape round-trips."""
    rng = random.Random(31)
    text = b"the quick brown fox jumps over the lazy dog. " * 2000
    enc = zstd_py.compress(text)
    assert len(enc) < 0.02 * len(text)      # entropy-only tier: ~0.56
    assert zstd_py.decompress(enc) == text
    cases = [
        b"abc" * 100,
        (b"A" * 100) + b"unique-middle" + (b"A" * 100),
        bytes(rng.choice(b"abcd") for _ in range(60_000)),
        (bytes(rng.randrange(256) for _ in range(400))) * 50,
        b"no-repeats-here-" + bytes(range(256)),
    ]
    for payload in cases:
        assert zstd_py.decompress(zstd_py.compress(payload)) == payload


@needs_cli
def test_golden_reference_decodes_lz_frames():
    """The reference CLI inverts our sequence-bearing frames exactly —
    predefined-FSE states, extra bits, offsets, literal runs and all."""
    rng = random.Random(63)
    payloads = [
        b"the quick brown fox jumps over the lazy dog. " * 3000,
        json.dumps([{"k": i, "v": "hello world %d" % i}
                    for i in range(3000)]).encode(),
        bytes(rng.choice(b"abcd") for _ in range(100_000)),
        bytes(rng.randrange(128, 256) for _ in range(3000)) * 4,
        (b"A" * 100) + b"unique-middle-part" + (b"A" * 100),
        b"x" * 20 + bytes(rng.randrange(256) for _ in range(200_000)),
    ]
    for payload in payloads:
        enc = zstd_py.compress(payload)
        p = subprocess.run([ZSTD_CLI, "-d", "-c"], input=enc,
                           capture_output=True)
        assert p.returncode == 0, p.stderr.decode()
        assert p.stdout == payload
