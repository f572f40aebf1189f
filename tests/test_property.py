"""Property-based tests (hypothesis) — the randomized-document tier of
the reference's test strategy (SampleGenerator over the annotated
schema, ``firebase/tests/__init__.py:229-254``), aimed at the engine's
semantic kernels: canonical-JSON hashing, filter/mask semantics, and
nested get/set.

Each property drives ONE Spark job over a generated batch of documents
(not one job per example) so the suite stays fast while still covering
randomized structure.
"""

from __future__ import annotations

import json

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from aether_firebase_consumer_spark.functions.hashing import (
    canonical_json_hash_str,
    py_hash,
)

# JSON documents: nested dicts/lists of scalars, string keys
scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-2**31, max_value=2**31),
    st.text(st.characters(min_codepoint=32, max_codepoint=126), max_size=12),
)
json_docs = st.recursive(
    scalars,
    lambda kids: st.one_of(
        st.lists(kids, max_size=4),
        st.dictionaries(st.text(st.characters(min_codepoint=97, max_codepoint=122),
                                min_size=1, max_size=6),
                        kids, max_size=4),
    ),
    max_leaves=12,
)


@settings(max_examples=5, deadline=None)
@given(st.lists(st.dictionaries(
    st.text(st.characters(min_codepoint=97, max_codepoint=122), min_size=1, max_size=6),
    json_docs, max_size=4), min_size=1, max_size=20))
def test_canonical_hash_matches_reference_bytes(spark, docs):
    """O9 parity property: for ANY JSON document, the engine's
    canonical-JSON hash must byte-match the reference's
    md5(json.dumps(sort_keys=True))[:16] (utils.py:29-33)."""
    payloads = [json.dumps(d) for d in docs]
    df = spark.createDataFrame([(i, p) for i, p in enumerate(payloads)],
                               "i int, payload string")
    got = {r["i"]: r["h"] for r in
           df.select("i", canonical_json_hash_str(F.col("payload")).alias("h"))
           .collect()}
    for i, d in enumerate(docs):
        assert got[i] == py_hash(json.loads(payloads[i])), d


@settings(max_examples=5, deadline=None)
@given(st.lists(st.tuples(
    st.sampled_from(["operational", "closed", "unknown", None]),
    st.integers(0, 100)), min_size=1, max_size=30))
def test_filter_semantics_match_python_reference(spark, rows):
    """O3 property: the engine's predicate filter must keep exactly the
    rows a plain-Python evaluation of the pass-condition keeps
    (artifacts.py:346-358 semantics: value at path ∈ pass list)."""
    from aether_firebase_consumer_spark.operators.filtering import (
        FilterConfig,
        apply_filter,
    )
    df = spark.createDataFrame(
        [(i, s, v) for i, (s, v) in enumerate(rows)],
        "i int, operational_status string, v int")
    cfg = FilterConfig("operational_status", ["operational", "closed"])
    got = sorted(r["i"] for r in apply_filter(df, cfg).collect())
    want = sorted(i for i, (s, _) in enumerate(rows)
                  if s in ("operational", "closed"))
    assert got == want


@settings(max_examples=5, deadline=None)
@given(st.dictionaries(
    st.sampled_from(["public", "private", "secret"]),
    st.sampled_from(["public", "private", "secret"]), min_size=0, max_size=3))
def test_mask_drops_exactly_above_emit_level(spark, classification):
    """O4 property: masking at emit level L drops exactly the columns
    classified above L in the ordered mask_levels list — never more,
    never fewer (artifacts.py:359-370 semantics)."""
    from aether_firebase_consumer_spark.operators.masking import (
        MaskConfig,
        apply_mask,
    )
    levels = ["public", "private", "secret"]
    cols = {f"c_{name}": cls for name, cls in
            zip("abc", classification.values())}
    if not cols:
        return
    df = spark.createDataFrame(
        [tuple(range(len(cols) + 1))], "id int, " +
        ", ".join(f"{c} int" for c in cols))
    cfg = MaskConfig(levels, "private")
    out = apply_mask(df, cfg, cols)
    kept = set(out.columns) - {"id"}
    want = {c for c, cls in cols.items()
            if levels.index(cls) <= levels.index("private")}
    assert kept == want


# ---------------------------------------------------------------- avro codec

_avro_record = st.fixed_dictionaries({
    "s": st.text(max_size=20),
    "n": st.integers(min_value=-(2**63), max_value=2**63 - 1),
    "f": st.floats(allow_nan=False, allow_infinity=False, width=64),
    "flag": st.booleans(),
    "opt": st.one_of(st.none(), st.text(max_size=8)),
    "tags": st.lists(st.text(max_size=6), max_size=5),
    "attrs": st.dictionaries(st.text(min_size=1, max_size=6),
                             st.integers(min_value=-10**9, max_value=10**9),
                             max_size=4),
    "raw": st.binary(max_size=16),
})

_AVRO_PROP_SCHEMA = {
    "type": "record", "name": "prop",
    "fields": [
        {"name": "s", "type": "string"},
        {"name": "n", "type": "long"},
        {"name": "f", "type": "double"},
        {"name": "flag", "type": "boolean"},
        {"name": "opt", "type": ["null", "string"]},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "attrs", "type": {"type": "map", "values": "long"}},
        {"name": "raw", "type": "bytes"},
    ],
}


@settings(max_examples=200, deadline=None)
@given(rec=_avro_record)
def test_avro_codec_roundtrip_property(rec):
    """decode(encode(x)) == x for arbitrary records over the full
    primitive/array/map/union surface — the codec can't lose or shift
    a byte anywhere in the varint/length-prefix framing."""
    from aether_firebase_consumer_spark.sources.avro_codec import (
        decode_record,
        encode_record,
    )
    assert decode_record(_AVRO_PROP_SCHEMA,
                         encode_record(_AVRO_PROP_SCHEMA, rec)) == rec


def test_upsert_table_model_based_op_sequences(spark, tmp_path):
    """Model-based check of the upsert table: a random sequence of
    merge / delete / partitioned-merge / vacuum operations must leave
    the table equal to a plain Python dict applying the same ops, and
    time travel must reproduce every retained snapshot. Derandomized
    hypothesis (fixed seeds) so the suite stays deterministic."""
    import random as _random

    from aether_firebase_consumer_spark.sinks.upsert import (
        ParquetUpsertTable,
    )

    for seed in (0, 1, 2):
        rng = _random.Random(seed)
        path = str(tmp_path / f"model_{seed}")
        t = ParquetUpsertTable(spark, path, ["id"],
                               partition_col="part",
                               retain_versions=50)
        model: dict[str, tuple] = {}
        snapshots: list[dict] = []
        for step in range(8):
            op = rng.choice(["merge", "merge", "merge", "delete"])
            if op == "merge" or not model:
                n = rng.randint(1, 6)
                rows = [(f"k{rng.randint(0, 9)}",
                         rng.randint(0, 99),
                         f"p{rng.randint(0, 2)}")
                        for _ in range(n)]
                # dropDuplicates keeps an arbitrary row per key within
                # a batch; make batches key-unique so the model is
                # well-defined (the sink's documented contract)
                uniq = {}
                for r in rows:
                    uniq[r[0]] = r
                rows = list(uniq.values())
                df = spark.createDataFrame(
                    rows, "id string, v int, part string")
                t.merge(df)
                for (k, v, p) in rows:
                    model[k] = (v, p)
            else:
                keys = rng.sample(sorted(model), rng.randint(
                    1, min(3, len(model))))
                t.delete_keys(spark.createDataFrame(
                    [(k,) for k in keys], "id string"))
                for k in keys:
                    model.pop(k)
            got = {r["id"]: (r["v"], r["part"])
                   for r in (t.read().collect() if t.read() is not None
                             else [])}
            assert got == model, (seed, step, op)
            snapshots.append(dict(model))
        # time travel: every retained version replays its snapshot
        vers = t.versions()
        assert len(vers) == len(snapshots)
        for v, snap in zip(vers, snapshots):
            got = {r["id"]: (r["v"], r["part"])
                   for r in t.read_version(v).collect()}
            assert got == snap, (seed, v)
        # vacuum keeps the newest snapshots readable
        t.vacuum(keep_last_n=2)
        assert len(t.versions()) == 2
        got = {r["id"]: (r["v"], r["part"]) for r in t.read().collect()}
        assert got == model


# ------------------------------------------------- kafka wire codecs

_kv = st.one_of(st.none(), st.binary(max_size=64))
_entry = st.tuples(
    st.integers(min_value=0, max_value=2**31),           # offset delta base
    st.integers(min_value=-2**40, max_value=2**40),      # timestamp ms
    _kv, _kv)


@given(st.lists(_entry, min_size=1, max_size=20),
       st.sampled_from([None, "gzip", "snappy"]))
@settings(max_examples=60, deadline=None)
def test_record_batch_roundtrip_property(entries, codec):
    """Any (offset, ts, key, value) sequence with strictly-increasing
    offsets round-trips through the magic-2 codec — plain, gzip, or
    snappy; any TRUNCATION decodes to a clean prefix of whole batches
    (never an exception, never a partial record)."""
    from aether_firebase_consumer_spark.sources.kafka_wire import (
        decode_record_batches,
        encode_record_batch,
    )

    # make offsets strictly increasing (cumulative), per the log model
    fixed = []
    off = 0
    for d, ts, k, v in entries:
        fixed.append((off, ts, k, v))
        off += 1 + (d % 3)       # gaps allowed (compaction)
    wire = encode_record_batch(fixed, codec=codec)
    assert decode_record_batches(wire) == fixed
    # truncation at every boundary: prefix-of-batches or nothing
    for cut in (0, 1, 12, len(wire) // 2, len(wire) - 1):
        got = decode_record_batches(wire[:cut])
        assert got == [] or got == fixed


@given(st.lists(st.tuples(st.integers(0, 2**30), _kv, _kv),
                min_size=1, max_size=20))
@settings(max_examples=60, deadline=None)
def test_message_set_roundtrip_property(entries):
    """Magic-0 message sets: round trip for any offsets/keys/values;
    truncation yields a prefix, never an error."""
    from aether_firebase_consumer_spark.sources.kafka_wire import (
        decode_message_set,
        encode_message_set,
    )

    wire = encode_message_set(entries)
    assert decode_message_set(wire) == entries
    got = decode_message_set(wire[:len(wire) - 1])
    assert got == entries[:len(got)]


@given(st.binary(max_size=200))
@settings(max_examples=100, deadline=None)
def test_crc32c_matches_bitwise_reference(data):
    """Table-driven CRC32C equals a bit-at-a-time reference
    implementation of the Castagnoli polynomial."""
    from aether_firebase_consumer_spark.sources.kafka_wire import crc32c

    crc = 0xFFFFFFFF
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = (crc >> 1) ^ 0x82F63B78 if crc & 1 else crc >> 1
    assert crc32c(data) == crc ^ 0xFFFFFFFF


@given(st.lists(st.integers(min_value=-2**62, max_value=2**62),
                min_size=1, max_size=50))
@settings(max_examples=100, deadline=None)
def test_zigzag_varint_roundtrip(values):
    from aether_firebase_consumer_spark.sources.kafka_wire import (
        _get_varint,
        _put_varint,
    )

    buf = bytearray()
    for v in values:
        _put_varint(buf, v)
    pos = 0
    out = []
    for _ in values:
        v, pos = _get_varint(bytes(buf), pos)
        out.append(v)
    assert out == values and pos == len(buf)


@settings(max_examples=5, deadline=None)
@given(st.lists(
    st.tuples(st.integers(min_value=1, max_value=12),   # token count
              st.booleans()),                           # repeated words?
    min_size=8, max_size=25))
def test_linear_probe_matches_numpy_lstsq(spark, tmp_path_factory,
                                          shapes):
    """Independent-implementation property for the exact-integer
    Cramer least squares (quality_linear_probe_trained): on random
    corpora, every prediction matches numpy.linalg.lstsq to float
    tolerance — a wrong cofactor sign or a feature-definition mismatch
    (Spark split vs str.split) fails immediately."""
    import numpy as np
    from hypothesis import assume

    from aether_firebase_consumer_spark.plans.quality_queries import (
        quality_linear_probe_trained,
    )

    rows = []
    for i, (tok, repeat) in enumerate(shapes):
        if repeat:
            words = ["ab"] * tok
        else:
            words = [chr(ord("a") + (j % 26)) * (1 + j % 3)
                     for j in range(tok)]
        rows.append((i, " ".join(words)))
    sf = tmp_path_factory.mktemp("lp")
    spark.createDataFrame(rows, "doc_id bigint, text string") \
        .write.mode("overwrite").parquet(str(sf / "documents.parquet"))
    try:
        got = {r.doc_id: r.pred_chars
               for r in quality_linear_probe_trained(
                   spark, str(sf)).collect()}
    except ValueError:
        assume(False)  # degenerate design matrix: not this property
        return

    feats = {i: (len(t.split(" ")), len(set(t.split(" "))), len(t))
             for i, t in rows}
    X = np.array([[1.0, feats[i][0], feats[i][1]] for i, _ in rows])
    y = np.array([float(feats[i][2]) for i, _ in rows])
    w, *_ = np.linalg.lstsq(X, y, rcond=None)
    for i, _ in rows:
        if i not in got:       # top-100 keeps all (n<=25) — always in
            continue
        want = w[0] + w[1] * feats[i][0] + w[2] * feats[i][1]
        assert abs(got[i] - want) <= 1e-6 * max(1.0, abs(want)), \
            (i, got[i], want)
