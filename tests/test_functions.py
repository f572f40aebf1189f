"""Unit tests: scalar core (hash O9, nested O11, path validation O7/O17).

Golden values mirror the reference's semantics (utils.hash =
md5(json.dumps(sort_keys=True))[:16], firebase/app/utils.py:29-33; path
rules firebase/app/artifacts.py:159-172; negative fixtures
firebase/tests/test_unit.py:42-50).
"""

from __future__ import annotations

import hashlib
import json

from pyspark.sql import functions as F

from aether_firebase_consumer_spark.functions.hashing import (
    canonical_json_hash,
    content_hash_expr,
    py_hash,
)
from aether_firebase_consumer_spark.functions.nested import (
    get_nested,
    get_nested_json,
    replace_nested,
)
from aether_firebase_consumer_spark.operators.routing import (
    handles_topic,
    path_for_topic,
    strip_tenant,
    validate_path,
)


def test_py_hash_matches_reference_algorithm():
    doc = {"b": 1, "a": {"z": [1, 2], "y": "x"}, "c": None}
    expected = hashlib.md5(
        json.dumps(doc, sort_keys=True).encode("utf-8")).hexdigest()[:16]
    assert py_hash(doc) == expected
    assert len(py_hash(doc)) == 16


def test_canonical_json_hash_udf_byte_parity(spark):
    df = spark.createDataFrame(
        [("a", (1, "s"), 3), ("b", (7, ""), 4)],
        "id string, nested struct<x:int, a:string>, n long")
    got = {r["id"]: r["h"] for r in df.select(
        "id", canonical_json_hash(F.struct(*df.columns)).alias("h")).collect()}
    # the reference hashes the plain dict form of the document
    assert got["a"] == py_hash({"id": "a", "nested": {"x": 1, "a": "s"}, "n": 3})
    assert got["b"] == py_hash({"id": "b", "nested": {"x": 7, "a": ""}, "n": 4})


def test_content_hash_expr_is_deterministic_and_order_insensitive(spark):
    df1 = spark.createDataFrame([(1, "x")], ["a", "b"])
    df2 = spark.createDataFrame([("x", 1)], ["b", "a"]).select("a", "b")
    h1 = df1.select(content_hash_expr(df1).alias("h")).first()["h"]
    h2 = df2.select(content_hash_expr(df2).alias("h")).first()["h"]
    assert h1 == h2
    assert len(h1) == 16


def test_nested_get_set(spark):
    df = spark.createDataFrame(
        [(((5,),), '{"b": {"c": 7}}')],
        "a struct<b:struct<c:int>>, j string")
    row = df.select(
        get_nested("a", ["b", "c"]).alias("typed"),
        get_nested_json("j", ["b", "c"]).cast("int").alias("json"),
        replace_nested(F.col("a"), ["b", "c"], F.lit(9)).alias("set"),
    ).first()
    assert row["typed"] == 5
    assert row["json"] == 7
    assert row["set"]["b"]["c"] == 9


def test_validate_path_reference_negative_fixtures():
    # firebase/tests/test_unit.py:42-50
    assert validate_path("{illegal}/sub/stitution")
    assert validate_path("too/short")
    assert not validate_path("_aether/entities/{topic}")
    assert not validate_path("one")
    assert validate_path("a/b")


def test_tenant_strip_is_anchored_not_charset(spark):
    # the lstrip bug (firebase/app/artifacts.py:375-376): tenant 'ten'
    # must not eat leading chars of 'ten.tenant_data'
    df = spark.createDataFrame([("ten.nets",)], ["topic"])
    assert df.select(strip_tenant("topic", "ten").alias("n")) \
             .first()["n"] == "nets"


def test_topic_pattern_matching():
    assert handles_topic("t1.clicks", "c*", "t1")
    assert handles_topic("t1.clicks", "clicks", "t1")
    assert not handles_topic("t2.clicks", "c*", "t1")
    assert not handles_topic("t1.views", "c*", "t1")


def test_path_for_topic(spark):
    df = spark.createDataFrame([("clicks",)], ["t"])
    assert df.select(path_for_topic("t").alias("p")) \
             .first()["p"] == "_aether/entities/clicks"


def test_approx_sketches_within_tolerance(spark):
    """Approximate aggregates (the 100 TB profiling path: HLL distinct,
    quantile sketch) must land within their documented error of the
    exact answers — at scale these replace exact DISTINCT/percentile
    when the exact shuffle is the bottleneck."""
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    row = li.agg(
        F.countDistinct("l_orderkey").alias("exact_d"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_d"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_p50"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 10000)")
        .alias("approx_p50"),
    ).collect()[0]
    assert abs(row["approx_d"] - row["exact_d"]) <= 0.05 * row["exact_d"]
    assert abs(float(row["approx_p50"]) - float(row["exact_p50"])) \
        <= 0.02 * float(row["exact_p50"])


def test_lit_doubles_bit_exact_roundtrip(spark):
    """lit_doubles/lit_double_matrix must reproduce arbitrary doubles
    bit-for-bit vs F.lit — incl. exponent-form reprs and edge values —
    since ANN/k-means near-tie argmax decisions ride on last bits."""
    import random
    import struct as _s

    from pyspark.sql import functions as F

    from aether_firebase_consumer_spark.functions.vectors import (
        lit_double_matrix,
        lit_doubles,
    )

    rng = random.Random(7)
    vals = [0.0, -0.0, 1.0, -1.0, 1e-300, -4.655e-10, 0.1, 2/3,
            1.7976931348623157e308, 5e-324]
    vals += [rng.uniform(-1, 1) for _ in range(200)]
    vals += [rng.uniform(-1e10, 1e10) * 10 ** rng.randint(-200, 200)
             for _ in range(200)]
    got = spark.range(1).select(lit_doubles(vals).alias("x")).first()["x"]
    want = spark.range(1).select(F.lit(vals).alias("x")).first()["x"]
    as_bits = [_s.pack("<d", v) for v in got]
    want_bits = [_s.pack("<d", v) for v in want]
    assert as_bits == want_bits

    mat = [vals[i::20] for i in range(20)]
    gm = spark.range(1).select(lit_double_matrix(mat).alias("x")).first()["x"]
    assert [[_s.pack("<d", v) for v in row] for row in gm] \
        == [[_s.pack("<d", v) for v in row] for row in mat]
