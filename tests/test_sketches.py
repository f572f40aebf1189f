"""Approximate-aggregate (sketch) support: HLL count-distinct and
quantile sketches are engine built-ins; their outputs are
approximation-algorithm-specific so they can't join the DuckDB
hash-equality gate — instead these tests pin RELATIVE-ERROR bounds vs
exact answers on the fixtures, which is the contract a user of
approx_* actually relies on."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_approx_count_distinct_error_bound(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    exact = ev.select(F.countDistinct("user_id")).first()[0]
    approx = ev.select(F.approx_count_distinct("user_id", rsd=0.05)) \
        .first()[0]
    assert abs(approx - exact) / exact <= 0.15  # 3x the configured rsd
    # tighter rsd costs more sketch memory, tightens the answer
    approx2 = ev.select(F.approx_count_distinct("user_id", rsd=0.01)) \
        .first()[0]
    assert abs(approx2 - exact) / exact <= 0.03


def test_approx_percentile_bounds(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    exact = li.selectExpr(
        "percentile(l_quantity, array(0.5, 0.9, 0.99)) AS p").first()["p"]
    approx = li.selectExpr(
        "approx_percentile(l_quantity, array(0.5, 0.9, 0.99), 10000) AS p"
    ).first()["p"]
    lo = float(li.agg(F.min("l_quantity")).first()[0])
    hi = float(li.agg(F.max("l_quantity")).first()[0])
    span = hi - lo
    for e, a in zip(exact, approx):
        assert abs(float(a) - float(e)) <= 0.05 * span, (e, a)


def test_approx_count_distinct_distributed_merge(spark):
    """Sketches must merge across partitions (the whole point at
    100 TB): value identical under different partition counts."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    a = ev.repartition(4).select(
        F.approx_count_distinct("user_id", rsd=0.02)).first()[0]
    b = ev.repartition(32).select(
        F.approx_count_distinct("user_id", rsd=0.02)).first()[0]
    assert a == b  # HLL merge is deterministic, partition-order free
