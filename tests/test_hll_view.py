"""approx_count_distinct HLL mode of CdfAggregateView (round 12).
Contracts under test:

1. DETERMINISM — the maintained sketch estimate equals the
   recompute-from-source sketch estimate EXACTLY after every refresh
   (the approximation is in the count, never in the maintenance).
2. ACCURACY — the estimate lands within a few standard errors of the
   true distinct count.
3. STATE BOUND — the register table stays <= 2^p rows per group,
   beating the exact multiset's O(distinct pairs) on
   high-cardinality measures.
4. RETRACTION — deletes and group moves dirty the pre-image group
   and the recompute restores sketch-exactness.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from aether_firebase_consumer_spark.functions.hll import (
    hll_error_bound,
    hll_estimate,
    hll_registers_df,
)
from aether_firebase_consumer_spark.sinks.upsert import ParquetUpsertTable
from aether_firebase_consumer_spark.streaming.incremental_agg import (
    CdfAggregateView,
)

P = 12


def _source(spark, root, **kw):
    kw.setdefault("retain_versions", 30)
    kw.setdefault("record_change_values", True)
    kw.setdefault("record_change_preimages", True)
    return ParquetUpsertTable(spark, str(root), ["k"],
                              partition_col="g", **kw)


def _rows(spark, rows):
    return spark.createDataFrame(rows, "k int, g string, x int")


def _view(spark, tmp, src, name="view", p=P):
    return CdfAggregateView(
        spark, str(tmp / name), src, ["g"],
        {"nd": ("approx_count_distinct", "x")},
        str(tmp / f"{name}_cursor"), hll_p=p)


def _sketch_recompute(spark, src, p=P):
    """The ground truth: sketch estimate computed from the CURRENT
    source state with the same register/estimator expressions."""
    cur = src.read()
    if cur is None:
        return {}
    regs = hll_registers_df(cur, ["g"], F.col("x"), p)
    est = (regs.groupBy("g")
           .agg(F.count("*").alias("_nr"),
                F.sum(F.pow(F.lit(2.0), -F.col("_rho"))).alias("_sp"))
           .select("g", hll_estimate(F.col("_nr"), F.col("_sp"), p)
                   .alias("nd")))
    out = {(r.g is None, r.g): r.nd for r in est.collect()}
    # groups with rows but all-null x: estimate 0 (read() coalesces)
    for r in cur.groupBy("g").count().collect():
        out.setdefault((r.g is None, r.g), 0)
    return out


def _read(view):
    df = view.read()
    return {} if df is None else \
        {(r.g is None, r.g): r.nd for r in df.collect()}


def test_maintained_estimate_equals_recompute_sketch(spark, tmp_path):
    src = _source(spark, tmp_path / "src")
    view = _view(spark, tmp_path, src)
    src.merge(_rows(spark, [(i, "a" if i % 3 else "b", i % 40)
                            for i in range(300)]
                    + [(900, "c", None), (901, None, 7)]))
    view.refresh()
    assert _read(view) == _sketch_recompute(spark, src)

    # updates (value changes retract the old value), group moves
    src.merge(_rows(spark, [(i, "b", i + 1000)
                            for i in range(0, 60, 5)]))
    view.refresh()
    assert _read(view) == _sketch_recompute(spark, src)

    # deletes, incl. wiping group c entirely
    src.delete_keys(spark.createDataFrame(
        [(i,) for i in range(0, 300, 7)] + [(900,)], "k int"))
    view.refresh()
    assert _read(view) == _sketch_recompute(spark, src)
    assert view.refresh() is None


def test_insert_only_folds_without_source_reads(spark, tmp_path):
    src = _source(spark, tmp_path / "src")
    view = _view(spark, tmp_path, src)
    src.merge(_rows(spark, [(i, "a", i) for i in range(100)]))
    view.refresh()
    orig = src.read_version

    def poisoned(*_a, **_k):
        raise AssertionError("insert-only HLL fold read the source")
    src.read_version = poisoned
    try:
        src.merge(_rows(spark, [(i, "a", i) for i in range(100, 200)]))
        view.refresh()
    finally:
        src.read_version = orig
    assert _read(view) == _sketch_recompute(spark, src)


def test_estimate_accuracy_and_state_bound(spark, tmp_path):
    src = _source(spark, tmp_path / "src")
    view = _view(spark, tmp_path, src)
    n = 30_000
    src.merge(_rows(spark, [(i, "a", i) for i in range(n)]))
    view.refresh()
    est = _read(view)[(False, "a")]
    rel = abs(est - n) / n
    assert rel < 4 * hll_error_bound(P), f"est {est} vs {n}"
    # state bound: <= 2^p register rows, far under the exact
    # multiset's O(distinct) rows
    reg_rows = view._hlls["nd"].read().count()
    assert reg_rows <= (1 << P) < n


def test_exact_vs_approx_state_comparison(spark, tmp_path):
    """The VERDICT's sizing claim, pinned: on a high-cardinality
    measure the exact count_distinct helper stores one row per
    distinct (group, value) pair; the HLL register table is capped at
    2^p per group."""
    src = _source(spark, tmp_path / "src")
    both = CdfAggregateView(
        spark, str(tmp_path / "both"), src, ["g"],
        {"nd_exact": ("count_distinct", "x"),
         "nd_approx": ("approx_count_distinct", "x")},
        str(tmp_path / "both_cursor"), hll_p=10)
    n = 20_000
    src.merge(_rows(spark, [(i, "a", i) for i in range(n)]))
    both.refresh()
    exact_rows = both._helpers["nd_exact"].read().count()
    approx_rows = both._hlls["nd_approx"].read().count()
    assert exact_rows == n
    assert approx_rows <= 1 << 10
    got = {r.g: (r.nd_exact, r.nd_approx)
           for r in both.read().collect()}
    assert got["a"][0] == n
    assert abs(got["a"][1] - n) / n < 4 * hll_error_bound(10)


def test_vacuumed_pinned_version_raises(spark, tmp_path):
    src = _source(spark, tmp_path / "src")
    view = _view(spark, tmp_path, src)
    src.merge(_rows(spark, [(1, "a", 1), (2, "a", 2)]))
    view.refresh()
    src.delete_keys(spark.createDataFrame([(1,)], "k int"))
    got = view.follower.poll(images=True)
    feed, up_to = got
    feed = feed.localCheckpoint()
    src.merge(_rows(spark, [(3, "a", 3)]))
    src.merge(_rows(spark, [(4, "a", 4)]))
    src.vacuum(keep_last_n=1)
    with pytest.raises(ValueError, match="rebuild"):
        view._fold_all(feed, up_to)
    view.rebuild()
    assert _read(view) == _sketch_recompute(spark, src)
