"""approx_quantile DD-sketch mode of CdfAggregateView (round 14,
VERDICT r13 item 4 — the quantile twin of the HLL tier). Contracts:

1. CANONICAL STATE — the maintained bucket table equals the sketch
   recomputed from the current source EXACTLY (bucket-for-bucket)
   after every refresh, including deletes and group moves, because
   counts fold additively in both directions. Stronger than the HLL
   contract: no dirty-group recompute exists to hide behind.
2. NO SOURCE READS — retractions fold from the feed's pre-images;
   ``read_version`` stays poisoned through delete-heavy refreshes.
3. ACCURACY — every estimate is within ``alpha`` relative VALUE
   error of the exact discrete quantile (rank = ceil(q*n), the
   ``corpus_token_quantiles`` convention).
4. MERGE — merge(sketch(A), sketch(B)) == sketch(A ⊎ B) bucket-for-
   bucket (the ``tests/test_hll_view.py`` register pinning, for
   quantiles), and an alpha-mismatch merge raises.
5. STATE BOUND — O(log value-spread) bucket rows per group.
"""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from aether_firebase_consumer_spark.functions.ddsketch import (
    DD_LAYOUT_TAG,
    dd_gamma,
    dd_estimate_df,
    dd_sketch_df,
    merge_dd_sketches,
    quantile_suffix,
)
from aether_firebase_consumer_spark.sinks.upsert import ParquetUpsertTable
from aether_firebase_consumer_spark.streaming.incremental_agg import (
    CdfAggregateView,
)

ALPHA = 0.01


def _source(spark, root, **kw):
    kw.setdefault("retain_versions", 30)
    kw.setdefault("record_change_values", True)
    kw.setdefault("record_change_preimages", True)
    return ParquetUpsertTable(spark, str(root), ["k"],
                              partition_col="g", **kw)


def _rows(spark, rows):
    return spark.createDataFrame(rows, "k int, g string, x double")


def _view(spark, tmp, src, name="view", alpha=ALPHA,
          qs=(0.5, 0.9, 0.99)):
    return CdfAggregateView(
        spark, str(tmp / name), src, ["g"],
        {"tq": ("approx_quantile", "x", qs)},
        str(tmp / f"{name}_cursor"), quantile_alpha=alpha)


def _sketch_rows(df):
    return sorted(((r.g is None, r.g), r._sgn, r._bkt, r._cnt)
                  for r in df.collect())


def _exact_quantiles(src, qs):
    """Exact discrete per-group quantiles (rank = ceil(q*n)) over
    non-null values — the oracle convention."""
    cur = src.read()
    if cur is None:
        return {}
    vals = {}
    for r in cur.filter(F.col("x").isNotNull()).collect():
        vals.setdefault((r.g is None, r.g), []).append(r.x)
    out = {}
    for g, xs in vals.items():
        xs.sort()
        out[g] = {q: xs[max(1, math.ceil(q * len(xs))) - 1]
                  for q in qs}
    return out


def test_maintained_sketch_is_canonical_and_never_reads_source(
        spark, tmp_path):
    src = _source(spark, tmp_path / "src")
    view = _view(spark, tmp_path, src)
    src.merge(_rows(spark, [(i, "a" if i % 3 else "b",
                             float(i % 40) * 1.7)
                            for i in range(300)]
                    + [(900, "c", None), (901, None, 7.0),
                       (902, "c", -5.5), (903, "c", 0.0)]))
    view.refresh()

    def assert_canonical():
        got = _sketch_rows(view.dd_sketch("tq").read()
                           .filter(F.col("_cnt") > 0))
        want = _sketch_rows(dd_sketch_df(src.read(), ["g"],
                                         F.col("x"), ALPHA))
        assert got == want

    assert_canonical()
    orig = src.read_version

    def poisoned(*_a, **_k):
        raise AssertionError("approx_quantile fold read the source")
    src.read_version = poisoned
    try:
        # updates (value changes retract the old bucket), group moves
        src.merge(_rows(spark, [(i, "b", float(i) + 1000.0)
                                for i in range(0, 60, 5)]))
        view.refresh()
        assert_canonical()
        # deletes, incl. wiping group c entirely
        src.delete_keys(spark.createDataFrame(
            [(i,) for i in range(0, 300, 7)]
            + [(900,), (902,), (903,)], "k int"))
        view.refresh()
        assert_canonical()
    finally:
        src.read_version = orig
    assert view.refresh() is None


def test_estimates_within_alpha_of_exact(spark, tmp_path):
    src = _source(spark, tmp_path / "src")
    qs = (0.5, 0.9, 0.99)
    view = _view(spark, tmp_path, src, qs=qs)
    # long-tailed positives across two groups, plus negatives
    rows = [(i, "a", float((i % 97) ** 2 + 1)) for i in range(4000)]
    rows += [(10_000 + i, "b", -float(i + 1) * 3.3)
             for i in range(500)]
    src.merge(_rows(spark, rows))
    view.refresh()
    got = {(r.g is None, r.g): r.asDict() for r in view.read().collect()}
    want = _exact_quantiles(src, qs)
    for g, per_q in want.items():
        for q, exact in per_q.items():
            est = got[g][f"tq_{quantile_suffix(q)}"]
            assert abs(est - exact) <= ALPHA * abs(exact) + 1e-12, \
                f"group {g} q={q}: est {est} vs exact {exact}"
    # estimates survive churn: delete half of group a, re-check
    src.delete_keys(spark.createDataFrame(
        [(i,) for i in range(0, 4000, 2)], "k int"))
    view.refresh()
    got = {(r.g is None, r.g): r.asDict() for r in view.read().collect()}
    want = _exact_quantiles(src, qs)
    for g, per_q in want.items():
        for q, exact in per_q.items():
            est = got[g][f"tq_{quantile_suffix(q)}"]
            assert abs(est - exact) <= ALPHA * abs(exact) + 1e-12


def test_merge_equals_union_sketch_and_mismatch_raises(
        spark, tmp_path):
    src_a = _source(spark, tmp_path / "a")
    src_b = _source(spark, tmp_path / "b")
    view_a = _view(spark, tmp_path, src_a, name="va")
    view_b = _view(spark, tmp_path, src_b, name="vb")
    src_a.merge(_rows(spark, [(i, "g1" if i % 2 else "g2",
                               float(i % 500) + 0.5)
                              for i in range(2000)]))
    src_b.merge(_rows(spark, [(i, "g1" if i % 3 else "g3",
                               float(i % 700) * 2.0)
                              for i in range(1500)]))
    view_a.refresh()
    view_b.refresh()
    ta, tb = view_a.dd_sketch("tq"), view_b.dd_sketch("tq")
    assert ta.commit_meta()["dd_alpha"] == ALPHA
    assert ta.commit_meta()["dd_layout"] == DD_LAYOUT_TAG
    merged = merge_dd_sketches(ta, tb, ["g"])
    union_src = src_a.read().unionByName(src_b.read())
    want = dd_sketch_df(union_src, ["g"], F.col("x"), ALPHA)
    assert _sketch_rows(merged) == _sketch_rows(want)
    # estimate-for-estimate too
    got_est = dd_estimate_df(merged, ["g"], ALPHA, [0.5, 0.9])
    want_est = dd_estimate_df(want, ["g"], ALPHA, [0.5, 0.9])
    key = lambda r: (r.g is None, r.g)  # noqa: E731
    assert sorted((key(r), r.q_p50, r.q_p90)
                  for r in got_est.collect()) == \
        sorted((key(r), r.q_p50, r.q_p90)
               for r in want_est.collect())
    # alpha mismatch raises, naming both sides
    view_c = CdfAggregateView(
        spark, str(tmp_path / "vc"), src_b, ["g"],
        {"tq": ("approx_quantile", "x")},
        str(tmp_path / "vc_cursor"), quantile_alpha=0.05)
    view_c.rebuild()
    with pytest.raises(ValueError, match="alpha=0.01.*alpha=0.05"
                                         "|alpha=0.05.*alpha=0.01"):
        merge_dd_sketches(ta, view_c.dd_sketch("tq"), ["g"])
    with pytest.raises(ValueError, match="mismatch"):
        merge_dd_sketches(
            ta, dd_sketch_df(_rows(spark, [(1, "a", 7.0)]), ["g"],
                             F.col("x"), ALPHA),
            ["g"], alpha=0.05)


def test_state_bound_is_log_of_value_spread(spark, tmp_path):
    src = _source(spark, tmp_path / "src")
    view = _view(spark, tmp_path, src, qs=(0.5,))
    n = 30_000
    src.merge(_rows(spark, [(i, "a", float(i + 1)) for i in range(n)]))
    view.refresh()
    rows = view.dd_sketch("tq").read().filter(F.col("_cnt") > 0).count()
    # values span [1, 30k] -> at most log_gamma(30k) + 2 buckets
    bound = math.ceil(math.log(n) / math.log(dd_gamma(ALPHA))) + 2
    assert rows <= bound < n
    # and the estimate still lands within alpha
    got = view.read().collect()[0]
    exact = _exact_quantiles(src, (0.5,))[(False, "a")][0.5]
    assert abs(got["tq_p50"] - exact) <= ALPHA * exact + 1e-12


def test_mixed_measures_and_all_null_group(spark, tmp_path):
    """approx_quantile coexists with the other kinds in one view;
    an all-null-measure group reads NULL quantiles (SQL percentile
    over an empty set) while its count stays exact."""
    src = _source(spark, tmp_path / "src")
    view = CdfAggregateView(
        spark, str(tmp_path / "view"), src, ["g"],
        {"n": ("count", None), "mx": ("max", "x"),
         "tq": ("approx_quantile", "x", (0.5,))},
        str(tmp_path / "cursor"))
    src.merge(_rows(spark, [(1, "a", 5.0), (2, "a", 15.0),
                            (3, "z", None)]))
    view.refresh()
    got = {r.g: r.asDict() for r in view.read().collect()}
    assert got["z"]["n"] == 1 and got["z"]["tq_p50"] is None
    assert got["a"]["n"] == 2 and got["a"]["mx"] == 15.0
    exact = _exact_quantiles(src, (0.5,))[(False, "a")][0.5]
    assert abs(got["a"]["tq_p50"] - exact) <= ALPHA * exact + 1e-12
    with pytest.raises(KeyError, match="approx_quantile"):
        view.dd_sketch("nope")
    with pytest.raises(ValueError, match="quantile"):
        CdfAggregateView(
            spark, str(tmp_path / "bad"), src, ["g"],
            {"tq": ("approx_quantile", "x", (1.5,))},
            str(tmp_path / "bad_cursor"))
