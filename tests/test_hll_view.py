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


def test_merge_sketch_tables_exact_vs_union_recompute(spark, tmp_path):
    """Round 13 (VERDICT r12 item 5): merging two maintained views'
    register tables equals the sketch computed from the UNION of
    their sources EXACTLY — register-for-register and
    estimate-for-estimate — without re-scanning either source. The
    cross-tenant / cross-partition rollup primitive."""
    from aether_firebase_consumer_spark.functions.hll import (
        hll_estimate_df,
        merge_sketch_tables,
    )

    p = 9
    src_a = _source(spark, tmp_path / "a")
    src_b = _source(spark, tmp_path / "b")
    view_a = _view(spark, tmp_path, src_a, name="va", p=p)
    view_b = _view(spark, tmp_path, src_b, name="vb", p=p)
    # overlapping values across tenants (the union must not double
    # count), plus groups exclusive to one side
    src_a.merge(_rows(spark, [(i, "g1" if i % 2 else "g2", i % 500)
                              for i in range(2_000)]))
    src_b.merge(_rows(spark, [(i, "g1" if i % 3 else "g3", i % 700)
                              for i in range(1_500)]))
    view_a.refresh()
    view_b.refresh()

    merged = merge_sketch_tables(view_a.hll_sketch("nd"),
                                 view_b.hll_sketch("nd"), ["g"])
    union_src = src_a.read().unionByName(src_b.read())
    want_regs = hll_registers_df(union_src, ["g"], F.col("x"), p)
    key = lambda r: ((r.g is None, r.g), r._idx)  # noqa: E731
    assert sorted((key(r), r._rho) for r in merged.collect()) == \
        sorted((key(r), r._rho) for r in want_regs.collect())
    got_est = {(r.g is None, r.g): r.nd
               for r in hll_estimate_df(merged, ["g"], p).collect()}
    want_est = {(r.g is None, r.g): r.nd
                for r in hll_estimate_df(want_regs, ["g"], p).collect()}
    assert got_est == want_est
    # sanity: the estimates are in range of the true union counts
    truth = {(r.g is None, r.g): r.c for r in
             (union_src.filter(F.col("x").isNotNull()).groupBy("g")
              .agg(F.count_distinct("x").alias("c")).collect())}
    for g, t in truth.items():
        assert abs(got_est[g] - t) / t < 4 * hll_error_bound(p)


def test_merge_sketch_tables_one_sided_and_empty(spark, tmp_path):
    """A merge with an empty side passes the other side through; two
    empty sides are a contract error. Ad-hoc register frames mix with
    view tables."""
    from aether_firebase_consumer_spark.functions.hll import (
        merge_sketch_tables,
    )

    p = 9
    src = _source(spark, tmp_path / "src")
    view = _view(spark, tmp_path, src, p=p)
    src.merge(_rows(spark, [(i, "a", i) for i in range(100)]))
    view.refresh()
    empty = _source(spark, tmp_path / "empty")
    ev = _view(spark, tmp_path, empty, name="ev", p=p)
    got = merge_sketch_tables(view.hll_sketch("nd"),
                              ev.hll_sketch("nd"), ["g"])
    want = view.hll_sketch("nd").read()
    assert sorted((r.g, r._idx, r._rho) for r in got.collect()) == \
        sorted((r.g, r._idx, r._rho) for r in want.collect())
    # ad-hoc DataFrame side
    adhoc = hll_registers_df(_rows(spark, [(1, "a", 7)]), ["g"],
                             F.col("x"), p)
    both = merge_sketch_tables(view.hll_sketch("nd"), adhoc, ["g"])
    assert both.count() >= want.count()
    with pytest.raises(ValueError, match="empty"):
        merge_sketch_tables(ev.hll_sketch("nd"), ev.hll_sketch("nd"),
                            ["g"])
    with pytest.raises(KeyError, match="approx_count_distinct"):
        view.hll_sketch("nope")


def test_merge_sketch_tables_p_mismatch_raises(spark, tmp_path):
    """Round-14 (VERDICT r13 item 2): the view stamps hll_p and the
    register-layout tag into every HLL-helper commit; merging two
    tables built at different p raises a diagnostic naming both
    sides instead of silently skewing the estimate. An explicit
    ``p=`` argument pins even a one-sided stamp."""
    from aether_firebase_consumer_spark.functions.hll import (
        HLL_WINDOW_TAG,
        merge_sketch_tables,
    )

    src_a = _source(spark, tmp_path / "a")
    src_b = _source(spark, tmp_path / "b")
    view_a = _view(spark, tmp_path, src_a, name="va", p=9)
    view_b = _view(spark, tmp_path, src_b, name="vb", p=11)
    src_a.merge(_rows(spark, [(i, "a", i) for i in range(50)]))
    src_b.merge(_rows(spark, [(i, "a", i) for i in range(50)]))
    view_a.refresh()
    view_b.refresh()
    ta, tb = view_a.hll_sketch("nd"), view_b.hll_sketch("nd")
    assert ta.commit_meta()["hll_p"] == 9
    assert ta.commit_meta()["hll_window"] == HLL_WINDOW_TAG
    with pytest.raises(ValueError, match=r"p=9.*p=11|p=11.*p=9"):
        merge_sketch_tables(ta, tb, ["g"])
    # explicit p pins a single stamped side too
    with pytest.raises(ValueError, match="mismatch"):
        merge_sketch_tables(ta, hll_registers_df(
            _rows(spark, [(1, "a", 7)]), ["g"], F.col("x"), 9),
            ["g"], p=11)
    # matching stamps (and a matching explicit p) merge fine
    view_c = _view(spark, tmp_path, src_b, name="vc", p=9)
    view_c.rebuild()
    assert view_c.hll_sketch("nd").commit_meta()["hll_p"] == 9
    merged = merge_sketch_tables(ta, view_c.hll_sketch("nd"), ["g"],
                                 p=9)
    assert merged.count() > 0


@pytest.mark.parametrize("p", [13, 16])
def test_high_precision_rank_window_unbiased(spark, p):
    """Round-12 ADVICE regression pin: shiftright is ARITHMETIC, so a
    fixed 52-bit rank window at p > 12 keeps p - 12 sign-extension
    copies of hash bit 63 — rho values 2..(p - 11) were unreachable
    (P(rho=2) = 0 at p = 13) and the estimate biased. With the
    p-dependent window every rho in [1, 64 - p + 1] is reachable with
    its geometric probability, and the estimate meets the error
    bound."""
    from aether_firebase_consumer_spark.functions.hll import (
        hll_register,
    )
    n = 40_000
    df = spark.range(n).select(F.col("id").cast("int").alias("x"))
    idx, rho = hll_register(F.col("x"), p)
    counts = {r.rho: r.c for r in
              (df.select(rho.alias("rho"))
               .groupBy("rho").agg(F.count("*").alias("c"))
               .collect())}
    assert max(counts) <= 64 - p + 1
    # P(rho = r) = 2^-r: each of ranks 1..4 must appear, close to
    # its geometric share (loose 25% tolerance at n = 40k)
    for r in (1, 2, 3, 4):
        assert counts.get(r, 0) > 0, f"rho={r} unreachable at p={p}"
        expect = n * 2.0 ** -r
        assert abs(counts[r] - expect) / expect < 0.25
    # end-to-end: estimator accuracy holds at the high precision
    regs = hll_registers_df(df.select(F.lit("a").alias("g"), "x"),
                            ["g"], F.col("x"), p)
    est = (regs.groupBy("g")
           .agg(F.count("*").alias("_nr"),
                F.sum(F.pow(F.lit(2.0), -F.col("_rho"))).alias("_sp"))
           .select(hll_estimate(F.col("_nr"), F.col("_sp"), p)
                   .alias("nd")).collect()[0].nd)
    assert abs(est - n) / n < 4 * hll_error_bound(p)


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
