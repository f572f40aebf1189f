"""Randomized op-script property test for the retraction machinery:
random interleavings of merge / delete_keys / delete_where (with
group moves, null groups, null values, duplicate values, and
refreshes at random points) must keep BOTH incremental views equal to
the full recompute after every refresh. Deterministic seeds — a
failure reproduces exactly; runs in the slow tier."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from aether_firebase_consumer_spark.sinks.upsert import ParquetUpsertTable
from aether_firebase_consumer_spark.streaming.incremental_agg import (
    CdfAggregateView,
)

GROUPS = ["a", "b", "c", None]
VALUES = [1, 2, 5, 5, 9, None]


def _rows(spark, rows):
    return spark.createDataFrame(rows, "k int, g string, x int")


def _script(rng, n_keys=14, n_ops=9):
    """A reproducible random op script over a small key space (small
    spaces maximize key collisions, group moves, and re-inserts)."""
    ops = []
    for _ in range(n_ops):
        kind = rng.choice(["merge", "merge", "merge",
                           "delete_keys", "delete_where", "refresh"])
        if kind == "merge":
            ks = rng.sample(range(n_keys), rng.randint(1, 5))
            ops.append(("merge",
                        [(k, rng.choice(GROUPS), rng.choice(VALUES))
                         for k in ks]))
        elif kind == "delete_keys":
            ops.append(("delete_keys",
                        rng.sample(range(n_keys), rng.randint(1, 3))))
        elif kind == "delete_where":
            ops.append(("delete_where", rng.choice([3, 6, 9])))
        else:
            ops.append(("refresh", None))
    ops.append(("refresh", None))
    return ops


def _recompute(src):
    cur = src.read()
    if cur is None:
        return []
    got = (cur.groupBy("g")
           .agg(F.count("*").cast("bigint").alias("n"),
                F.sum("x").cast("bigint").alias("sx"),
                F.min("x").alias("mn"),
                F.max("x").alias("mx"),
                F.countDistinct("x").cast("bigint").alias("nd"))
           .collect())
    return sorted(((r.g is None, r.g), r.n, r.sx, r.mn, r.mx, r.nd)
                  for r in got)


def _read(view):
    df = view.read()
    if df is None:
        return []
    return sorted(((r.g is None, r.g), r.n, r.sx, r.mn, r.mx, r.nd)
                  for r in df.collect())


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_random_op_scripts_view_equals_recompute(spark, tmp_path, seed):
    rng = random.Random(seed)
    src = ParquetUpsertTable(
        spark, str(tmp_path / "src"), ["k"], partition_col="g",
        retain_versions=40, record_change_values=True,
        record_change_preimages=True)
    view = CdfAggregateView(
        spark, str(tmp_path / "view"), src, ["g"],
        {"n": ("count", None), "sx": ("sum", "x"),
         "mn": ("min", "x"), "mx": ("max", "x"),
         "nd": ("count_distinct", "x")},
        str(tmp_path / "cursor"))
    live = False
    for step, (op, arg) in enumerate(_script(rng)):
        if op == "merge":
            src.merge(_rows(spark, arg))
            live = True
        elif op == "delete_keys" and live:
            src.delete_keys(
                spark.createDataFrame([(k,) for k in arg], "k int"))
        elif op == "delete_where" and live:
            src.delete_where(("x", ">=", arg))
        elif op == "refresh" and live:
            view.refresh()
            assert _read(view) == _recompute(src), \
                f"seed {seed} diverged at step {step}"
    assert _read(view) == _recompute(src), f"seed {seed} final state"


JKS = ["j1", "j2", "j3", None]


def _jscript(rng, n_keys=12, n_ops=8):
    ops = []
    for _ in range(n_ops):
        kind = rng.choice(["fmerge", "fmerge", "fdel",
                           "dmerge", "ddel", "refresh"])
        if kind == "fmerge":
            ks = rng.sample(range(n_keys), rng.randint(1, 4))
            ops.append(("fmerge",
                        [(k, rng.choice(JKS), rng.choice(VALUES))
                         for k in ks]))
        elif kind == "fdel":
            ops.append(("fdel",
                        rng.sample(range(n_keys), rng.randint(1, 2))))
        elif kind == "dmerge":
            jks = rng.sample(["j1", "j2", "j3"], rng.randint(1, 2))
            ops.append(("dmerge",
                        [(j, rng.randint(1, 99)) for j in jks]))
        elif kind == "ddel":
            ops.append(("ddel", rng.choice(["j1", "j2", "j3"])))
        else:
            ops.append(("refresh", None))
    ops.append(("refresh", None))
    return ops


def _jrecompute(fact, dim):
    f = fact.read()
    if f is None:
        return []
    d = dim.read()
    if d is not None:
        f = f.join(d.select("jk", F.col("attr").alias("dim_attr")),
                   "jk", "left")
    else:
        f = f.withColumn("dim_attr", F.lit(None).cast("int"))
    return sorted(((r.k,), (r.jk is None, r.jk), r.x, r.dim_attr)
                  for r in f.collect())


def _jread(view):
    df = view.read()
    if df is None:
        return []
    if "dim_attr" not in df.columns:
        df = df.withColumn("dim_attr", F.lit(None).cast("int"))
    return sorted(((r.k,), (r.jk is None, r.jk), r.x, r.dim_attr)
                  for r in df.collect())


@pytest.mark.parametrize("seed", [5, 31])
def test_random_op_scripts_join_view_equals_rejoin(spark, tmp_path,
                                                   seed):
    """Random fact/dim op interleavings (null join keys, dim deletes,
    join-key moves, refreshes at random points): after every refresh
    the maintained join view equals the full re-join."""
    from aether_firebase_consumer_spark.streaming.join_view import (
        CdfJoinView,
    )

    rng = random.Random(seed)
    fact = ParquetUpsertTable(
        spark, str(tmp_path / "fact"), ["k"], retain_versions=40,
        record_change_values=True)
    dim = ParquetUpsertTable(
        spark, str(tmp_path / "dim"), ["jk"], retain_versions=40)
    view = CdfJoinView(spark, str(tmp_path / "view"), fact, dim, "jk",
                       str(tmp_path / "fck"), str(tmp_path / "dck"))
    flive = False
    for step, (op, arg) in enumerate(_jscript(rng)):
        if op == "fmerge":
            fact.merge(spark.createDataFrame(
                arg, "k int, jk string, x int"))
            flive = True
        elif op == "fdel" and flive:
            fact.delete_keys(spark.createDataFrame(
                [(k,) for k in arg], "k int"))
        elif op == "dmerge":
            dim.merge(spark.createDataFrame(
                arg, "jk string, attr int"))
        elif op == "ddel" and dim.current_version() >= 0:
            dim.delete_keys(spark.createDataFrame(
                [(arg,)], "jk string"))
        elif op == "refresh" and flive:
            view.refresh()
            assert _jread(view) == _jrecompute(fact, dim), \
                f"seed {seed} diverged at step {step}"
    if flive:
        view.refresh()
        assert _jread(view) == _jrecompute(fact, dim), \
            f"seed {seed} final state"


def _jrejoin_at(spark, fact, dim, vf, vd):
    """Full re-join pinned at an explicit (fact_version, dim_version)
    snapshot pair — the aligned-refresh ground truth."""
    if vf is None or vf < 0:
        return []
    f = fact.read_version(vf)
    d = None if (vd is None or vd < 0) else dim.read_version(vd)
    if d is not None:
        f = f.join(d.select("jk", F.col("attr").alias("dim_attr")),
                   "jk", "left")
    else:
        f = f.withColumn("dim_attr", F.lit(None).cast("int"))
    return sorted(((r.k,), (r.jk is None, r.jk), r.x, r.dim_attr)
                  for r in f.collect())


@pytest.mark.parametrize("seed", [7, 43])
def test_aligned_refresh_equals_snapshot_rejoin(spark, tmp_path, seed):
    """Round 12: snapshot-aligned refreshes — after EVERY
    refresh_aligned, the view equals the full re-join at exactly the
    (fact_cursor, dim_cursor) pair it committed, whatever the op
    interleaving. Mixed scripts also interleave plain refresh() calls
    (which leave documented torn states) to pin that the next aligned
    refresh REPAIRS them back to a consistent snapshot."""
    from aether_firebase_consumer_spark.streaming.join_view import (
        CdfJoinView,
    )

    rng = random.Random(seed)
    fact = ParquetUpsertTable(
        spark, str(tmp_path / "fact"), ["k"], retain_versions=60,
        record_change_values=True)
    dim = ParquetUpsertTable(
        spark, str(tmp_path / "dim"), ["jk"], retain_versions=60)
    view = CdfJoinView(spark, str(tmp_path / "view"), fact, dim, "jk",
                       str(tmp_path / "fck"), str(tmp_path / "dck"))
    ops = []
    for _ in range(10):
        ops.append(rng.choice(
            ["fmerge", "fmerge", "fdel", "dmerge", "ddel",
             "refresh", "aligned", "aligned"]))
    ops.append("aligned")
    flive = False
    for step, op in enumerate(ops):
        if op == "fmerge":
            ks = rng.sample(range(12), rng.randint(1, 4))
            fact.merge(spark.createDataFrame(
                [(k, rng.choice(JKS), rng.choice(VALUES)) for k in ks],
                "k int, jk string, x int"))
            flive = True
        elif op == "fdel" and flive:
            fact.delete_keys(spark.createDataFrame(
                [(k,) for k in rng.sample(range(12), rng.randint(1, 2))],
                "k int"))
        elif op == "dmerge":
            jks = rng.sample(["j1", "j2", "j3"], rng.randint(1, 2))
            dim.merge(spark.createDataFrame(
                [(j, rng.randint(1, 99)) for j in jks],
                "jk string, attr int"))
        elif op == "ddel" and dim.current_version() >= 0:
            dim.delete_keys(spark.createDataFrame(
                [(rng.choice(["j1", "j2", "j3"]),)], "jk string"))
        elif op == "refresh" and flive:
            view.refresh()   # documented torn-state mode
        elif op == "aligned" and flive:
            got = view.refresh_aligned()
            cur = view._cursors()
            # the committed cursors ARE the snapshot pair
            if got["fact"] is not None:
                assert cur["fact"] == got["fact"]
            assert _jread(view) == _jrejoin_at(
                spark, fact, dim, cur["fact"], cur["dim"]), \
                f"seed {seed} torn at step {step} (cursors {cur})"


def _topk_recompute(src, n):
    from pyspark.sql import Window as W

    cur = src.read()
    if cur is None:
        return []
    w = W.partitionBy("g").orderBy(F.col("x").desc_nulls_last(),
                                   F.col("k").asc_nulls_last())
    got = (cur.withColumn("_rk", F.row_number().over(w))
           .filter(F.col("_rk") <= n).drop("_rk").collect())
    return sorted((r.k, (r.g is None, r.g), r.x) for r in got)


def _topk_read(view):
    df = view.read()
    return [] if df is None else \
        sorted((r.k, (r.g is None, r.g), r.x) for r in df.collect())


@pytest.mark.parametrize("seed", [13, 59])
def test_random_op_scripts_topk_equals_recompute(spark, tmp_path, seed):
    """Round 12: the same randomized op scripts drive a CdfTopKView —
    after every refresh the maintained top-2 per group equals the
    windowed recompute (evictions, backfills, group moves, null
    groups/values, duplicate order values with key tie-breaks)."""
    from aether_firebase_consumer_spark.streaming.topk_view import (
        CdfTopKView,
    )

    rng = random.Random(seed)
    src = ParquetUpsertTable(
        spark, str(tmp_path / "src"), ["k"], partition_col="g",
        retain_versions=40, record_change_values=True,
        record_change_preimages=True)
    view = CdfTopKView(
        spark, str(tmp_path / "view"), src, ["g"], "x", 2,
        checkpoint_path=str(tmp_path / "cursor"))
    live = False
    for step, (op, arg) in enumerate(_script(rng)):
        if op == "merge":
            src.merge(_rows(spark, arg))
            live = True
        elif op == "delete_keys" and live:
            src.delete_keys(
                spark.createDataFrame([(k,) for k in arg], "k int"))
        elif op == "delete_where" and live:
            src.delete_where(("x", ">=", arg))
        elif op == "refresh" and live:
            view.refresh()
            assert _topk_read(view) == _topk_recompute(src, 2), \
                f"seed {seed} diverged at step {step}"
    if live:
        view.refresh()
        assert _topk_read(view) == _topk_recompute(src, 2), \
            f"seed {seed} final state"


@pytest.mark.parametrize("seed", [17, 71])
def test_random_op_scripts_hll_estimate_equals_recompute(
        spark, tmp_path, seed):
    """Round 12: the maintained approx_count_distinct sketch is
    DETERMINISTIC — after every refresh its estimate equals the
    recompute-from-source sketch estimate exactly, through random
    retraction scripts (the approximation lives in the count, never
    in the maintenance)."""
    from aether_firebase_consumer_spark.functions.hll import (
        hll_estimate,
        hll_registers_df,
    )

    p = 10
    rng = random.Random(seed)
    src = ParquetUpsertTable(
        spark, str(tmp_path / "src"), ["k"], partition_col="g",
        retain_versions=40, record_change_values=True,
        record_change_preimages=True)
    view = CdfAggregateView(
        spark, str(tmp_path / "view"), src, ["g"],
        {"nd": ("approx_count_distinct", "x")},
        str(tmp_path / "cursor"), hll_p=p)

    def recompute():
        cur = src.read()
        if cur is None:
            return {}
        regs = hll_registers_df(cur, ["g"], F.col("x"), p)
        est = (regs.groupBy("g")
               .agg(F.count("*").alias("_nr"),
                    F.sum(F.pow(F.lit(2.0), -F.col("_rho")))
                    .alias("_sp"))
               .select("g", hll_estimate(F.col("_nr"), F.col("_sp"), p)
                       .alias("nd")))
        out = {(r.g is None, r.g): r.nd for r in est.collect()}
        for r in cur.groupBy("g").count().collect():
            out.setdefault((r.g is None, r.g), 0)
        return out

    def read():
        df = view.read()
        return {} if df is None else \
            {(r.g is None, r.g): r.nd for r in df.collect()}

    live = False
    for step, (op, arg) in enumerate(_script(rng)):
        if op == "merge":
            src.merge(_rows(spark, arg))
            live = True
        elif op == "delete_keys" and live:
            src.delete_keys(
                spark.createDataFrame([(k,) for k in arg], "k int"))
        elif op == "delete_where" and live:
            src.delete_where(("x", ">=", arg))
        elif op == "refresh" and live:
            view.refresh()
            assert read() == recompute(), \
                f"seed {seed} diverged at step {step}"
    if live:
        view.refresh()
        assert read() == recompute(), f"seed {seed} final state"


@pytest.mark.parametrize("seed", [13, 37])
def test_random_op_scripts_dd_sketch_is_canonical(
        spark, tmp_path, seed):
    """Round 14: the maintained approx_quantile DD sketch is
    CANONICAL — after every refresh its bucket-count table equals
    the sketch recomputed from the current source bucket-for-bucket,
    through random retraction scripts (signed counts fold exactly in
    both directions; there is no dirty-recompute path to hide
    divergence). Stricter than the HLL pin, which compares
    estimates."""
    from aether_firebase_consumer_spark.functions.ddsketch import (
        dd_sketch_df,
    )

    alpha = 0.02
    rng = random.Random(seed)
    src = ParquetUpsertTable(
        spark, str(tmp_path / "src"), ["k"], partition_col="g",
        retain_versions=40, record_change_values=True,
        record_change_preimages=True)
    view = CdfAggregateView(
        spark, str(tmp_path / "view"), src, ["g"],
        {"q": ("approx_quantile", "x", (0.5, 0.9))},
        str(tmp_path / "cursor"), quantile_alpha=alpha)

    def recompute():
        cur = src.read()
        if cur is None:
            return []
        sk = dd_sketch_df(cur, ["g"], F.col("x"), alpha)
        return sorted(((r.g is None, r.g), r._sgn, r._bkt, r._cnt)
                      for r in sk.collect())

    def sketch_rows():
        df = view.dd_sketch("q").read()
        if df is None:
            return []
        return sorted(((r.g is None, r.g), r._sgn, r._bkt, r._cnt)
                      for r in df.filter(F.col("_cnt") > 0).collect())

    live = False
    for step, (op, arg) in enumerate(_script(rng)):
        if op == "merge":
            src.merge(_rows(spark, arg))
            live = True
        elif op == "delete_keys" and live:
            src.delete_keys(
                spark.createDataFrame([(k,) for k in arg], "k int"))
        elif op == "delete_where" and live:
            src.delete_where(("x", ">=", arg))
        elif op == "refresh" and live:
            view.refresh()
            assert sketch_rows() == recompute(), \
                f"seed {seed} diverged at step {step}"
    if live:
        view.refresh()
        assert sketch_rows() == recompute(), f"seed {seed} final state"


@pytest.mark.parametrize("seed", [29])
def test_aligned_chain_downstream_sees_consistent_snapshots(
        spark, tmp_path, seed):
    """Round 12: the chained-view consistency story end to end — a
    CdfAggregateView maintained over an ALIGNED CdfJoinView's own
    feed. After every (aligned refresh → downstream refresh) step the
    downstream aggregate equals GROUP BY over the pinned re-join at
    the committed (vf, vd) pair: the downstream view can never
    observe a torn cross-source state, because every state the join
    view ever publishes IS a consistent snapshot."""
    from aether_firebase_consumer_spark.streaming.join_view import (
        CdfJoinView,
    )

    rng = random.Random(seed)
    fact = ParquetUpsertTable(
        spark, str(tmp_path / "fact"), ["k"], retain_versions=60,
        record_change_values=True)
    dim = ParquetUpsertTable(
        spark, str(tmp_path / "dim"), ["jk"], retain_versions=60)
    view = CdfJoinView(
        spark, str(tmp_path / "view"), fact, dim, "jk",
        str(tmp_path / "fck"), str(tmp_path / "dck"),
        table_kwargs={"record_change_values": True,
                      "record_change_preimages": True,
                      "retain_versions": 60})
    agg = CdfAggregateView(
        spark, str(tmp_path / "agg"), view.table, ["dim_attr"],
        {"n": ("count", None), "sx": ("sum", "x")},
        str(tmp_path / "aggck"))

    def expected(vf, vd):
        if vf is None or vf < 0:
            return []
        f = fact.read_version(vf)
        d = None if (vd is None or vd < 0) else dim.read_version(vd)
        if d is not None:
            f = f.join(d.select("jk", F.col("attr").alias("dim_attr")),
                       "jk", "left")
        else:
            f = f.withColumn("dim_attr", F.lit(None).cast("int"))
        got = (f.groupBy("dim_attr")
               .agg(F.count("*").cast("bigint").alias("n"),
                    F.sum("x").cast("bigint").alias("sx")).collect())
        return sorted(((r.dim_attr is None, r.dim_attr), r.n, r.sx)
                      for r in got)

    def agg_read():
        df = agg.read()
        return [] if df is None else \
            sorted(((r.dim_attr is None, r.dim_attr), r.n, r.sx)
                   for r in df.collect())

    # seed both sides and one aligned fold BEFORE the random script:
    # the downstream agg groups by the ENRICHED column, which only
    # exists in the view table once a dim has been joined at least
    # once (creating the agg earlier raises the documented
    # cannot-resolve diagnostic — that contract is pinned in
    # test_view_schema_evolution / test_incremental_agg)
    dim.merge(spark.createDataFrame([("j1", 1)], "jk string, attr int"))
    fact.merge(spark.createDataFrame([(0, "j1", 1)],
                                     "k int, jk string, x int"))
    view.refresh_aligned()
    agg.refresh()
    flive = True
    for step in range(12):
        op = rng.choice(["fmerge", "fmerge", "fdel", "dmerge",
                         "ddel", "aligned", "aligned"])
        if op == "fmerge":
            ks = rng.sample(range(12), rng.randint(1, 4))
            fact.merge(spark.createDataFrame(
                [(k, rng.choice(JKS), rng.choice(VALUES)) for k in ks],
                "k int, jk string, x int"))
            flive = True
        elif op == "fdel" and flive:
            fact.delete_keys(spark.createDataFrame(
                [(k,) for k in rng.sample(range(12), rng.randint(1, 2))],
                "k int"))
        elif op == "dmerge":
            jks = rng.sample(["j1", "j2", "j3"], rng.randint(1, 2))
            dim.merge(spark.createDataFrame(
                [(j, rng.randint(1, 99)) for j in jks],
                "jk string, attr int"))
        elif op == "ddel" and dim.current_version() >= 0:
            dim.delete_keys(spark.createDataFrame(
                [(rng.choice(["j1", "j2", "j3"]),)], "jk string"))
        elif op == "aligned" and flive:
            view.refresh_aligned()
            agg.refresh()
            cur = view._cursors()
            assert agg_read() == expected(cur["fact"], cur["dim"]), \
                f"seed {seed} downstream torn at step {step} ({cur})"
    if flive:
        view.refresh_aligned()
        agg.refresh()
        cur = view._cursors()
        assert agg_read() == expected(cur["fact"], cur["dim"])
