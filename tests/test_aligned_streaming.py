"""Streaming-driven snapshot-aligned join view (round 13, VERDICT r12
item 1): ``CdfJoinView.refresh_aligned`` bound into the
``foreachBatch``/``StreamingQuery`` path under the ``SparkJob``
lifecycle. Contracts under test:

1. ALIGNMENT UNDER STREAMING — with the maintenance query running,
   after every drained interleaved op batch (fact merges/deletes, dim
   merges/deletes, delete-only slices) the view equals the full
   re-join pinned at EXACTLY the committed (fact_cursor, dim_cursor)
   pair.
2. LIFECYCLE — the job pauses (view frozen but still a consistent
   snapshot at its old pair), resumes from the same checkpoint, and
   catches up; status transitions NORMAL -> PAUSED -> NORMAL.
3. RESTART — a stop + fresh start on the same checkpoint re-delivers
   unseen ticks; the follower fence folds each version once.
4. GUARD — a view without follower checkpoints is rejected.
"""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from aether_firebase_consumer_spark.control.jobs import (
    JobManager,
    JobStatus,
)
from aether_firebase_consumer_spark.sinks.upsert import ParquetUpsertTable
from aether_firebase_consumer_spark.streaming.aligned_driver import (
    aligned_refresh_start_fn,
)
from aether_firebase_consumer_spark.streaming.join_view import CdfJoinView
from aether_firebase_consumer_spark.streaming.table_changes_source import (
    register_table_changes,
)

JKS = ["j1", "j2", "j3", None]
VALUES = [1, 2, 5, 5, 9, None]


def _tables(spark, tmp_path):
    fact = ParquetUpsertTable(
        spark, str(tmp_path / "fact"), ["k"], retain_versions=80,
        record_change_values=True)
    dim = ParquetUpsertTable(
        spark, str(tmp_path / "dim"), ["jk"], retain_versions=80,
        record_change_values=True)
    return fact, dim


def _view(spark, tmp_path, fact, dim):
    return CdfJoinView(spark, str(tmp_path / "view"), fact, dim, "jk",
                       str(tmp_path / "fck"), str(tmp_path / "dck"))


def _read(view):
    df = view.read()
    if df is None:
        return []
    if "dim_attr" not in df.columns:
        df = df.withColumn("dim_attr", F.lit(None).cast("int"))
    return sorted(((r.k,), (r.jk is None, r.jk), r.x, r.dim_attr)
                  for r in df.collect())


def _rejoin_at(fact, dim, vf, vd):
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


def _assert_aligned(view, fact, dim, ctx=""):
    cur = view._cursors()
    assert _read(view) == _rejoin_at(fact, dim, cur["fact"],
                                     cur["dim"]), \
        f"view torn vs snapshot pair {cur} {ctx}"
    return cur


def test_streaming_job_maintains_aligned_snapshots(spark, tmp_path):
    register_table_changes(spark)
    rng = random.Random(37)
    fact, dim = _tables(spark, tmp_path)
    view = _view(spark, tmp_path, fact, dim)
    # seed both sides so the tick streams have a version 0 to start on
    dim.merge(spark.createDataFrame([("j1", 10)], "jk string, attr int"))
    fact.merge(spark.createDataFrame([(0, "j1", 1)],
                                     "k int, jk string, x int"))

    mgr = JobManager(str(tmp_path / "ck_root"))
    job = mgr.add_job("t1", "aligned-view",
                      aligned_refresh_start_fn(spark, view))
    job.start()
    try:
        assert job.get_status() == JobStatus.NORMAL
        job.query.processAllAvailable()
        _assert_aligned(view, fact, dim, "after seed")

        for step in range(10):
            op = rng.choice(["fmerge", "fmerge", "fdel", "dmerge",
                             "ddel"])
            if op == "fmerge":
                ks = rng.sample(range(12), rng.randint(1, 4))
                fact.merge(spark.createDataFrame(
                    [(k, rng.choice(JKS), rng.choice(VALUES))
                     for k in ks], "k int, jk string, x int"))
            elif op == "fdel":
                fact.delete_keys(spark.createDataFrame(
                    [(k,) for k in rng.sample(range(12),
                                              rng.randint(1, 2))],
                    "k int"))
            elif op == "dmerge":
                jks = rng.sample(["j1", "j2", "j3"], rng.randint(1, 2))
                dim.merge(spark.createDataFrame(
                    [(j, rng.randint(1, 99)) for j in jks],
                    "jk string, attr int"))
            elif op == "ddel" and dim.current_version() >= 0:
                dim.delete_keys(spark.createDataFrame(
                    [(rng.choice(["j1", "j2", "j3"]),)], "jk string"))
            job.query.processAllAvailable()
            _assert_aligned(view, fact, dim, f"at step {step}")
            # drained: the view also equals the re-join at the
            # sources' CURRENT tip. (The committed cursor pair may
            # legitimately lag the tip when a dim slice touched no
            # fact rows — the fence only rides merges — but then the
            # pinned rejoin and the tip rejoin coincide.)
            assert _read(view) == _rejoin_at(
                fact, dim, fact.current_version(),
                dim.current_version()), f"stale after drain, step {step}"
    finally:
        job.stop()
    assert job.get_status() == JobStatus.STOPPED


def test_pause_freezes_consistent_snapshot_and_resume_catches_up(
        spark, tmp_path):
    register_table_changes(spark)
    fact, dim = _tables(spark, tmp_path)
    view = _view(spark, tmp_path, fact, dim)
    dim.merge(spark.createDataFrame(
        [("j1", 10), ("j2", 20)], "jk string, attr int"))
    fact.merge(spark.createDataFrame(
        [(0, "j1", 1), (1, "j2", 2)], "k int, jk string, x int"))

    mgr = JobManager(str(tmp_path / "ck_root"))
    job = mgr.add_job("t1", "aligned-view",
                      aligned_refresh_start_fn(spark, view))
    job.start()
    try:
        job.query.processAllAvailable()
        frozen = _assert_aligned(view, fact, dim, "before pause")

        job.pause()
        assert job.get_status() == JobStatus.PAUSED
        # ops land while paused: the view must NOT move, and must
        # still be the consistent snapshot at its old committed pair
        fact.merge(spark.createDataFrame(
            [(2, "j2", 5), (0, "j2", 9)], "k int, jk string, x int"))
        dim.delete_keys(spark.createDataFrame([("j1",)], "jk string"))
        fact.delete_keys(spark.createDataFrame([(1,)], "k int"))
        cur = _assert_aligned(view, fact, dim, "while paused")
        assert cur == frozen
        assert cur["fact"] < fact.current_version()

        job.resume()
        assert job.get_status() == JobStatus.NORMAL
        job.query.processAllAvailable()
        cur = _assert_aligned(view, fact, dim, "after resume")
        assert _read(view) == _rejoin_at(
            fact, dim, fact.current_version(), dim.current_version())
        assert cur["fact"] == fact.current_version()
    finally:
        job.stop()


def test_restart_on_same_checkpoint_is_exactly_once(spark, tmp_path):
    register_table_changes(spark)
    fact, dim = _tables(spark, tmp_path)
    view = _view(spark, tmp_path, fact, dim)
    dim.merge(spark.createDataFrame([("j1", 10)], "jk string, attr int"))
    fact.merge(spark.createDataFrame([(0, "j1", 1)],
                                     "k int, jk string, x int"))
    mgr = JobManager(str(tmp_path / "ck_root"))
    job = mgr.add_job("t1", "aligned-view",
                      aligned_refresh_start_fn(spark, view))
    job.start()
    job.query.processAllAvailable()
    job.stop()
    _assert_aligned(view, fact, dim, "first run")

    # changes while fully stopped, then a cold start on the SAME
    # checkpoint dir (fresh SparkJob instance, as after a process
    # restart via resume_all)
    fact.merge(spark.createDataFrame(
        [(1, "j1", 7), (0, "j1", 3)], "k int, jk string, x int"))
    dim.merge(spark.createDataFrame([("j1", 99)], "jk string, attr int"))
    mgr2 = JobManager(str(tmp_path / "ck_root"))
    job2 = mgr2.add_job("t1", "aligned-view",
                        aligned_refresh_start_fn(spark, view))
    job2.start()
    try:
        job2.query.processAllAvailable()
        cur = _assert_aligned(view, fact, dim, "after restart")
        assert _read(view) == _rejoin_at(
            fact, dim, fact.current_version(), dim.current_version())
        assert cur["fact"] == fact.current_version()
    finally:
        job2.stop()


def test_view_chain_job_maintains_topk_join_chain(spark, tmp_path):
    """Round 13: one streaming job maintains a whole view DAG —
    source → CdfTopKView (top-2 per group) → CdfJoinView (enrich the
    members with a dim) — refreshed in topological order per tick.
    After every drained op batch the downstream equals the recompute
    from the roots; pause freezes the chain at committed states;
    resume catches the whole chain up on one wakeup."""
    from pyspark.sql import Window as W

    from aether_firebase_consumer_spark.streaming.aligned_driver import (
        view_chain_start_fn,
    )
    from aether_firebase_consumer_spark.streaming.topk_view import (
        CdfTopKView,
    )

    register_table_changes(spark)
    src = ParquetUpsertTable(
        spark, str(tmp_path / "src"), ["k"], partition_col="g",
        retain_versions=80, record_change_values=True,
        record_change_preimages=True)
    dim = ParquetUpsertTable(
        spark, str(tmp_path / "dim"), ["g"], retain_versions=80,
        record_change_values=True)
    topk = CdfTopKView(
        spark, str(tmp_path / "topk"), src, ["g"], "x", 2,
        checkpoint_path=str(tmp_path / "tcur"),
        table_kwargs={"record_change_values": True,
                      "record_change_preimages": True,
                      "retain_versions": 80})
    join = CdfJoinView(spark, str(tmp_path / "join"), topk.table,
                       dim, "g", str(tmp_path / "fck"),
                       str(tmp_path / "dck"))

    def expected():
        cur = src.read()
        if cur is None:
            return []
        w = W.partitionBy("g").orderBy(F.col("x").desc_nulls_last(),
                                       F.col("k").asc_nulls_last())
        top = (cur.withColumn("_rk", F.row_number().over(w))
               .filter(F.col("_rk") <= 2).drop("_rk"))
        d = dim.read()
        if d is not None:
            top = top.join(d.select("g", F.col("attr")
                                    .alias("dim_attr")), "g", "left")
        else:
            top = top.withColumn("dim_attr", F.lit(None).cast("int"))
        return sorted((r.k, r.g, r.x, r.dim_attr)
                      for r in top.collect())

    def got():
        df = join.read()
        if df is None:
            return []
        if "dim_attr" not in df.columns:
            df = df.withColumn("dim_attr", F.lit(None).cast("int"))
        return sorted((r.k, r.g, r.x, r.dim_attr)
                      for r in df.collect())

    dim.merge(spark.createDataFrame([("a", 7), ("b", 8)],
                                    "g string, attr int"))
    src.merge(spark.createDataFrame(
        [(i, "a" if i % 2 else "b", 10 * i) for i in range(1, 7)],
        "k int, g string, x int"))
    mgr = JobManager(str(tmp_path / "ck_root"))
    job = mgr.add_job("t1", "chain",
                      view_chain_start_fn(spark, [src, dim],
                                          [topk, join]))
    job.start()
    try:
        job.query.processAllAvailable()
        assert got() == expected()

        # evict both leaders (bench promotions ride through the
        # chain), update the dim, insert a new leader
        src.delete_keys(spark.createDataFrame([(6,), (5,)], "k int"))
        dim.merge(spark.createDataFrame([("a", 70)],
                                        "g string, attr int"))
        job.query.processAllAvailable()
        assert got() == expected()

        job.pause()
        src.merge(spark.createDataFrame([(9, "a", 999)],
                                        "k int, g string, x int"))
        frozen = got()
        assert (9, "a", 999, 70) not in frozen  # chain frozen
        job.resume()
        job.query.processAllAvailable()
        assert got() == expected()
        assert (9, "a", 999, 70) in got()
    finally:
        job.stop()


def test_view_chain_job_aligned_member_feeds_downstream_agg(
        spark, tmp_path):
    """An (aligned join view → aggregate) chain under one streaming
    job: every drained state the downstream aggregate serves equals
    GROUP BY over the re-join pinned at the join view's committed
    cursor pair — the feature-store consistency arc, now fully under
    the job model."""
    from aether_firebase_consumer_spark.streaming.aligned_driver import (
        view_chain_start_fn,
    )
    from aether_firebase_consumer_spark.streaming.incremental_agg import (
        CdfAggregateView,
    )

    register_table_changes(spark)
    fact, dim = _tables(spark, tmp_path)
    view = CdfJoinView(
        spark, str(tmp_path / "view"), fact, dim, "jk",
        str(tmp_path / "fck"), str(tmp_path / "dck"),
        table_kwargs={"record_change_values": True,
                      "record_change_preimages": True,
                      "retain_versions": 80})
    # seed so the enriched column exists before the agg is defined
    dim.merge(spark.createDataFrame([("j1", 1)], "jk string, attr int"))
    fact.merge(spark.createDataFrame([(0, "j1", 1)],
                                     "k int, jk string, x int"))
    view.refresh_aligned()
    agg = CdfAggregateView(
        spark, str(tmp_path / "agg"), view.table, ["dim_attr"],
        {"n": ("count", None), "sx": ("sum", "x")},
        str(tmp_path / "aggck"))

    def expected(vf, vd):
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

    mgr = JobManager(str(tmp_path / "ck_root"))
    job = mgr.add_job("t1", "aligned-chain",
                      view_chain_start_fn(spark, [fact, dim],
                                          [(view, "aligned"), agg]))
    job.start()
    try:
        rng = random.Random(53)
        for step in range(6):
            op = rng.choice(["fmerge", "fmerge", "fdel", "dmerge",
                             "ddel"])
            if op == "fmerge":
                ks = rng.sample(range(10), rng.randint(1, 3))
                fact.merge(spark.createDataFrame(
                    [(k, rng.choice(JKS), rng.choice(VALUES))
                     for k in ks], "k int, jk string, x int"))
            elif op == "fdel":
                fact.delete_keys(spark.createDataFrame(
                    [(rng.randrange(10),)], "k int"))
            elif op == "dmerge":
                dim.merge(spark.createDataFrame(
                    [(rng.choice(["j1", "j2"]), rng.randint(1, 99))],
                    "jk string, attr int"))
            elif op == "ddel" and dim.current_version() >= 0:
                dim.delete_keys(spark.createDataFrame(
                    [(rng.choice(["j1", "j2"]),)], "jk string"))
            job.query.processAllAvailable()
            cur = view._cursors()
            got = agg.read()
            got = [] if got is None else \
                sorted(((r.dim_attr is None, r.dim_attr), r.n, r.sx)
                       for r in got.collect())
            assert got == expected(cur["fact"], cur["dim"]), \
                f"downstream torn at step {step} ({cur})"
    finally:
        job.stop()


def test_view_chain_rejects_bad_specs(spark, tmp_path):
    from aether_firebase_consumer_spark.streaming.aligned_driver import (
        view_chain_start_fn,
    )

    fact, dim = _tables(spark, tmp_path)
    view = _view(spark, tmp_path, fact, dim)
    with pytest.raises(ValueError, match="root table"):
        view_chain_start_fn(spark, [], [view])
    with pytest.raises(ValueError, match="mode"):
        view_chain_start_fn(spark, [fact], [(view, "wrong")])
    streaming_view = CdfJoinView(
        spark, str(tmp_path / "v2"), fact, dim, "jk")
    with pytest.raises(ValueError, match="aligned chain member"):
        view_chain_start_fn(spark, [fact],
                            [(streaming_view, "aligned")])
    # a BARE streaming-mode member fails at configuration time too,
    # not as a dead StreamingQuery on the first tick
    with pytest.raises(ValueError, match="chain member"):
        view_chain_start_fn(spark, [fact], [streaming_view])


def test_streaming_mode_view_rejected(spark, tmp_path):
    fact, dim = _tables(spark, tmp_path)
    streaming_view = CdfJoinView(
        spark, str(tmp_path / "view"), fact, dim, "jk")  # no followers
    with pytest.raises(ValueError, match="poll-loop mode"):
        aligned_refresh_start_fn(spark, streaming_view)


def _topk_join_chain(spark, tmp_path):
    """src → top-2 per group → dim-enrich join, the chain fixture the
    round-13 e2e test uses, shared by the round-14 DAG tests."""
    from aether_firebase_consumer_spark.streaming.topk_view import (
        CdfTopKView,
    )

    src = ParquetUpsertTable(
        spark, str(tmp_path / "src"), ["k"], partition_col="g",
        retain_versions=80, record_change_values=True,
        record_change_preimages=True)
    dim = ParquetUpsertTable(
        spark, str(tmp_path / "dim"), ["g"], retain_versions=80,
        record_change_values=True)
    topk = CdfTopKView(
        spark, str(tmp_path / "topk"), src, ["g"], "x", 2,
        checkpoint_path=str(tmp_path / "tcur"),
        table_kwargs={"record_change_values": True,
                      "record_change_preimages": True,
                      "retain_versions": 80})
    join = CdfJoinView(spark, str(tmp_path / "join"), topk.table,
                       dim, "g", str(tmp_path / "fck"),
                       str(tmp_path / "dck"))
    return src, dim, topk, join


def _chain_expected(src, dim):
    from pyspark.sql import Window as W

    cur = src.read()
    if cur is None:
        return []
    w = W.partitionBy("g").orderBy(F.col("x").desc_nulls_last(),
                                   F.col("k").asc_nulls_last())
    top = (cur.withColumn("_rk", F.row_number().over(w))
           .filter(F.col("_rk") <= 2).drop("_rk"))
    d = dim.read()
    if d is not None:
        top = top.join(d.select("g", F.col("attr").alias("dim_attr")),
                       "g", "left")
    else:
        top = top.withColumn("dim_attr", F.lit(None).cast("int"))
    return sorted((r.k, r.g, r.x, r.dim_attr) for r in top.collect())


def _chain_got(join):
    df = join.read()
    if df is None:
        return []
    if "dim_attr" not in df.columns:
        df = df.withColumn("dim_attr", F.lit(None).cast("int"))
    return sorted((r.k, r.g, r.x, r.dim_attr) for r in df.collect())


def test_view_chain_derives_topological_order(spark, tmp_path):
    """Round 14 (VERDICT r13 item 5): the chain no longer trusts the
    caller's list order — members listed DOWNSTREAM-FIRST are
    reordered from their source/table edges, so one tick still
    drains the whole chain (before: the join would fold the top-k
    table's PREVIOUS state every tick, one hop stale forever)."""
    from aether_firebase_consumer_spark.streaming.aligned_driver import (
        view_chain_start_fn,
    )

    register_table_changes(spark)
    src, dim, topk, join = _topk_join_chain(spark, tmp_path)
    dim.merge(spark.createDataFrame([("a", 7), ("b", 8)],
                                    "g string, attr int"))
    src.merge(spark.createDataFrame(
        [(i, "a" if i % 2 else "b", 10 * i) for i in range(1, 7)],
        "k int, g string, x int"))
    mgr = JobManager(str(tmp_path / "ck_root"))
    # DOWNSTREAM FIRST — the derived order must fix it
    job = mgr.add_job("t1", "chain",
                      view_chain_start_fn(spark, [src, dim],
                                          [join, topk]))
    job.start()
    try:
        job.query.processAllAvailable()
        assert _chain_got(join) == _chain_expected(src, dim)
        # a second tick (member eviction) also drains in ONE wakeup
        src.delete_keys(spark.createDataFrame([(6,)], "k int"))
        job.query.processAllAvailable()
        assert _chain_got(join) == _chain_expected(src, dim)
    finally:
        job.stop()


def test_view_chain_rejects_cycles_and_dangling_sources(
        spark, tmp_path):
    """Round 14 (VERDICT r13 item 5): configuration-time errors for
    the DAG shapes a refresh loop cannot serve — a dependency cycle,
    a member reading a table that is neither a tick root nor another
    member's output, and two members maintaining one table."""
    from aether_firebase_consumer_spark.streaming.aligned_driver import (
        view_chain_start_fn,
    )
    from aether_firebase_consumer_spark.streaming.incremental_agg import (
        CdfAggregateView,
    )

    fact, dim = _tables(spark, tmp_path)
    # dangling: the join reads dim, but only fact ticks the job and
    # no member maintains dim
    join = CdfJoinView(spark, str(tmp_path / "jv"), fact, dim, "jk",
                       str(tmp_path / "fck"), str(tmp_path / "dck"))
    with pytest.raises(ValueError, match="neither a tick root"):
        view_chain_start_fn(spark, [fact], [join])
    # cycle: A aggregates B's table, B aggregates A's table
    tbl_b = ParquetUpsertTable(spark, str(tmp_path / "B"), ["g"])
    va = CdfAggregateView(
        spark, str(tmp_path / "A"), tbl_b, ["g"],
        {"n": ("count", None)}, str(tmp_path / "ca"))
    vb = CdfAggregateView(
        spark, str(tmp_path / "B"), va.table, ["g"],
        {"n": ("count", None)}, str(tmp_path / "cb"))
    with pytest.raises(ValueError, match="cycle"):
        view_chain_start_fn(spark, [fact], [va, vb])
    # duplicate output: two members maintaining the same table path
    va2 = CdfAggregateView(
        spark, str(tmp_path / "A"), fact, ["jk"],
        {"n": ("count", None)}, str(tmp_path / "ca2"))
    va3 = CdfAggregateView(
        spark, str(tmp_path / "A"), fact, ["jk"],
        {"n": ("count", None)}, str(tmp_path / "ca3"))
    with pytest.raises(ValueError, match="same table"):
        view_chain_start_fn(spark, [fact], [va2, va3])


def test_view_chain_hard_kill_between_hops_converges(spark, tmp_path):
    """Round 14 (VERDICT r13 item 6): a crash BETWEEN two hops'
    commits inside one tick — simulated by the downstream refresh
    raising after the upstream hop committed — kills the streaming
    query; restarting the job on the SAME checkpoint re-delivers the
    tick, the already-committed hop replays nothing (its follower
    cursor fences it: table version unchanged), the crashed hop folds
    its pending changes, and the chain converges to the recompute.
    Extends the per-view crash-safety claim to per-chain evidence."""
    from aether_firebase_consumer_spark.streaming.aligned_driver import (
        view_chain_start_fn,
    )

    register_table_changes(spark)
    src, dim, topk, join = _topk_join_chain(spark, tmp_path)
    dim.merge(spark.createDataFrame([("a", 7), ("b", 8)],
                                    "g string, attr int"))
    src.merge(spark.createDataFrame(
        [(i, "a" if i % 2 else "b", 10 * i) for i in range(1, 7)],
        "k int, g string, x int"))
    boom = {"armed": False}
    real_refresh = join.refresh

    def flaky_refresh():
        if boom["armed"]:
            boom["armed"] = False
            raise RuntimeError("injected crash between chain hops")
        return real_refresh()
    join.refresh = flaky_refresh

    mgr = JobManager(str(tmp_path / "ck_root"))
    job = mgr.add_job("t1", "chain",
                      view_chain_start_fn(spark, [src, dim],
                                          [topk, join]))
    job.start()
    try:
        job.query.processAllAvailable()
        assert _chain_got(join) == _chain_expected(src, dim)

        # arm the crash, commit new source changes, let the tick die
        # between the top-k commit and the join commit
        boom["armed"] = True
        src.delete_keys(spark.createDataFrame([(6,), (5,)], "k int"))
        with pytest.raises(Exception):
            job.query.processAllAvailable()
            job.query.awaitTermination()
        assert not boom["armed"], "crash hook never fired"
        topk_v_after_crash = topk.table.current_version()
        # the downstream is stale (pre-crash state), upstream committed
        assert _chain_got(join) != _chain_expected(src, dim)

        # restart the job on the SAME checkpoint: the tick replays,
        # the committed hop is fenced (no new top-k version), the
        # crashed hop catches up
        job.stop()
        job.start()
        job.query.processAllAvailable()
        assert _chain_got(join) == _chain_expected(src, dim)
        assert topk.table.current_version() == topk_v_after_crash, \
            "fenced hop re-applied its fold on replay"
    finally:
        job.stop()
