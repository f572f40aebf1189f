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


def test_streaming_mode_view_rejected(spark, tmp_path):
    fact, dim = _tables(spark, tmp_path)
    streaming_view = CdfJoinView(
        spark, str(tmp_path / "view"), fact, dim, "jk")  # no followers
    with pytest.raises(ValueError, match="poll-loop mode"):
        aligned_refresh_start_fn(spark, streaming_view)
