"""Incremental rollup maintenance + stream-static / stream-stream
joins — the streaming-warehouse surface on top of the upsert sink.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from aether_firebase_consumer_spark.sinks.rollup import IncrementalRollup
from aether_firebase_consumer_spark.tables import normalize_event_ts

SF = "/root/testdata/sf0.001"


def _events(spark):
    return normalize_event_ts(spark.read.parquet(f"{SF}/events.parquet"))


SPECS = {
    "n": ("count", None),
    "total": ("sum", "value"),
    "vmin": ("min", "value"),
    "vmax": ("max", "value"),
}


def _recompute(df):
    return df.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("value").alias("total"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"))


def _as_dict(df):
    return {r["event_type"]: (r["n"], r["total"], r["vmin"], r["vmax"])
            for r in df.collect()}


def _assert_rollup_equal(got, expected):
    """n/min/max exact; sum to float tolerance (fold order differs)."""
    assert got.keys() == expected.keys()
    for k, (n, total, vmin, vmax) in expected.items():
        gn, gtotal, gvmin, gvmax = got[k]
        assert (gn, gvmin, gvmax) == (n, vmin, vmax)
        assert gtotal == pytest.approx(total, rel=1e-9)


def test_incremental_rollup_equals_full_recompute(spark, tmp_path):
    """Folding N arbitrary micro-batches == one full groupBy: the
    additivity invariant of maintained aggregates."""
    ev = _events(spark)
    roll = IncrementalRollup(spark, str(tmp_path / "roll"),
                             ["event_type"], SPECS)
    # three uneven slices, different key mixes per batch
    b1 = ev.where(F.col("event_id") % 3 == 0)
    b2 = ev.where(F.col("event_id") % 3 == 1)
    b3 = ev.where(F.col("event_id") % 3 == 2)
    for b in (b1, b2, b3):
        roll.update(b)
    _assert_rollup_equal(_as_dict(roll.read()), _as_dict(_recompute(ev)))


def test_incremental_rollup_all_null_batch_keeps_history(spark, tmp_path):
    """An all-NULL value_col batch for an existing key must leave the
    stored sum intact (NULL delta folded as identity), not store NULL
    and silently reset the accumulator on the following batch."""
    roll = IncrementalRollup(spark, str(tmp_path / "roll"),
                             ["event_type"], SPECS)
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "event_type string, value double")
    roll.update(mk([("click", 10.0), ("click", 5.0)]))
    # batch 2: the key recurs but value is NULL everywhere
    roll.update(mk([("click", None)]))
    got = _as_dict(roll.read())
    assert got["click"] == (3, 15.0, 5.0, 10.0)
    # batch 3 must FOLD into the preserved 15.0, not restart from 7
    roll.update(mk([("click", 7.0)]))
    got = _as_dict(roll.read())
    assert got["click"] == (4, 22.0, 5.0, 10.0)
    # a never-seen key arriving with only NULLs stores NULL sum, then
    # recovers when real values arrive
    roll.update(mk([("view", None)]))
    assert _as_dict(roll.read())["view"] == (1, None, None, None)
    roll.update(mk([("view", 3.0)]))
    assert _as_dict(roll.read())["view"] == (2, 3.0, 3.0, 3.0)


def test_incremental_rollup_rejects_unknown_aggregate(spark, tmp_path):
    with pytest.raises(ValueError):
        IncrementalRollup(spark, str(tmp_path / "r"), ["k"],
                          {"a": ("avg", "value")})


def test_incremental_rollup_foreach_batch_stream(spark, tmp_path):
    """The foreachBatch adapter maintains the rollup from a file
    stream; the final table equals the batch recompute."""
    src = tmp_path / "src"
    src.mkdir()
    shutil.copy(f"{SF}/events.parquet", src / "part-0.parquet")
    schema = spark.read.parquet(str(src)).schema
    stream = normalize_event_ts(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(str(src)))
    roll = IncrementalRollup(spark, str(tmp_path / "roll"),
                             ["event_type"], SPECS)
    q = (stream.writeStream
         .foreachBatch(roll.foreach_batch_writer())
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    _assert_rollup_equal(_as_dict(roll.read()),
                         _as_dict(_recompute(_events(spark))))


def test_stream_static_broadcast_join(spark, tmp_path):
    """Stream-static join: each micro-batch joins against a static
    dimension with no stream-side state — the enrich pattern. The
    static side is a small dim, broadcast per batch."""
    src = tmp_path / "src"
    src.mkdir()
    shutil.copy(f"{SF}/events.parquet", src / "part-0.parquet")
    schema = spark.read.parquet(str(src)).schema
    stream = normalize_event_ts(
        spark.readStream.schema(schema).parquet(str(src)))
    dim = spark.createDataFrame(
        [("click", "engagement"), ("view", "engagement"),
         ("purchase", "revenue")],
        "event_type string, category string")
    joined = stream.join(F.broadcast(dim), "event_type", "left")
    q = (joined.groupBy("category").agg(F.count("*").alias("n"))
         .writeStream.outputMode("complete")
         .format("memory").queryName("ss_join_out").start())
    q.processAllAvailable()
    q.stop()
    got = {r["category"]: r["n"]
           for r in spark.sql("SELECT * FROM ss_join_out").collect()}
    ev = _events(spark)
    expected = {r["category"]: r["n"]
                for r in ev.join(dim, "event_type", "left")
                .groupBy("category").agg(F.count("*").alias("n")).collect()}
    assert got == expected


def test_stream_stream_interval_join(spark, tmp_path):
    """Stream-stream inner join with watermarks + event-time interval:
    click events join purchase events of the same user within 1 hour
    after the click. Both sides buffer bounded state (watermark-evicted)
    — the canonical funnel-attribution join."""
    src = tmp_path / "src"
    src.mkdir()
    shutil.copy(f"{SF}/events.parquet", src / "part-0.parquet")
    schema = spark.read.parquet(str(src)).schema

    def side(event_type, alias):
        s = normalize_event_ts(
            spark.readStream.schema(schema).parquet(str(src)))
        return (s.where(F.col("event_type") == event_type)
                .select(F.col("user_id").alias(f"{alias}_user"),
                        F.col("event_id").alias(f"{alias}_id"),
                        F.col("ts").alias(f"{alias}_ts"))
                .withWatermark(f"{alias}_ts", "2 hours"))

    clicks, buys = side("click", "c"), side("purchase", "b")
    joined = clicks.join(
        buys,
        (F.col("c_user") == F.col("b_user"))
        & (F.col("b_ts") >= F.col("c_ts"))
        & (F.col("b_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")))
    q = (joined.writeStream.outputMode("append")
         .format("memory").queryName("ss_interval_out").start())
    q.processAllAvailable()
    q.stop()
    got = spark.sql(
        "SELECT COUNT(*) AS n FROM ss_interval_out").collect()[0]["n"]

    ev = _events(spark)
    c = (ev.where(F.col("event_type") == "click")
         .select(F.col("user_id").alias("c_user"),
                 F.col("event_id").alias("c_id"), F.col("ts").alias("c_ts")))
    b = (ev.where(F.col("event_type") == "purchase")
         .select(F.col("user_id").alias("b_user"),
                 F.col("event_id").alias("b_id"), F.col("ts").alias("b_ts")))
    expected = c.join(
        b,
        (F.col("c_user") == F.col("b_user"))
        & (F.col("b_ts") >= F.col("c_ts"))
        & (F.col("b_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR"))).count()
    assert got == expected and got > 0


def test_incremental_rollup_exactly_once_across_restart(spark, tmp_path):
    """Stop the maintenance query after batch 1, add more data, restart
    from the SAME checkpoint: the resumed query must fold only the new
    files — no double counting of batch 1 (checkpoint-offset
    exactly-once composes with the additive fold)."""
    ev = _events(spark)
    first = ev.where(F.col("event_id") % 2 == 0)
    second = ev.where(F.col("event_id") % 2 == 1)
    src = tmp_path / "src"
    src.mkdir()
    first.write.parquet(str(src / "b0.parquet"))

    roll = IncrementalRollup(spark, str(tmp_path / "roll"),
                             ["event_type"], SPECS)

    def run_once():
        stream = normalize_event_ts(
            spark.readStream.schema(ev.schema)
            .option("recursiveFileLookup", "true").parquet(str(src)))
        q = (stream.writeStream
             .foreachBatch(roll.foreach_batch_writer())
             .option("checkpointLocation", str(tmp_path / "ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run_once()
    _assert_rollup_equal(_as_dict(roll.read()), _as_dict(_recompute(first)))

    second.write.parquet(str(src / "b1.parquet"))
    run_once()  # restart from the same checkpoint
    _assert_rollup_equal(_as_dict(roll.read()), _as_dict(_recompute(ev)))


def test_rollup_epoch_fence_dedupes_replayed_batch(spark, tmp_path):
    """A crash between the rollup merge and the streaming checkpoint
    commit re-delivers the SAME epoch; additive folds would double-
    count it. The commit-meta epoch fence must skip the replay while
    still applying genuinely new epochs."""
    roll = IncrementalRollup(
        spark, str(tmp_path / "roll"), ["k"],
        {"n": ("count", None), "s": ("sum", "v")})
    b1 = spark.createDataFrame([("a", 1), ("a", 2), ("b", 10)],
                               "k string, v int")
    roll.update(b1, epoch_id=0)
    roll.update(b1, epoch_id=0)  # replay: must be a no-op
    got = {r["k"]: (r["n"], r["s"]) for r in roll.read().collect()}
    assert got == {"a": (2, 3), "b": (1, 10)}, got

    b2 = spark.createDataFrame([("a", 5)], "k string, v int")
    roll.update(b2, epoch_id=1)  # new epoch applies
    roll.update(b2, epoch_id=1)  # and its replay is fenced
    roll.update(b2, epoch_id=0)  # stale epoch after newer one: fenced
    got = {r["k"]: (r["n"], r["s"]) for r in roll.read().collect()}
    assert got == {"a": (3, 8), "b": (1, 10)}, got

    # batch backfills (no epoch) stay unfenced by design
    roll.update(b2)
    got = {r["k"]: (r["n"], r["s"]) for r in roll.read().collect()}
    assert got["a"] == (4, 13), got


def test_upsert_commit_meta_atomic_with_version(spark, tmp_path):
    """commit_meta reads from the CURRENT version's directory — it can
    never disagree with the visible data — and meta-less commits CARRY
    the previous tag FORWARD: a maintenance op (optimize, backfill,
    delete) between a fold and its checkpoint must not erase the epoch
    fence and reopen the double-count window."""
    from aether_firebase_consumer_spark.sinks.upsert import (
        ParquetUpsertTable,
    )
    t = ParquetUpsertTable(spark, str(tmp_path / "t"), ["id"])
    df1 = spark.createDataFrame([("x", 1)], "id string, v int")
    t.merge(df1, commit_meta={"epoch": 7})
    assert t.commit_meta() == {"epoch": 7}
    # meta-less merge: previous tag survives into the new version
    t.merge(spark.createDataFrame([("y", 2)], "id string, v int"))
    assert t.commit_meta() == {"epoch": 7}
    # maintenance commit also preserves it
    t.optimize(num_files=1)
    assert t.commit_meta() == {"epoch": 7}
    # a newer epoch replaces it
    t.merge(spark.createDataFrame([("z", 3)], "id string, v int"),
            commit_meta={"epoch": 8})
    assert t.commit_meta() == {"epoch": 8}
    assert t.read().count() == 3


def test_stream_stream_left_outer_interval_join(spark, tmp_path):
    """LEFT OUTER stream-stream join: clicks with no purchase within
    the interval must STILL emit (null-padded) once the watermark
    proves no match can arrive — the attribution-with-nonconverters
    shape plain inner joins can't express. Uses synthetic events so the
    matched/unmatched split is known exactly."""
    import datetime as dt

    src = tmp_path / "lo_src"
    src.mkdir()
    t0 = dt.datetime(2024, 1, 1, 10, 0)
    rows = [
        # user 1: click with purchase 30 min later (matches)
        (1, "click", t0, 100),
        (1, "purchase", t0 + dt.timedelta(minutes=30), 101),
        # user 2: click, purchase 3h later (outside the 1h interval)
        (2, "click", t0, 200),
        (2, "purchase", t0 + dt.timedelta(hours=3), 201),
        # user 3: click, no purchase at all
        (3, "click", t0, 300),
        # watermark pushers on both sides
        (9, "click", t0 + dt.timedelta(hours=12), 900),
        (9, "purchase", t0 + dt.timedelta(hours=12), 901),
    ]
    spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, event_id long"
    ).coalesce(1).write.parquet(str(src / "b1"))

    def side(event_type, alias):
        s = (spark.readStream
             .schema("user_id long, event_type string, ts timestamp, "
                     "event_id long")
             .option("recursiveFileLookup", "true").parquet(str(src)))
        return (s.where(F.col("event_type") == event_type)
                .select(F.col("user_id").alias(f"{alias}_user"),
                        F.col("event_id").alias(f"{alias}_id"),
                        F.col("ts").alias(f"{alias}_ts"))
                .withWatermark(f"{alias}_ts", "1 hour"))

    clicks, buys = side("click", "c"), side("purchase", "b")
    joined = clicks.join(
        buys,
        (F.col("c_user") == F.col("b_user"))
        & (F.col("b_ts") >= F.col("c_ts"))
        & (F.col("b_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        "leftOuter")
    q = (joined.writeStream.outputMode("append")
         .format("memory").queryName("ss_louter_out").start())
    q.processAllAvailable()
    q.stop()
    got = {(r["c_id"], r["b_id"])
           for r in spark.sql("SELECT * FROM ss_louter_out").collect()}
    assert (100, 101) in got                      # matched pair
    assert (200, None) in got and (300, None) in got  # null-padded
    assert (200, 201) not in got                  # outside interval
