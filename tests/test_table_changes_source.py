"""`table_changes` streaming/batch DataSource (round 11): a
ParquetUpsertTable's change feed as a standard Spark source —
versions are the offsets, Spark's checkpoint is the cursor.

Covers: batch read ≡ change_feed; streaming tail with checkpointed
restart (no replay, no loss); the e2e takedown arc (corpus
delete_where → readStream → AnnIndexJob.delete) surviving a restart;
rate limiting; loud failure on unrecorded/vacuumed history."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from aether_firebase_consumer_spark.sinks.upsert import ParquetUpsertTable
from aether_firebase_consumer_spark.streaming.table_changes_source import (
    TableChangesDataSource,
    register_table_changes,
)


@pytest.fixture()
def table(spark, tmp_path):
    register_table_changes(spark)
    return ParquetUpsertTable(spark, str(tmp_path / "t"), ["k"],
                              retain_versions=20)


def _kdf(spark, rows):
    return spark.createDataFrame(rows, "k bigint, v string")


def _reader(spark, t, **opts):
    r = (spark.read.format("table_changes")
         .option("path", t.path).option("keyCols", "k"))
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def _sorted(df):
    return sorted((r.k, r.change_type, r.version) for r in df.collect())


def test_batch_read_equals_change_feed(spark, table):
    t = table
    t.merge(_kdf(spark, [(1, "a"), (2, "b")]))
    t.merge(_kdf(spark, [(2, "B"), (3, "c")]))
    t.delete_keys(spark.createDataFrame([(1,)], "k bigint"))
    got = _reader(spark, t)
    assert got.columns == ["k", "change_type", "version"]
    want = t.change_feed(0)
    assert _sorted(got) == _sorted(want)
    # startingVersion narrows the range
    assert _sorted(_reader(spark, t, startingVersion=2)) == \
        [(1, "delete", 2)]


def test_stream_tails_checkpoint_and_restarts(spark, table, tmp_path):
    t = table
    t.merge(_kdf(spark, [(1, "a")]))        # pre-attach history
    ckpt = str(tmp_path / "ck")
    out = str(tmp_path / "out")

    def run_once():
        q = (spark.readStream.format("table_changes")
             .option("path", t.path).option("keyCols", "k").load()
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt).start())
        q.processAllAvailable()
        q.stop()

    run_once()
    # tail semantics: nothing before attach is replayed
    assert not any(n.endswith(".parquet") and
                   os.path.getsize(os.path.join(out, n)) > 0
                   for n in os.listdir(out)) or \
        spark.read.parquet(out).count() == 0

    t.merge(_kdf(spark, [(2, "b"), (1, "A")]))   # insert + update
    run_once()
    assert sorted((r.k, r.change_type, r.version)
                  for r in spark.read.parquet(out).collect()) == \
        [(1, "update", 1), (2, "insert", 1)]

    # restart with no new commits: nothing re-delivered
    run_once()
    assert spark.read.parquet(out).count() == 2

    t.delete_keys(spark.createDataFrame([(2,)], "k bigint"))
    run_once()
    assert sorted((r.k, r.change_type, r.version)
                  for r in spark.read.parquet(out).collect()) == \
        [(1, "update", 1), (2, "delete", 2), (2, "insert", 1)]


def test_max_versions_per_trigger(spark, table, tmp_path):
    t = table
    f0 = t.current_version()
    for i in range(5):
        t.merge(_kdf(spark, [(i, "x")]))
    seen_batches = []

    def sink(df, epoch_id):
        seen_batches.append(sorted(r.version for r in df.collect()))

    q = (spark.readStream.format("table_changes")
         .option("path", t.path).option("keyCols", "k")
         .option("startingVersion", f0 + 1)
         .option("maxVersionsPerTrigger", 2).load()
         .writeStream.foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    q.processAllAvailable()
    q.stop()
    assert [v for b in seen_batches for v in b] == [0, 1, 2, 3, 4]
    assert all(len(set(b)) <= 2 for b in seen_batches if b)
    assert len([b for b in seen_batches if b]) >= 3


def test_unrecorded_version_fails_loudly(spark, table, tmp_path):
    from aether_firebase_consumer_spark.sinks.manifest import (
        export_snapshot,
        import_snapshot,
    )
    t = table
    t.merge(_kdf(spark, [(1, "a")]))
    export_snapshot(t, str(tmp_path / "snap"))
    t.merge(_kdf(spark, [(2, "b")]))
    import_snapshot(str(tmp_path / "snap"), t)   # v2: no recording
    with pytest.raises(Exception, match="no\\s+commit-time|recording"):
        _reader(spark, t).collect()
    # but a range past the gap works
    t.merge(_kdf(spark, [(4, "d")]))             # v3: recorded again
    assert _sorted(_reader(spark, t, startingVersion=3)) == \
        [(4, "insert", 3)]


def test_batch_include_values_matches_feed(spark, tmp_path):
    """includeValues=true on a value-carrying table reproduces
    change_feed_with_values exactly: post-images on inserts/updates,
    nulls on deletes — O(changed rows), no version read."""
    register_table_changes(spark)
    t = ParquetUpsertTable(spark, str(tmp_path / "tv"), ["k"],
                           retain_versions=20,
                           record_change_values=True)
    t.merge(_kdf(spark, [(1, "a"), (2, "b")]))
    t.merge(_kdf(spark, [(2, "B"), (3, "c")]))
    t.delete_keys(spark.createDataFrame([(1,)], "k bigint"))
    got = _reader(spark, t, includeValues="true")
    assert got.columns == ["k", "v", "change_type", "version"]
    want = (t.change_feed_with_values(0)
            .select("k", "v", "change_type", "version"))
    assert sorted(map(tuple, got.collect()), key=repr) == \
        sorted(map(tuple, want.collect()), key=repr)
    # delete rows carry null values through the source too
    assert [r.v for r in got.filter("change_type = 'delete'")
            .collect()] == [None]


def test_include_values_keys_only_recording_nullfills(spark, table):
    """A table WITHOUT record_change_values has keys-only recordings;
    an includeValues stream still emits the declared full schema, with
    value columns null — the source never pays a version-sized read to
    derive images (that derivation is change_feed_with_values' job)."""
    t = table
    t.merge(_kdf(spark, [(1, "a"), (2, "b")]))
    got = _reader(spark, t, includeValues="true")
    assert got.columns == ["k", "v", "change_type", "version"]
    rows = got.collect()
    assert sorted((r.k, r.change_type) for r in rows) == \
        [(1, "insert"), (2, "insert")]
    assert all(r.v is None for r in rows)


def test_streaming_mirror_include_values(spark, tmp_path):
    """Log-shipped replication as a STANDARD streaming query: an
    includeValues table_changes stream drives a mirror table via
    foreachBatch (latest-per-key collapse, delete-before-merge); a
    checkpointed restart neither replays nor loses, and the mirror
    ends row-identical to the source through updates and deletes."""
    from aether_firebase_consumer_spark.sinks.upsert import (
        latest_per_key,
    )
    register_table_changes(spark)
    src = ParquetUpsertTable(spark, str(tmp_path / "src"), ["k"],
                             retain_versions=20,
                             record_change_values=True)
    mirror = ParquetUpsertTable(spark, str(tmp_path / "mir"), ["k"],
                                retain_versions=5)
    src.merge(_kdf(spark, [(1, "a"), (2, "b"), (3, "c")]))
    ckpt = str(tmp_path / "ck")

    def apply_batch(df, epoch_id):
        final = latest_per_key(df, ["k"], "version")
        dead = (final.filter(F.col("change_type") == "delete")
                .select("k"))
        live = (final.filter(F.col("change_type") != "delete")
                .drop("change_type", "version"))
        if not dead.isEmpty():
            mirror.delete_keys(dead)
        mirror.merge(live)

    def run_once():
        q = (spark.readStream.format("table_changes")
             .option("path", src.path).option("keyCols", "k")
             .option("includeValues", "true")
             .option("startingVersion", 0).load()
             .writeStream.foreachBatch(apply_batch)
             .option("checkpointLocation", ckpt).start())
        q.processAllAvailable()
        q.stop()

    run_once()
    def snap(t):
        return sorted(map(tuple, t.read().collect()))
    assert snap(mirror) == snap(src)

    # update + delete + insert across several versions, then restart:
    # update-then-delete of k=2 must end ABSENT in the mirror
    src.merge(_kdf(spark, [(1, "A"), (2, "b2")]))
    src.merge(_kdf(spark, [(4, "d")]))
    src.delete_keys(spark.createDataFrame([(2,)], "k bigint"))
    run_once()
    assert snap(mirror) == snap(src)
    assert sorted(r.k for r in mirror.read().collect()) == [1, 3, 4]


def test_e2e_takedown_stream_survives_restart(spark, tmp_path):
    """The production shape: corpus retention deletes flow through a
    checkpointed streaming query into the ANN index's pruned delete;
    a restart neither replays nor loses takedowns, and the index ends
    hash-equal to a recompute on the surviving corpus."""
    from tests.test_ann_ingest import (
        _df, _mk_job, _recompute_topk, _snap, _vec,
    )
    register_table_changes(spark)
    corpus = ParquetUpsertTable(spark, str(tmp_path / "up"),
                                ["vec_id"], retain_versions=20)
    state = [(i, _vec(i)) for i in range(1, 11)]
    corpus.merge(_df(spark, state))
    job = _mk_job(spark, tmp_path / "ann")
    job.process_batch(_df(spark, state), 0)

    ckpt = str(tmp_path / "ck")
    attach_after = corpus.current_version()

    def apply_changes(df, epoch_id):
        dead = (df.filter(F.col("change_type") == "delete")
                .select("vec_id").distinct())
        job.delete(dead)

    def run_once():
        q = (spark.readStream.format("table_changes")
             .option("path", corpus.path)
             .option("keyCols", "vec_id")
             .option("startingVersion", attach_after + 1).load()
             .writeStream.foreachBatch(apply_changes)
             .option("checkpointLocation", ckpt).start())
        q.processAllAvailable()
        q.stop()

    assert corpus.delete_where(("vec_id", "<=", 3)) == 3
    run_once()
    corpus.delete_keys(spark.createDataFrame([(7,)], "vec_id bigint"))
    run_once()   # restart from checkpoint picks up only the new delete

    remaining = [(i, v) for i, v in state if i > 3 and i != 7]
    got = {(r.vec_id, r.cell, tuple(r.codes))
           for r in job.codes.read().collect()}
    want = {(r.vec_id, r.cell, tuple(r.codes))
            for r in job.code_rows(_df(spark, remaining)).collect()}
    assert got == want
    queries = _df(spark, [(0, _vec(5))])
    assert _snap(job.topk(queries, k=3, shortlist=10)) == \
        _snap(_recompute_topk(spark, remaining, queries, k=3,
                              shortlist=10))
