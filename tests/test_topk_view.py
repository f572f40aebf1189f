"""Incremental top-k / argmax-per-group view (round 12):
``CdfTopKView`` keeps per-group top-N rows exact under retraction.
Contracts under test:

1. EXACTNESS through an op script: inserts, value updates (up and
   DOWN), group moves, key deletes, predicate deletes — after every
   refresh the view equals the windowed recompute.
2. EVICTION/BACKFILL — deleting a current member pulls in the old
   rank-N+1 row (the dirty-group source recompute), and an insert
   displacing a member evicts it without touching the source.
3. REPLAY — re-folding an already-applied slice converges.
4. GUARDS — vacuumed pinned version raises; missing pre-images raise;
   degenerate params raise.
"""

from __future__ import annotations

import pytest

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from aether_firebase_consumer_spark.sinks.upsert import ParquetUpsertTable
from aether_firebase_consumer_spark.streaming.topk_view import CdfTopKView


def _source(spark, root, **kw):
    kw.setdefault("retain_versions", 30)
    kw.setdefault("record_change_values", True)
    kw.setdefault("record_change_preimages", True)
    return ParquetUpsertTable(spark, str(root), ["k"],
                              partition_col="g", **kw)


def _rows(spark, rows):
    return spark.createDataFrame(rows, "k int, g string, x int")


def _view(spark, tmp, src, n=2, **kw):
    return CdfTopKView(spark, str(tmp / "view"), src, ["g"], "x", n,
                       checkpoint_path=str(tmp / "cursor"), **kw)


def _recompute(src, n=2):
    cur = src.read()
    if cur is None:
        return []
    w = W.partitionBy("g").orderBy(F.col("x").desc_nulls_last(),
                                   F.col("k").asc_nulls_last())
    got = (cur.withColumn("_rk", F.row_number().over(w))
           .filter(F.col("_rk") <= n).drop("_rk").collect())
    return sorted((r.k, (r.g is None, r.g), r.x) for r in got)


def _read(view):
    df = view.read()
    return [] if df is None else \
        sorted((r.k, (r.g is None, r.g), r.x) for r in df.collect())


def test_topk_matches_recompute_through_op_script(spark, tmp_path):
    src = _source(spark, tmp_path / "src")
    view = _view(spark, tmp_path, src, n=2)
    src.merge(_rows(spark, [(1, "a", 10), (2, "a", 20), (3, "a", 30),
                            (4, "b", 5), (5, "b", 50),
                            (6, None, 7), (7, "a", None)]))
    view.refresh()
    assert _read(view) == _recompute(src)

    # update DOWN (dirty: 3 falls out of top), update UP (2 rises),
    # group move (5: b -> a), insert
    src.merge(_rows(spark, [(3, "a", 1), (2, "a", 99),
                            (5, "a", 50), (8, "b", 80)]))
    view.refresh()
    assert _read(view) == _recompute(src)

    # deletes: a member (99) and a non-member
    src.delete_keys(spark.createDataFrame([(2,), (3,)], "k int"))
    view.refresh()
    assert _read(view) == _recompute(src)

    # predicate delete wiping a whole group
    src.delete_where(("g", "=", "b"))
    view.refresh()
    assert _read(view) == _recompute(src)
    assert view.refresh() is None  # caught up


def test_eviction_backfills_runner_up_and_insert_displaces(
        spark, tmp_path):
    src = _source(spark, tmp_path / "src")
    view = _view(spark, tmp_path, src, n=2)
    src.merge(_rows(spark, [(1, "a", 100), (2, "a", 90), (3, "a", 80),
                            (4, "a", 70)]))
    view.refresh()
    assert _read(view) == [(1, (False, "a"), 100), (2, (False, "a"), 90)]

    # delete the leader: runner-up 3 backfills from the SOURCE
    src.delete_keys(spark.createDataFrame([(1,)], "k int"))
    view.refresh()
    assert _read(view) == [(2, (False, "a"), 90), (3, (False, "a"), 80)]

    # insert a new leader: displaces 3 with zero source reads
    def poisoned(*_a, **_k):
        raise AssertionError("insert-only fold read the source")
    orig = src.read_version
    src.read_version = poisoned
    try:
        src.merge(_rows(spark, [(9, "a", 95)]))
        view.refresh()
    finally:
        src.read_version = orig
    assert _read(view) == [(2, (False, "a"), 90), (9, (False, "a"), 95)]
    assert _read(view) == _recompute(src)


def test_argmax_n1_latest_per_group(spark, tmp_path):
    """n=1 is argmax — the reference's latest-state-per-id sink shape
    (/root/reference/firebase/app/helpers.py:93-114), maintained."""
    src = _source(spark, tmp_path / "src")
    view = _view(spark, tmp_path, src, n=1)
    src.merge(_rows(spark, [(1, "a", 10), (2, "a", 20), (3, "b", 1)]))
    view.refresh()
    assert _read(view) == _recompute(src, n=1)
    src.delete_keys(spark.createDataFrame([(2,)], "k int"))
    view.refresh()
    assert _read(view) == [(1, (False, "a"), 10), (3, (False, "b"), 1)]
    ranked = view.read(with_rank=True)
    assert {r.rank for r in ranked.collect()} == {1}


def test_replay_fence_converges(spark, tmp_path):
    src = _source(spark, tmp_path / "src")
    view = _view(spark, tmp_path, src, n=2)
    src.merge(_rows(spark, [(1, "a", 10), (2, "a", 20), (3, "a", 30)]))
    src.delete_keys(spark.createDataFrame([(3,)], "k int"))
    got = view.follower.poll(images=True)
    feed, up_to = got
    view._fold(feed, up_to)
    before = _read(view)
    # crash-replay: the same slice folds again
    view._fold(feed, up_to)
    assert _read(view) == before == _recompute(src)


def test_vacuumed_pinned_version_raises(spark, tmp_path):
    # buffer_rows=0 forces every member retraction onto the
    # dirty-recompute path (the round-13 bench would otherwise answer
    # this delete from view state, legitimately never touching the
    # vacuumed source version)
    src = _source(spark, tmp_path / "src", retain_versions=30)
    view = _view(spark, tmp_path, src, n=2, buffer_rows=0)
    src.merge(_rows(spark, [(1, "a", 10), (2, "a", 20), (3, "a", 30)]))
    view.refresh()
    src.delete_keys(spark.createDataFrame([(3,)], "k int"))
    got = view.follower.poll(images=True)
    feed, up_to = got
    feed = feed.localCheckpoint()
    src.merge(_rows(spark, [(4, "a", 40)]))
    src.merge(_rows(spark, [(5, "a", 50)]))
    src.vacuum(keep_last_n=1)
    with pytest.raises(ValueError, match="rebuild"):
        view._fold(feed, up_to)
    view.rebuild()
    assert _read(view) == _recompute(src)


def test_without_preimage_recordings_still_exact(spark, tmp_path):
    """A source without ``record_change_preimages`` still maintains
    correctly: ``change_feed_with_images`` derives pre-images from
    retained versions (version-sized, slower — the recordings are the
    O(changed rows) fast path, not a correctness requirement)."""
    src = ParquetUpsertTable(spark, str(tmp_path / "src"), ["k"],
                             retain_versions=30,
                             record_change_values=True)  # no preimages
    view = CdfTopKView(spark, str(tmp_path / "view"), src, ["g"],
                       "x", 2, checkpoint_path=str(tmp_path / "cur"))
    src.merge(_rows(spark, [(1, "a", 10), (2, "a", 20), (3, "a", 30)]))
    view.refresh()
    src.delete_keys(spark.createDataFrame([(3,)], "k int"))
    src.merge(_rows(spark, [(2, "b", 20)]))   # group move a -> b
    view.refresh()
    got = view.read()
    w = W.partitionBy("g").orderBy(F.col("x").desc_nulls_last(),
                                   F.col("k").asc_nulls_last())
    want = (src.read().withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= 2).drop("_rk"))
    assert sorted((r.k, r.g, r.x) for r in got.collect()) == \
        sorted((r.k, r.g, r.x) for r in want.collect())


def test_degenerate_params_rejected(spark, tmp_path):
    src = _source(spark, tmp_path / "src")
    with pytest.raises(ValueError, match="n >= 1"):
        CdfTopKView(spark, str(tmp_path / "v1"), src, ["g"], "x", 0)
    with pytest.raises(ValueError, match="KEY column"):
        CdfTopKView(spark, str(tmp_path / "v2"), src, ["k"], "x", 1)
    with pytest.raises(ValueError, match="group column"):
        CdfTopKView(spark, str(tmp_path / "v3"), src, ["x"], "x", 1)


def test_streaming_table_changes_drives_topk(spark, tmp_path):
    """A checkpointed table_changes stream (includeImages) drives the
    top-k view through fold_stream_batch, surviving a restart — same
    arc as the join/aggregate views."""
    from aether_firebase_consumer_spark.streaming.table_changes_source import (  # noqa: E501
        register_table_changes,
    )

    register_table_changes(spark)
    src = _source(spark, tmp_path / "src")
    view = CdfTopKView(spark, str(tmp_path / "view"), src, ["g"],
                       "x", 2)  # streaming mode: no follower
    src.merge(_rows(spark, [(1, "a", 10), (2, "a", 20), (3, "a", 30)]))

    def run_once():
        q = (spark.readStream.format("table_changes")
             .option("path", src.path).option("keyCols", "k")
             .option("includeImages", "true")
             .option("startingVersion", 0).load()
             .writeStream.foreachBatch(view.fold_stream_batch)
             .option("checkpointLocation", str(tmp_path / "ck"))
             .start())
        q.processAllAvailable()
        q.stop()

    run_once()
    assert _read(view) == _recompute(src)
    src.delete_keys(spark.createDataFrame([(3,)], "k int"))
    src.merge(_rows(spark, [(4, "a", 25), (5, "b", 1)]))
    run_once()                          # restart from the checkpoint
    assert _read(view) == _recompute(src)
    with pytest.raises(RuntimeError, match="streaming mode"):
        view.refresh()
