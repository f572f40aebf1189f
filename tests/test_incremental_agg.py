"""Retraction-based incremental aggregate maintenance (round 11):
``CdfAggregateView`` keeps a GROUP BY view exact under inserts,
updates, deletes, and GROUP MOVES by consuming the source table's
pre+post image change feed. Contracts under test:

1. PRE-IMAGES — recordings of a ``record_change_preimages`` table
   carry the correct ``_pre_<col>`` values (update/delete rows), the
   values API still excludes them, and the image feed round-trips
   through both the verbatim fast path and the derivation fallback.
2. EXACTNESS — after every refresh the maintained view equals the
   full recompute of the source's current state, through an op script
   covering insert / no-op re-merge / value update / group move /
   delete_where / delete_keys, and across MULTIPLE refreshes.
3. NULL SEMANTICS — SUM is NULL for a group whose every value is
   NULL; retracting the last non-null value returns the group to
   NULL (not 0).
4. FENCING — a crash between the view's merge and the cursor commit
   (simulated by rolling the checkpoint back) does not double-apply;
   a partially-overlapping re-poll applies only the unapplied suffix.
5. VANISH — fully-retracted groups disappear from read() and
   compact() reclaims their stored rows.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from aether_firebase_consumer_spark.sinks.upsert import ParquetUpsertTable
from aether_firebase_consumer_spark.streaming.incremental_agg import (
    CdfAggregateView,
)


def _source(spark, root, **kw):
    kw.setdefault("retain_versions", 20)
    kw.setdefault("record_change_values", True)
    kw.setdefault("record_change_preimages", True)
    return ParquetUpsertTable(spark, str(root), ["k"],
                              partition_col="g", **kw)


def _rows(spark, rows):
    return spark.createDataFrame(rows, "k int, g string, x int")


def _view(spark, tmp, src, **kw):
    return CdfAggregateView(
        spark, str(tmp / "view"), src, ["g"],
        {"n": ("count", None), "sx": ("sum", "x")},
        str(tmp / "cursor"), **kw)



def _nsort(rows):
    return sorted(rows, key=lambda t: tuple((v is None, v) for v in t))

def _recompute(src):
    cur = src.read()
    if cur is None:
        return []
    got = (cur.groupBy("g")
           .agg(F.count("*").cast("bigint").alias("n"),
                F.sum("x").cast("bigint").alias("sx")).collect())
    return _nsort((r.g, r.n, r.sx) for r in got)


def _read(view):
    df = view.read()
    return [] if df is None else \
        _nsort((r.g, r.n, r.sx) for r in df.collect())


def test_preimages_recorded_and_views_agree(spark, tmp_path):
    src = _source(spark, tmp_path / "src")
    src.merge(_rows(spark, [(1, "a", 10), (2, "a", 20), (3, "b", 30)]))
    src.merge(_rows(spark, [(2, "a", 25),        # value update
                            (3, "c", 31),        # group move b -> c
                            (4, "b", 40)]))      # insert
    src.delete_keys(_rows(spark, [(1, "a", 0)]).select("k", "g"))

    img = src.changes_with_images(1)
    by_key = {r.k: r for r in img.collect()}
    assert by_key[2].change_type == "update"
    assert (by_key[2]._pre_x, by_key[2].x) == (20, 25)
    assert (by_key[2]._pre_g, by_key[2].g) == ("a", "a")
    assert (by_key[3]._pre_g, by_key[3].g) == ("b", "c")
    assert by_key[4].change_type == "insert"
    assert by_key[4]._pre_x is None and by_key[4].x == 40

    dele = {r.k: r for r in src.changes_with_images(2).collect()}
    assert dele[1].change_type == "delete"
    assert (dele[1]._pre_x, dele[1]._pre_g) == (10, "a")
    assert dele[1].x is None  # no post-image for a delete

    # the post-image values API must NOT leak pre-image columns
    vals = src.changes_with_values(1)
    assert not [c for c in vals.columns if c.startswith("_pre_")]
    feed = src.change_feed_with_values(0)
    assert not [c for c in feed.columns if c.startswith("_pre_")]

    # verbatim fast path and derivation fallback agree row-for-row
    fast = src.changes_with_images(1)
    slow = src._order_image_cols(
        src._attach_preimages(
            src._attach_values(src.changes(1), src.read_version(1)),
            src.read_version(0)))
    key = ["k", "x", "_pre_x", "_pre_g", "change_type"]
    assert sorted(map(tuple, fast.select(*key).collect())) == \
        sorted(map(tuple, slow.select(*key).collect()))


def test_view_matches_recompute_through_op_script(spark, tmp_path):
    src = _source(spark, tmp_path / "src")
    view = _view(spark, tmp_path, src)

    src.merge(_rows(spark, [(1, "a", 1), (2, "a", 2), (3, "b", 3),
                            (4, "b", 4), (5, "c", 5)]))
    assert view.refresh() == 0
    assert _read(view) == _recompute(src)

    # update + no-op re-merge + group move + insert, then refresh
    src.merge(_rows(spark, [(2, "a", 20),   # value update
                            (3, "b", 3),    # byte-identical no-op
                            (4, "c", 4),    # group move b -> c
                            (6, "d", 6)]))  # insert
    src.delete_where(("x", ">=", 20))       # kills k=2
    assert view.refresh() == 2
    assert _read(view) == _recompute(src)

    # multi-version catch-up in ONE refresh
    src.delete_keys(_rows(spark, [(5, "c", 0)]).select("k", "g"))
    src.merge(_rows(spark, [(7, "a", 70), (1, "e", 100)]))  # move a->e
    assert view.refresh() == 4
    assert _read(view) == _recompute(src)
    assert view.refresh() is None  # caught up


def test_sum_null_semantics_under_retraction(spark, tmp_path):
    src = _source(spark, tmp_path / "src")
    view = _view(spark, tmp_path, src)
    src.merge(_rows(spark, [(1, "a", None), (2, "a", 7),
                            (3, "b", None)]))
    view.refresh()
    got = dict((r.g, r.sx) for r in view.read().collect())
    assert got == {"a": 7, "b": None}
    # retract the only non-null value: 'a' must return to NULL, not 0
    src.delete_keys(_rows(spark, [(2, "a", 0)]).select("k", "g"))
    view.refresh()
    got = dict((r.g, r.sx) for r in view.read().collect())
    assert got == {"a": None, "b": None}
    assert _read(view) == _recompute(src)


def test_replay_fence_no_double_apply(spark, tmp_path):
    src = _source(spark, tmp_path / "src")
    view = _view(spark, tmp_path, src)
    src.merge(_rows(spark, [(1, "a", 1), (2, "b", 2)]))
    view.refresh()
    before = _read(view)
    # crash between merge and cursor commit: roll the checkpoint back
    view.follower._write_cursor(-1)
    assert view.refresh() == 0      # re-poll of the same range
    assert _read(view) == before    # fenced: applied nothing twice

    # partially-overlapping re-poll: v1 lands, cursor again rolled
    # back to -1 — only v1 (version > applied) may apply
    src.merge(_rows(spark, [(3, "a", 30)]))
    view.follower._write_cursor(-1)
    assert view.refresh() == 1
    assert _read(view) == _recompute(src)


def test_vanish_and_compact(spark, tmp_path):
    src = _source(spark, tmp_path / "src")
    view = _view(spark, tmp_path, src)
    src.merge(_rows(spark, [(1, "a", 1), (2, "b", 2)]))
    view.refresh()
    src.delete_keys(_rows(spark, [(1, "a", 0)]).select("k", "g"))
    view.refresh()
    assert _read(view) == [("b", 1, 2)]
    stored = view.table.read().count()
    assert stored == 2  # retracted group still stored (_rows == 0)
    view.compact()
    assert view.table.read().count() == 1
    assert _read(view) == [("b", 1, 2)]
    # a later insert re-creates the group from its delta alone
    src.merge(_rows(spark, [(9, "a", 90)]))
    view.refresh()
    assert _read(view) == _recompute(src)


def test_unknown_kind_rejected(spark, tmp_path):
    src = _source(spark, tmp_path / "src")
    with pytest.raises(ValueError, match="unsupported aggregate"):
        CdfAggregateView(spark, str(tmp_path / "v"), src, ["g"],
                         {"m": ("median", "x")}, str(tmp_path / "c"))


def _mm_view(spark, tmp, src):
    return CdfAggregateView(
        spark, str(tmp / "mmview"), src, ["g"],
        {"n": ("count", None), "sx": ("sum", "x"),
         "mn": ("min", "x"), "mx": ("max", "x")},
        str(tmp / "mmcursor"))


def _mm_recompute(src):
    cur = src.read()
    if cur is None:
        return []
    got = (cur.groupBy("g")
           .agg(F.count("*").cast("bigint").alias("n"),
                F.sum("x").cast("bigint").alias("sx"),
                F.min("x").alias("mn"),
                F.max("x").alias("mx")).collect())
    return _nsort((r.g, r.n, r.sx, r.mn, r.mx) for r in got)


def _mm_read(view):
    df = view.read()
    return [] if df is None else \
        _nsort((r.g, r.n, r.sx, r.mn, r.mx) for r in df.collect())


def test_min_max_maintained_through_retractions(spark, tmp_path):
    src = _source(spark, tmp_path / "src")
    view = _mm_view(spark, tmp_path, src)
    src.merge(_rows(spark, [(1, "a", 5), (2, "a", 9), (3, "a", 1),
                            (4, "b", 7), (5, "b", None)]))
    view.refresh()
    assert _mm_read(view) == _mm_recompute(src)

    # delete the current minimum of 'a': dirty recompute must find
    # the runner-up (5), not keep the stale 1
    src.delete_keys(_rows(spark, [(3, "a", 0)]).select("k", "g"))
    view.refresh()
    assert _mm_read(view) == _mm_recompute(src)

    # clean refresh (insert-only) must fold additively: a NEW maximum
    # arrives without any retraction
    src.merge(_rows(spark, [(6, "a", 11), (7, "b", 2)]))
    view.refresh()
    assert _mm_read(view) == _mm_recompute(src)

    # update that moves the max of 'a' DOWN (retracts 11, posts 4):
    # dirty path again; also a group move b -> a in the same version
    src.merge(_rows(spark, [(6, "a", 4), (7, "a", 2)]))
    view.refresh()
    assert _mm_read(view) == _mm_recompute(src)

    # retract the last non-null value of 'b': min/max return to NULL
    src.delete_keys(_rows(spark, [(4, "b", 0)]).select("k", "g"))
    view.refresh()
    assert _mm_read(view) == _mm_recompute(src)
    got = {r.g: (r.mn, r.mx) for r in view.read().collect()}
    assert got["b"] == (None, None)


def test_interior_retractions_never_touch_the_source(spark, tmp_path):
    """Round 13: a retraction strictly INSIDE a group's value range
    cannot move min or max (the extremum-bearing rows provably
    survive), so it must fold cleanly — no dirty flag, no source
    read. Only retractions that tie-or-beat a stored extremum
    recompute. Pinned with a poisoned read_version and the view's
    dirty-group counter."""
    src = _source(spark, tmp_path / "src")
    view = _mm_view(spark, tmp_path, src)
    src.merge(_rows(spark, [(1, "a", 1), (2, "a", 5), (3, "a", 7),
                            (4, "a", 9), (5, "b", 3), (6, "b", 8)]))
    view.refresh()
    assert view.stats["minmax_dirty_groups"] == 0

    orig = src.read_version

    def poisoned(*_a, **_k):
        raise AssertionError("interior retraction read the source")
    src.read_version = poisoned
    try:
        # interior delete (5 in [1, 9]), interior update down (7 -> 2,
        # still inside), and an update that IMPROVES the max (9 -> 12:
        # its retracted pre-value 9 ties the stored max, so this one
        # IS a threat — do it separately below, not here)
        src.delete_keys(_rows(spark, [(2, "a", 0)]).select("k", "g"))
        src.merge(_rows(spark, [(3, "a", 2)]))
        view.refresh()
    finally:
        src.read_version = orig
    assert _mm_read(view) == _mm_recompute(src)
    assert view.stats["minmax_dirty_groups"] == 0

    # tie-or-beat retractions DO recompute: delete the min of 'a'
    # (value 1) — 'b' is untouched and must not be recomputed
    src.delete_keys(_rows(spark, [(1, "a", 0)]).select("k", "g"))
    view.refresh()
    assert _mm_read(view) == _mm_recompute(src)
    assert view.stats["minmax_dirty_groups"] == 1

    # an update that moves the max UP retracts the old max (a tie):
    # conservative dirty is correct and converges
    src.merge(_rows(spark, [(4, "a", 12)]))
    view.refresh()
    assert _mm_read(view) == _mm_recompute(src)
    assert view.stats["minmax_dirty_groups"] == 2


def test_null_group_is_one_group(spark, tmp_path):
    """NULL is a legal SQL group: the null-safe fold join and the
    table's null-safe key matching must keep ONE stored row for it
    across refreshes (an unsafe join would duplicate it)."""
    src = _source(spark, tmp_path / "src")
    view = _view(spark, tmp_path, src)
    src.merge(_rows(spark, [(1, None, 1), (2, None, 2), (3, "a", 3)]))
    view.refresh()
    assert _read(view) == _recompute(src)
    src.merge(_rows(spark, [(4, None, 4)]))   # second fold, same group
    src.delete_keys(_rows(spark, [(1, None, 0)]).select("k", "g"))
    view.refresh()
    assert _read(view) == _recompute(src)
    nulls = [r for r in view.read().collect() if r.g is None]
    assert len(nulls) == 1 and (nulls[0].n, nulls[0].sx) == (2, 6)


def test_streaming_fold_via_table_changes(spark, tmp_path):
    """The production shape: a table_changes includeImages stream
    drives the view via foreachBatch -> fold_stream_batch — the
    cursor lives in Spark's checkpoint, the version fence upgrades
    the engine's at-least-once replay to exactly-once effect. A
    checkpointed restart neither double-folds nor loses versions,
    through updates, group moves, and deletes."""
    from aether_firebase_consumer_spark.streaming.table_changes_source import (  # noqa: E501
        register_table_changes,
    )

    register_table_changes(spark)
    src = _source(spark, tmp_path / "src")
    view = CdfAggregateView(
        spark, str(tmp_path / "view"), src, ["g"],
        {"n": ("count", None), "sx": ("sum", "x")})
    src.merge(_rows(spark, [(1, "a", 1), (2, "a", 2), (3, "b", 3)]))
    ckpt = str(tmp_path / "ck")

    def run_once():
        q = (spark.readStream.format("table_changes")
             .option("path", src.path).option("keyCols", "k")
             .option("includeImages", "true")
             .option("startingVersion", 0).load()
             .writeStream.foreachBatch(view.fold_stream_batch)
             .option("checkpointLocation", ckpt).start())
        q.processAllAvailable()
        q.stop()

    run_once()
    assert _read(view) == _recompute(src)

    src.merge(_rows(spark, [(2, "b", 20),     # group move a -> b
                            (4, "c", None)]))  # null-valued insert
    src.delete_keys(_rows(spark, [(1, "a", 0)]).select("k", "g"))
    run_once()                                 # restart from checkpoint
    assert _read(view) == _recompute(src)
    assert view.refresh.__doc__  # poll-mode refresh must stay intact

    # refresh() without a follower refuses loudly (streaming mode)
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="streaming mode"):
        view.refresh()


def test_count_distinct_maintained(spark, tmp_path):
    """Exact COUNT(DISTINCT x) through the helper multiset: duplicate
    values collapse, retracting ONE copy of a duplicated value leaves
    the count unchanged, retracting the LAST copy drops it, NULLs are
    ignored (0 for an all-null group), and group moves carry the
    value between helper groups."""
    src = _source(spark, tmp_path / "src")
    view = CdfAggregateView(
        spark, str(tmp_path / "cdview"), src, ["g"],
        {"n": ("count", None), "nd": ("count_distinct", "x")},
        str(tmp_path / "cdcursor"))

    def recompute():
        got = (src.read().groupBy("g")
               .agg(F.count("*").cast("bigint").alias("n"),
                    F.countDistinct("x").cast("bigint").alias("nd"))
               .collect())
        return _nsort((r.g, r.n, r.nd) for r in got)

    def read():
        return _nsort((r.g, r.n, r.nd)
                      for r in view.read().collect())

    src.merge(_rows(spark, [(1, "a", 5), (2, "a", 5), (3, "a", 7),
                            (4, "b", None), (5, "b", 9)]))
    view.refresh()
    assert read() == recompute() == [("a", 3, 2), ("b", 2, 1)]

    # retract ONE copy of the duplicated 5 (update 5 -> 7): distinct
    # count stays 2 (5 survives via k=2; 7 already present)
    src.merge(_rows(spark, [(1, "a", 7)]))
    view.refresh()
    assert read() == recompute() == [("a", 3, 2), ("b", 2, 1)]

    # retract the LAST copy of 5, and null out b's only value
    src.merge(_rows(spark, [(2, "a", 7), (5, "b", None)]))
    view.refresh()
    assert read() == recompute() == [("a", 3, 1), ("b", 2, 0)]

    # group move carries the value: k=3 moves a -> b with x=7
    src.merge(_rows(spark, [(3, "b", 7)]))
    view.refresh()
    assert read() == recompute() == [("a", 2, 1), ("b", 3, 1)]

    # fence: replay must not double-count the multiset
    view.follower._write_cursor(-1)
    view.refresh()
    assert read() == recompute()

    # compact reclaims fully-retracted helper rows too
    view.compact()
    helper = view._helpers["nd"]
    assert helper.read().filter(F.col("_rows") <= 0).isEmpty()
    assert read() == recompute()


def test_rebuild_past_retention(spark, tmp_path):
    """The recovery arc: vacuum the source past the view's cursor so
    refresh raises (history is GONE), rebuild from the snapshot —
    including min/max and the count_distinct helper — then resume
    incremental folding."""
    src = _source(spark, tmp_path / "src", retain_versions=2)
    view = CdfAggregateView(
        spark, str(tmp_path / "rview"), src, ["g"],
        {"n": ("count", None), "sx": ("sum", "x"),
         "mn": ("min", "x"), "nd": ("count_distinct", "x")},
        str(tmp_path / "rcursor"))
    src.merge(_rows(spark, [(1, "a", 5), (2, "a", 5), (3, "b", 7)]))
    view.refresh()

    # three more versions; retention keeps only the last two
    src.merge(_rows(spark, [(4, "b", 9)]))
    src.delete_keys(_rows(spark, [(1, "a", 0)]).select("k", "g"))
    src.merge(_rows(spark, [(5, "c", None)]))
    src.vacuum(keep_last_n=1)

    import pytest as _pytest
    with _pytest.raises(ValueError):
        view.refresh()          # gap: unrecorded history vacuumed

    v = view.rebuild()
    assert v == src.current_version()

    def recompute():
        got = (src.read().groupBy("g")
               .agg(F.count("*").cast("bigint").alias("n"),
                    F.sum("x").cast("bigint").alias("sx"),
                    F.min("x").alias("mn"),
                    F.countDistinct("x").cast("bigint").alias("nd"))
               .collect())
        return _nsort((r.g, r.n, r.sx, r.mn, r.nd) for r in got)

    def read():
        return _nsort((r.g, r.n, r.sx, r.mn, r.nd)
                      for r in view.read().collect())

    assert read() == recompute()
    # incremental resumes cleanly after the jump
    src.merge(_rows(spark, [(6, "a", 5), (3, "b", 70)]))
    src.delete_keys(_rows(spark, [(4, "b", 0)]).select("k", "g"))
    assert view.refresh() == src.current_version()
    assert read() == recompute()


def test_view_maintenance_under_job_lifecycle(spark, tmp_path):
    """View maintenance as an OPERABLE control-plane job (O18): the
    table_changes -> foreachBatch fold runs as a standard
    StreamingQuery under SparkJob — start / pause / resume with the
    cursor in the job's checkpoint. Changes landing WHILE PAUSED fold
    exactly once after resume (checkpoint restart + version fence),
    and the job reports NORMAL/PAUSED/STOPPED through the same
    lifecycle surface every other job uses."""
    from aether_firebase_consumer_spark.control.jobs import (
        JobStatus,
        SparkJob,
    )
    from aether_firebase_consumer_spark.streaming.table_changes_source import (  # noqa: E501
        register_table_changes,
    )

    register_table_changes(spark)
    src = _source(spark, tmp_path / "src")
    view = CdfAggregateView(
        spark, str(tmp_path / "view"), src, ["g"],
        {"n": ("count", None), "sx": ("sum", "x")})
    src.merge(_rows(spark, [(1, "a", 1), (2, "b", 2)]))

    def start_fn(ckpt):
        return (spark.readStream.format("table_changes")
                .option("path", src.path).option("keyCols", "k")
                .option("includeImages", "true")
                .option("startingVersion", 0).load()
                .writeStream.foreachBatch(view.fold_stream_batch)
                .option("checkpointLocation", ckpt).start())

    job = SparkJob("t1", "agg-view", start_fn, str(tmp_path / "ck"))
    job.start()
    assert job.get_status() == JobStatus.NORMAL
    job.query.processAllAvailable()
    assert _read(view) == _recompute(src)

    job.pause()
    assert job.get_status() == JobStatus.PAUSED
    # changes land while the job is down
    src.merge(_rows(spark, [(1, "b", 10), (3, "a", 30)]))
    src.delete_keys(_rows(spark, [(2, "b", 0)]).select("k", "g"))

    job.resume()
    job.query.processAllAvailable()
    assert job.get_status() == JobStatus.NORMAL
    assert _read(view) == _recompute(src)

    job.stop()
    assert job.get_status() == JobStatus.STOPPED


def test_unresolvable_measure_column_raises_clearly(spark, tmp_path):
    """Round 12 (ADVICE): a spec naming a column that exists in
    neither feed image nor the source schema must raise a diagnostic
    ValueError naming the column — not AttributeError/KeyError."""
    src = _source(spark, tmp_path / "src")
    bad = CdfAggregateView(
        spark, str(tmp_path / "bad"), src, ["g"],
        {"sy": ("sum", "y")},                 # 'y' never existed
        str(tmp_path / "badcur"))
    src.merge(_rows(spark, [(1, "a", 1)]))
    with pytest.raises(ValueError, match="'y'"):
        bad.refresh()


def test_dirty_recompute_at_vacuumed_version_raises(spark, tmp_path):
    """Round 12 (ADVICE): a min/max dirty-group recompute whose
    pinned source version was vacuumed must RAISE (directing at
    rebuild()), not silently recompute at the newer head — that would
    transiently pin extrema past the fold's cursor."""
    src = _source(spark, tmp_path / "src", retain_versions=20)
    view = _mm_view(spark, tmp_path, src)
    src.merge(_rows(spark, [(1, "a", 1), (2, "a", 9), (3, "b", 5)]))
    view.refresh()
    # a retraction (dirties group 'a'), polled but NOT yet folded
    src.delete_keys(spark.createDataFrame([(2,)], "k int"))
    got = view.follower.poll(images=True)
    assert got is not None
    feed, up_to = got
    feed = feed.localCheckpoint()   # pin rows before history vanishes
    # history moves on and the polled version gets vacuumed
    src.merge(_rows(spark, [(4, "a", 7)]))
    src.merge(_rows(spark, [(5, "a", 8)]))
    src.vacuum(keep_last_n=1)
    with pytest.raises(ValueError, match="rebuild"):
        view._fold_all(feed, up_to)
    # the documented recovery works
    view.rebuild()
    assert _mm_read(view) == _mm_recompute(src)
