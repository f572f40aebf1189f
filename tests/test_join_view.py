"""Incremental enrich-join view (round 11): ``CdfJoinView`` maintains
``fact LEFT JOIN dim`` from both change feeds. Contracts under test:

1. EXACTNESS — after a refresh with both feeds drained the view
   equals the full re-join, through fact inserts/updates/deletes,
   JOIN-KEY MOVES (a fact row changing its dim), dim value updates,
   dim inserts (late-arriving dims backfill enrichment), and dim
   deletes (LEFT JOIN nulls).
2. PRUNED FAN-IN — a dim change re-enriches through the IN-list
   data-skipping read: on a join-key-clustered fact the files_for
   plan keeps a strict subset of files.
3. REGRESSION FENCE — a crash-replayed OLD fact slice must not
   overwrite newer post-images.
4. STREAMING — two table_changes streams drive the view via the
   foreachBatch adapters, surviving checkpointed restarts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aether_firebase_consumer_spark.sinks.upsert import ParquetUpsertTable
from aether_firebase_consumer_spark.streaming.join_view import CdfJoinView


def _fact(spark, root, **kw):
    kw.setdefault("retain_versions", 20)
    kw.setdefault("record_change_values", True)
    kw.setdefault("stats_cols", ["jk"])
    kw.setdefault("bloom_cols", ["jk"])
    return ParquetUpsertTable(spark, str(root), ["k"], **kw)


def _dim(spark, root, **kw):
    kw.setdefault("retain_versions", 20)
    return ParquetUpsertTable(spark, str(root), ["jk"], **kw)


def _frows(spark, rows):
    return spark.createDataFrame(rows, "k int, jk string, x int")


def _drows(spark, rows):
    return spark.createDataFrame(rows, "jk string, attr int")


def _mk(spark, tmp):
    fact = _fact(spark, tmp / "fact")
    dim = _dim(spark, tmp / "dim")
    view = CdfJoinView(spark, str(tmp / "view"), fact, dim, "jk",
                       str(tmp / "fck"), str(tmp / "dck"))
    return fact, dim, view


def _recompute(fact, dim):
    f = fact.read()
    if f is None:
        return []
    d = dim.read()
    if d is not None:
        d = d.select("jk", F.col("attr").alias("dim_attr"))
        f = f.join(d, "jk", "left")
    else:
        f = f.withColumn("dim_attr", F.lit(None).cast("int"))
    return sorted((r.k, r.jk, r.x, r.dim_attr) for r in f.collect())


def _read(view):
    df = view.read()
    if df is None:
        return []
    if "dim_attr" not in df.columns:
        df = df.withColumn("dim_attr", F.lit(None).cast("int"))
    return sorted((r.k, r.jk, r.x, r.dim_attr)
                  for r in df.collect())


def test_join_view_matches_rejoin_through_op_script(spark, tmp_path):
    fact, dim, view = _mk(spark, tmp_path)
    dim.merge(_drows(spark, [("a", 1), ("b", 2)]))
    fact.merge(_frows(spark, [(1, "a", 10), (2, "a", 20),
                              (3, "b", 30), (4, "zz", 40)]))  # zz: no dim
    view.refresh()
    assert _read(view) == _recompute(fact, dim)

    # dim value update + dim delete + late dim insert (backfills zz)
    dim.merge(_drows(spark, [("a", 100), ("zz", 9)]))
    dim.delete_keys(_drows(spark, [("b", 0)]).select("jk"))
    view.refresh()
    assert _read(view) == _recompute(fact, dim)
    got = {r.k: r.dim_attr for r in view.read().collect()}
    assert got[3] is None      # dim 'b' deleted -> LEFT JOIN null
    assert got[4] == 9         # late dim backfilled

    # fact update incl. JOIN-KEY MOVE + fact delete + fact insert
    fact.merge(_frows(spark, [(1, "zz", 11),   # a -> zz
                              (5, "a", 50)]))
    fact.delete_keys(_frows(spark, [(2, "a", 0)]).select("k"))
    view.refresh()
    assert _read(view) == _recompute(fact, dim)
    got = {r.k: r.dim_attr for r in view.read().collect()}
    assert got[1] == 9 and got[5] == 100

    # both sides caught up: refresh is a no-op
    assert view.refresh() == {"fact": None, "dim": None}


def test_dim_fanin_prunes_fact_files(spark, tmp_path):
    """On a jk-partitioned fact, a one-dim-key change plans a strict
    file subset through the manifest (partition + IN-list path)."""
    fact = _fact(spark, tmp_path / "fact", partition_col="jk")
    dim = _dim(spark, tmp_path / "dim")
    view = CdfJoinView(spark, str(tmp_path / "view"), fact, dim, "jk",
                       str(tmp_path / "fck"), str(tmp_path / "dck"))
    rows = [(i, f"jk{i % 8}", i) for i in range(400)]
    fact.merge(_frows(spark, rows))
    dim.merge(_drows(spark, [(f"jk{i}", i) for i in range(8)]))
    view.refresh()
    assert _read(view) == _recompute(fact, dim)

    dim.merge(_drows(spark, [("jk3", 333)]))
    plan = fact.files_for([("jk", "in", ["jk3"])])
    assert plan is not None
    _v, kept, total = plan
    assert total > 1 and len(kept) < total, \
        f"no pruning: {len(kept)}/{total}"
    # I/O-level pin, not just the manifest plan: the scan the dim
    # fold runs must touch ONLY the affected partition's files
    files = fact.read_where(("jk", "in", ["jk3"])).inputFiles()
    assert files and all("jk=jk3" in f for f in files), files
    view.refresh()
    assert _read(view) == _recompute(fact, dim)


def test_old_slice_replay_cannot_regress(spark, tmp_path):
    fact, dim, view = _mk(spark, tmp_path)
    dim.merge(_drows(spark, [("a", 1)]))
    fact.merge(_frows(spark, [(1, "a", 10)]))      # fact v0
    view.refresh()
    fact.merge(_frows(spark, [(1, "a", 99)]))      # fact v1 (newer)
    view.refresh()
    assert {r.x for r in view.read().collect()} == {99}
    # crash-replay of the OLD slice: roll the follower back to -1 so
    # the next poll re-delivers v0+v1; the fence (version > applied)
    # must keep 99, not regress to 10
    view.fact_follower._write_cursor(-1)
    view.refresh()
    assert {r.x for r in view.read().collect()} == {99}
    assert _read(view) == _recompute(fact, dim)


def test_streaming_two_feeds_drive_view(spark, tmp_path):
    from aether_firebase_consumer_spark.streaming.table_changes_source import (  # noqa: E501
        register_table_changes,
    )

    register_table_changes(spark)
    fact = _fact(spark, tmp_path / "fact")
    dim = _dim(spark, tmp_path / "dim")
    view = CdfJoinView(spark, str(tmp_path / "view"), fact, dim, "jk")
    dim.merge(_drows(spark, [("a", 1), ("b", 2)]))
    fact.merge(_frows(spark, [(1, "a", 10), (2, "b", 20)]))

    def run_once():
        qf = (spark.readStream.format("table_changes")
              .option("path", fact.path).option("keyCols", "k")
              .option("includeValues", "true")
              .option("startingVersion", 0).load()
              .writeStream.foreachBatch(view.fold_fact_batch)
              .option("checkpointLocation", str(tmp_path / "fck"))
              .start())
        qf.processAllAvailable()
        qf.stop()
        qd = (spark.readStream.format("table_changes")
              .option("path", dim.path).option("keyCols", "jk")
              .option("startingVersion", 0).load()
              .writeStream.foreachBatch(view.fold_dim_batch)
              .option("checkpointLocation", str(tmp_path / "dck"))
              .start())
        qd.processAllAvailable()
        qd.stop()

    run_once()
    assert _read(view) == _recompute(fact, dim)

    fact.merge(_frows(spark, [(1, "b", 11), (3, "a", 30)]))
    dim.merge(_drows(spark, [("b", 200)]))
    dim.delete_keys(_drows(spark, [("a", 0)]).select("jk"))
    run_once()                         # restart from checkpoints
    assert _read(view) == _recompute(fact, dim)


def test_join_view_rebuild_past_retention(spark, tmp_path):
    import pytest as _pytest

    fact = _fact(spark, tmp_path / "fact", retain_versions=2)
    dim = _dim(spark, tmp_path / "dim")
    view = CdfJoinView(spark, str(tmp_path / "view"), fact, dim, "jk",
                       str(tmp_path / "fck"), str(tmp_path / "dck"))
    dim.merge(_drows(spark, [("a", 1), ("b", 2)]))
    fact.merge(_frows(spark, [(1, "a", 10), (2, "b", 20)]))
    view.refresh()

    fact.merge(_frows(spark, [(3, "a", 30)]))
    fact.delete_keys(_frows(spark, [(2, "b", 0)]).select("k"))
    fact.merge(_frows(spark, [(4, "b", 40)]))
    fact.vacuum(keep_last_n=1)
    with _pytest.raises(ValueError):
        view.refresh()

    got = view.rebuild()
    assert got == {"fact": fact.current_version(),
                   "dim": dim.current_version()}
    assert _read(view) == _recompute(fact, dim)

    # incremental resumes on both sides
    dim.merge(_drows(spark, [("a", 111)]))
    fact.merge(_frows(spark, [(5, "a", 50)]))
    view.refresh()
    assert _read(view) == _recompute(fact, dim)


def test_view_chaining_join_then_agg(spark, tmp_path):
    """Views COMPOSE through the CDF: the join view's table records
    its own retraction feed (table_kwargs), and a CdfAggregateView
    over that denormalized table maintains GROUP BY dim_attr —
    source -> enrich -> aggregate, every hop O(its own changed rows),
    exact through dim updates that MOVE whole groups and fact
    deletes. The no-op exclusion matters here: a dim fold re-merging
    unchanged fact rows must not produce phantom change rows for the
    downstream aggregate."""
    from aether_firebase_consumer_spark.streaming.incremental_agg import (
        CdfAggregateView,
    )

    fact = _fact(spark, tmp_path / "fact")
    dim = _dim(spark, tmp_path / "dim")
    view = CdfJoinView(
        spark, str(tmp_path / "view"), fact, dim, "jk",
        str(tmp_path / "fck"), str(tmp_path / "dck"),
        table_kwargs={"record_change_values": True,
                      "record_change_preimages": True,
                      "retain_versions": 20})
    agg = CdfAggregateView(
        spark, str(tmp_path / "agg"), view.table, ["dim_attr"],
        {"n": ("count", None), "sx": ("sum", "x")},
        str(tmp_path / "aggck"))

    def recompute():
        f = fact.read()
        d = dim.read().select("jk", F.col("attr").alias("dim_attr"))
        got = (f.join(d, "jk", "left").groupBy("dim_attr")
               .agg(F.count("*").cast("bigint").alias("n"),
                    F.sum("x").cast("bigint").alias("sx")).collect())
        return sorted(((r.dim_attr is None, r.dim_attr), r.n, r.sx)
                      for r in got)

    def read():
        return sorted(((r.dim_attr is None, r.dim_attr), r.n, r.sx)
                      for r in agg.read().collect())

    dim.merge(_drows(spark, [("a", 1), ("b", 2)]))
    fact.merge(_frows(spark, [(1, "a", 10), (2, "a", 20),
                              (3, "b", 30), (4, "zz", 40)]))
    view.refresh()
    agg.refresh()
    assert read() == recompute()

    # dim value update MOVES every 'a' fact row to a new group; dim
    # delete moves 'b' rows to the null group; fact delete shrinks it
    dim.merge(_drows(spark, [("a", 111)]))
    dim.delete_keys(_drows(spark, [("b", 0)]).select("jk"))
    fact.delete_keys(_frows(spark, [(3, "b", 0)]).select("k"))
    view.refresh()
    agg.refresh()
    assert read() == recompute()

    # catch-up chain: several upstream refreshes, ONE downstream
    fact.merge(_frows(spark, [(5, "a", 50)]))
    view.refresh()
    dim.merge(_drows(spark, [("zz", 7)]))
    view.refresh()
    agg.refresh()
    assert read() == recompute()


def test_dim_fanin_over_cap_uses_semi_join_not_inlist(spark, tmp_path):
    """Round 12: a dim-wide change past ``dim_fanin_cap`` must NOT
    collect keys to the driver or build an IN-list read — the fold
    switches to a distributed semi-join. Pinned by forcing the cap to
    0 and poisoning ``read_where`` (the IN-list path): the fold must
    never call it, and the result must still equal the full
    re-join."""
    fact = _fact(spark, tmp_path / "fact")
    dim = _dim(spark, tmp_path / "dim")
    view = CdfJoinView(spark, str(tmp_path / "view"), fact, dim, "jk",
                       str(tmp_path / "fck"), str(tmp_path / "dck"),
                       dim_fanin_cap=0)
    fact.merge(_frows(spark, [(i, f"jk{i % 6}", i) for i in range(60)]))
    dim.merge(_drows(spark, [(f"jk{i}", i) for i in range(6)]))
    view.refresh()
    assert _read(view) == _recompute(fact, dim)

    # dim-wide rewrite: every key touched
    dim.merge(_drows(spark, [(f"jk{i}", 100 + i) for i in range(6)]))

    def poisoned(*_a, **_k):
        raise AssertionError(
            "over-cap dim fold used the IN-list read_where path")
    orig = fact.read_where
    fact.read_where = poisoned
    try:
        view.refresh()
    finally:
        fact.read_where = orig
    assert _read(view) == _recompute(fact, dim)
    got = {r.k: r.dim_attr for r in view.read().collect()}
    assert got[0] == 100 and got[5] == 105


def test_dim_fanin_under_cap_still_prunes(spark, tmp_path):
    """The cap leaves the common case alone: a small dim delta still
    goes through the file-skipping IN-list read (pinned by poisoning
    the full-table read the semi-join fallback would use)."""
    fact, dim, view = _mk(spark, tmp_path)
    fact.merge(_frows(spark, [(i, f"jk{i % 6}", i) for i in range(60)]))
    dim.merge(_drows(spark, [(f"jk{i}", i) for i in range(6)]))
    view.refresh()
    dim.merge(_drows(spark, [("jk2", 222)]))

    def poisoned(*_a, **_k):
        raise AssertionError(
            "under-cap dim fold fell into the full-read semi-join")
    orig = fact.read
    fact.read = poisoned
    try:
        view.refresh()
    finally:
        fact.read = orig
    assert _read(view) == _recompute(fact, dim)


def test_concurrent_fold_cannot_regress_other_cursor(spark, tmp_path):
    """Round 12 (ADVICE): commit_meta is a publish-time closure — a
    fold that raced an interleaved fold of the OTHER side re-reads
    both cursors inside the retrying merge body, so the published
    meta can never carry a pre-merge (regressed) snapshot of the
    other cursor. Simulated deterministically: a dim fold commits
    WHILE the fact fold's merge is staging."""
    fact, dim, view = _mk(spark, tmp_path)
    dim.merge(_drows(spark, [("a", 1)]))
    fact.merge(_frows(spark, [(1, "a", 10)]))
    view.refresh()
    before = view._cursors()

    # queue up one new change per side
    dim.merge(_drows(spark, [("a", 2)]))     # dim -> version +1
    fact.merge(_frows(spark, [(2, "a", 20)]))

    got = view.fact_follower.poll(values=True)
    assert got is not None
    feed, f_up_to = got
    dgot = view.dim_follower.poll()
    assert dgot is not None
    dfeed, d_up_to = dgot

    # interleave: the dim fold lands while the fact fold is in flight
    real_merge = view.table.merge
    state = {"raced": False}

    def racing_merge(batch, commit_meta=None):
        if not state["raced"]:
            state["raced"] = True
            view._fold_dim(dfeed.filter(
                F.col("version") > before["dim"]), d_up_to)
        return real_merge(batch, commit_meta=commit_meta)

    view.table.merge = racing_merge
    try:
        view._fold_fact(
            feed.filter(F.col("version") > before["fact"]), f_up_to)
    finally:
        view.table.merge = real_merge
    after = view._cursors()
    assert state["raced"]
    assert after["dim"] == d_up_to, \
        f"fact fold regressed dim cursor: {after}"
    assert after["fact"] == f_up_to
    view.fact_follower.commit(f_up_to)
    view.dim_follower.commit(d_up_to)
    assert _read(view) == _recompute(fact, dim)


def test_aligned_refresh_pins_snapshot_not_current(spark, tmp_path):
    """Round 12: refresh_aligned must enrich with the dim AT THE
    CAPTURED VERSION, not the current head — pinned by landing a new
    dim commit WHILE the fact fold is merging: the view must show the
    captured weights and the cursors must equal the captured pair."""
    fact, dim, view = _mk(spark, tmp_path)
    dim.merge(_drows(spark, [("a", 1)]))           # dim v0
    fact.merge(_frows(spark, [(1, "a", 10)]))      # fact v0
    dv_captured = dim.current_version()

    real_merge = view.table.merge
    state = {"raced": False}

    def racing_merge(batch, commit_meta=None):
        if not state["raced"]:
            state["raced"] = True
            dim.merge(_drows(spark, [("a", 999)]))  # lands mid-fold
        return real_merge(batch, commit_meta=commit_meta)

    view.table.merge = racing_merge
    try:
        got = view.refresh_aligned()
    finally:
        view.table.merge = real_merge
    assert state["raced"]
    assert got["dim"] == dv_captured
    row = {r.k: r.dim_attr for r in view.read().collect()}
    assert row[1] == 1, f"torn enrichment leaked: {row}"
    # the next aligned refresh catches the post-capture commit
    view.refresh_aligned()
    row = {r.k: r.dim_attr for r in view.read().collect()}
    assert row[1] == 999


def test_aligned_refresh_streaming_mode_rejected(spark, tmp_path):
    fact = _fact(spark, tmp_path / "fact")
    dim = _dim(spark, tmp_path / "dim")
    view = CdfJoinView(spark, str(tmp_path / "view"), fact, dim, "jk")
    import pytest

    with pytest.raises(RuntimeError, match="checkpoint"):
        view.refresh_aligned()


def test_delete_only_slice_advances_aligned_cursors(spark, tmp_path):
    """Round 12 fence fix, pinned deterministically: a fact slice
    containing ONLY deletes has no merge for the cursor to ride, but
    it advances state — delete_keys carries the commit_meta, so
    refresh_aligned's published cursor pair always equals the state
    it created (found by the seed-29 chained-aligned property
    script)."""
    fact, dim, view = _mk(spark, tmp_path)
    dim.merge(_drows(spark, [("a", 1)]))
    fact.merge(_frows(spark, [(1, "a", 10), (2, "a", 20)]))
    view.refresh_aligned()
    before = view._cursors()

    fact.delete_keys(_frows(spark, [(2, "a", 0)]).select("k"))
    got = view.refresh_aligned()
    after = view._cursors()
    assert got["fact"] == after["fact"] == before["fact"] + 1, \
        f"delete-only slice left a stale fence: {before} -> {after}"
    assert _read(view) == _recompute(fact, dim) == \
        [(1, "a", 10, 1)]
