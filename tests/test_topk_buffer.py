"""Order-statistic buffer for CdfTopKView (round 13, VERDICT r12
item 4): a bench of up to ``m`` rows per group (ranks n+1..n+m) so a
member retraction promotes a buffered row with ZERO source reads;
only bench exhaustion recomputes from the pinned source. Contracts:

1. PROMOTION WITHOUT SOURCE — deleting a member backfills from the
   bench with ``read_version`` poisoned.
2. STRICTLY FEWER RECOMPUTES — on the randomized op script the
   buffered view dirty-recomputes strictly fewer groups than the
   round-12 design (which recomputed EVERY retracting group —
   counted by the same fold as ``stats["retract_groups"]``), with
   results equal to the windowed recompute after every refresh.
3. EXHAUSTION FALLS BACK — retracting more members than the bench
   holds recomputes from the source and stays exact.
4. INVALIDATION DEGRADES, NEVER LIES — a bench whose stamp split
   from the serving cursor (crash simulation) is cleared and the
   fold proceeds bufferless; results stay exact.
5. DELETE-ONLY slices promote and advance the fence.
"""

from __future__ import annotations

import random

import pytest

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from aether_firebase_consumer_spark.sinks.upsert import ParquetUpsertTable
from aether_firebase_consumer_spark.streaming.topk_view import CdfTopKView

GROUPS = ["a", "b", "c", None]
VALUES = [1, 2, 5, 5, 9, None]


def _source(spark, root, **kw):
    kw.setdefault("retain_versions", 40)
    kw.setdefault("record_change_values", True)
    kw.setdefault("record_change_preimages", True)
    return ParquetUpsertTable(spark, str(root), ["k"],
                              partition_col="g", **kw)


def _rows(spark, rows):
    return spark.createDataFrame(rows, "k int, g string, x int")


def _recompute(src, n):
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


def test_member_delete_promotes_from_bench_without_source(
        spark, tmp_path):
    src = _source(spark, tmp_path / "src")
    view = CdfTopKView(spark, str(tmp_path / "view"), src, ["g"],
                       "x", 2, checkpoint_path=str(tmp_path / "cur"))
    assert view.m == 2  # default bench = n
    src.merge(_rows(spark, [(1, "a", 100), (2, "a", 90), (3, "a", 80),
                            (4, "a", 70), (5, "a", 60)]))
    view.refresh()
    # bench holds ranks 3..4 (keys 3, 4)
    bench = {r.k for r in view.buffer.read().collect()}
    assert bench == {3, 4}

    orig = src.read_version

    def poisoned(*_a, **_k):
        raise AssertionError("buffered retraction fold read the source")
    src.read_version = poisoned
    try:
        # delete the leader AND update a member down: two member
        # retractions, bench covers both
        src.delete_keys(spark.createDataFrame([(1,)], "k int"))
        view.refresh()
        assert _read(view) == [(2, (False, "a"), 90),
                               (3, (False, "a"), 80)]
        src.merge(_rows(spark, [(2, "a", 10)]))
        view.refresh()
    finally:
        src.read_version = orig
    assert _read(view) == _recompute(src, 2)
    assert view.stats["dirty_groups"] == 0
    assert view.stats["retract_groups"] > 0


def _script(rng, n_keys=14, n_ops=10):
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


@pytest.mark.parametrize("seed", [19, 61])
def test_buffered_script_exact_with_strictly_fewer_recomputes(
        spark, tmp_path, seed):
    rng = random.Random(seed)
    src = _source(spark, tmp_path / "src")
    view = CdfTopKView(spark, str(tmp_path / "view"), src, ["g"],
                       "x", 2, checkpoint_path=str(tmp_path / "cur"))
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
            assert _read(view) == _recompute(src, 2), \
                f"seed {seed} diverged at step {step}"
    if live:
        view.refresh()
        assert _read(view) == _recompute(src, 2), f"seed {seed} final"
    # deterministic tail: a member eviction the bench is guaranteed to
    # cover (fresh 6-row group, delete its leader) — some random
    # scripts retract harder than the bench everywhere (seed 61 does),
    # so this pins the strict improvement on EVERY script
    src.merge(_rows(spark, [(100 + i, "zz", 100 - i) for i in range(6)]))
    view.refresh()
    src.delete_keys(spark.createDataFrame([(100,)], "k int"))
    view.refresh()
    assert _read(view) == _recompute(src, 2), f"seed {seed} tail"
    # the round-12 design recomputed EVERY retracting group
    # (counted by retract_groups); the bench must beat it strictly
    assert view.stats["retract_groups"] > 0, "script had no retractions"
    assert view.stats["dirty_groups"] < view.stats["retract_groups"], \
        (f"bench saved nothing: dirty {view.stats['dirty_groups']} vs "
         f"retract {view.stats['retract_groups']}")


def test_bench_exhaustion_falls_back_to_source_recompute(
        spark, tmp_path):
    src = _source(spark, tmp_path / "src")
    view = CdfTopKView(spark, str(tmp_path / "view"), src, ["g"],
                       "x", 2, buffer_rows=1,
                       checkpoint_path=str(tmp_path / "cur"))
    src.merge(_rows(spark, [(i, "a", 100 - i) for i in range(6)]))
    view.refresh()
    # top2 = {0, 1}, bench(m=1) = {2}; deleting 3 union rows leaves
    # 0 survivors < n -> dirty recompute backfills 3, 4 from source
    src.delete_keys(spark.createDataFrame([(0,), (1,), (2,)], "k int"))
    view.refresh()
    assert _read(view) == [(3, (False, "a"), 97), (4, (False, "a"), 96)]
    assert view.stats["dirty_groups"] == 1


def test_split_stamp_invalidates_bench_and_stays_exact(spark, tmp_path):
    src = _source(spark, tmp_path / "src")
    view = CdfTopKView(spark, str(tmp_path / "view"), src, ["g"],
                       "x", 2, checkpoint_path=str(tmp_path / "cur"))
    src.merge(_rows(spark, [(i, "a", 100 - i) for i in range(5)]))
    view.refresh()
    assert view._buffer_usable()
    # crash simulation: the serving fold landed but the bench write
    # never got its matching stamp (meta-less commits CARRY the
    # parent stamp, so splitting requires an explicit wrong one) —
    # also injects a ghost row the cleared bench must not resurrect
    view.buffer.merge(_rows(spark, [(99, "a", 1)]),
                      commit_meta={"cdf_cursor": -5})
    assert not view._buffer_usable()
    # next retraction fold must CLEAR the bench, go bufferless
    # (dirty), and still land exactly
    src.delete_keys(spark.createDataFrame([(0,)], "k int"))
    view.refresh()
    assert _read(view) == _recompute(src, 2)
    assert view.stats["buffer_invalidations"] == 1
    assert view.stats["dirty_groups"] >= 1
    # the fold refilled + restamped the touched group's bench
    assert view._buffer_usable()
    assert 99 not in {r.k for r in view.buffer.read().collect()}


def test_low_ranking_insert_cannot_pollute_a_shrunken_bench(
        spark, tmp_path):
    """Round-13 review regression (reproduced pre-fix): after a
    promotion shrinks the bench, a clean fold must NOT refill it with
    an insert that unseen source rows outrank — the union would stop
    being a prefix, and later member deletes would promote the stale
    insert while counting enough survivors to stay 'clean' (wrong
    results with zero dirty recomputes). The admission rule caps
    bench entry at the worst survivor's rank; the pollution scenario
    must now end exactly at the windowed recompute."""
    src = _source(spark, tmp_path / "src")
    view = CdfTopKView(spark, str(tmp_path / "view"), src, ["g"],
                       "x", 2, checkpoint_path=str(tmp_path / "cur"))
    src.merge(_rows(spark, [(1, "a", 100), (2, "a", 90), (3, "a", 80),
                            (4, "a", 70), (5, "a", 60), (6, "a", 50)]))
    view.refresh()
    # delete the leader: 3 promotes from the bench, bench shrinks to {4}
    src.delete_keys(spark.createDataFrame([(1,)], "k int"))
    view.refresh()
    assert {r.k for r in view.buffer.read().collect()} == {4}
    # low-ranking insert: x=10 ranks below the UNSEEN rows 60 and 50,
    # so it must NOT enter the bench (rank 4 > worst-survivor rank 3)
    src.merge(_rows(spark, [(7, "a", 10)]))
    view.refresh()
    assert {r.k for r in view.buffer.read().collect()} == {4}
    # two member deletes: first promotes 4 (clean), second exhausts
    # the bench and recomputes — landing on the true runner-ups
    # (60, 50), never the polluted 10
    src.delete_keys(spark.createDataFrame([(2,)], "k int"))
    view.refresh()
    assert _read(view) == _recompute(src, 2)
    src.delete_keys(spark.createDataFrame([(3,)], "k int"))
    view.refresh()
    assert _read(view) == _recompute(src, 2)
    assert _read(view) == [(4, (False, "a"), 70), (5, (False, "a"), 60)]
    # and a NEW group's inserts are fully trusted (no survivors =
    # whole group): its bench fills normally
    src.merge(_rows(spark, [(20, "z", 9), (21, "z", 8), (22, "z", 7),
                            (23, "z", 6)]))
    view.refresh()
    zbench = {r.k for r in view.buffer.read()
              .filter(F.col("g") == "z").collect()}
    assert zbench == {22, 23}
    assert _read(view) == _recompute(src, 2)


def test_noop_bench_fold_keeps_bench_trusted(spark, tmp_path):
    """Round 14 (VERDICT r13 item 3 / ADVICE): a fold that advances
    the serving cursor but has NO bench rows to write (here: an
    admission-capped insert into a benchless group) must still
    advance the bench stamp — via a metadata-only touch commit — so
    the next fold trusts the untouched groups' valid bench instead
    of clearing it and paying a source recompute."""
    src = _source(spark, tmp_path / "src")
    view = CdfTopKView(spark, str(tmp_path / "view"), src, ["g"],
                       "x", 2, checkpoint_path=str(tmp_path / "cur"))
    # z: 4 rows -> bench holds z-ranks 3..4; a: 2 rows -> no bench
    src.merge(_rows(spark, [(1, "z", 100), (2, "z", 90), (3, "z", 80),
                            (4, "z", 70), (11, "a", 30), (12, "a", 20)]))
    view.refresh()
    assert {r.k for r in view.buffer.read().collect()} == {3, 4}
    # admission-capped insert into a (rank 3 > pmax 2): nothing to
    # merge into or delete from the bench, serving cursor advances
    src.merge(_rows(spark, [(13, "a", 10)]))
    view.refresh()
    assert view._buffer_usable(), \
        "no-op bench fold left the stamp split"
    assert view.stats["buffer_invalidations"] == 0
    # a z-member delete now promotes from the STILL-TRUSTED bench
    # with zero source reads and zero invalidations
    orig = src.read_version

    def poisoned(*_a, **_k):
        raise AssertionError("valid bench was distrusted: the fold "
                             "read the source")
    src.read_version = poisoned
    try:
        src.delete_keys(spark.createDataFrame([(1,)], "k int"))
        view.refresh()
    finally:
        src.read_version = orig
    assert view.stats["buffer_invalidations"] == 0
    assert view.stats["dirty_groups"] == 0
    assert _read(view) == _recompute(src, 2)


def test_touch_is_metadata_only(spark, tmp_path):
    """The ParquetUpsertTable.touch primitive behind the no-op bench
    stamp: a new version, identical data (hardlinked), new meta, an
    EMPTY change recording (followers see no changes), and the
    guards (empty table / None meta) raise."""
    t = _source(spark, tmp_path / "t")
    with pytest.raises(ValueError, match="empty table"):
        t.touch(commit_meta={"cdf_cursor": 0})
    t.merge(_rows(spark, [(1, "a", 1), (2, "b", 2)]))
    v0 = t.current_version()
    rows0 = sorted((r.k, r.g, r.x) for r in t.read().collect())
    t.touch(commit_meta={"cdf_cursor": 99, "tag": "stamped"})
    assert t.current_version() == v0 + 1
    assert t.commit_meta() == {"cdf_cursor": 99, "tag": "stamped"}
    assert sorted((r.k, r.g, r.x) for r in t.read().collect()) == rows0
    assert t.changes(v0 + 1).isEmpty()
    with pytest.raises(ValueError, match="commit_meta"):
        t.touch(commit_meta=None)


def test_delete_only_slice_promotes_and_advances_fence(spark, tmp_path):
    src = _source(spark, tmp_path / "src")
    view = CdfTopKView(spark, str(tmp_path / "view"), src, ["g"],
                       "x", 2, checkpoint_path=str(tmp_path / "cur"))
    src.merge(_rows(spark, [(1, "a", 30), (2, "a", 20), (3, "a", 10)]))
    view.refresh()
    before = view._applied()
    src.delete_keys(spark.createDataFrame([(1,)], "k int"))
    view.refresh()
    assert _read(view) == [(2, (False, "a"), 20), (3, (False, "a"), 10)]
    assert view._applied() > before


def test_buffer_rows_zero_disables_bench(spark, tmp_path):
    src = _source(spark, tmp_path / "src")
    view = CdfTopKView(spark, str(tmp_path / "view"), src, ["g"],
                       "x", 2, buffer_rows=0,
                       checkpoint_path=str(tmp_path / "cur"))
    assert view.buffer is None
    src.merge(_rows(spark, [(1, "a", 30), (2, "a", 20), (3, "a", 10)]))
    view.refresh()
    # member retraction -> dirty (round-12 regime); non-member
    # retraction -> clean even without a bench
    src.delete_keys(spark.createDataFrame([(3,)], "k int"))  # non-member
    view.refresh()
    assert view.stats["dirty_groups"] == 0
    src.delete_keys(spark.createDataFrame([(1,)], "k int"))  # member
    view.refresh()
    assert view.stats["dirty_groups"] == 1
    assert _read(view) == _recompute(src, 2)
    with pytest.raises(ValueError, match="buffer_rows"):
        CdfTopKView(spark, str(tmp_path / "v2"), src, ["g"], "x", 2,
                    buffer_rows=-1)
