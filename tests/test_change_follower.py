"""ChangeFeedFollower (round 10): versions-as-offsets consumption of a
table's change feed, at-least-once, with takedown propagation into a
downstream persisted index."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from aether_firebase_consumer_spark.sinks.upsert import ParquetUpsertTable
from aether_firebase_consumer_spark.streaming.change_follower import (
    ChangeFeedFollower,
    propagate_deletes,
)

from tests.test_ann_ingest import (
    _df,
    _mk_job,
    _recompute_topk,
    _snap,
    _vec,
)


def _t(spark, root, **kw):
    return ParquetUpsertTable(spark, str(root), ["k"], **kw)


def _kdf(spark, rows):
    return spark.createDataFrame(rows, "k bigint, v string")


def _feed(df):
    return sorted((r.k, r.change_type, r.version) for r in df.collect())


def test_follower_tails_only_new_changes(spark, tmp_path):
    t = _t(spark, tmp_path / "t", retain_versions=10)
    t.merge(_kdf(spark, [(1, "a"), (2, "b")]))
    f = ChangeFeedFollower(t, str(tmp_path / "ckpt"))
    assert f.poll() is None  # history before attach is not replayed

    t.merge(_kdf(spark, [(2, "B"), (3, "c")]))   # update + insert
    t.delete_keys(spark.createDataFrame([(1,)], "k bigint"))
    changes, up_to = f.poll()
    assert up_to == t.current_version()
    assert _feed(changes) == [(1, "delete", 2), (2, "update", 1),
                              (3, "insert", 1)]
    f.commit(up_to)
    assert f.poll() is None


def test_follower_at_least_once(spark, tmp_path):
    t = _t(spark, tmp_path / "t", retain_versions=10)
    f = ChangeFeedFollower(t, str(tmp_path / "ckpt"))
    t.merge(_kdf(spark, [(1, "a")]))

    first = f.poll()
    again = f.poll()     # no commit between → same batch re-delivers
    assert _feed(first[0]) == _feed(again[0]) == [(1, "insert", 0)]
    assert first[1] == again[1]

    with pytest.raises(RuntimeError):
        f.process(lambda df, v: (_ for _ in ()).throw(
            RuntimeError("handler crash")))
    # cursor untouched by the crash; a healthy retry lands the batch
    seen = []
    assert f.process(lambda df, v: seen.append(_feed(df))) == first[1]
    assert seen == [[(1, "insert", 0)]]
    assert f.process(lambda df, v: seen.append(_feed(df))) is None


def test_follower_full_replay_and_retention_fence(spark, tmp_path):
    t = _t(spark, tmp_path / "t", retain_versions=10)
    t.merge(_kdf(spark, [(1, "a")]))
    t.merge(_kdf(spark, [(2, "b")]))
    f = ChangeFeedFollower(t, str(tmp_path / "ckpt"), from_version=0)
    changes, up_to = f.poll()
    assert _feed(changes) == [(1, "insert", 0), (2, "insert", 1)]
    f.commit(up_to)

    # a follower that falls behind the retention window fails loudly
    # (same contract as a Kafka consumer vs topic retention)
    lagger = ChangeFeedFollower(t, str(tmp_path / "ckpt2"),
                                from_version=0)
    for i in range(3, 15):
        t.merge(_kdf(spark, [(i, "x")]))
    t.vacuum(keep_last_n=2)
    with pytest.raises(ValueError):
        lagger.poll()


def test_takedown_propagates_to_downstream_index(spark, tmp_path):
    """The e2e arc: retention delete on the upstream corpus table →
    change feed records deletes → follower drives the ANN index's
    pruned delete → the index answers as if rebuilt from the
    remaining corpus."""
    upstream = ParquetUpsertTable(spark, str(tmp_path / "up"),
                                  ["vec_id"], retain_versions=10,
                                  stats_cols=["vec_id"])
    state = [(i, _vec(i)) for i in range(1, 9)]
    upstream.merge(_df(spark, state))

    job = _mk_job(spark, tmp_path / "ann")
    job.process_batch(_df(spark, state), 0)

    f = ChangeFeedFollower(upstream, str(tmp_path / "ckpt"))
    assert propagate_deletes(f, job) == 0      # caught up, nothing

    # retention predicate upstream (stats-pruned delete_where)
    assert upstream.delete_where(("vec_id", "<=", 2)) == 2
    assert propagate_deletes(f, job) == 2

    remaining = [(i, v) for i, v in state if i > 2]
    got = {(r.vec_id, r.cell, tuple(r.codes))
           for r in job.codes.read().collect()}
    want = {(r.vec_id, r.cell, tuple(r.codes))
            for r in job.code_rows(_df(spark, remaining)).collect()}
    assert got == want
    queries = _df(spark, [(0, _vec(1))])
    assert _snap(job.topk(queries, k=3, shortlist=10)) == \
        _snap(_recompute_topk(spark, remaining, queries, k=3,
                              shortlist=10))
    # replay safety: nothing new → no-op, not an error
    assert propagate_deletes(f, job) == 0
