"""Top-k views as CHAIN members (round 13, VERDICT r12 item 3): the
top-k view's own table records its retraction feed, so downstream
views maintain over MEMBERSHIP changes — evictions, promotions (from
the round-13 bench), and group moves all propagate as ordinary
delete+insert change rows. Contracts:

1. DETERMINISTIC EVICTION ARC — deleting a chained top row promotes
   the bench row upstream and re-enriches it downstream (topk →
   join chain), with zero source reads in the top-k fold.
2. RANDOM SCRIPTS — topk → aggregate chain equals the recompute
   (GROUP BY over the true top-2) after every refresh pair.
"""

from __future__ import annotations

import random

import pytest

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from aether_firebase_consumer_spark.sinks.upsert import ParquetUpsertTable
from aether_firebase_consumer_spark.streaming.incremental_agg import (
    CdfAggregateView,
)
from aether_firebase_consumer_spark.streaming.join_view import CdfJoinView
from aether_firebase_consumer_spark.streaming.topk_view import CdfTopKView

GROUPS = ["a", "b", "c", None]
VALUES = [1, 2, 5, 5, 9, None]


def _source(spark, root):
    return ParquetUpsertTable(spark, str(root), ["k"],
                              partition_col="g", retain_versions=40,
                              record_change_values=True,
                              record_change_preimages=True)


def _rows(spark, rows):
    return spark.createDataFrame(rows, "k int, g string, x int")


def _topk(spark, tmp, src, n=2):
    return CdfTopKView(
        spark, str(tmp / "topk"), src, ["g"], "x", n,
        checkpoint_path=str(tmp / "tcur"),
        table_kwargs={"record_change_values": True,
                      "record_change_preimages": True,
                      "retain_versions": 40})


def _true_top(src, n=2):
    cur = src.read()
    if cur is None:
        return None
    w = W.partitionBy("g").orderBy(F.col("x").desc_nulls_last(),
                                   F.col("k").asc_nulls_last())
    return (cur.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= n).drop("_rk"))


def test_delete_evicts_chained_top_row_through_join(spark, tmp_path):
    src = _source(spark, tmp_path / "src")
    topk = _topk(spark, tmp_path, src, n=2)
    dim = ParquetUpsertTable(spark, str(tmp_path / "dim"), ["g"],
                             retain_versions=40)
    join = CdfJoinView(spark, str(tmp_path / "join"), topk.table,
                       dim, "g", str(tmp_path / "fck"),
                       str(tmp_path / "dck"))
    dim.merge(spark.createDataFrame([("a", 7), ("b", 8)],
                                    "g string, attr int"))
    src.merge(_rows(spark, [(1, "a", 100), (2, "a", 90), (3, "a", 80),
                            (4, "b", 50), (5, "b", 40), (6, "b", 30)]))
    topk.refresh()
    join.refresh()

    def enriched():
        return sorted((r.k, r.g, r.x, r.dim_attr)
                      for r in join.read().collect())
    assert enriched() == [(1, "a", 100, 7), (2, "a", 90, 7),
                          (4, "b", 50, 8), (5, "b", 40, 8)]

    # delete BOTH groups' leaders: the bench promotes 3 and 6 with
    # zero source reads, and the downstream join enriches exactly the
    # promoted members
    orig = src.read_version

    def poisoned(*_a, **_k):
        raise AssertionError("chained eviction read the source")
    src.read_version = poisoned
    try:
        src.delete_keys(spark.createDataFrame([(1,), (4,)], "k int"))
        topk.refresh()
    finally:
        src.read_version = orig
    join.refresh()
    assert enriched() == [(2, "a", 90, 7), (3, "a", 80, 7),
                          (5, "b", 40, 8), (6, "b", 30, 8)]
    assert topk.stats["dirty_groups"] == 0


def _script(rng, n_keys=14, n_ops=9):
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


@pytest.mark.parametrize("seed", [41, 83])
def test_random_scripts_topk_agg_chain_equals_recompute(
        spark, tmp_path, seed):
    """topk → aggregate chain under random retraction scripts: the
    downstream per-group (member count, sum of member x) equals GROUP
    BY over the true top-2 after every refresh pair. Scripts include
    delete_where slices that wipe whole memberships — the chained
    feed must retract every evicted member exactly once."""
    rng = random.Random(seed)
    src = _source(spark, tmp_path / "src")
    topk = _topk(spark, tmp_path, src, n=2)
    agg = CdfAggregateView(
        spark, str(tmp_path / "agg"), topk.table, ["g"],
        {"n_members": ("count", None), "sx": ("sum", "x")},
        str(tmp_path / "aggck"))

    def expected():
        top = _true_top(src, 2)
        if top is None:
            return []
        got = (top.groupBy("g")
               .agg(F.count("*").cast("bigint").alias("n"),
                    F.sum("x").cast("bigint").alias("sx")).collect())
        return sorted(((r.g is None, r.g), r.n, r.sx) for r in got)

    def agg_read():
        df = agg.read()
        return [] if df is None else \
            sorted(((r.g is None, r.g), r.n_members, r.sx)
                   for r in df.collect())

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
            topk.refresh()
            agg.refresh()
            assert agg_read() == expected(), \
                f"seed {seed} chain diverged at step {step}"
    if live:
        topk.refresh()
        agg.refresh()
        assert agg_read() == expected(), f"seed {seed} final state"
