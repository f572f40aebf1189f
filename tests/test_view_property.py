"""Randomized op-script property test for the retraction machinery:
random interleavings of merge / delete_keys / delete_where (with
group moves, null groups, null values, duplicate values, and
refreshes at random points) must keep BOTH incremental views equal to
the full recompute after every refresh. Deterministic seeds — a
failure reproduces exactly; runs in the slow tier."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from aether_firebase_consumer_spark.sinks.upsert import ParquetUpsertTable
from aether_firebase_consumer_spark.streaming.incremental_agg import (
    CdfAggregateView,
)

GROUPS = ["a", "b", "c", None]
VALUES = [1, 2, 5, 5, 9, None]


def _rows(spark, rows):
    return spark.createDataFrame(rows, "k int, g string, x int")


def _script(rng, n_keys=14, n_ops=9):
    """A reproducible random op script over a small key space (small
    spaces maximize key collisions, group moves, and re-inserts)."""
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


def _recompute(src):
    cur = src.read()
    if cur is None:
        return []
    got = (cur.groupBy("g")
           .agg(F.count("*").cast("bigint").alias("n"),
                F.sum("x").cast("bigint").alias("sx"),
                F.min("x").alias("mn"),
                F.max("x").alias("mx"),
                F.countDistinct("x").cast("bigint").alias("nd"))
           .collect())
    return sorted(((r.g is None, r.g), r.n, r.sx, r.mn, r.mx, r.nd)
                  for r in got)


def _read(view):
    df = view.read()
    if df is None:
        return []
    return sorted(((r.g is None, r.g), r.n, r.sx, r.mn, r.mx, r.nd)
                  for r in df.collect())


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_random_op_scripts_view_equals_recompute(spark, tmp_path, seed):
    rng = random.Random(seed)
    src = ParquetUpsertTable(
        spark, str(tmp_path / "src"), ["k"], partition_col="g",
        retain_versions=40, record_change_values=True,
        record_change_preimages=True)
    view = CdfAggregateView(
        spark, str(tmp_path / "view"), src, ["g"],
        {"n": ("count", None), "sx": ("sum", "x"),
         "mn": ("min", "x"), "mx": ("max", "x"),
         "nd": ("count_distinct", "x")},
        str(tmp_path / "cursor"))
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
            assert _read(view) == _recompute(src), \
                f"seed {seed} diverged at step {step}"
    assert _read(view) == _recompute(src), f"seed {seed} final state"
