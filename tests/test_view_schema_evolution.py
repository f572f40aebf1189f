"""Views under SOURCE SCHEMA EVOLUTION (round 12, VERDICT item 6):
the engine's MERGE grows schemas (unionByName allowMissingColumns —
a batch adding a column merges with nulls on the old rows), so every
incremental view must stay exact when the source evolves MID-FEED.
The contract pinned here:

- columns can only be ADDED; an already-referenced measure/group/
  order column never disappears from the source schema (new batches
  that omit it merge as nulls — a value change the retraction algebra
  already handles);
- evolution of columns a view does NOT reference is invisible to it;
- views that store full rows (CdfJoinView, CdfTopKView) adopt the new
  column through their own table's schema evolution — old view rows
  read as null, exactly like the source;
- a view whose specs name a column that NEVER existed raises a
  diagnostic naming it (tests/test_incremental_agg.py pins that
  half).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from aether_firebase_consumer_spark.sinks.upsert import ParquetUpsertTable
from aether_firebase_consumer_spark.streaming.change_follower import (
    ChangeFeedFollower,
    mirror_changes,
)
from aether_firebase_consumer_spark.streaming.incremental_agg import (
    CdfAggregateView,
)
from aether_firebase_consumer_spark.streaming.join_view import CdfJoinView
from aether_firebase_consumer_spark.streaming.topk_view import CdfTopKView


def _src(spark, root, keys=("k",), **kw):
    kw.setdefault("retain_versions", 30)
    kw.setdefault("record_change_values", True)
    kw.setdefault("record_change_preimages", True)
    return ParquetUpsertTable(spark, str(root), list(keys), **kw)


def test_aggregate_view_ignores_unrelated_new_column(spark, tmp_path):
    """A column the view does not reference appears mid-feed: folds
    stay exact, before and after (the recordings carry the new column
    only for versions that have it)."""
    src = _src(spark, tmp_path / "src")
    view = CdfAggregateView(
        spark, str(tmp_path / "view"), src, ["g"],
        {"n": ("count", None), "sx": ("sum", "x"),
         "mx": ("max", "x")},
        str(tmp_path / "cursor"))
    src.merge(spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 5)],
        "k int, g string, x int"))
    view.refresh()
    # EVOLVE: new column y arrives; later ops touch x and delete rows
    src.merge(spark.createDataFrame(
        [(4, "a", 7, "extra"), (2, "a", 25, "boo")],
        "k int, g string, x int, y string"))
    src.delete_keys(spark.createDataFrame([(1,)], "k int"))
    view.refresh()
    got = sorted((r.g, r.n, r.sx, r.mx)
                 for r in view.read().collect())
    want = sorted((r.g, r.n, r.sx, r.mx) for r in
                  src.read().groupBy("g")
                  .agg(F.count("*").cast("bigint").alias("n"),
                       F.sum("x").cast("bigint").alias("sx"),
                       F.max("x").alias("mx")).collect())
    assert got == want


def test_aggregate_view_over_column_added_later(spark, tmp_path):
    """A view created AFTER the source evolved aggregates the new
    column exactly — rows from before the evolution contribute SQL
    NULLs (ignored by SUM, counted by COUNT(*))."""
    src = _src(spark, tmp_path / "src2")
    src.merge(spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k int, g string, x int"))
    src.merge(spark.createDataFrame(
        [(3, "a", 30, 100)], "k int, g string, x int, y int"))
    view = CdfAggregateView(
        spark, str(tmp_path / "view2"), src, ["g"],
        {"n": ("count", None), "sy": ("sum", "y")},
        str(tmp_path / "cursor2"), from_version=0)
    view.refresh()
    got = {r.g: (r.n, r.sy) for r in view.read().collect()}
    assert got == {"a": (2, 100), "b": (1, None)}
    # and keeps folding after another evolution-era op
    src.merge(spark.createDataFrame(
        [(2, "b", 20, 7)], "k int, g string, x int, y int"))
    view.refresh()
    got = {r.g: (r.n, r.sy) for r in view.read().collect()}
    assert got == {"a": (2, 100), "b": (1, 7)}


def test_join_view_adopts_new_fact_column(spark, tmp_path):
    """The enrich-join view gains a fact column added mid-feed via
    its own table's schema evolution; rows enriched before the
    evolution read NULL for it, exactly like the source."""
    fact = _src(spark, tmp_path / "fact")
    dim = ParquetUpsertTable(spark, str(tmp_path / "dim"), ["jk"],
                             retain_versions=30)
    view = CdfJoinView(spark, str(tmp_path / "view"), fact, dim, "jk",
                       str(tmp_path / "fck"), str(tmp_path / "dck"))
    dim.merge(spark.createDataFrame([("a", 1)], "jk string, attr int"))
    fact.merge(spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20)], "k int, jk string, x int"))
    view.refresh()
    fact.merge(spark.createDataFrame(
        [(3, "a", 30, "new")], "k int, jk string, x int, z string"))
    view.refresh()
    got = {r.k: (r.x, r.z, r.dim_attr) for r in view.read().collect()}
    assert got == {1: (10, None, 1), 2: (20, None, 1),
                   3: (30, "new", 1)}
    # full re-join agreement including the evolved column
    want = {r.k: (r.x, r.z, r.dim_attr) for r in
            fact.read().join(
                dim.read().select("jk", F.col("attr").alias("dim_attr")),
                "jk", "left").collect()}
    assert got == want


def test_topk_view_unions_old_members_with_evolved_rows(
        spark, tmp_path):
    """Top-k candidate ranking unions stored members (pre-evolution
    schema) with new post-images (evolved schema) via
    allowMissingColumns — membership stays exact and the new column
    appears (null on old members)."""
    src = _src(spark, tmp_path / "src")
    view = CdfTopKView(spark, str(tmp_path / "view"), src, ["g"],
                       "x", 2, checkpoint_path=str(tmp_path / "cur"))
    src.merge(spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20)], "k int, g string, x int"))
    view.refresh()
    src.merge(spark.createDataFrame(
        [(3, "a", 15, "tag")], "k int, g string, x int, z string"))
    view.refresh()
    got = sorted((r.k, r.x, r.z) for r in view.read().collect())
    assert got == [(2, 20, None), (3, 15, "tag")]
    # a retraction after the evolution recomputes from the evolved
    # source exactly
    src.delete_keys(spark.createDataFrame([(2,)], "k int"))
    view.refresh()
    w = W.partitionBy("g").orderBy(F.col("x").desc_nulls_last(),
                                   F.col("k").asc_nulls_last())
    want = sorted((r.k, r.x, r.z) for r in
                  src.read().withColumn("_rk", F.row_number().over(w))
                  .filter(F.col("_rk") <= 2).drop("_rk").collect())
    assert sorted((r.k, r.x, r.z)
                  for r in view.read().collect()) == want


def test_mirror_replication_under_evolution(spark, tmp_path):
    """Log-shipped mirror maintenance stays exact when the source
    evolves between polled versions: the feed's value images merge
    the schemas, old rows replicate with nulls for the new column."""
    src = _src(spark, tmp_path / "src")
    target = ParquetUpsertTable(spark, str(tmp_path / "mirror"), ["k"])
    follower = ChangeFeedFollower(src, str(tmp_path / "fck"),
                                  from_version=0)
    src.merge(spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k int, g string, x int"))
    src.merge(spark.createDataFrame(
        [(3, "c", 30, 9)], "k int, g string, x int, y int"))
    src.delete_keys(spark.createDataFrame([(2,)], "k int"))
    mirror_changes(follower, target)
    got = sorted((r.k, r.g, r.x, r.y) for r in target.read().collect())
    want = sorted((r.k, r.g, r.x, r.y) for r in src.read().collect())
    assert got == want == [(1, "a", 10, None), (3, "c", 30, 9)]
