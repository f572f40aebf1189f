"""VERDICT r14 item 10: A/B localCheckpoint() vs
persist(MEMORY_AND_DISK) for the two multi-referenced query frames
that use eager localCheckpoint (semdedup assignment `a`, centroid
token counts `tc`).

localCheckpoint truncates lineage into executor-local blocks (fast,
but unrecoverable on executor loss); persist keeps lineage (slower
bookkeeping, survives loss by recompute). This measures the price of
the safer option at sf0.1 and the sf1 decade.

Usage: python tools/ab_ckpt_vs_persist_r15.py [rounds]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aether_firebase_consumer_spark.functions.vectors import (
    cosine,
    ivf_cell,
    memo_col,
)
from aether_firebase_consumer_spark.operators.dedup import portable_hash60
from aether_firebase_consumer_spark.plans.clustering_queries import (
    _KM_INIT,
    _SEM_CAP,
    _SEM_THRESH,
    _mat_key,
)
from aether_firebase_consumer_spark.plans.text_queries import (
    centroid_classify,
)
from aether_firebase_consumer_spark.session import get_spark
from aether_firebase_consumer_spark.tables import (
    fan_out_for_compute,
    load_table,
)
from tools.ab import ab

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

try:  # Spark 4: the concrete implementation lives on the classic class
    from pyspark.sql.classic.dataframe import DataFrame as _CDataFrame
except ImportError:  # pragma: no cover - Spark 3.x fallback
    _CDataFrame = DataFrame

_ORIG_LOCAL_CKPT = _CDataFrame.localCheckpoint


def mat_ckpt(df: DataFrame) -> DataFrame:
    return _ORIG_LOCAL_CKPT(df)


def mat_persist(df: DataFrame) -> DataFrame:
    # drop the previous run's blocks so repeated A/B rounds don't
    # accumulate dead cache entries and skew storage memory
    df.sparkSession.catalog.clearCache()
    return df.persist(StorageLevel.MEMORY_AND_DISK)


def semdedup(spark, mat):
    """dedup_semantic_semdedup with a pluggable materialization for
    the assignment frame (mirrors _semdedup_prune verbatim)."""
    emb = fan_out_for_compute(load_table(spark, SF_DIR, "embeddings"))
    a = emb.select(
        "vec_id", "embedding",
        memo_col(("ivf_cell", "embedding", _mat_key(_KM_INIT)),
                 lambda: ivf_cell(F.col("embedding"), _KM_INIT))
        .alias("cluster"))
    a = mat(a)
    counts = a.groupBy("cluster").agg(F.count(F.lit(1)).alias("cnt"))
    a2 = (
        a.join(F.broadcast(counts), "cluster")
        .select(
            "vec_id", "embedding", "cluster",
            (portable_hash60(F.col("vec_id").cast("string"))
             % F.expr(f"CAST((cnt + {_SEM_CAP - 1}) DIV {_SEM_CAP}"
                      " AS BIGINT)")).alias("sub"))
    )
    left = a2.select(F.col("vec_id").alias("id_a"),
                     F.col("embedding").alias("va"), "cluster", "sub")
    right = a2.select(F.col("vec_id").alias("id_b"),
                      F.col("embedding").alias("vb"), "cluster", "sub")
    drops = (
        left.join(right, ["cluster", "sub"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(cosine(F.col("va"), F.col("vb")) >= _SEM_THRESH)
        .select(F.col("id_b").alias("vec_id")).distinct()
        .withColumn("dropped", F.lit(True))
    )
    return (
        a.select("vec_id", "cluster").join(drops, "vec_id", "left")
        .select("vec_id", "cluster",
                F.coalesce(~F.col("dropped"), F.lit(True)).alias("kept"))
    )


def centroid(spark, mat):
    """text_centroid_lang_classifier with the tc materialization
    swapped by monkeypatching DataFrame.localCheckpoint for the
    duration of the build (the call site is inline in
    centroid_classify)."""
    docs = load_table(spark, SF_DIR, "documents")
    _CDataFrame.localCheckpoint = lambda self, eager=True: mat(self)
    try:
        return centroid_classify(docs, "doc_id", "lang", "text",
                                 F.col("doc_id") % 10 < 8)
    finally:
        _CDataFrame.localCheckpoint = _ORIG_LOCAL_CKPT


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("ab_ckpt_persist", shuffle_partitions=32)

    print("== semdedup assignment frame ==", flush=True)
    ab(spark, {
        "localCheckpoint": lambda: semdedup(spark, mat_ckpt),
        "persist_mem_disk": lambda: semdedup(spark, mat_persist),
    }, rounds=rounds)

    print("== centroid tc frame ==", flush=True)
    ab(spark, {
        "localCheckpoint": lambda: centroid(spark, mat_ckpt),
        "persist_mem_disk": lambda: centroid(spark, mat_persist),
    }, rounds=rounds)


if __name__ == "__main__":
    main()
