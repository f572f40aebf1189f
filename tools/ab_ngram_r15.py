"""Interleaved A/B: ngram inverted-index self-join (batch-1 tree) vs
grouped posting-list pair generation (batch-2), both int64-keyed.

Usage: python tools/ab_ngram_r15.py [rounds]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aether_firebase_consumer_spark.functions.text import shingles
from aether_firebase_consumer_spark.operators.dedup import (
    ngram_containment_pairs,
    ngram_jaccard_pairs,
)
from aether_firebase_consumer_spark.session import get_spark
from aether_firebase_consumer_spark.tables import (
    fan_out_for_compute,
    load_table,
)
from tools.ab import ab

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CAP = 50


def jaccard_selfjoin(df, id_col, text_col, shingle_k=3, threshold=0.5,
                     max_doc_freq=CAP):
    """The batch-1 (pre-grouping) shape, verbatim."""
    inv = df.select(F.col(id_col).alias("id"),
                    F.explode(shingles(F.col(text_col), shingle_k))
                    .alias("shingle"))
    inv = inv.select("id", F.xxhash64("shingle").alias("shingle"))
    rare = (inv.groupBy("shingle")
            .agg(F.count("*").alias("df_"))
            .filter(F.col("df_") <= max_doc_freq)
            .select("shingle"))
    inv = inv.join(rare, "shingle").localCheckpoint()
    sizes = inv.groupBy("id").agg(F.count("*").alias("n"))
    a, b = inv.alias("a"), inv.alias("b")
    common = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                     & (F.col("a.id") < F.col("b.id")))
              .groupBy(F.col("a.id").alias("id_a"),
                       F.col("b.id").alias("id_b"))
              .agg(F.count("*").alias("n_common")))
    na = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("id").alias("id_b"), F.col("n").alias("n_b"))
    return (common.join(na, "id_a").join(nb, "id_b")
            .select("id_a", "id_b",
                    (F.col("n_common").cast("double")
                     / (F.col("n_a") + F.col("n_b") - F.col("n_common")))
                    .alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


def containment_selfjoin(df, id_col, text_col, shingle_k=3, threshold=0.8,
                         max_doc_freq=CAP):
    inv = df.select(F.col(id_col).alias("id"),
                    F.explode(shingles(F.col(text_col), shingle_k))
                    .alias("shingle"))
    inv = inv.select("id", F.xxhash64("shingle").alias("shingle"))
    rare = (inv.groupBy("shingle")
            .agg(F.count("*").alias("df_"))
            .filter(F.col("df_") <= max_doc_freq)
            .select("shingle"))
    inv = inv.join(rare, "shingle").localCheckpoint()
    sizes = inv.groupBy("id").agg(F.count("*").alias("n"))
    a, b = inv.alias("a"), inv.alias("b")
    common = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                     & (F.col("a.id") != F.col("b.id")))
              .groupBy(F.col("a.id").alias("contained_id"),
                       F.col("b.id").alias("container_id"))
              .agg(F.count("*").alias("n_common")))
    na = sizes.select(F.col("id").alias("contained_id"),
                      F.col("n").alias("n_a"))
    return (common.join(na, "contained_id")
            .select("contained_id", "container_id",
                    (F.col("n_common").cast("double") / F.col("n_a"))
                    .alias("containment"))
            .filter(F.col("containment") >= threshold))


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("ab_ngram_r15", shuffle_partitions=32)
    docs = fan_out_for_compute(load_table(spark, SF_DIR, "documents"))
    print("== jaccard ==")
    ab(spark, {
        "selfjoin": lambda: jaccard_selfjoin(docs, "doc_id", "text"),
        "grouped": lambda: ngram_jaccard_pairs(
            docs, "doc_id", "text", threshold=0.5, max_doc_freq=CAP),
    }, rounds=rounds)
    print("== containment ==")
    ab(spark, {
        "selfjoin": lambda: containment_selfjoin(docs, "doc_id", "text"),
        "grouped": lambda: ngram_containment_pairs(
            docs, "doc_id", "text", threshold=0.8, max_doc_freq=CAP),
    }, rounds=rounds)


if __name__ == "__main__":
    main()
