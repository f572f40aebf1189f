"""Interleaved A/B: trained SemDeDup with the r14 shape (reassignment
re-scans the embeddings table) vs the r15 shape (one lazily
checkpointed iteration-0 frame serves both Lloyd passes).

Usage: python tools/ab_semdedup_r15.py [rounds]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aether_firebase_consumer_spark.plans.clustering_queries import (
    DIM,
    _KM_INIT,
    _ivf_scores,
    _mat_key,
    _semdedup_prune,
    dedup_semantic_semdedup_trained,
)
from aether_firebase_consumer_spark.functions.vectors import (
    ivf_cell,
    memo_col,
)
from aether_firebase_consumer_spark.session import get_spark
from aether_firebase_consumer_spark.tables import (
    fan_out_for_compute,
    load_table,
)
from tools.ab import ab

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def trained_r14(spark, sf_dir):
    """The r14 shape, verbatim: a0 un-materialized, reassignment from
    a fresh embeddings scan."""
    emb = fan_out_for_compute(load_table(spark, sf_dir, "embeddings"))
    a0 = emb.withColumn(
        "c", memo_col(("ivf_cell", "embedding", _mat_key(_KM_INIT)),
                      lambda: ivf_cell(F.col("embedding"), _KM_INIT)))
    upd = (a0.select("c", F.posexplode("embedding").alias("pos", "val"))
             .groupBy("c", "pos")
             .agg(F.round(F.avg(F.col("val").cast("double")), 6)
                  .alias("m")))
    cents: dict[int, dict[int, float]] = {}
    for r in upd.collect():
        cents.setdefault(int(r["c"]), {})[int(r["pos"])] = float(r["m"])
    cells = sorted(cents)
    cent_list = [[cents[c][j] for j in range(DIM)] for c in cells]
    scores = memo_col(("ivf_scores", "embedding", _mat_key(cent_list)),
                      lambda: _ivf_scores(F.col("embedding"), cent_list))
    pos = F.array_position(scores, F.array_max(scores))
    cell_ids = F.array(*[F.lit(c) for c in cells])
    a = emb.select(
        "vec_id", "embedding",
        F.element_at(cell_ids, pos.cast("int")).cast("int")
        .alias("cluster"))
    return _semdedup_prune(a)


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("ab_semdedup_r15", shuffle_partitions=32)
    ab(spark, {
        "rescan_r14": lambda: trained_r14(spark, SF_DIR),
        "ckpt_r15": lambda: dedup_semantic_semdedup_trained(spark, SF_DIR),
    }, rounds=rounds)


if __name__ == "__main__":
    main()
