"""Stage decomposition of dedup_editdist_full (VERDICT r14 item 3).

Times, each as best-of-N through the noop sink in one deep-warm
session: (a) the candidate discovery (hashed-key equi-join +
dropDuplicates), (b) the full query (candidates + text-attach verify
join + banded levenshtein), and prints candidate/pair counts so the
fan-out is visible.

Usage: python tools/editdist_decomp_r15.py [rounds]
Env:   SPARK_GRAFT_SF_DIR (default /root/repo/.scale_sf1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aether_firebase_consumer_spark.operators import dedup as D
from aether_firebase_consumer_spark.session import get_spark
from aether_firebase_consumer_spark.tables import (
    fan_out_for_compute,
    load_table,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.scale_sf1")
K = 2


def corpus_frame(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    m1 = (docs.filter(F.col("doc_id") % 17 == 0)
          .select((F.col("doc_id") + 10_000_000).alias("doc_id"),
                  F.expr("concat(substring(text, 1, 9), "
                         "substring(text, 11))").alias("text")))
    m2 = (docs.filter(F.col("doc_id") % 23 == 0)
          .select((F.col("doc_id") + 20_000_000).alias("doc_id"),
                  F.expr("concat(substring(text, 1, 4), 'Z', "
                         "substring(text, 6))").alias("text")))
    return fan_out_for_compute(docs.unionByName(m1).unionByName(m2))


def cand_only(df, id_col, text_col, k):
    """editdist_pairs_full's candidate half, stopping at the deduped
    (id_a, id_b) frame (copied from operators/dedup.py)."""
    base = (df.filter(F.length(F.col(text_col)) >= k + 1)
            .select(F.col(id_col).alias("id"),
                    F.col(text_col).alias("t"),
                    F.length(F.col(text_col)).alias("m")))

    def seg_geometry(l):
        b, rem = (l / (k + 1)).cast("int"), l % (k + 1)
        out = []
        for i in range(k + 1):
            plus_ones = F.greatest(F.lit(0), F.lit(i) - (k + 1 - rem))
            start = F.lit(i) * b + plus_ones
            seg_len = b + F.when(F.lit(i) >= (k + 1) - rem, 1) \
                           .otherwise(0)
            out.append((start, seg_len))
        return out

    idx_structs = [
        F.struct(F.col("m").alias("l"), F.lit(i).alias("seg"),
                 F.col("t").substr(start + 1, seg_len).alias("sig"))
        for i, (start, seg_len) in enumerate(seg_geometry(F.col("m")))]
    seg_rows = (base.select(F.col("id").alias("id_s"),
                            F.explode(F.array(*idx_structs)).alias("e"))
                .select("id_s",
                        F.xxhash64("e.l", "e.seg", "e.sig").alias("hk")))
    geo_structs = []
    for dl in range(-k, 1):
        l = F.col("m") + dl
        delta = -dl
        for i, (start, seg_len) in enumerate(seg_geometry(l)):
            lo = max(-i, delta - (k - i))
            hi = min(i, delta + (k - i))
            geo_structs.append(
                F.struct(l.alias("l"), F.lit(i).alias("seg"),
                         start.alias("p"), seg_len.alias("sl"),
                         F.lit(lo).alias("lo"), F.lit(hi).alias("hi")))
    geo = (base.select("id", "t", "m",
                       F.explode(F.array(*geo_structs)).alias("g"))
           .filter(F.col("g.l") >= k + 1))
    probe_rows = (geo
                  .select("id", "t", "m", "g",
                          F.explode(F.sequence(
                              F.col("g.lo"), F.col("g.hi")))
                          .alias("d"))
                  .filter((F.col("g.p") + F.col("d") >= 0)
                          & (F.col("g.p") + F.col("d") + F.col("g.sl")
                             <= F.col("m")))
                  .select(F.col("id").alias("id_p"),
                          F.xxhash64(
                              F.col("g.l"), F.col("g.seg"),
                              F.col("t").substr(
                                  F.col("g.p") + F.col("d") + 1,
                                  F.col("g.sl"))).alias("hk")))
    return (seg_rows.join(probe_rows, "hk")
            .filter(F.col("id_s") != F.col("id_p"))
            .select(F.least("id_s", "id_p").alias("id_a"),
                    F.greatest("id_s", "id_p").alias("id_b"))
            .dropDuplicates(["id_a", "id_b"]))


def timeit(label, build, rounds):
    best = None
    runs = []
    for _ in range(rounds):
        t0 = time.time()
        build().write.mode("overwrite").format("noop").save()
        el = time.time() - t0
        runs.append(el)
        best = el if best is None else min(best, el)
    print(f"STAGE {label}: best={best:.3f} runs="
          + ",".join(f"{r:.3f}" for r in runs), flush=True)


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("editdist_decomp", shuffle_partitions=32)
    corpus = corpus_frame(spark)
    full = lambda: D.editdist_pairs_full(corpus, "doc_id", "text", k=K)
    cand = lambda: cand_only(corpus, "doc_id", "text", K)
    # counts (untimed context)
    n = corpus.count()
    nc = cand().count()
    np_ = full().count()
    print(f"COUNTS corpus={n} candidates={nc} pairs={np_}", flush=True)
    # warm-up
    for _ in range(2):
        cand().write.mode("overwrite").format("noop").save()
        full().write.mode("overwrite").format("noop").save()
    timeit("cand", cand, rounds)
    timeit("full", full, rounds)


if __name__ == "__main__":
    main()
