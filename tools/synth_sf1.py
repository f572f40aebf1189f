"""Synthesize an sf1-scale fixture decade for the heavy query families.

The driver ships sf0.001/0.01/0.1; at those sizes every probe slope
tops out ~0.8 — fixed overhead dominates, so the 1.5 quadratic
threshold can't catch a real quadratic (VERDICT r5, next-round #4).
This tool builds ``.scale_sf1/`` (gitignored, inside the repo) with
documents and embeddings at 10x sf0.1, constructed so the STATISTICS
that drive join/candidate volumes are preserved — replication must not
manufacture cross-replica duplicates, or the probe would punish the
dedup family for data it would never see:

* documents: 10 replicas; replica k>0 suffixes every whitespace token
  with ``~rk``. Token/shingle counts, lengths, and WITHIN-replica
  duplicate structure are identical to the original; across replicas
  no shingle matches, so dup density per row is constant as N grows —
  the null hypothesis a linear scan + bounded-fanout join should hold.
* embeddings: 10 replicas; replica k applies a deterministic per-k
  ±1 sign pattern per dimension — an ORTHOGONAL transform, so norms
  and all within-replica cosines are exactly preserved while
  cross-replica cosines decorrelate to ~0 (no manufactured near-dups).
* every other table is copied verbatim from sf0.1 (the heavy families
  under probe read only documents/embeddings; copies keep any
  load_table call working).

Usage:  PYTHONPATH=/root/repo python tools/synth_sf1.py
Then:   SPARK_GRAFT_SF1_DIR=/root/repo/.scale_sf1 \
        PYTHONPATH=/root/repo python tools/scale_probe.py <heavy...>
"""

from __future__ import annotations

import hashlib
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aether_firebase_consumer_spark.session import get_spark
from aether_firebase_consumer_spark.tables import load_table

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".scale_sf1")
REPLICAS = 10
#: doc_id / vec_id stride between replicas (far above fixture ids)
STRIDE = 10_000_000


def _sign_pattern(k: int, dim: int) -> list[float]:
    """Deterministic ±1 diagonal for replica k (k=0 → identity)."""
    if k == 0:
        return [1.0] * dim
    out = []
    for j in range(dim):
        h = hashlib.md5(f"sf1-sign:{k}:{j}".encode()).hexdigest()
        out.append(1.0 if int(h[0], 16) >= 8 else -1.0)
    return out


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    spark = get_spark("synth_sf1", shuffle_partitions=32)

    docs = load_table(spark, SRC, "documents")
    id_col = "doc_id" if "doc_id" in docs.columns else docs.columns[0]
    parts = []
    for k in range(REPLICAS):
        d = docs.withColumn(id_col, F.col(id_col) + F.lit(k * STRIDE))
        if k > 0:
            d = d.withColumn(
                "text",
                F.array_join(
                    F.transform(F.split(F.col("text"), " "),
                                lambda t: F.concat(t, F.lit(f"~r{k}"))),
                    " "))
        parts.append(d)
    big_docs = parts[0]
    for p in parts[1:]:
        big_docs = big_docs.unionByName(p)
    big_docs.repartition(32).write.mode("overwrite") \
        .parquet(os.path.join(DST, "documents.parquet"))

    emb = load_table(spark, SRC, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    eparts = []
    for k in range(REPLICAS):
        signs = _sign_pattern(k, dim)
        e = emb.withColumn("vec_id", F.col("vec_id") + F.lit(k * STRIDE))
        if k > 0:
            sign_lit = F.array(*[F.lit(s) for s in signs])
            e = e.withColumn(
                "embedding",
                F.zip_with("embedding", sign_lit, lambda x, s: x * s))
        eparts.append(e)
    big_emb = eparts[0]
    for p in eparts[1:]:
        big_emb = big_emb.unionByName(p)
    big_emb.repartition(32).write.mode("overwrite") \
        .parquet(os.path.join(DST, "embeddings.parquet"))

    for fname in os.listdir(SRC):
        if fname.startswith(("documents", "embeddings")):
            continue
        src, dst = os.path.join(SRC, fname), os.path.join(DST, fname)
        if os.path.isdir(src):
            shutil.copytree(src, dst, dirs_exist_ok=True)
        else:
            shutil.copy2(src, dst)

    n_d = spark.read.parquet(os.path.join(DST, "documents.parquet")).count()
    n_e = spark.read.parquet(os.path.join(DST, "embeddings.parquet")).count()
    print(f"synthesized {DST}: documents={n_d} embeddings={n_e}")


if __name__ == "__main__":
    main()
