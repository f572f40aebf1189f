"""sf1 probes for the round-9 persisted-index additions' FULL paths
(round 10, VERDICT r9 item 6): SCALE.md's deep dives cover the probe
side of `similarity_ann_ivfadc_pruned`; this tool measures the pieces
a 100 TB operator actually schedules —

- INDEX BUILD: one AnnIndexJob.process_batch over the whole embeddings
  table (corpus + codes MERGE) at each decade;
- PROBE: topk() for a fixed 5-query set against the persisted index;
- REBUILD (model/modulus migration): AnnIndexJob.rebuild() re-encoding
  the whole corpus into one atomic version swap;
- RESHARD: SemanticIngestJob.reshard(new_n_sub) — the cell-index
  migration — over the same decades;
- DELETE (round 10): AnnIndexJob.delete() of 100 ids — the pruned
  takedown path.

Usage: PYTHONPATH=/root/repo python tools/ann_maintenance_probe.py
Honors SPARK_GRAFT_SF1_DIR for the synthesized sf1 decade
(tools/synth_sf1.py). Prints one JSON line per decade plus fitted
0.1→1 slopes; splice results into SCALE.md by hand (scale_report.py
overwrites the file — do not use it for this).
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aether_firebase_consumer_spark.session import get_spark
from aether_firebase_consumer_spark.sinks.upsert import ParquetUpsertTable
from aether_firebase_consumer_spark.streaming.ann_ingest import AnnIndexJob
from aether_firebase_consumer_spark.streaming.semantic_ingest import (
    SemanticIngestJob,
)
from aether_firebase_consumer_spark.tables import (
    fan_out_for_compute,
    load_table,
)


def _decades() -> list[tuple[str, str]]:
    out = [("0.1", "/root/testdata/sf0.1")]
    sf1 = os.environ.get("SPARK_GRAFT_SF1_DIR")
    if sf1:
        out.append(("1", sf1))
    return out


def probe_decade(spark, sf_dir: str) -> dict:
    from aether_firebase_consumer_spark.plans.similarity_queries import (
        _CENTS,
        _PQ_BOOKS,
    )

    emb = fan_out_for_compute(load_table(spark, sf_dir, "embeddings")) \
        .select("vec_id", "embedding")
    n = emb.count()
    root = tempfile.mkdtemp(prefix="ann_probe_")
    res: dict = {"n_vectors": n}
    try:
        corpus = ParquetUpsertTable(spark, root + "/corp", ["vec_id"],
                                    partition_col="idp")
        codes = ParquetUpsertTable(spark, root + "/codes", ["vec_id"],
                                   partition_col="cp")
        job = AnnIndexJob(spark, corpus, codes, _CENTS, _PQ_BOOKS,
                          n_parts=16, idp_parts=8)
        t0 = time.time()
        job.process_batch(emb, 0)
        res["index_build_s"] = round(time.time() - t0, 3)

        queries = emb.filter(F.col("vec_id") < 5).localCheckpoint()
        best = None
        for _ in range(2):
            t0 = time.time()
            job.topk(queries, k=5, shortlist=50) \
                .write.mode("overwrite").format("noop").save()
            e = time.time() - t0
            best = e if best is None else min(best, e)
        res["probe_s"] = round(best, 3)

        t0 = time.time()
        job.rebuild(n_parts=24)          # modulus migration, full re-encode
        res["rebuild_s"] = round(time.time() - t0, 3)

        ids = [r[0] for r in emb.select("vec_id").limit(100).collect()]
        t0 = time.time()
        deleted = job.delete(ids)
        res["delete100_s"] = round(time.time() - t0, 3)
        res["delete100_n"] = deleted

        # SemanticIngestJob reshard over the same vectors
        sroot = root + "/sem"
        scorp = ParquetUpsertTable(spark, sroot + "/c", ["vec_id"],
                                   partition_col="idp")
        sidx = ParquetUpsertTable(spark, sroot + "/i", ["vec_id"],
                                  partition_col="cp")
        sem = SemanticIngestJob(spark, scorp, cluster_index=sidx,
                                threshold=2.0,  # gate nothing: pure ingest
                                n_sub=4, n_parts=16, idp_parts=8)
        sem.process_batch(emb, 0)
        t0 = time.time()
        sem.reshard(8)
        res["sem_reshard_s"] = round(time.time() - t0, 3)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return res


def main() -> None:
    spark = get_spark("ann_maintenance_probe", shuffle_partitions=32)
    rows = {}
    for sf, sf_dir in _decades():
        rows[sf] = probe_decade(spark, sf_dir)
        print(json.dumps({"sf": sf, **rows[sf]}))
    if "1" in rows and "0.1" in rows:
        slopes = {}
        for k in ("index_build_s", "probe_s", "rebuild_s",
                  "delete100_s", "sem_reshard_s"):
            a, b = rows["0.1"][k], rows["1"][k]
            if a > 0 and b > 0:
                slopes[k] = round(math.log10(b / a), 2)
        print(json.dumps({"slopes_0.1_to_1": slopes}))


if __name__ == "__main__":
    main()
