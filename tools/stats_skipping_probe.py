"""sf1 probes for the round-10 data-skipping layer: the stats-manifest
table's full operational path at sf0.1 and the synthesized sf1 decade —

- BUILD: documents → lang-partitioned ParquetUpsertTable with
  stats_cols=["n_chars"], then optimize(zorder_cols=["n_chars"]) (the
  layout pass that makes per-file ranges narrow);
- SKIP PLAN: files_for() selectivity for the headline range predicate
  (manifest lookup only — this is the driver-side cost of skipping);
- READ: read_where() vs the full filtered read(), same predicate, both
  timed on a count();
- RETENTION: delete_where() expiring the low tail, timed, plus how
  many files were rewritten vs carried as hardlinks (from the
  manifests' relpath overlap).

Usage: PYTHONPATH=/root/repo python tools/stats_skipping_probe.py
Honors SPARK_GRAFT_SF1_DIR (tools/synth_sf1.py). Prints one JSON line
per decade plus fitted 0.1→1 slopes; splice into SCALE.md by hand.
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
from aether_firebase_consumer_spark.sinks.stats import load_manifest
from aether_firebase_consumer_spark.sinks.upsert import ParquetUpsertTable
from aether_firebase_consumer_spark.tables import load_table

PRED_READ = (("n_chars", ">=", 400), ("n_chars", "<", 900))
PRED_EXPIRE = (("n_chars", "<", 200),)


def _decades() -> list[tuple[str, str]]:
    out = [("0.1", "/root/testdata/sf0.1")]
    sf1 = os.environ.get("SPARK_GRAFT_SF1_DIR")
    if sf1 and os.path.isdir(sf1):
        out.append(("1", sf1))
    return out


def probe(spark, sf_dir: str) -> dict:
    root = tempfile.mkdtemp(prefix="stats_probe_")
    try:
        docs = load_table(spark, sf_dir, "documents") \
            .select("doc_id", "lang", "n_chars")
        t = ParquetUpsertTable(spark, root, ["doc_id"],
                               partition_col="lang",
                               stats_cols=["n_chars"])
        t0 = time.monotonic()
        t.merge(docs)
        t.optimize(zorder_cols=["n_chars"])
        build_s = time.monotonic() - t0

        t0 = time.monotonic()
        _v, kept, total = t.files_for(list(PRED_READ))
        plan_s = time.monotonic() - t0

        t0 = time.monotonic()
        n_skip = t.read_where(*PRED_READ).count()
        read_skip_s = time.monotonic() - t0

        cond = (F.col("n_chars") >= 400) & (F.col("n_chars") < 900)
        t0 = time.monotonic()
        n_full = t.read().filter(cond).count()
        read_full_s = time.monotonic() - t0
        assert n_skip == n_full, (n_skip, n_full)

        base = t._data_dir(t.current_version())
        bytes_kept = sum(os.path.getsize(os.path.join(base, r))
                         for r in kept)
        man0 = load_manifest(base)
        bytes_total = sum(os.path.getsize(os.path.join(base, r))
                          for r in man0["files"])

        man_before = load_manifest(t._data_dir(t.current_version()))
        t0 = time.monotonic()
        n_del = t.delete_where(*PRED_EXPIRE)
        delete_s = time.monotonic() - t0
        man_after = load_manifest(t._data_dir(t.current_version()))
        carried = len(set(man_before["files"])
                      & set(man_after["files"]))
        return {"rows": docs.count(), "build_s": round(build_s, 3),
                "skip_plan_s": round(plan_s, 4),
                "files_kept": len(kept), "files_total": total,
                "bytes_kept": bytes_kept, "bytes_total": bytes_total,
                "read_where_s": round(read_skip_s, 3),
                "read_full_s": round(read_full_s, 3),
                "rows_read": n_skip,
                "delete_where_s": round(delete_s, 3),
                "rows_deleted": n_del,
                "files_carried": carried,
                "files_before": len(man_before["files"])}
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    spark = get_spark("stats-skipping-probe")
    results = {}
    for sf, sf_dir in _decades():
        results[sf] = probe(spark, sf_dir)
        print(json.dumps({"sf": sf, **results[sf]}))
    if "1" in results:
        for key in ("build_s", "read_where_s", "delete_where_s"):
            a, b = results["0.1"][key], results["1"][key]
            slope = (math.log10(b / a)) if a > 0 else float("nan")
            print(json.dumps({"metric": key,
                              "slope_0.1_to_1": round(slope, 2)}))


if __name__ == "__main__":
    main()
