"""Measure the driver-side cost of the stats-manifest skip plan as
file count grows (round 11, VERDICT r10 item 6).

The per-version manifest is one JSON document parsed on the driver
(`sinks/stats.py`): fine at thousands of files, but VERDICT flagged
"at millions of files the parse/prune becomes a driver bottleneck
(Delta shards checkpoints into parquet)". This probe turns that note
into numbers, two ways:

1. REAL tier — a ParquetUpsertTable with a few hundred real files
   (one per partition value; AQE coalesces plain repartition(N)
   writes, so partitions are the honest way to force file count):
   end-to-end `files_for` wall time including manifest load.
2. SYNTHETIC tier — in-memory manifests of 10k/100k/1M entries with
   realistic stats + bloom payloads, timing `json.loads` (the parse
   half) and `prune_files` (the prune half) separately. No Spark
   involved: these costs are pure driver Python, which is exactly the
   point.

Prints one JSON line per measurement; the summary goes into SCALE.md.
"""

from __future__ import annotations

import base64
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from aether_firebase_consumer_spark.sinks.stats import (  # noqa: E402
    _BLOOM_BITS_PER_ROW,
    build_bloom,
    prune_files,
)


def synthetic_manifest(n_files: int, rows_per_file: int = 1000,
                       with_bloom: bool = True) -> str:
    """A manifest JSON string shaped like the real writer's output:
    disjoint int intervals per file (the post-OPTIMIZE layout), plus a
    per-file bloom sized like production (~10 bits/row)."""
    bloom = None
    if with_bloom:
        # one representative bloom reused across entries: byte size is
        # what drives parse cost, contents don't matter for timing
        bloom = build_bloom(range(rows_per_file))
    files = {}
    for i in range(n_files):
        lo = i * rows_per_file
        entry = {"k": [lo, lo + rows_per_file - 1],
                 "ts": [{"us": lo * 1_000_000},
                        {"us": (lo + rows_per_file) * 1_000_000}]}
        if bloom:
            entry["__bloom__"] = {"k": bloom}
        files[f"p={i % 64}/part-{i:06d}.parquet"] = entry
    return json.dumps({"cols": ["k", "ts"], "files": files,
                       "bloom_cols": ["k"] if with_bloom else []})


def time_synthetic(n_files: int) -> dict:
    doc = synthetic_manifest(n_files)
    t0 = time.perf_counter()
    manifest = json.loads(doc)
    t_parse = time.perf_counter() - t0
    # selective range predicate: keeps ~1% of files
    hi = n_files * 1000
    preds = [("k", ">=", int(hi * 0.42)), ("k", "<", int(hi * 0.43))]
    t0 = time.perf_counter()
    kept, total = prune_files(manifest, preds)
    t_prune_range = time.perf_counter() - t0
    # point lookup (bloom consulted per file)
    t0 = time.perf_counter()
    kept_pt, _ = prune_files(manifest, [("k", "=", hi // 2)])
    t_prune_point = time.perf_counter() - t0
    return {"tier": "synthetic", "n_files": n_files,
            "manifest_mb": round(len(doc) / 1e6, 1),
            "parse_s": round(t_parse, 3),
            "prune_range_s": round(t_prune_range, 3),
            "range_kept": len(kept),
            "prune_point_s": round(t_prune_point, 3),
            "point_kept": len(kept_pt), "total": total}


def write_sharded_synthetic(n_files: int, n_shards: int,
                            root: str) -> None:
    """The same synthetic entries laid out in the round-11 SHARDED
    format: one JSON per partition dir under _STATS.d plus the root
    counts+sigs doc — what `write_manifest` produces for a
    partitioned table."""
    import hashlib

    bloom = build_bloom(range(1000))
    os.makedirs(os.path.join(root, "_STATS.d"), exist_ok=True)
    shards_meta = {}
    for s in range(n_shards):
        files = {}
        rels = []
        for i in range(s, n_files, n_shards):
            lo = i * 1000
            rel = f"p={s}/part-{i:06d}.parquet"
            rels.append(rel)
            files[rel] = {"k": [lo, lo + 999],
                          "ts": [{"us": lo * 1_000_000},
                                 {"us": (lo + 1000) * 1_000_000}],
                          "__bloom__": {"k": bloom}}
        h = hashlib.md5()
        for r in sorted(rels):
            h.update(r.encode())
            h.update(b"\0")
        with open(os.path.join(root, "_STATS.d", f"p={s}.json"),
                  "w") as fh:
            json.dump({"files": files}, fh)
        shards_meta[f"p={s}"] = {"n": len(rels), "sig": h.hexdigest()}
    with open(os.path.join(root, "_STATS.json"), "w") as fh:
        json.dump({"cols": ["k", "ts"], "bloom_cols": ["k"],
                   "sharded": True, "shards": shards_meta}, fh)


def time_sharded(n_files: int, n_shards: int = 1024) -> dict:
    """End-to-end sharded point probe: load root doc + parse ONLY the
    admitted shard — the cost a partition-equality takedown lookup
    pays on a table of ``n_files`` total files."""
    from aether_firebase_consumer_spark.sinks.stats import (
        load_manifest,
    )

    root = tempfile.mkdtemp(prefix="manifest_shard_probe_")
    write_sharded_synthetic(n_files, n_shards, root)
    # file 0 (shard p=0) covers k∈[0,999] and the representative
    # bloom was built over range(1000), so k=5 both interval- and
    # bloom-admits exactly that one file — the probe returns kept=1
    target, some_k = 0, 5
    t0 = time.perf_counter()
    man = load_manifest(root)
    kept, total = prune_files(
        man, [("p", "=", target), ("k", "=", some_k)],
        partition_col="p")
    dt = time.perf_counter() - t0
    assert man.loaded == {f"p={target}"}, man.loaded
    import shutil
    shutil.rmtree(root, ignore_errors=True)
    return {"tier": "sharded", "n_files": n_files,
            "n_shards": n_shards,
            "point_probe_s": round(dt, 3),
            "shards_parsed": 1, "kept": len(kept), "total": total}


def time_real(spark, n_partitions: int = 256) -> dict:
    from pyspark.sql import functions as F
    from aether_firebase_consumer_spark.sinks.upsert import (
        ParquetUpsertTable,
    )
    root = tempfile.mkdtemp(prefix="manifest_probe_")
    t = ParquetUpsertTable(spark, root, ["k"], partition_col="p",
                           stats_cols=["k"], bloom_cols=["k"])
    df = (spark.range(n_partitions * 200)
          .select(F.col("id").alias("k"),
                  (F.col("id") % n_partitions).alias("p")))
    t.merge(df)
    t0 = time.perf_counter()
    plan = t.files_for([("k", ">=", 100), ("k", "<", 400)])
    dt = time.perf_counter() - t0
    v, kept, total = plan
    return {"tier": "real", "n_files": total, "kept": len(kept),
            "files_for_s": round(dt, 3)}


def main() -> None:
    out = [time_synthetic(n) for n in (10_000, 100_000, 1_000_000)]
    out += [time_sharded(n) for n in (10_000, 100_000, 1_000_000)]
    if "--no-spark" not in sys.argv:
        from aether_firebase_consumer_spark.session import get_spark
        out.append(time_real(get_spark("manifest_probe")))
    for row in out:
        print(json.dumps(row))


if __name__ == "__main__":
    main()
