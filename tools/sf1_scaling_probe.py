"""VERDICT r14 item 7: sf1 scaling spot-check for the heaviest bench
queries — 8 vs 32 cores at the sf1 decade, where wall time is
task-dominated (the sf0.1 bench is fixed-overhead-dominated: 31/57
queries showed ratio <= 1.0 there, so it cannot see parallelism).

Runs ONE core count per process (master is fixed at session build):

    SPARK_GRAFT_CPUS=32 python tools/sf1_scaling_probe.py out32.json
    SPARK_GRAFT_CPUS=8  python tools/sf1_scaling_probe.py out8.json

Then merge:  python tools/sf1_scaling_probe.py --merge out32.json \
             out8.json plans/r15/sf1_scaling.md

Protocol: bench.py methodology (noop sink, deep-warm best-of-3 after
2 untimed warm-up passes per query), shuffle_partitions pinned to 32
in BOTH runs (the bench contract: partition count must not drift with
the machine), sf1 fixture from tools/synth_sf1.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "dedup_ngram_containment",
    "dedup_ngram_jaccard",
    "dedup_semantic_semdedup_trained",
    "dedup_editdist_full",
    "dedup_incremental_lsh",
]

SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/root/repo/.scale_sf1")


def run(out_path: str) -> None:
    from aether_firebase_consumer_spark.plans import REGISTRY, _load_all
    from aether_firebase_consumer_spark.session import get_spark

    _load_all()
    spark = get_spark("sf1_scaling", shuffle_partitions=32)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    for name in QUERIES:           # deep warm-up, 2 passes
        for _ in range(2):
            REGISTRY[name].builder(spark, SF1) \
                .write.mode("overwrite").format("noop").save()
    out = {"cpus": cpus, "sf1_dir": SF1, "queries": {}}
    for name in QUERIES:
        best = None
        for _ in range(3):
            t0 = time.time()
            REGISTRY[name].builder(spark, SF1) \
                .write.mode("overwrite").format("noop").save()
            el = time.time() - t0
            best = el if best is None else min(best, el)
        out["queries"][name] = round(best, 3)
        print(f"SF1SCALE cpus={cpus} {name}: {best:.3f}", flush=True)
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)


def merge(p32: str, p8: str, out_md: str) -> None:
    with open(p32) as fh:
        d32 = json.load(fh)
    with open(p8) as fh:
        d8 = json.load(fh)
    lines = [
        "# sf1 scaling spot-check (r15, VERDICT r14 item 7)",
        "",
        f"10x sf0.1 fixture (`{d32['sf1_dir']}`, tools/synth_sf1.py), "
        "noop sink, deep-warm best-of-3, shuffle_partitions=32 in both "
        "runs; separate processes per core count. `ratio` = t(8 cores) "
        "/ t(32 cores); 1.0 = no parallel speedup, 4.0 = ideal.",
        "",
        "| query | 32 cores s | 8 cores s | ratio |",
        "|---|---|---|---|",
    ]
    for q in QUERIES:
        t32, t8 = d32["queries"][q], d8["queries"][q]
        lines.append(f"| {q} | {t32} | {t8} | {t8 / t32:.2f} |")
    with open(out_md, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out_md}")


if __name__ == "__main__":
    if sys.argv[1] == "--merge":
        merge(*sys.argv[2:5])
    else:
        run(sys.argv[1])
