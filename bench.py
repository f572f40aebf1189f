"""Benchmark runner (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Queries execute end-to-end via the "noop" sink — full plan execution
(scan→shuffle→agg) without driver-side collect, which is the honest
throughput measure at scale.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aether_firebase_consumer_spark.plans import REGISTRY, _load_all
from aether_firebase_consumer_spark.session import get_spark

HEADLINE = [
    "flagship_filter_mask_route",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q18_large_volume_customer",
    "join_fact_fact",
    "asof_join_events",
    "change_detection",
    "agg_stats",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    _load_all()
    spark = get_spark("bench")

    names = [n for n in HEADLINE if n in REGISTRY]
    # extension headliners are added as they land
    for extra in ("dedup_minhash_lsh", "similarity_topk_cosine",
                  "similarity_ann_ivf", "text_quality_score"):
        if extra in REGISTRY:
            names.append(extra)

    timings: dict[str, float] = {}
    for name in names:
        builder = REGISTRY[name].builder
        # best of 2: the first run pays JVM/codegen warmup that a
        # long-lived cluster never sees per-query; min() reports the
        # steady-state cost while still charging all real work.
        best = None
        for _ in range(2):
            t0 = time.time()
            df = builder(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            elapsed = time.time() - t0
            best = elapsed if best is None else min(best, elapsed)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
