"""Scaling probe: run representative queries at every fixture scale
factor and report how wall time grows vs data size.

The 100 TB argument needs evidence, not adjectives: a query whose
time-growth exponent tracks ~O(n) on sf0.001 -> 0.01 -> 0.1 (100x data)
has no hidden quadratic term; an exponent drifting toward 2 flags an
all-pairs join or an unpruned fan-out. Fixed-overhead-dominated queries
(tiny inputs) show exponents near 0 — also visible, also honest.

Usage:  PYTHONPATH=/root/repo python tools/scale_probe.py [query ...]
Prints one JSON line: per query, seconds at each sf and the fitted
log-log slope between the two largest scales (where fixed overhead
matters least).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aether_firebase_consumer_spark.plans import REGISTRY, _load_all
from aether_firebase_consumer_spark.session import get_spark

SFS = [("0.001", "/root/testdata/sf0.001"),
       ("0.01", "/root/testdata/sf0.01"),
       ("0.1", "/root/testdata/sf0.1")]

# optional 4th decade: a synthesized sf1 fixture dir (tools/synth_sf1.py)
# — at sf0.1 the slopes are overhead-dominated (max ~0.8), so the 1.5
# quadratic threshold only has teeth once the fastest probed query
# clears a couple of seconds
if os.environ.get("SPARK_GRAFT_SF1_DIR"):
    SFS.append(("1", os.environ["SPARK_GRAFT_SF1_DIR"]))

DEFAULT = ["flagship_filter_mask_route", "q1_pricing_summary",
           "q18_large_volume_customer", "join_fact_fact",
           "dedup_minhash_lsh", "dedup_chunk_overlap",
           "similarity_embedding_neardup", "text_quality_score",
           "embedding_kmeans", "dedup_ngram_jaccard"]


def main() -> None:
    _load_all()
    names = sys.argv[1:] or [n for n in DEFAULT if n in REGISTRY]
    spark = get_spark("scale_probe", shuffle_partitions=32)
    out: dict[str, dict] = {}
    for name in names:
        builder = REGISTRY[name].builder
        times: dict[str, float] = {}
        for sf, sf_dir in SFS:
            best = None
            for _ in range(2):
                t0 = time.time()
                builder(spark, sf_dir).write.mode("overwrite") \
                    .format("noop").save()
                el = time.time() - t0
                best = el if best is None else min(best, el)
            times[sf] = round(best, 3)
        # log-log slope over the top decade (the two LARGEST scales
        # probed): 1.0 = linear in data size, ~0 = fixed-overhead
        # bound, ~2 = quadratic danger
        hi, lo = SFS[-1][0], SFS[-2][0]
        slope = (math.log(times[hi] / times[lo]) / math.log(10)
                 if times[lo] > 0 else float("nan"))
        out[name] = {"sec": times, "slope_top_decade": round(slope, 2)}
    print(json.dumps({"queries": out}))


if __name__ == "__main__":
    main()
