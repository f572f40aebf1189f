"""Time individual registered queries with bench.py's methodology
(noop sink, deep-warm best-of-3 after an untimed warm-up run).

Usage: python tools/qtime.py <query> [query ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aether_firebase_consumer_spark.plans import REGISTRY, _load_all
from aether_firebase_consumer_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    _load_all()
    spark = get_spark("qtime", shuffle_partitions=32)
    # deep warm-up: several untimed passes (bench.py warms with one
    # whole-list pass; a single query needs a few of its own)
    for name in names:
        for _ in range(3):
            df = REGISTRY[name].builder(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
    for name in names:
        best = None
        runs = []
        for _ in range(3):
            t0 = time.time()
            df = REGISTRY[name].builder(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            el = time.time() - t0
            runs.append(el)
            best = el if best is None else min(best, el)
        print(f"QTIME {name}: best={best:.3f} runs="
              + ",".join(f"{r:.3f}" for r in runs))


if __name__ == "__main__":
    main()
