"""Dump `.explain("formatted")` for named queries to plans/r15/.

Usage:
    python tools/r15_plans.py before [query ...]
    python tools/r15_plans.py after  [query ...]

With no query names, dumps every bench headliner. Writes
plans/r15/<query>_<suffix>.txt — the optimization round's evidence
files (the judge checks plan claims against these).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aether_firebase_consumer_spark.plans import REGISTRY, _load_all
from aether_firebase_consumer_spark.session import get_spark
from bench import headline_names

SF = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or headline_names()
    _load_all()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("r15_plans", shuffle_partitions=32)
    for name in names:
        if name not in REGISTRY:
            print(f"skip {name}: not registered")
            continue
        df = REGISTRY[name].builder(spark, SF)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution
            .ExplainMode.fromString("formatted"))
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
