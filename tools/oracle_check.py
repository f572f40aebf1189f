"""Local stand-in for the driver's t2 correctness gate.

Runs every registered query on Spark at sf0.01 AND its DuckDB oracle,
then compares row count, column names, and an order-insensitive value
hash (columns sorted by name, rows sorted by stringified tuple).

Usage:  python tools/oracle_check.py [query ...]
"""

from __future__ import annotations

import datetime
import decimal
import hashlib
import math
import sys
import time
import traceback

import duckdb

import os

# runnable from a bare shell (`python3 tools/oracle_check.py ...`)
# without PYTHONPATH=. — the repo root holds the package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, (datetime.datetime,)):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    if isinstance(v, bytes):
        return "b:" + v.hex()
    if isinstance(v, bool):
        return f"bool:{v}"
    return f"{type(v).__name__}:{v}"


def table_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    canon_rows = sorted(
        "|".join(canon_value(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5()
    for r in canon_rows:
        h.update(r.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest(), canon_rows


def main(argv):
    from aether_firebase_consumer_spark.session import get_spark
    from aether_firebase_consumer_spark.plans import REGISTRY, _load_all

    _load_all()
    spark = get_spark("oracle_check")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    names = argv or list(REGISTRY)
    n_pass = n_fail = n_nooracle = 0
    for name in names:
        spec = REGISTRY[name]
        t0 = time.time()
        try:
            sdf = spec.builder(spark, SF_DIR)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception:
            print(f"FAIL  {name}: spark error")
            traceback.print_exc()
            n_fail += 1
            continue
        if spec.oracle is None:
            print(f"rows  {name}: {len(srows)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            n_nooracle += 1
            continue
        try:
            cur = con.execute(spec.oracle)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception:
            print(f"FAIL  {name}: duckdb error")
            traceback.print_exc()
            n_fail += 1
            continue

        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duck={len(orows)}")
        if not problems:
            sh, scanon = table_hash(srows, scols)
            oh, ocanon = table_hash(orows, ocols)
            if sh != oh:
                diffs = [(a, b) for a, b in zip(scanon, ocanon) if a != b][:3]
                problems.append(f"valuehash {sh[:8]}!={oh[:8]}; first diffs: {diffs}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"OK    {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1

    print(f"\n{n_pass} ok, {n_fail} fail, {n_nooracle} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
