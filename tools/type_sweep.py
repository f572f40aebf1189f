"""Sweep every registered oracle for declared-type hazards.

The driver's correctness gate compares *declared* output schemas as
well as values. A query can pass the value-hash locally (Python coerces
DuckDB HUGEINT and Spark bigint both to int) yet fail the driver's
schema canonicalizer — round-1 q12 failed exactly this way. This tool
compares Spark's declared schema against DuckDB's ``DESCRIBE`` of the
oracle and flags:

* any DuckDB ``HUGEINT``/``UHUGEINT`` column (Spark has no int128);
* any ``DECIMAL`` output column on either side (precision rules differ
  between engines — surface DOUBLE instead, keep DECIMAL internal);
* cross-engine type-family mismatches (int vs float vs decimal vs
  string vs date vs timestamp vs bool vs list vs binary).

Usage:  PYTHONPATH=/root/repo python tools/type_sweep.py [query ...]
Schema-only: no data is collected, so this runs in seconds.
"""

from __future__ import annotations

import os
import re
import sys

import duckdb

# runnable from a bare shell without PYTHONPATH=.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

_FAMILY = [
    (r"hugeint", "HUGEINT"),
    (r"decimal", "decimal"),
    (r"tinyint|smallint|int(eger)?|bigint|long|short|byte|^u?int", "int"),
    (r"double|float|real", "float"),
    (r"bool", "bool"),
    (r"varchar|string|char|text", "string"),
    (r"timestamp", "timestamp"),
    (r"date", "date"),
    (r"blob|binary", "binary"),
    (r"list|array", "list"),
    (r"struct|row", "struct"),
    (r"map", "map"),
]


def family(type_str: str) -> str:
    t = type_str.lower()
    for pat, fam in _FAMILY:
        if re.search(pat, t):
            return fam
    return t


def main(argv):
    from aether_firebase_consumer_spark.session import get_spark
    from aether_firebase_consumer_spark.plans import REGISTRY, _load_all

    _load_all()
    spark = get_spark("type_sweep")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")

    names = argv or list(REGISTRY)
    n_flag = 0
    for name in names:
        spec = REGISTRY[name]
        try:
            sdf = spec.builder(spark, SF_DIR)
            stypes = {f.name: f.dataType.simpleString()
                      for f in sdf.schema.fields}
        except Exception as e:  # noqa: BLE001 — report and continue sweep
            print(f"ERR   {name}: spark {e}")
            n_flag += 1
            continue
        if spec.oracle is None:
            # rows-only gate: still flag Spark-side DECIMAL surfaces
            decs = [c for c, t in stypes.items() if "decimal" in t]
            if decs:
                print(f"FLAG  {name} (no oracle): spark DECIMAL cols {decs}")
                n_flag += 1
            continue
        try:
            rows = con.execute(
                f"DESCRIBE SELECT * FROM ({spec.oracle}) __q").fetchall()
            otypes = {r[0]: r[1] for r in rows}
        except Exception as e:  # noqa: BLE001
            print(f"ERR   {name}: duckdb {e}")
            n_flag += 1
            continue

        problems = []
        for col in sorted(set(stypes) | set(otypes)):
            st, ot = stypes.get(col), otypes.get(col)
            if st is None or ot is None:
                problems.append(f"{col}: only in "
                                f"{'duck' if st is None else 'spark'}")
                continue
            sf_, of_ = family(st), family(ot)
            if of_ == "HUGEINT":
                problems.append(f"{col}: duck HUGEINT (spark {st})")
            elif sf_ == "decimal" or of_ == "decimal":
                problems.append(f"{col}: decimal surface "
                                f"(spark {st}, duck {ot})")
            elif sf_ != of_:
                problems.append(f"{col}: family mismatch "
                                f"spark {st} vs duck {ot}")
        if problems:
            print(f"FLAG  {name}: " + "; ".join(problems))
            n_flag += 1

    print(f"\n{len(names)} swept, {n_flag} flagged")
    return 1 if n_flag else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
