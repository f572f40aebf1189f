"""Every registered query runs at sf0.001 and (when it has an oracle)
hash-matches DuckDB — a fast local mirror of the driver's t2 gate.
"""

from __future__ import annotations

import datetime
import decimal
import hashlib
import math

import pytest

from aether_firebase_consumer_spark.plans import REGISTRY, _load_all

SF_ORACLE = "/root/testdata/sf0.001"

_load_all()


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, bool):
        return f"bool:{v}"
    return f"{type(v).__name__}:{v}"


def _hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted("|".join(_canon(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for r in canon:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, duck):
    spec = REGISTRY[name]
    sdf = spec.builder(spark, SF_ORACLE)
    srows = [tuple(r) for r in sdf.collect()]
    assert srows is not None
    if spec.oracle is None:
        return  # rows-only smoke: ran without error, schema stable
    cur = duck.execute(spec.oracle)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    assert sorted(sdf.columns) == sorted(ocols)
    assert len(srows) == len(orows)
    assert _hash(srows, sdf.columns) == _hash(orows, ocols)
