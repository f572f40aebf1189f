"""Skew mitigation for hot join keys (SURVEY.md §7 risk 5).

AQE's skew-join splitting (on in session.py) handles most skew at
runtime by splitting oversized shuffle partitions. This module is the
explicit fallback for the pathological case AQE can't fix: a single
join KEY so hot that one reducer gets it all (e.g. an LSH band key for
a boilerplate shingle, or a null-ish default id at 100 TB).

``salted_join`` spreads each hot key over ``salt`` sub-keys: the large
side gets a deterministic salt in [0, salt); the small side is
replicated ``salt`` times (explode of a literal sequence — a bounded
size-multiplier, which is why this is for *moderate* small sides). Join
on (key, salt) then drop the salt: same result, `salt`-way parallel hot
keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(large: DataFrame, small: DataFrame, on: list[str],
                how: str = "inner", salt: int = 8) -> DataFrame:
    """Equi-join with `salt`-way key spreading. Result is identical to
    ``large.join(small, on, how)`` for row-preserving join types
    (inner/left); the salt column never escapes."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    # deterministic per-row salt on the big side: hash of the row id
    # stream spreads a hot key's rows uniformly across sub-keys
    l_salted = large.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()),
               F.lit(salt)).cast("int"))
    s_salted = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    out = l_salted.join(s_salted, on + ["_salt"], how)
    return out.drop("_salt")
