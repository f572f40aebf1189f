"""HyperLogLog building blocks for approximate COUNT(DISTINCT)
(round 12) — pure JVM-side column expressions (xxhash64 + integer
bit math + one aggregate), no UDFs, so sketch construction rides
whole-stage codegen at scan parallelism.

The sketch is the classic Flajolet–Durand–Gandouet–Meunier HLL
(public paper, 2007): ``m = 2^p`` registers; each value hashes to a
register index (low bits) and a rank ``rho`` = leading-zero count of
the remaining bits + 1; a register keeps the MAX rank seen. The
estimator is ``alpha_m * m^2 / sum_j 2^(-M_j)`` with the standard
small-range linear-counting correction (``E <= 2.5m`` and empty
registers present → ``m * ln(m / V)``). 64-bit hashes make the
large-range correction unnecessary at any realistic cardinality.

Representation here is RELATIONAL, not a packed binary blob: one row
per (group, register index) with its max rank — never more than
``m`` rows per group. That makes the sketch MERGEABLE with plain SQL
(``GROUP BY idx -> MAX(rho)``), incremental under inserts (max is
monotone), and storable in a :class:`~...sinks.upsert.
ParquetUpsertTable` keyed by (group, idx) — which is exactly how
``CdfAggregateView`` maintains it (``approx_count_distinct`` spec
kind). Rank math: the 64-bit hash keeps its low ``p`` bits for the
index (via pmod — any fixed uniform mapping works; determinism is
what the view's exactness contract needs) and the next 52 bits for
the rank (a bigint-safe window: ``bin()``'s string length IS the
bit length, so rho = 53 - bitlength, exactly, with no float
rounding), so rho ∈ [1, 53] fits a smallint.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: rank-bit window width (bits of the hash above the index bits)
_RANK_BITS = 52


def hll_alpha(m: int) -> float:
    """The standard bias-correction constant alpha_m."""
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_register(value: Column, p: int) -> tuple[Column, Column]:
    """``(idx, rho)`` register contribution of one value: idx in
    [0, 2^p), rho in [1, 53]. Deterministic (seeded xxhash64), null
    values must be filtered by the caller (COUNT DISTINCT ignores
    them)."""
    if not 4 <= p <= 16:
        raise ValueError(f"hll precision p must be in [4, 16] "
                         f"(got {p}) — m = 2^p registers")
    m = 1 << p
    w = F.xxhash64(value)
    idx = F.pmod(w, F.lit(m)).cast("int")
    w2 = F.shiftright(w, p).bitwiseAND(F.lit((1 << _RANK_BITS) - 1))
    # bin(x) has no leading zeros: length(bin(x)) == bitlength(x);
    # leading zeros in the 52-bit window = 52 - bitlength, rho = +1
    rho = (F.when(w2 == 0, F.lit(_RANK_BITS + 1))
           .otherwise(F.lit(_RANK_BITS + 1) - F.length(F.bin(w2)))
           .cast("smallint"))
    return idx, rho


def hll_registers_df(df: DataFrame, group_cols: list[str],
                     value: Column, p: int,
                     idx_col: str = "_idx",
                     rho_col: str = "_rho") -> DataFrame:
    """Per-group register rows ``(group_cols..., idx, max rho)`` for
    a frame of values — one narrow shuffle on (group, idx), max is
    map-side combined."""
    idx, rho = hll_register(value, p)
    return (df.filter(value.isNotNull())
            .select(*group_cols, idx.alias(idx_col),
                    rho.alias(rho_col))
            .groupBy(*group_cols, idx_col)
            .agg(F.max(rho_col).cast("smallint").alias(rho_col)))


def hll_estimate(n_regs: Column, sum_pow: Column, p: int) -> Column:
    """Cardinality estimate from per-group aggregates of the register
    rows: ``n_regs`` = COUNT(*) of stored registers (all have rho >=
    1; the other m - n_regs registers are implicitly 0), ``sum_pow``
    = SUM(2^-rho) over stored registers. Applies the small-range
    linear-counting correction. Returns bigint."""
    m = 1 << p
    alpha = hll_alpha(m)
    zeros = F.lit(m) - n_regs
    denom = zeros.cast("double") + sum_pow
    raw = F.lit(alpha * m * m) / denom
    small = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    est = F.when((raw <= F.lit(2.5 * m)) & (zeros > 0), small) \
        .otherwise(raw)
    return F.round(est).cast("bigint")


def hll_error_bound(p: int) -> float:
    """The theoretical relative standard error, 1.04 / sqrt(m)."""
    return 1.04 / math.sqrt(1 << p)
