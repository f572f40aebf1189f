"""Mergeable approximate-QUANTILE sketch (round 14) — the quantile
twin of the HLL tier (``functions/hll.py``), as pure JVM-side column
expressions (log + integer bucketing + one additive aggregate).

The sketch is DDSketch (public paper: Masson, Rim & Lee, "DDSketch: a
fast and fully-mergeable quantile sketch with relative-error
guarantees", VLDB 2019): values bucket into exponentially-sized bins
``idx = ceil(log_gamma(x))`` with ``gamma = (1 + alpha)/(1 - alpha)``,
one signed store each for positive and negative magnitudes plus a zero
bucket. Any q-quantile read back from the bucket counts is within
RELATIVE VALUE error ``alpha`` of the true rank-``ceil(q*n)`` item:
the counts are exact, so the selected bucket provably CONTAINS the
true quantile value, and every value in a bucket is within alpha of
the bucket's midpoint estimate ``2*gamma^idx/(gamma + 1)``.

Why DDSketch and not KLL (which the round-13 punch list sketched):

- CANONICAL state. The sketch is a pure function of the value
  multiset — rows ``(group, sign, bucket, count)`` with counts that
  simply ADD. ``merge(sketch(A), sketch(B)) == sketch(A ∪ B)``
  EXACTLY, bucket-for-bucket (the HLL tier's register-for-register
  pinning, reproduced for quantiles in ``tests/test_dd_view.py``).
  KLL's compactor state depends on arrival/merge ORDER — merge
  equality can only be approximate, and a maintained view's state
  would diverge from the recompute sketch it is tested against.
- RETRACTION-EXACT. Counts are signed: a delete/update folds as
  ``count - 1`` on the pre-image bucket — no pinned-source
  dirty-group recompute, ever (the count/sum regime, not min/max).
  KLL cannot retract at all.
- Spark-first: construction is one narrow shuffle on (group, sign,
  bucket) with map-side combine; no iterative compaction loop, no
  UDFs, whole-stage codegen end to end.

The tradeoff is the guarantee's shape: DDSketch bounds relative VALUE
error (alpha), KLL bounds RANK error. For the long-tailed
distributions this engine serves (token counts, document lengths,
latencies — the ``corpus_token_quantiles`` family) a value-relative
bound is the operationally useful one (p99 = 4_000 ± 1% beats
p99 = "some value whose rank is within 1%").

State bound: buckets span ``log_gamma(max/min_indexable)`` indices —
at the default ``alpha = 0.01`` and the default index clamp, at most
``2 * DD_MAX_IDX + 1`` ≈ 4.6k rows per group worst-case, in practice
O(log of the value spread). Values with ``|x| < DD_MIN_VALUE`` count
into the zero bucket (the standard DDSketch min-indexable contract —
the relative-error guarantee starts above it).

Storable in a ``ParquetUpsertTable`` keyed by (group, _sgn, _bkt) —
exactly how ``CdfAggregateView`` maintains its ``approx_quantile``
measures — with the sketch parameters stamped into commit_meta (see
:func:`sketch_meta`) so :func:`merge_dd_sketches` can refuse an
alpha-mismatch merge instead of silently mixing bucket scales (same
contract as the HLL tier's p stamp).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: identifies this module's bucket layout in a persisted table's
#: commit_meta: sign/zero stores, ceil-log-gamma indexing, midpoint
#: estimator. Bump if the layout changes — counts from a different
#: layout are not comparable bucket-to-bucket.
DD_LAYOUT_TAG = "sign/ceil-log-gamma/v1"

#: smallest indexable magnitude: anything closer to zero counts into
#: the zero bucket (idx 0, sign 0). Bounds the index range — without
#: a floor, a denormal double would mint ~huge negative indices.
DD_MIN_VALUE = 1e-9

#: index clamp (|idx| <= DD_MAX_IDX): at alpha = 0.01 this covers
#: magnitudes up to gamma^2300 ≈ 1e19 — beyond double's exact-integer
#: range. Values past the clamp saturate into the edge bucket; the
#: guarantee degrades only there.
DD_MAX_IDX = 2300


def dd_gamma(alpha: float) -> float:
    """The bucket growth factor for a target relative error."""
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"dd alpha must be in (0, 1) (got {alpha})")
    return (1.0 + alpha) / (1.0 - alpha)


def sketch_meta(alpha: float) -> dict:
    """The commit_meta fragment every persisted DD table should carry
    (``CdfAggregateView`` stamps it on each quantile-helper commit):
    the alpha and layout tag :func:`merge_dd_sketches` validates."""
    return {"dd_alpha": float(alpha), "dd_layout": DD_LAYOUT_TAG}


def dd_bucket(value: Column, alpha: float) -> tuple[Column, Column]:
    """``(sign, idx)`` bucket of one value: sign ∈ {-1, 0, +1} (0 =
    the zero bucket, holding |x| < DD_MIN_VALUE), idx = clamped
    ``ceil(log_gamma(|x|))``. Null/NaN values must be filtered by the
    caller (percentiles ignore them, like every SQL aggregate).
    The magnitude is clamped to a finite positive band BEFORE the
    log, so ceil never sees ±Infinity — under ANSI mode that would
    be a long-overflow error, and Spark does not short-circuit the
    unused branch of a ``when``."""
    lg = math.log(dd_gamma(alpha))
    v = value.cast("double")
    mag = F.least(F.greatest(F.abs(v), F.lit(DD_MIN_VALUE)),
                  F.lit(1.7e308))
    idx = F.least(
        F.greatest(F.ceil(F.log(mag) / F.lit(lg)), F.lit(-DD_MAX_IDX)),
        F.lit(DD_MAX_IDX)).cast("int")
    sign = (F.when(F.abs(v) < F.lit(DD_MIN_VALUE), F.lit(0))
            .when(v < 0, F.lit(-1))
            .otherwise(F.lit(1)).cast("smallint"))
    return sign, F.when(sign == 0, F.lit(0)).otherwise(idx)


def dd_sketch_df(df: DataFrame, group_cols: list[str], value: Column,
                 alpha: float, sign_col: str = "_sgn",
                 idx_col: str = "_bkt",
                 cnt_col: str = "_cnt") -> DataFrame:
    """Per-group bucket counts ``(group_cols..., sign, idx, count)``
    for a frame of values — one narrow shuffle on (group, sign, idx),
    counts map-side combined. The canonical sketch of the multiset:
    building it twice, or merging two partial builds, yields
    identical rows."""
    sign, idx = dd_bucket(value, alpha)
    v = value.cast("double")
    return (df.filter(v.isNotNull() & ~F.isnan(v))
            .select(*group_cols, sign.alias(sign_col),
                    idx.alias(idx_col))
            .groupBy(*group_cols, sign_col, idx_col)
            .agg(F.count("*").cast("bigint").alias(cnt_col)))


def _bucket_value(sign_col: str, idx_col: str, alpha: float) -> Column:
    """The midpoint estimate of a bucket: ``sign * 2*gamma^idx /
    (gamma + 1)`` — within alpha of every value the bucket holds."""
    g = dd_gamma(alpha)
    mag = F.lit(2.0 / (g + 1.0)) * F.pow(F.lit(g), F.col(idx_col))
    return (F.when(F.col(sign_col) == 0, F.lit(0.0))
            .otherwise(F.col(sign_col).cast("double") * mag))


def quantile_suffix(q: float) -> str:
    """Stable output-column suffix for a quantile: 0.5 -> ``p50``,
    0.99 -> ``p99``, 0.999 -> ``p99_9``."""
    s = f"{q * 100:g}".replace(".", "_")
    return f"p{s}"


def dd_estimate_df(sketch, group_cols: list[str], alpha: float,
                   qs: list[float], out_prefix: str = "q",
                   sign_col: str = "_sgn", idx_col: str = "_bkt",
                   cnt_col: str = "_cnt") -> DataFrame:
    """Per-group quantile estimates from a sketch frame (or anything
    with a ``read()``): for each q, the midpoint value of the bucket
    containing the rank-``max(1, ceil(q * n))`` item — the same
    discrete-rank convention as the exact ``corpus_token_quantiles``
    oracle, so |estimate - exact| <= alpha * |exact| holds row for
    row. One window pass over the O(buckets) sketch rows per group —
    never over the source data. Output columns:
    ``{out_prefix}_{quantile_suffix(q)}`` (doubles)."""
    from pyspark.sql import Window as W

    df = sketch if isinstance(sketch, DataFrame) else sketch.read()
    if df is None:
        raise ValueError("cannot estimate quantiles from an empty "
                         "sketch")
    df = df.filter(F.col(cnt_col) > 0)
    # true value order across the three stores: negatives descending
    # by idx (more negative magnitude first), then zero, then
    # positives ascending
    order_key = (F.col(sign_col).cast("int") * F.lit(100_000)
                 + F.col(sign_col).cast("int") * F.col(idx_col))
    w = (W.partitionBy(*group_cols).orderBy(order_key)
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    wg = W.partitionBy(*group_cols)
    ranked = (df.withColumn("_cw", F.sum(cnt_col).over(w))
              .withColumn("_n", F.sum(cnt_col).over(wg))
              .withColumn("_bv", _bucket_value(sign_col, idx_col,
                                               alpha)))
    aggs = [F.max("_n").cast("bigint").alias(f"{out_prefix}_n")]
    for q in qs:
        target = F.greatest(F.lit(1),
                            F.ceil(F.lit(float(q)) * F.col("_n")))
        # the FIRST bucket whose cumulative count reaches the target
        # rank: min of _bv over qualifying buckets is exactly it,
        # because _cw is monotone in the value order
        aggs.append(
            F.min(F.when(F.col("_cw") >= target, F.col("_bv")))
            .alias(f"{out_prefix}_{quantile_suffix(q)}"))
    return ranked.groupBy(*group_cols).agg(*aggs)


def merge_dd_sketches(a, b, group_cols: list[str],
                      sign_col: str = "_sgn", idx_col: str = "_bkt",
                      cnt_col: str = "_cnt",
                      alpha: float | None = None) -> DataFrame:
    """MERGE two DD sketches WITHOUT re-scanning either source: sum
    the counts per (group, sign, bucket). EXACT by construction —
    counts are additive over a disjoint union, so
    ``merge(sketch(A), sketch(B)) == sketch(A ⊎ B)`` bucket-for-
    bucket (pinned in ``tests/test_dd_view.py``), hence
    estimate-for-estimate. Accepts register DataFrames, persisted
    ``ParquetUpsertTable`` sketch tables, or ``CdfAggregateView``
    quantile helpers; table-backed sides VALIDATE the ``dd_alpha`` /
    ``dd_layout`` commit_meta stamps (and an explicitly passed
    ``alpha``) — a mismatch raises instead of mixing bucket scales.
    A group present on one side only passes through unchanged. Cost:
    one shuffle over O(buckets × groups) rows, independent of either
    source's size."""
    def _stamp(x, side: str):
        meta_fn = getattr(x, "commit_meta", None)
        meta = (meta_fn() or {}) if callable(meta_fn) else {}
        return (side, getattr(x, "path", side),
                meta.get("dd_alpha"), meta.get("dd_layout"))

    stamps = [_stamp(a, "a"), _stamp(b, "b")]
    if alpha is not None:
        stamps.append(("alpha=", "explicit alpha argument",
                       float(alpha), DD_LAYOUT_TAG))
    known = [s for s in stamps if s[2] is not None]
    if len({s[2] for s in known}) > 1 or \
            len({s[3] for s in known if s[3] is not None}) > 1:
        detail = "; ".join(f"side {s[0]!r} ({s[1]}): alpha={s[2]}, "
                           f"layout={s[3]}" for s in stamps)
        raise ValueError(
            "DD sketch merge alpha/layout mismatch — bucket counts "
            "from different alphas index different value ranges and "
            f"merging them silently skews every quantile: {detail}. "
            "Rebuild one side at the other's alpha, or re-sketch "
            "from source.")

    def _rows(x) -> DataFrame:
        df = x if isinstance(x, DataFrame) else x.read()
        if df is None:
            return None
        return df.select(*group_cols, sign_col, idx_col, cnt_col)

    ra, rb = _rows(a), _rows(b)
    if ra is None and rb is None:
        raise ValueError("both sketch sides are empty — nothing to "
                         "merge")
    both = ra if rb is None else rb if ra is None else \
        ra.unionByName(rb)
    return (both.groupBy(*group_cols, sign_col, idx_col)
            .agg(F.sum(cnt_col).cast("bigint").alias(cnt_col))
            .filter(F.col(cnt_col) != 0))
