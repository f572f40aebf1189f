"""Distributed global prefix aggregation.

A window with a global ORDER BY and no PARTITION BY (``SUM(x) OVER
(ORDER BY ts)``) funnels the entire input through ONE task
(``WindowExec: No Partition Defined``) — the scale-killer the round-4
audit flagged in ``window_range_frame`` and the reason a naive global
running sum cannot run at 100 TB. The classic fix is the two-phase
parallel prefix scan (Blelloch):

1. bucket rows by a monotone function of the order key (time buckets,
   id ranges); run the running aggregate LOCALLY within each bucket —
   parallelism = bucket count, one shuffle;
2. aggregate one total per bucket (tiny: #buckets rows) and prefix-sum
   THOSE with a window — the only serialized step, over #buckets rows,
   not the table;
3. final value = bucket carry-in + local running value (one broadcast
   join back, no second pass over the data).

``events_max_concurrency`` inlines this shape; this module is the
reusable form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def global_running_sum(df: DataFrame, order_cols: list[str],
                       value: Column, bucket: Column,
                       out_col: str = "running") -> DataFrame:
    """Exact global running sum of ``value`` in ``order_cols`` order,
    without a single-task global window.

    ``bucket`` must be monotone non-decreasing in the order (e.g.
    ``F.floor(unix_micros(ts) / 3600e6)`` for a (ts, id) order): every
    row of bucket b sorts before every row of bucket b+1. Within a
    bucket, rows order by ``order_cols`` — ties must be broken to a
    total order for a deterministic result (include a unique id).

    Exactness: use a DECIMAL ``value`` for float inputs — the local
    sums and the carry prefix then add exactly in any grouping, so the
    distributed result is bit-identical to the single-sweep form.
    """
    tagged = df.withColumn("_bucket", bucket)
    wloc = (W.partitionBy("_bucket").orderBy(*order_cols)
            .rowsBetween(W.unboundedPreceding, W.currentRow))
    local = tagged.withColumn("_local", F.sum(value).over(wloc))
    totals = tagged.groupBy("_bucket").agg(F.sum(value).alias("_total"))
    # the only global window runs over #buckets rows — bounded and
    # tiny by construction: this single-task step is the POINT of the
    # two-phase scan (the registry sweep bans whole-INPUT unpartitioned
    # windows and carries a named exception for this bounded carry;
    # a constant partition key would not help — Catalyst folds it away)
    wcarry = (W.orderBy("_bucket")
              .rowsBetween(W.unboundedPreceding, -1))
    carry = totals.withColumn(
        "_carry", F.coalesce(F.sum("_total").over(wcarry),
                             F.lit(0).cast("decimal(38,2)")))
    return (local.join(F.broadcast(carry.select("_bucket", "_carry")),
                       "_bucket")
            .withColumn(out_col, F.col("_carry") + F.col("_local"))
            .drop("_bucket", "_local", "_carry"))


def global_running_agg(df: DataFrame, order_cols: list[str],
                       value: Column, bucket: Column, agg: str = "sum",
                       out_col: str = "running") -> DataFrame:
    """:func:`global_running_sum` generalized to any associative +
    commutative aggregate — ``sum`` / ``min`` / ``max``. The carry for
    min/max is the prefix min/max of per-bucket extremes (no zero
    element, so the first bucket's carry is NULL and coalesces to the
    local value)."""
    if agg == "sum":
        return global_running_sum(df, order_cols, value, bucket, out_col)
    if agg not in ("min", "max"):
        raise ValueError(f"agg must be sum|min|max, got {agg!r}")
    fn = F.min if agg == "min" else F.max
    comb = F.least if agg == "min" else F.greatest
    tagged = df.withColumn("_bucket", bucket)
    wloc = (W.partitionBy("_bucket").orderBy(*order_cols)
            .rowsBetween(W.unboundedPreceding, W.currentRow))
    local = tagged.withColumn("_local", fn(value).over(wloc))
    totals = tagged.groupBy("_bucket").agg(fn(value).alias("_total"))
    wcarry = (W.orderBy("_bucket")
              .rowsBetween(W.unboundedPreceding, -1))
    carry = totals.withColumn("_carry", fn("_total").over(wcarry))
    return (local.join(F.broadcast(carry.select("_bucket", "_carry")),
                       "_bucket")
            .withColumn(out_col,
                        F.when(F.col("_carry").isNull(), F.col("_local"))
                        .otherwise(comb(F.col("_carry"), F.col("_local"))))
            .drop("_bucket", "_local", "_carry"))
