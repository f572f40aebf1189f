"""Data-layout management: range-clustered writes and small-file
compaction.

At 100 TB the dominant cost of most queries is the scan, and the scan
cost is set by LAYOUT, not by the query: parquet footers carry per-
row-group min/max statistics, and a reader prunes row groups whose
range can't match the predicate — but only if the writer clustered
rows so ranges are narrow and disjoint. A table written in arrival
order has every file spanning the whole key domain and prunes
nothing.

- :func:`write_range_clustered` — ``repartitionByRange`` on the
  cluster keys (one range-shuffle; Spark samples split points) +
  ``sortWithinPartitions`` so every output file covers a narrow,
  near-disjoint key range. Point/range predicates on the cluster key
  then skip whole files via footer stats. This is the single-column
  special case of Z-ordering; for multi-column locality compose with
  an interleaved key expression.
- :func:`cluster_ranges` — reads back each file's per-column min/max
  from the parquet footers (pyarrow, driver-side metadata read only)
  so tests and operators can PROVE prunability instead of asserting
  vibes.
- :func:`compact_small_files` — the maintenance pass every
  streaming-ingested table needs: micro-batches leave K tiny files
  per trigger; compaction rewrites a directory to
  ceil(bytes / target) files. Runs as a normal Spark job (scan +
  round-robin repartition + write); the rewrite is atomic via
  write-to-temp + directory swap.

The reference has no storage layout at all (it writes documents
1-by-1 into Firestore, ``firebase/app/helpers.py:93-114``); these are
the parquet-lake operations that replace that model at scale.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def write_range_clustered(df: DataFrame, path: str, cluster_cols: list[str],
                          num_files: int | None = None) -> None:
    """Write ``df`` as parquet clustered on ``cluster_cols``: one
    range-repartition (shuffle with sampled split points) then a
    partition-local sort — each output file covers a narrow key range,
    so footer min/max stats prune file scans for predicates on the
    cluster key."""
    parts = num_files or df.sparkSession.sparkContext.defaultParallelism
    (df.repartitionByRange(parts, *cluster_cols)
       .sortWithinPartitions(*cluster_cols)
       .write.mode("overwrite").parquet(path))


def zorder_key(df: DataFrame, cols: list[str], bits: int = 8):
    """Z-order (Morton) key expression over numeric columns: each
    column is min/max-normalized into ``2**bits`` buckets (one tiny
    agg job for the bounds — driver-side scalars), then bucket bits
    interleave LSB-first so locality in EVERY input column maps to
    locality in the single sort key. Pure bitwise codegen expressions;
    no UDF, no extra shuffle beyond the caller's range partition.

    Returns (key_column, bounds) where bounds is {col: (min, max)}."""
    from pyspark.sql import functions as F

    n_buckets = (1 << bits) - 1
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__min_{c}"), F.max(c).alias(f"__max_{c}")]
    row = df.agg(*aggs).first()
    bounds = {c: (row[f"__min_{c}"], row[f"__max_{c}"]) for c in cols}

    key = F.lit(0).cast("bigint")
    for ci, c in enumerate(cols):
        lo, hi = bounds[c]
        span = float(hi) - float(lo) or 1.0
        bucket = F.floor(
            (F.col(c).cast("double") - float(lo)) / span * n_buckets
        ).cast("bigint")
        bucket = F.greatest(F.lit(0), F.least(F.lit(n_buckets), bucket))
        for b in range(bits):
            key = key + F.shiftleft(
                F.shiftright(bucket, b).bitwiseAND(F.lit(1)),
                b * len(cols) + ci)
    return key, bounds


def write_zorder_clustered(df: DataFrame, path: str, cols: list[str],
                           num_files: int | None = None,
                           bits: int = 8) -> None:
    """Write ``df`` parquet Z-order-clustered on ``cols``: range-
    partition + sort on the interleaved Morton key, so footer min/max
    stats stay narrow for EVERY clustered column simultaneously —
    multi-column file pruning where single-key range clustering only
    prunes its leading column. Same cost shape as
    :func:`write_range_clustered` (one bounds agg + one range
    shuffle); the standard lakehouse OPTIMIZE ZORDER BY layout."""
    key, _ = zorder_key(df, cols, bits=bits)
    parts = num_files or df.sparkSession.sparkContext.defaultParallelism
    (df.withColumn("__zkey", key)
       .repartitionByRange(parts, "__zkey")
       .sortWithinPartitions("__zkey")
       .drop("__zkey")
       .write.mode("overwrite").parquet(path))


def cluster_ranges(path: str, column: str) -> list[tuple]:
    """Per-file (min, max) of ``column`` from parquet footer metadata —
    a driver-side metadata read (no data pages touched), the same
    stats a reader's row-group pruning uses."""
    import pyarrow.parquet as pq

    ranges = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema == column and col.statistics:
                    s = col.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        if lo is not None:
            ranges.append((lo, hi))
    return ranges


def overlap_fraction(ranges: list[tuple]) -> float:
    """Fraction of file-range pairs that overlap — 0.0 is perfectly
    prunable layout, ~1.0 is arrival-order layout. Diagnostic for
    tests and layout audits."""
    n = len(ranges)
    if n < 2:
        return 0.0
    overlaps = sum(
        1
        for i in range(n)
        for j in range(i + 1, n)
        if ranges[i][0] <= ranges[j][1] and ranges[j][0] <= ranges[i][1])
    return overlaps / (n * (n - 1) / 2)


def compact_small_files(spark: SparkSession, path: str,
                        target_file_bytes: int = 128 * 1024 * 1024) -> int:
    """Rewrite a parquet directory to ~ceil(total_bytes/target) files.
    Returns the new file count. Round-robin repartition (no shuffle
    key) — compaction must not disturb value distribution, only file
    sizes.

    Swap caveat: a plain directory cannot be exchanged atomically on
    POSIX — between the two renames below the table path briefly does
    not exist, so a reader racing the swap can hit file-not-found (a
    retry succeeds; no reader ever sees a HALF-compacted mix). For
    tables with concurrent readers use ``ParquetUpsertTable``, whose
    version-pointer commit (write new dir, atomically repoint
    ``_VERSION``) has no such window."""
    total = sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path) if f.endswith(".parquet"))
    n_files = max(1, math.ceil(total / target_file_bytes))
    tmp = f"{path}__compact_{uuid.uuid4().hex[:8]}"
    spark.read.parquet(path).repartition(n_files) \
        .write.mode("overwrite").parquet(tmp)
    old = f"{path}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
