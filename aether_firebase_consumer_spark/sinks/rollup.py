"""Incremental aggregate maintenance: a keyed rollup table kept
up-to-date by micro-batch deltas instead of full recomputes.

The reference consumer forwards raw documents only; any aggregate view
of them is recomputed downstream from scratch. At 100 TB a full
recompute per refresh is the difference between minutes and seconds —
the standard warehouse answer is an incrementally-maintained
materialized aggregate: each micro-batch reduces to per-key partial
aggregates (count / sum / min / max — the commutative-associative
set), which fold additively into the stored rollup.

Scale shape:

- The micro-batch reduces map-side BEFORE any state is touched: the
  delta is |distinct keys in batch| rows, not |batch| rows.
- The fold touches only keys present in the delta (outer-join +
  coalesce); WITH ``partition_col`` configured the merge inherits the
  upsert sink's partition pruning (O(delta ∩ partitions) per refresh);
  without it each fold rewrites the table — configure it at scale.
- avg is derived (sum/count) at read time, never stored — storing it
  would break additivity.

Used from Structured Streaming via ``foreachBatch`` (exactly-once per
epoch with the checkpoint, same contract as
``streaming/pipeline.py``), or called directly in batch backfills.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aether_firebase_consumer_spark.sinks.upsert import ParquetUpsertTable

#: Supported additive aggregates: name -> (delta expr builder, fold fn).
_FOLDS = {
    "count": lambda old, new: old + new,
    "sum": lambda old, new: old + new,
    "min": lambda old, new: F.least(old, new),
    "max": lambda old, new: F.greatest(old, new),
}


class IncrementalRollup:
    """A per-key aggregate table maintained by additive micro-batch
    deltas.

    ``specs`` maps output column -> ("count"|"sum"|"min"|"max",
    value_col); value_col is ignored for count. All stored measures
    are commutative-associative, so the maintained table equals the
    full recompute for any batch arrival order / grouping — the
    invariant the test suite asserts.
    """

    def __init__(self, spark: SparkSession, path: str, key_cols: list[str],
                 specs: dict[str, tuple[str, str | None]],
                 partition_col: str | None = None):
        for name, (kind, _col) in specs.items():
            if kind not in _FOLDS:
                raise ValueError(f"unsupported aggregate {kind!r} for {name!r}")
        self.spark = spark
        self.key_cols = key_cols
        self.specs = specs
        # partition_col (a LOW-cardinality member of key_cols, e.g. a
        # date or tenant column) turns each fold's merge into a
        # partition-pruned rewrite; without it the merge rewrites the
        # whole rollup per batch — fine for small rollups, configure
        # it for big ones
        self.table = ParquetUpsertTable(spark, path, key_cols,
                                        partition_col=partition_col)

    # -- delta ----------------------------------------------------------
    def _delta(self, batch: DataFrame) -> DataFrame:
        aggs = []
        for name, (kind, col) in self.specs.items():
            if kind == "count":
                aggs.append(F.count("*").cast("bigint").alias(name))
            elif kind == "sum":
                aggs.append(F.sum(col).alias(name))
            elif kind == "min":
                aggs.append(F.min(col).alias(name))
            else:
                aggs.append(F.max(col).alias(name))
        return batch.groupBy(*self.key_cols).agg(*aggs)

    # -- update ---------------------------------------------------------
    def update(self, batch: DataFrame, epoch_id: int | None = None) -> None:
        """Fold one micro-batch into the rollup: reduce to per-key
        partials, outer-join against current state restricted to the
        delta's keys, fold, MERGE.

        ``epoch_id`` (the foreachBatch batch id) makes the fold
        REPLAY-SAFE: folds are additive, not idempotent, so a crash
        after the merge commits but before the streaming checkpoint
        commits would re-deliver the same epoch and double-count it.
        The epoch is written as the merge's ``commit_meta`` — visible
        atomically with the folded data via the version-pointer swap —
        and a re-delivered epoch <= the last committed one is skipped.
        This is the standard idempotent-foreachBatch fencing pattern,
        done with an atomic tag instead of a racy side file. Caveat:
        batch ids are scoped to ONE checkpoint lineage — pointing a
        FRESH checkpoint at an existing rollup table would start over
        at epoch 0 and fence everything out; new lineage, new table
        (or pass ``epoch_id=None`` for non-streaming backfills)."""
        if epoch_id is not None:
            meta = self.table.commit_meta()
            if meta is not None and meta.get("epoch") is not None \
                    and epoch_id <= meta["epoch"]:
                return  # replayed epoch: already folded in
        commit_meta = None if epoch_id is None else {"epoch": epoch_id}
        delta = self._delta(batch)
        current = self.table.read()
        if current is None:
            self.table.merge(delta, commit_meta=commit_meta)
            return
        # only keys touched by this batch participate in the fold; the
        # rest of the table is untouched (and partition-pruned by merge)
        d = delta.alias("d")
        c = current.alias("c")
        on = [F.col(f"d.{k}") == F.col(f"c.{k}") for k in self.key_cols]
        folded_cols = [F.col(f"d.{k}").alias(k) for k in self.key_cols]
        for name, (kind, _col) in self.specs.items():
            old, new = F.col(f"c.{name}"), F.col(f"d.{name}")
            fold = _FOLDS[kind](old, new)
            # guard BOTH sides: an all-NULL value_col batch for an
            # existing key yields a NULL sum delta — old + NULL would
            # store NULL and silently reset the accumulator next batch
            folded_cols.append(
                F.when(new.isNull(), old)
                .when(old.isNull(), new)
                .otherwise(fold).alias(name))
        folded = d.join(c, on, "left").select(*folded_cols)
        self.table.merge(folded, commit_meta=commit_meta)

    def foreach_batch_writer(self):
        """Adapter for ``writeStream.foreachBatch`` — exactly-once per
        epoch: the checkpoint dedupes planned batches, and the epoch
        fence in :meth:`update` dedupes crash-replayed ones."""
        def write(batch_df: DataFrame, epoch_id: int) -> None:
            self.update(batch_df, epoch_id=epoch_id)
        return write

    # -- read -----------------------------------------------------------
    def read(self) -> DataFrame | None:
        return self.table.read()
