"""Streaming corpus ingestion with incremental near-dup rejection.

The streaming face of :func:`~.operators.dedup.lsh_incremental_pairs`:
each micro-batch of documents is deduplicated (a) within itself —
exact id + near-dup, keep-smallest-id — and (b) against the corpus
accumulated so far, then the survivors MERGE into the corpus table.
This is how a 100 TB training corpus actually grows: the corpus is
never self-joined; every trigger pays cost proportional to the batch,
probing the corpus's band index.

Scale posture: ``lsh_incremental_pairs`` recomputes the corpus-side
band frame from the corpus table per batch here (correct, simple); at
real scale the band index ``(id, band_key)`` is itself a second
incrementally-maintained table — survivors append their band keys, so
the probe side is a bucketed scan, not a recompute. The structure of
this job (reject → merge survivors) is identical either way; the
docstring of the operator carries the same note.

Rejected documents are not dropped silently: each batch can append a
(doc_id, dup_of, jaccard, epoch) audit row set to a rejection log —
the keep/reason artifact ``dedup_pipeline_keep`` produces in batch
form, maintained incrementally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aether_firebase_consumer_spark.operators.dedup import (
    lsh_candidate_pairs,
    lsh_incremental_pairs,
)
from aether_firebase_consumer_spark.sinks.upsert import ParquetUpsertTable


class DedupIngestJob:
    """foreachBatch handler: near-dup-gated corpus accumulation."""

    def __init__(self, spark: SparkSession, corpus: ParquetUpsertTable,
                 rejects: ParquetUpsertTable | None = None,
                 id_col: str = "doc_id", text_col: str = "text",
                 threshold: float = 0.5, k: int = 8, bands: int = 4) -> None:
        self.spark = spark
        self.corpus = corpus
        self.rejects = rejects
        self.id_col, self.text_col = id_col, text_col
        self.threshold, self.k, self.bands = threshold, k, bands
        #: cumulative counters (driver-side, tiny): batches processed,
        #: docs accepted into the corpus, docs rejected as near-dups —
        #: the processed/suppressed tallies the reference's report
        #: counter hand-maintains, fed from the batch plans' own counts
        self.stats = {"batches": 0, "accepted": 0, "rejected": 0}

    def _log_rejects(self, matches: DataFrame, loser_col: str,
                     winner_col: str, epoch_id: int) -> None:
        if self.rejects is None:
            return
        best = matches.groupBy(loser_col).agg(
            F.min(winner_col).alias("dup_of"),
            F.max("jaccard").alias("jaccard"))
        self.rejects.merge(
            best.select(F.col(loser_col).alias(self.id_col),
                        "dup_of", "jaccard",
                        F.lit(epoch_id).alias("epoch")))

    def process_batch(self, batch: DataFrame, epoch_id: int) -> None:
        batch = batch.dropDuplicates([self.id_col])
        # in-batch near-dups: id_a < id_b by construction → dropping
        # every id_b keeps the smallest id of each near-dup group
        in_pairs = lsh_candidate_pairs(batch, self.id_col, self.text_col,
                                       k=self.k, bands=self.bands) \
            .filter(F.col("jaccard") >= self.threshold)
        self._log_rejects(in_pairs, "id_b", "id_a", epoch_id)
        losers = in_pairs.select(F.col("id_b").alias(self.id_col)).distinct()
        survivors = batch.join(losers, self.id_col, "left_anti")

        existing = self.corpus.read()
        if existing is not None:
            # an id the corpus already holds is a re-delivery or an
            # UPDATE of that document — it merges directly and must not
            # be near-dup-gated (it would match its own prior version)
            known = existing.select(self.id_col).distinct()
            fresh = survivors.join(known, self.id_col, "left_anti")
            matches = lsh_incremental_pairs(
                existing, fresh, self.id_col, self.text_col,
                k=self.k, bands=self.bands, threshold=self.threshold)
            self._log_rejects(matches, "new_id", "old_id", epoch_id)
            dup_ids = matches.select(
                F.col("new_id").alias(self.id_col)).distinct()
            accepted_fresh = fresh.join(dup_ids, self.id_col, "left_anti")
            updates = survivors.join(known, self.id_col, "left_semi")
            survivors = updates.unionByName(accepted_fresh)
        n_in = batch.count()
        n_kept = survivors.count()
        self.stats["batches"] += 1
        self.stats["accepted"] += n_kept
        self.stats["rejected"] += n_in - n_kept
        self.corpus.merge(survivors)

    def writer(self, stream: DataFrame, checkpoint: str):
        return (stream.writeStream
                .foreachBatch(self.process_batch)
                .option("checkpointLocation", checkpoint)
                .outputMode("update"))
