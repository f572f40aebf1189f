"""Streaming corpus ingestion with incremental near-dup rejection.

The streaming face of :func:`~.operators.dedup.lsh_incremental_pairs`:
each micro-batch of documents is deduplicated (a) within itself —
exact id + near-dup, keep-smallest-id — and (b) against the corpus
accumulated so far, then the survivors MERGE into the corpus table.
This is how a 100 TB training corpus actually grows: the corpus is
never self-joined; every trigger pays cost proportional to the batch,
probing the corpus's band index.

Scale posture — with ``band_index`` set (the production shape), the
LSH band index ``(id, sh, band_keys)`` is itself a second
incrementally-maintained :class:`~..sinks.upsert.ParquetUpsertTable`:
survivors merge their index rows at ingest time, and each batch
PROBES the persisted index (:func:`~.operators.dedup.
lsh_probe_index_pairs`) instead of re-shingling the accumulated
corpus — per-batch work is shingle+hash the batch, one equi-join into
the index, and a candidate-only verify, independent of corpus size.
Without ``band_index`` the job falls back to recomputing the corpus
band frame per batch (correct, simple, fine for small corpora); the
rejection semantics are identical either way and test-pinned.

Rejected documents are not dropped silently: each batch can append a
(doc_id, dup_of, jaccard, epoch) audit row set to a rejection log —
the keep/reason artifact ``dedup_pipeline_keep`` produces in batch
form, maintained incrementally. ``dup_of`` and ``jaccard`` come from
the SAME matched pair (the best match: max jaccard, ties to the
smallest winner id — ``dedup_incremental_lsh``'s rule), never mixed
across matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from aether_firebase_consumer_spark.operators.dedup import (
    lsh_candidate_pairs,
    lsh_incremental_pairs,
    lsh_index_frame,
    lsh_probe_index_pairs,
)
from aether_firebase_consumer_spark.sinks.upsert import ParquetUpsertTable


class DedupIngestJob:
    """foreachBatch handler: near-dup-gated corpus accumulation.

    ``band_index`` (optional but recommended): a second upsert table
    keyed by ``id_col`` holding each corpus doc's shingle set and LSH
    band keys. When present, cross-batch matching probes this table —
    cost ∝ batch — and the job maintains it: survivors upsert their
    rows after every merge; a doc UPDATEd to empty text gets an
    empty-array tombstone row (explodes to zero band keys, so probes
    skip it — same semantics as the recompute path, where empty docs
    drop out of the band frame). Attaching an index to an already-
    populated corpus backfills it from the full corpus ONCE on the
    next batch.
    """

    def __init__(self, spark: SparkSession, corpus: ParquetUpsertTable,
                 rejects: ParquetUpsertTable | None = None,
                 band_index: ParquetUpsertTable | None = None,
                 id_col: str = "doc_id", text_col: str = "text",
                 threshold: float = 0.5, k: int = 8, bands: int = 4) -> None:
        self.spark = spark
        self.corpus = corpus
        self.rejects = rejects
        self.band_index = band_index
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
        # ONE matched pair per loser — best match first (max jaccard,
        # ties to smallest winner id) — so dup_of and jaccard always
        # describe the same pair, not a min(winner)/max(jaccard) mix
        w = W.partitionBy(loser_col).orderBy(F.desc("jaccard"),
                                             F.asc(winner_col))
        best = (matches.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1))
        self.rejects.merge(
            best.select(F.col(loser_col).alias(self.id_col),
                        F.col(winner_col).alias("dup_of"), "jaccard",
                        F.lit(epoch_id).alias("epoch")))

    def _index_rows(self, docs: DataFrame) -> DataFrame:
        """Index rows for ``docs``, including empty-array tombstones
        for docs whose text yields no shingles (an UPDATE to empty
        text must overwrite the stale keys of the previous version)."""
        idx = lsh_index_frame(docs, self.id_col, self.text_col,
                              k=self.k, bands=self.bands)
        empty_arr = F.array().cast("array<string>")
        blanks = (docs.select(self.id_col)
                  .join(idx.select(self.id_col), self.id_col, "left_anti")
                  .select(self.id_col, empty_arr.alias("sh"),
                          empty_arr.alias("band_keys")))
        return idx.unionByName(blanks)

    def process_batch(self, batch: DataFrame, epoch_id: int) -> None:
        batch = batch.dropDuplicates([self.id_col])
        # in-batch near-dups: id_a < id_b by construction → dropping
        # every id_b keeps the smallest id of each near-dup group.
        # localCheckpoint: the candidate join runs ONCE — the result
        # feeds the audit log, the loser anti-join, and (via survivors)
        # the counters and merge, all from the materialized frame.
        in_pairs = lsh_candidate_pairs(batch, self.id_col, self.text_col,
                                       k=self.k, bands=self.bands) \
            .filter(F.col("jaccard") >= self.threshold).localCheckpoint()
        self._log_rejects(in_pairs, "id_b", "id_a", epoch_id)
        losers = in_pairs.select(F.col("id_b").alias(self.id_col)).distinct()
        survivors = batch.join(losers, self.id_col, "left_anti")

        existing = self.corpus.read()
        had_index = False
        if existing is not None:
            # an id the corpus already holds is a re-delivery or an
            # UPDATE of that document — it merges directly and must not
            # be near-dup-gated (it would match its own prior version)
            known = existing.select(self.id_col).distinct()
            fresh = survivors.join(known, self.id_col, "left_anti")
            index = self.band_index.read() \
                if self.band_index is not None else None
            if index is not None:
                had_index = True
                matches = lsh_probe_index_pairs(
                    index, fresh, self.id_col, self.text_col,
                    k=self.k, bands=self.bands, threshold=self.threshold)
            else:
                matches = lsh_incremental_pairs(
                    existing, fresh, self.id_col, self.text_col,
                    k=self.k, bands=self.bands, threshold=self.threshold)
            matches = matches.localCheckpoint()
            self._log_rejects(matches, "new_id", "old_id", epoch_id)
            dup_ids = matches.select(
                F.col("new_id").alias(self.id_col)).distinct()
            accepted_fresh = fresh.join(dup_ids, self.id_col, "left_anti")
            updates = survivors.join(known, self.id_col, "left_semi")
            survivors = updates.unionByName(accepted_fresh)
        # one materialization of the survivor plan: counters and the
        # corpus/index merges all read the checkpointed result instead
        # of re-running the LSH joins (3× in the pre-r6 shape)
        survivors = survivors.localCheckpoint()
        n_in = batch.count()
        n_kept = survivors.count()
        self.stats["batches"] += 1
        self.stats["accepted"] += n_kept
        self.stats["rejected"] += n_in - n_kept
        self.corpus.merge(survivors)
        if self.band_index is not None:
            if had_index:
                self.band_index.merge(self._index_rows(survivors))
            else:
                # first sight of the index table: backfill from the
                # full (just-merged) corpus so probes see every doc —
                # a one-time cost, after which maintenance is ∝ batch
                self.band_index.merge(self._index_rows(self.corpus.read()))

    def writer(self, stream: DataFrame, checkpoint: str):
        return (stream.writeStream
                .foreachBatch(self.process_batch)
                .option("checkpointLocation", checkpoint)
                .outputMode("update"))
