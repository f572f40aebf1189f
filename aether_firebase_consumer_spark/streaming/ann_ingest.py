"""Incrementally-maintained ANN index (round 9) — the similarity-
search member of the ingest-job family: each micro-batch of vectors
MERGEs into (a) an idp-partitioned corpus table (exact embeddings for
the re-rank) and (b) a cp-partitioned inverted-file table holding each
vector's coarse IVF cell and residual-PQ codes; :meth:`AnnIndexJob.
topk` then answers queries against the PERSISTED index with every scan
partition-pruned.

This completes the ANN ladder's production story: the batch query
(``similarity_ann_ivfadc``) recomputes the inverted file per run; at
100 TB the inverted file is a TABLE you maintain, not a frame you
rebuild. Index maintenance cost is ∝ batch (one cell+code pass over
the batch, partition-pruned MERGEs); probe cost is ∝ the query set
(cells → a bounded driver-side cp IN-list → PartitionFilters on the
codes scan; shortlisted candidate ids → a bounded idp IN-list →
PartitionFilters on the corpus fetch; the query side broadcasts).

All three IVFADC consumers — the batch query, the persisted variant
(``similarity_ann_ivfadc_pruned``, same DuckDB oracle), and this job —
run the SAME stage helpers (:mod:`..plans.similarity_queries`:
``ivfadc_code_rows`` / ``ivfadc_query_frame`` / ``ivfadc_shortlist`` /
``ivfadc_rerank``), so equivalence is structural, then test-pinned.

An UPDATE (same id, new embedding) is one MERGE into each table: the
codes row is keyed by id, so the vector's (cell, codes) — and, when
the cell moves, its cp partition — are replaced atomically with the
corpus row (:class:`~..sinks.upsert.ParquetUpsertTable` rewrites
partitions holding moved keys).

Reference scope note: the reference system (eHealthAfrica/
aether-firebase-consumer) has no vector search at all; this job is
part of the §2.3 extension surface (SURVEY.md), built on the public
IVFADC structure from Jégou/Douze/Schmid's product-quantization paper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aether_firebase_consumer_spark.operators.dedup import id_partition
from aether_firebase_consumer_spark.plans.similarity_queries import (
    ivfadc_code_rows,
    ivfadc_query_frame,
    ivfadc_rerank,
    ivfadc_shortlist,
)
from aether_firebase_consumer_spark.sinks.upsert import ParquetUpsertTable
from aether_firebase_consumer_spark.streaming.cdc import CdcIngest
from aether_firebase_consumer_spark.streaming.pruning import (
    doomed_rows,
    normalize_ids,
)
from aether_firebase_consumer_spark.streaming.recipe import (
    model_fingerprint,
    recipe_begin,
    recipe_commit,
    recipe_guard,
)


class AnnIndexJob(CdcIngest):
    """foreachBatch handler + query API for a persisted IVFADC index.

    Unlike the dedup-family jobs this one GATES nothing: an ANN index
    accumulates every vector (dropDuplicates within the batch; an id
    seen again is an UPDATE). ``corpus`` must be idp-partitioned
    (exact re-rank fetch prunes by candidate ids), ``codes``
    cp-partitioned (probe prunes by query cells)."""

    def __init__(self, spark: SparkSession, corpus: ParquetUpsertTable,
                 codes: ParquetUpsertTable,
                 centroids: list[list[float]],
                 books: list[list[list[float]]],
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 n_parts: int = 16, idp_parts: int = 8) -> None:
        if codes.partition_col != "cp":
            raise ValueError(
                "codes must be partitioned by 'cp' (cell % n_parts) — "
                "an unpartitioned inverted file re-scans every cell "
                "per probe, the exact I/O shape it exists to avoid")
        if corpus.partition_col != "idp":
            raise ValueError(
                "corpus must be partitioned by 'idp' (id_partition of "
                "the id column): the re-rank fetches only candidate "
                "partitions")
        self.spark = spark
        self.corpus = corpus
        self.codes = codes
        self.centroids = centroids
        self.books = books
        self.id_col, self.vec_col = id_col, vec_col
        self.n_parts, self.idp_parts = n_parts, idp_parts
        # fail loudly if this job's derivation parameters differ from
        # what the table was built with — a silent mismatch (different
        # n_parts, retrained centroids) would MISS candidates, not err
        recipe_guard(codes.path, self._recipe())
        #: cumulative driver-side counters
        self.stats = {"batches": 0, "indexed": 0, "deleted": 0}

    def _recipe(self) -> dict:
        return {"kind": "ivfadc", "n_parts": self.n_parts,
                "idp_parts": self.idp_parts,
                "model_fp": model_fingerprint(self.centroids,
                                              self.books)}

    # -- maintenance -----------------------------------------------------

    def code_rows(self, df: DataFrame) -> DataFrame:
        """The persisted inverted-file shape: one (id, cell, codes, cp)
        row per vector — pure codegen function of the row, zero
        shuffle."""
        return ivfadc_code_rows(df, self.centroids, self.books,
                                self.id_col, self.vec_col,
                                n_parts=self.n_parts)

    def process_batch(self, batch: DataFrame, epoch_id: int) -> None:
        batch = batch.dropDuplicates([self.id_col]).localCheckpoint()
        n = batch.count()
        self.stats["batches"] += 1
        self.stats["indexed"] += n
        if n == 0:
            return
        self.corpus.merge(batch.withColumn(
            "idp", id_partition(F.col(self.id_col), self.idp_parts)))
        self.codes.merge(self.code_rows(batch))

    def writer(self, stream: DataFrame, checkpoint: str):
        return (stream.writeStream
                .foreachBatch(self.process_batch)
                .option("checkpointLocation", checkpoint))

    def delete(self, ids) -> int:
        """Delete vectors by id from BOTH persisted tables (round 10,
        VERDICT r9 item 1) — the takedown/retention dual of the MERGE
        ingest: a removed vector must stop serving as a neighbor, not
        linger as a ghost in the codes table. ``ids`` is a DataFrame
        carrying ``id_col`` or a plain list of ids. Returns the number
        of vectors actually removed.

        Both deletes are partition-pruned: the doomed rows' embeddings
        are fetched from the corpus (idp IN-list) to recompute their
        cells, locating the codes rows' cp partitions — the same pure
        function the ingest stamped, so the prune is exact. Order is
        codes FIRST: once those rows are gone the vector can never be
        shortlisted, so a crash between the two ``delete_keys`` calls
        leaves only an invisible corpus ghost (never a served
        neighbor); re-running the delete clears it."""
        ids1 = normalize_ids(self.spark, ids, self.id_col)
        doomed = doomed_rows(self.corpus, ids1, self.id_col,
                             self.idp_parts)
        if doomed is None:
            return 0
        # referenced three times: count, codes keys, corpus keys
        doomed = doomed.localCheckpoint()
        n = doomed.count()
        if n == 0:
            return 0
        self.codes.delete_keys(
            self.code_rows(doomed).select(self.id_col, "cp"))
        self.corpus.delete_keys(doomed.select(self.id_col, "idp"))
        self.stats["deleted"] += n
        return n

    def reconcile(self) -> dict:
        """Repair corpus/codes divergence after a crash between the
        two MERGEs (ingest) or the two deletes (round 10) — the
        explicit form of "re-running clears it": vectors present in
        the corpus but missing from the codes table are re-encoded and
        merged (they were invisible to probes); codes rows whose
        vector left the corpus are deleted (they burned shortlist
        slots for nothing). Idempotent; run between triggers. Returns
        ``{"re_encoded": n, "orphans_dropped": n}``.

        Cost: one column-pruned id anti-join in each direction — a
        scheduled maintenance scan, not a per-trigger cost (the jobs'
        write ORDER makes divergence a crash-only state)."""
        corpus = self.corpus.read()
        codes = self.codes.read()
        out = {"re_encoded": 0, "orphans_dropped": 0}
        if corpus is None and codes is None:
            return out
        if corpus is None:
            n = codes.count()
            if n:
                self.codes.delete_keys(codes.select(self.id_col, "cp"))
                out["orphans_dropped"] = n
            return out
        missing = corpus if codes is None else corpus.join(
            codes.select(self.id_col), self.id_col, "left_anti")
        missing = missing.localCheckpoint()
        n_miss = missing.count()
        if n_miss:
            self.codes.merge(self.code_rows(missing))
            out["re_encoded"] = n_miss
        if codes is not None:
            orphans = (codes.select(self.id_col, "cp")
                       .join(corpus.select(self.id_col),
                             self.id_col, "left_anti")
                       .localCheckpoint())
            n_orp = orphans.count()
            if n_orp:
                self.codes.delete_keys(orphans)
                out["orphans_dropped"] = n_orp
        return out

    def rebuild(self, centroids: list[list[float]] | None = None,
                books: list[list[list[float]]] | None = None,
                n_parts: int | None = None) -> None:
        """Migrate the index to a refreshed model (retrained
        centroids/codebooks) or a new partition modulus: re-encode the
        whole corpus and swap the codes table in ONE atomic version
        commit, updating the recorded recipe in the same step — the
        scheduled-maintenance path for 'the embedding model changed'
        or 'the index outgrew its partition count'. Run between
        triggers: a batch must be assigned with the same model the
        index it probes was built with."""
        if centroids is not None:
            self.centroids = centroids
        if books is not None:
            self.books = books
        if n_parts is not None:
            if n_parts < 1:
                raise ValueError("n_parts must be >= 1")
            self.n_parts = n_parts
        # crash-safe choreography: stage the new recipe, rebuild,
        # commit — a crash in either window leaves the .next marker
        # and every later attach fails loudly (recipe.py)
        recipe_begin(self.codes.path, self._recipe())
        corpus = self.corpus.read()
        if corpus is not None and self.codes.read() is not None:
            self.codes.replace(self.code_rows(corpus))
        recipe_commit(self.codes.path)

    # -- queries ---------------------------------------------------------

    def _empty_result(self, queries: DataFrame) -> DataFrame:
        id_t = dict(queries.dtypes)[self.id_col]
        return self.spark.createDataFrame(
            [], f"query_id {id_t}, neighbor_id {id_t}, cos_sim double")

    def topk(self, queries: DataFrame, k: int = 5,
             shortlist: int = 50,
             materialize: bool = True) -> DataFrame:
        """Top-k cosine neighbors per query vector against the
        persisted index: ``(query_id, neighbor_id, cos_sim)``.

        ``queries`` carries (id_col, vec_col); a query id equal to an
        indexed id never matches itself (same rule as the batch
        query). ``materialize=False`` keeps the lazy lineage — both
        pruned scans visible to plan tests — at the cost of
        re-deriving the twice-referenced frames."""
        inv_full = self.codes.read()
        corpus = self.corpus.read()
        if inv_full is None or corpus is None:
            return self._empty_result(queries)
        q = ivfadc_query_frame(queries, self.centroids, self.books,
                               self.id_col, self.vec_col)
        if materialize:
            # referenced twice: the cp collect and the shortlist join
            q = q.localCheckpoint()
        cps = [r[0] for r in
               q.select(F.pmod(F.col("cell"), F.lit(self.n_parts))
                        .cast("int").alias("p")).distinct().collect()]
        if not cps:
            return self._empty_result(queries)
        inv = inv_full.filter(F.col("cp").isin(cps))
        sl = ivfadc_shortlist(inv, q, self.books, shortlist,
                              id_col=self.id_col)
        if materialize:
            # referenced twice: the idp collect and the re-rank join
            sl = sl.localCheckpoint()
        idps = [r[0] for r in
                sl.select(id_partition(F.col("neighbor_id"),
                                       self.idp_parts).alias("p"))
                .distinct().collect()]  # bounded by idp_parts
        if not idps:
            return self._empty_result(queries)
        q_emb = queries.select(
            F.col(self.id_col).alias("query_id"),
            F.col(self.vec_col).alias("q_emb"))
        n_emb = (corpus.filter(F.col("idp").isin(idps))
                 .select(F.col(self.id_col).alias("neighbor_id"),
                         F.col(self.vec_col).alias("n_emb")))
        return ivfadc_rerank(sl, q_emb, n_emb, topk=k)
