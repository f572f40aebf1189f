"""Shared idp-corpus pruning pieces for the ingest-job family
(round 9). All four jobs stamp/prune the corpus the same way; keeping
the rule in one place means a fix (or a recipe change) cannot drift
between copies — the code-review finding that motivated this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aether_firebase_consumer_spark.operators.dedup import id_partition
from aether_firebase_consumer_spark.sinks.upsert import ParquetUpsertTable
from aether_firebase_consumer_spark.streaming.recipe import recipe_guard


def corpus_recipe(idp_parts: int) -> dict:
    """The recipe an idp-partitioned corpus table records: just the
    modulus — rows are raw documents/vectors, so no model state."""
    return {"kind": "idp-corpus", "idp_parts": idp_parts}


def guard_idp_corpus(corpus: ParquetUpsertTable,
                     idp_parts: int | None) -> None:
    """Validate an ingest job's corpus table: partitioning must be
    None or 'idp'; when 'idp', ``idp_parts`` must be set and must
    match the table's recorded recipe (a modulus drift across
    restarts silently breaks the known-id check — an UPDATE would be
    near-dup-gated against its own prior version and dropped)."""
    if corpus.partition_col not in (None, "idp"):
        raise ValueError(
            "corpus must be unpartitioned or partitioned by 'idp' "
            "(id_partition of the id column): probes and the known-id "
            "check prune by idp")
    if corpus.partition_col == "idp":
        if idp_parts is None:
            raise ValueError(
                "corpus is idp-partitioned but idp_parts is unset")
        recipe_guard(corpus.path, corpus_recipe(idp_parts))


def normalize_ids(spark, ids, id_col: str) -> DataFrame:
    """Accept a delete set as a DataFrame (any schema containing
    ``id_col``) or a plain Python list/tuple of ids; return a
    one-column distinct frame named ``id_col``."""
    if isinstance(ids, (list, tuple, set)):
        ids = spark.createDataFrame([(i,) for i in sorted(ids)]) \
            .toDF(id_col)
    return ids.select(id_col).distinct()


def doomed_rows(corpus: ParquetUpsertTable, ids: DataFrame,
                id_col: str, idp_parts: int | None) -> DataFrame | None:
    """Corpus rows whose id appears in ``ids`` — the fetch every
    ``delete(ids)`` needs (embeddings/shingles locate the index rows'
    partitions). Pruned to the ids' OWN idp partitions when the corpus
    is idp-partitioned: a row for id can only live at
    idp=id_partition(id), the pure function its merge stamped, so the
    prune is exact and the scan is ∝ delete set, not corpus. Returns
    None when the corpus doesn't exist yet."""
    existing = corpus.read()
    if existing is None:
        return None
    src = existing
    if corpus.partition_col == "idp" and "idp" in existing.columns:
        idps = [r[0] for r in ids
                .select(id_partition(F.col(id_col), idp_parts)
                        .alias("p"))
                .distinct().collect()]  # ≤ idp_parts values
        src = existing.filter(F.col("idp").isin(idps))
    return src.join(ids, id_col, "left_semi")


def known_ids(corpus: ParquetUpsertTable, existing: DataFrame,
              batch: DataFrame, id_col: str,
              idp_parts: int | None) -> DataFrame:
    """Corpus ids the batch could collide with. With an
    idp-partitioned corpus the scan prunes to the BATCH's own id
    partitions (a batch id can only be 'known' at
    idp=id_partition(id), the pure function its merge stamped) —
    per-trigger known-check I/O ∝ batch, not corpus."""
    src = existing
    if corpus.partition_col == "idp" and "idp" in existing.columns:
        batch_idps = [r[0] for r in batch
                      .select(id_partition(F.col(id_col), idp_parts)
                              .alias("p"))
                      .distinct().collect()]  # ≤ idp_parts values
        src = existing.filter(F.col("idp").isin(batch_idps))
    return src.select(id_col).distinct()
