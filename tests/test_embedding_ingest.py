"""EmbeddingIngestJob: near-dup-gated vector-corpus accumulation with
the persisted band index — the vector twin of test_dedup_ingest."""

from __future__ import annotations

import hashlib
import math

import pytest

from pyspark.sql import functions as F

from aether_firebase_consumer_spark.sinks.upsert import ParquetUpsertTable
from aether_firebase_consumer_spark.streaming.embedding_ingest import (
    EmbeddingIngestJob,
)

DIM = 16


def _vec(i: int) -> list[float]:
    # deterministic, mutually near-orthogonal vectors
    return [int(hashlib.md5(f"v{i}:{j}".encode()).hexdigest()[:8], 16)
            / 2**31 - 1.0 for j in range(DIM)]


def _near(vec: list[float], salt: str, eps: float = 0.05) -> list[float]:
    nrm = math.sqrt(sum(x * x for x in vec))
    return [x + eps * nrm / math.sqrt(DIM)
            * (int(hashlib.md5(f"{salt}:{j}".encode()).hexdigest()[:8],
                   16) / 2**31 - 1.0)
            for j, x in enumerate(vec)]


# 2x4-plane banding MATCHED to these 16-dim vectors (the job's
# default planes are 64-dim; dim mismatch now errors loudly instead of
# zip_with-truncating — a silent data hazard at scale)
from aether_firebase_consumer_spark.functions.vectors import (  # noqa: E402
    hyperplane_signs,
)

_PLANES16 = hyperplane_signs("test-lsh-16", n_planes=8, dim=DIM)
BANDS16 = [_PLANES16[:4], _PLANES16[4:]]


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>")


@pytest.fixture()
def jobs(spark, tmp_path):
    def mk(root, with_index):
        root.mkdir()
        corpus = ParquetUpsertTable(spark, str(root / "c"), ["vec_id"])
        rejects = ParquetUpsertTable(spark, str(root / "r"), ["vec_id"])
        idx = ParquetUpsertTable(spark, str(root / "i"), ["vec_id"]) \
            if with_index else None
        return EmbeddingIngestJob(spark, corpus, rejects,
                                  band_index=idx, threshold=0.9,
                                  bands=BANDS16), \
            corpus, rejects, idx
    return mk


def test_embedding_ingest_index_matches_recompute(spark, tmp_path, jobs):
    """Index-probed and recompute-per-batch jobs produce identical
    corpora, rejects, and counters over batches exercising in-batch
    near-dups, cross-batch near-dups, and updates; the maintained
    index equals a from-scratch recompute of the corpus."""
    from aether_firebase_consumer_spark.plans.similarity_queries import (
        embedding_index_frame,
    )

    job_i, corp_i, rej_i, idx_i = jobs(tmp_path / "a", True)
    job_r, corp_r, rej_r, _ = jobs(tmp_path / "b", False)

    v1, v2, v5 = _vec(1), _vec(2), _vec(5)
    batches = [
        [(1, v1), (2, v2), (3, _near(v1, "n3"))],   # in-batch near-dup
        [(4, _near(v2, "n4")), (5, v5)],            # corpus near-dup
        [(5, _near(v5, "rev", 0.01)), (6, _vec(6))],  # update + fresh
        [(7, _near(v1, "n7"))],                     # dup of indexed 1
    ]
    for n, rows in enumerate(batches):
        job_i.process_batch(_df(spark, rows), n)
        job_r.process_batch(_df(spark, rows), n)

    def snap(t):
        return sorted((r.vec_id, tuple(r.embedding))
                      for r in t.read().collect())

    assert snap(corp_i) == snap(corp_r)
    assert {r.vec_id for r in corp_i.read().collect()} == {1, 2, 5, 6}
    ri = {(r.vec_id, r.dup_of) for r in rej_i.read().collect()}
    assert ri == {(r.vec_id, r.dup_of) for r in rej_r.read().collect()}
    assert ri == {(3, 1), (4, 2), (7, 1)}
    assert job_i.stats == job_r.stats
    # 8 rows in: 3 rejected (3, 4, 7), 5 accepted (1, 2, 5, 5', 6)
    assert job_i.stats == {"batches": 4, "accepted": 5, "rejected": 3}

    want = {(r.vec_id, tuple(r.band_keys))
            for r in embedding_index_frame(
                corp_i.read(), "vec_id", "embedding",
                BANDS16).collect()}
    got = {(r.vec_id, tuple(r.band_keys))
           for r in idx_i.read().collect()}
    assert got == want


def test_embedding_ingest_backfill_and_probe_plan(spark, tmp_path, jobs):
    """Attaching an index to a populated corpus backfills it once; the
    probe's matching plan computes band keys only over the BATCH — the
    corpus side's keys come from the index file (band_keys in a file
    ReadSchema), embeddings fetched per-candidate only."""
    from aether_firebase_consumer_spark.plans.similarity_queries import (
        embedding_probe_index_pairs,
    )

    job0, corpus, _, _ = jobs(tmp_path / "x", False)
    job0.process_batch(_df(spark, [(1, _vec(1)), (2, _vec(2))]), 0)

    idx = ParquetUpsertTable(spark, str(tmp_path / "idx"), ["vec_id"])
    job1 = EmbeddingIngestJob(spark, corpus, band_index=idx,
                              threshold=0.9, bands=BANDS16)
    job1.process_batch(_df(spark, [(5, _vec(5))]), 1)
    assert {r.vec_id for r in idx.read().collect()} == {1, 2, 5}
    # a near-dup of PRE-INDEX vector 1 is caught via the index probe
    job1.process_batch(_df(spark, [(6, _near(_vec(1), "n6"))]), 2)
    assert {r.vec_id for r in corpus.read().collect()} == {1, 2, 5}

    probe = embedding_probe_index_pairs(
        idx.read(), corpus.read(),
        _df(spark, [(9, _near(_vec(2), "n9"))]),
        "vec_id", "embedding", BANDS16, 0.9)
    assert {(r.new_id, r.old_id) for r in probe.collect()} == {(9, 2)}
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "band_keys:array<bigint>" in plan   # index file scanned
    assert str(tmp_path / "idx") in plan
