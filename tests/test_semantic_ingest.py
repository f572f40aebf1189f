"""SemanticIngestJob: SemDeDup-gated corpus accumulation with the
persisted (cluster, sub, cp) cell index — the semantic member of the
ingest-job family (test_dedup_ingest / test_embedding_ingest are the
band-index twins)."""

from __future__ import annotations

import hashlib
import math

import pytest

from pyspark.sql import functions as F

from aether_firebase_consumer_spark.functions.vectors import ivf_centroids
from aether_firebase_consumer_spark.sinks.upsert import ParquetUpsertTable
from aether_firebase_consumer_spark.streaming.semantic_ingest import (
    SemanticIngestJob,
)

DIM = 16
CENTS = ivf_centroids("test-sem-16", 4, DIM)


def _vec(i: int) -> list[float]:
    return [int(hashlib.md5(f"v{i}:{j}".encode()).hexdigest()[:8], 16)
            / 2**31 - 1.0 for j in range(DIM)]


def _near(vec: list[float], salt: str, eps: float = 0.05) -> list[float]:
    nrm = math.sqrt(sum(x * x for x in vec))
    return [x + eps * nrm / math.sqrt(DIM)
            * (int(hashlib.md5(f"{salt}:{j}".encode()).hexdigest()[:8],
                   16) / 2**31 - 1.0)
            for j, x in enumerate(vec)]


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>")


def _mk_job(spark, root, with_index: bool, n_sub: int = 1):
    root.mkdir()
    corpus = ParquetUpsertTable(spark, str(root / "c"), ["vec_id"])
    rejects = ParquetUpsertTable(spark, str(root / "r"), ["vec_id"])
    idx = ParquetUpsertTable(spark, str(root / "i"), ["vec_id"],
                             partition_col="cp") if with_index else None
    return SemanticIngestJob(spark, corpus, rejects, cluster_index=idx,
                             centroids=CENTS, threshold=0.9,
                             n_sub=n_sub, n_parts=4)


def test_index_requires_cp_partitioning(spark, tmp_path):
    flat = ParquetUpsertTable(spark, str(tmp_path / "i"), ["vec_id"])
    with pytest.raises(ValueError, match="partitioned by 'cp'"):
        SemanticIngestJob(spark, flat, cluster_index=flat)


def test_semantic_gate_and_audit(spark, tmp_path):
    """Core semantics: in-batch near-dups keep the smallest id,
    cross-batch near-dups are rejected against the corpus, audit rows
    carry the best match, and vectors in a DIFFERENT cell are never
    compared (a near-dup of nothing lands even at cosine 1.0 with
    itself-elsewhere)."""
    job = _mk_job(spark, tmp_path / "j", with_index=True)
    v1, v2 = _vec(1), _vec(2)
    job.process_batch(_df(spark, [
        (1, v1), (2, v2), (3, _near(v1, "n3"))]), 0)
    got = {r.vec_id for r in job.corpus.read().collect()}
    assert got == {1, 2}
    job.process_batch(_df(spark, [
        (4, _near(v2, "n4")), (5, _vec(5))]), 1)
    got = {r.vec_id for r in job.corpus.read().collect()}
    assert got == {1, 2, 5}
    rej = {(r.vec_id, r.dup_of) for r in job.rejects.read().collect()}
    assert rej == {(3, 1), (4, 2)}
    assert job.stats == {"batches": 2, "accepted": 3, "rejected": 2}
    # index rows mirror the corpus exactly (one row per vector)
    idx = {(r.vec_id, r.cluster, r.sub, r.cp)
           for r in job.cluster_index.read().collect()}
    want = {(r.vec_id, r.cluster, r.sub, r.cp)
            for r in job.index_rows(job.corpus.read()).collect()}
    assert idx == want


def test_index_vs_recompute_equivalence(spark, tmp_path):
    """The done-criterion pin: the persisted-index job and the
    recompute-per-batch job accept/reject IDENTICALLY across batches
    including updates that move a vector to a different cell."""
    ji = _mk_job(spark, tmp_path / "ji", with_index=True)
    jr = _mk_job(spark, tmp_path / "jr", with_index=False)
    v1, v2, v5 = _vec(1), _vec(2), _vec(5)
    batches = [
        [(1, v1), (2, v2), (3, _near(v1, "n3"))],
        [(4, _near(v2, "n4")), (5, v5), (6, _vec(6))],
        # UPDATE vector 5 to a different direction entirely
        [(5, _vec(55)), (7, _near(_vec(55), "n7"))],
        # 8 near-dups 5's OLD vector — accepted iff the index
        # reflects the update (stale cell row would reject it)
        [(8, _near(v5, "n8"))],
    ]
    for n, rows in enumerate(batches):
        ji.process_batch(_df(spark, rows), n)
        jr.process_batch(_df(spark, rows), n)

    def snap(c):
        return sorted((r.vec_id, tuple(r.embedding))
                      for r in c.read().collect())

    assert snap(ji.corpus) == snap(jr.corpus)
    assert {(r.vec_id, r.dup_of) for r in ji.rejects.read().collect()} \
        == {(r.vec_id, r.dup_of) for r in jr.rejects.read().collect()}
    assert ji.stats == jr.stats
    ids = {r.vec_id for r in ji.corpus.read().collect()}
    assert 5 in ids and 8 in ids and 7 not in ids


def test_backfill_on_late_index_attach(spark, tmp_path):
    """Attaching a cluster_index to an already-populated corpus
    backfills every existing vector's cell row on the next batch."""
    root = tmp_path / "j"
    job = _mk_job(spark, root, with_index=False)
    job.process_batch(_df(spark, [(1, _vec(1)), (2, _vec(2))]), 0)
    idx = ParquetUpsertTable(spark, str(root / "i2"), ["vec_id"],
                             partition_col="cp")
    job.cluster_index = idx
    job.process_batch(_df(spark, [(3, _vec(3))]), 1)
    got = {r.vec_id for r in idx.read().collect()}
    assert got == {1, 2, 3}


def test_probe_prunes_index_partitions(spark, tmp_path):
    """The production I/O shape: the probe's index scan carries real
    parquet PartitionFilters on cp — per-trigger index reads are
    bounded by the batch's own clusters, not the corpus."""
    job = _mk_job(spark, tmp_path / "j", with_index=True)
    job.process_batch(_df(spark, [(i, _vec(i))
                                  for i in range(1, 9)]), 0)
    index = job.cluster_index.read()
    existing = job.corpus.read()
    fresh = job._assign(_df(spark, [(100, _vec(100))]))
    pairs = job._probe_pairs(index, existing, fresh)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # the filter is non-empty: cp IN (...) reached the scan
    import re
    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan).group(1)
    assert "cp" in pf


def test_semantic_ingest_under_job_manager_lifecycle(spark, tmp_path):
    """Lifecycle parity with the band-index twins: managed as a
    SparkJob, pause mid-corpus, feed more data, resume — checkpoint
    continues exactly, semantics hold across the pause, and the index
    stays consistent with the corpus."""
    from aether_firebase_consumer_spark.control.jobs import (
        JobManager,
        JobStatus,
    )

    src = tmp_path / "src"
    src.mkdir()
    root = tmp_path / "t"
    root.mkdir()
    corpus = ParquetUpsertTable(spark, str(root / "c"), ["vec_id"])
    rejects = ParquetUpsertTable(spark, str(root / "r"), ["vec_id"])
    idx = ParquetUpsertTable(spark, str(root / "i"), ["vec_id"],
                             partition_col="cp")
    ingest = SemanticIngestJob(spark, corpus, rejects,
                               cluster_index=idx, centroids=CENTS,
                               threshold=0.9, n_sub=1, n_parts=4)

    def feed(name, rows):
        _df(spark, rows).coalesce(1).write.parquet(str(src / name))

    def start_fn(checkpoint):
        stream = (spark.readStream
                  .schema("vec_id bigint, embedding array<double>")
                  .parquet(str(src) + "/*"))
        return (ingest.writer(stream, checkpoint)
                .trigger(availableNow=True).start())

    mgr = JobManager(str(tmp_path / "ckpt"))
    job = mgr.add_job("tenant-a", "semantic-ingest", start_fn)

    v1, v2 = _vec(1), _vec(2)
    feed("b1", [(1, v1), (2, v2), (3, _near(v1, "n3"))])
    job.start()
    job.query.awaitTermination()
    assert {r.vec_id for r in corpus.read().collect()} == {1, 2}

    job.pause()
    assert job.get_status() == JobStatus.PAUSED
    feed("b2", [(4, _near(v2, "n4")), (5, _vec(5))])

    job.resume()
    job.query.awaitTermination()
    assert job.get_status() in (JobStatus.NORMAL, JobStatus.STOPPED)
    assert {r.vec_id for r in corpus.read().collect()} == {1, 2, 5}
    assert {(r.vec_id, r.dup_of) for r in rejects.read().collect()} \
        == {(3, 1), (4, 2)}
    got = {(r.vec_id, r.cluster, r.sub, r.cp)
           for r in idx.read().collect()}
    want = {(r.vec_id, r.cluster, r.sub, r.cp)
            for r in ingest.index_rows(corpus.read()).collect()}
    assert got == want


def test_fixed_subcluster_modulus_bounds_comparisons(spark, tmp_path):
    """The declared streaming trade: with n_sub > 1, vectors compare
    ONLY within their (cluster, sub) cell — an identical vector in a
    different subcluster is accepted (bounded comparisons beat perfect
    recall; size n_sub to peak cluster population / 512). Sub is a
    pure function of the id, so the split is stable across batches."""
    job = _mk_job(spark, tmp_path / "j", with_index=True, n_sub=2)
    v = _vec(1)
    subs = {r.vec_id: r.sub for r in job._assign(
        _df(spark, [(i, v) for i in range(1, 30)])).collect()}
    same = [i for i in range(2, 30) if subs[i] == subs[1]]
    diff = [i for i in range(2, 30) if subs[i] != subs[1]]
    assert same and diff, subs
    job.process_batch(_df(spark, [(1, v)]), 0)
    # identical vector, same cell → rejected; different sub → accepted
    job.process_batch(_df(spark, [(same[0], v), (diff[0], v)]), 1)
    ids = {r.vec_id for r in job.corpus.read().collect()}
    assert diff[0] in ids and same[0] not in ids
