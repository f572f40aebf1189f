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
    assert job_i.stats == {"batches": 4, "accepted": 5, "rejected": 3,
                           "deleted": 0}

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
    # plan Location strings truncate at 100 chars (pytest tmp paths can
    # exceed that), so pin the index-file read via inputFiles()
    assert any(str(tmp_path / "idx") in f for f in probe.inputFiles())


# ------------------------------------- partition-pruned long index (r7)

N_PARTS = 64
IDP_PARTS = 8


def _mk_long_tables(spark, tmp_path, existing_df):
    from aether_firebase_consumer_spark.operators.dedup import (
        id_partition,
    )
    from aether_firebase_consumer_spark.plans.similarity_queries import (
        embedding_band_index_rows,
    )
    corpus = ParquetUpsertTable(spark, str(tmp_path / "corp"),
                                ["vec_id"], partition_col="idp")
    long_t = ParquetUpsertTable(spark, str(tmp_path / "long"),
                                ["vec_id", "bi"], partition_col="bkp")
    corpus.merge(existing_df.withColumn(
        "idp", id_partition(F.col("vec_id"), IDP_PARTS)))
    long_t.merge(embedding_band_index_rows(
        existing_df, "vec_id", "embedding", BANDS16, N_PARTS))
    return corpus, long_t


def test_embedding_pruned_probe_equals_unpruned(spark, tmp_path):
    """The bkp-pruned probe is bit-identical to the unpruned index
    probe and the recompute form, and its plan pushes REAL
    PartitionFilters on both the long-index scan and the idp-
    partitioned corpus embedding fetch."""
    import re

    from aether_firebase_consumer_spark.plans.similarity_queries import (
        embedding_index_frame,
        embedding_probe_index_pairs,
        embedding_probe_partitioned_pairs,
    )

    existing_df = _df(spark, [(i, _vec(i)) for i in range(12)])
    incoming_df = _df(spark, [(100, _near(_vec(3), "p1")),
                              (101, _near(_vec(7), "p2")),
                              (102, _vec(40))])
    corpus, long_t = _mk_long_tables(spark, tmp_path, existing_df)

    got = embedding_probe_partitioned_pairs(
        long_t.read(), corpus.read(), incoming_df,
        "vec_id", "embedding", BANDS16, 0.9,
        n_parts=N_PARTS, idp_parts=IDP_PARTS)
    want = embedding_probe_index_pairs(
        embedding_index_frame(existing_df, "vec_id", "embedding",
                              BANDS16),
        existing_df, incoming_df, "vec_id", "embedding", BANDS16, 0.9)
    key = lambda df: {(r.new_id, r.old_id, round(r.cos_sim, 9))
                      for r in df.collect()}
    assert key(got) == key(want)
    assert {(r.new_id, r.old_id) for r in got.collect()} >= {
        (100, 3), (101, 7)}

    lazy = embedding_probe_partitioned_pairs(
        long_t.read(), corpus.read(), incoming_df,
        "vec_id", "embedding", BANDS16, 0.9,
        n_parts=N_PARTS, idp_parts=IDP_PARTS, materialize=False)
    plan = spark.sparkContext._jvm.PythonSQLUtils.explainString(
        lazy._jdf.queryExecution(), "formatted")
    real = re.compile(r"#\d+L? (=|IN|INSET)")
    bkp = re.findall(r"PartitionFilters: \[[^\]]*bkp[^\]]*\]", plan)
    idp = re.findall(r"PartitionFilters: \[[^\]]*idp[^\]]*\]", plan)
    assert bkp and all(real.search(f) for f in bkp)
    assert idp and all(real.search(f) for f in idp)


def test_embedding_long_index_job_matches_recompute(spark, tmp_path):
    """EmbeddingIngestJob with the pruned long index (idp-partitioned
    corpus, no per-doc index at all — the long table alone feeds the
    probe) reproduces the recompute job's corpus/rejects/counters, and
    the long table stays MERGE-exact under updates."""
    from aether_firebase_consumer_spark.plans.similarity_queries import (
        embedding_band_index_rows,
    )

    def mk(root, kind):
        root.mkdir()
        rejects = ParquetUpsertTable(spark, str(root / "r"), ["vec_id"])
        if kind == "recompute":
            corpus = ParquetUpsertTable(spark, str(root / "c"),
                                        ["vec_id"])
            return EmbeddingIngestJob(spark, corpus, rejects,
                                      threshold=0.9,
                                      bands=BANDS16), corpus, rejects
        corpus = ParquetUpsertTable(spark, str(root / "c"), ["vec_id"],
                                    partition_col="idp")
        long_t = ParquetUpsertTable(spark, str(root / "l"),
                                    ["vec_id", "bi"],
                                    partition_col="bkp")
        job = EmbeddingIngestJob(spark, corpus, rejects,
                                 band_long_index=long_t, threshold=0.9,
                                 bands=BANDS16, n_parts=N_PARTS,
                                 idp_parts=IDP_PARTS)
        return job, corpus, rejects

    (jr, cr, rr) = mk(tmp_path / "a", "recompute")
    (jp, cp, rp) = mk(tmp_path / "b", "pruned")

    v1, v2, v5 = _vec(1), _vec(2), _vec(5)
    batches = [
        [(1, v1), (2, v2), (3, _near(v1, "n3"))],
        [(4, _near(v2, "n4")), (5, v5)],
        # UPDATE vector 5 to a DIFFERENT direction entirely
        [(5, _vec(55)), (6, _vec(6))],
        # 7 near-dups 5's NEW vector — only matched if the index
        # reflects the update (old (5, bi) rows replaced by MERGE)
        [(7, _near(_vec(55), "n7")), (8, _near(v5, "n8"))],
    ]
    for n, rows in enumerate(batches):
        jr.process_batch(_df(spark, rows), n)
        jp.process_batch(_df(spark, rows), n)

    def snap(c):
        return sorted((r.vec_id, tuple(r.embedding))
                      for r in c.read().collect())

    assert snap(cr) == snap(cp)
    assert {(r.vec_id, r.dup_of) for r in rp.read().collect()} == \
        {(r.vec_id, r.dup_of) for r in rr.read().collect()}
    assert jr.stats == jp.stats
    ids = {r.vec_id for r in cp.read().collect()}
    assert 8 in ids and 7 not in ids  # update visible, no stale rows

    fresh = embedding_band_index_rows(
        cp.read(), "vec_id", "embedding", BANDS16, N_PARTS)
    stored = jp.band_long_index.read()
    cols = ["vec_id", "bi", "bk", "bkp"]
    assert (sorted(map(tuple, stored.select(*cols).collect()))
            == sorted(map(tuple, fresh.select(*cols).collect())))


def test_embedding_ingest_under_job_manager_lifecycle(spark, tmp_path):
    """Lifecycle parity with the text twin (VERDICT r6 #6): managed as
    a SparkJob, pause mid-corpus, feed more data, resume — checkpoint
    continues exactly, dedup semantics hold across the pause, and both
    index tables stay consistent with the corpus."""
    from aether_firebase_consumer_spark.control.jobs import (
        JobManager,
        JobStatus,
    )
    from aether_firebase_consumer_spark.plans.similarity_queries import (
        embedding_band_index_rows,
        embedding_index_frame,
    )

    src = tmp_path / "src"
    src.mkdir()
    corpus = ParquetUpsertTable(spark, str(tmp_path / "c"), ["vec_id"])
    rejects = ParquetUpsertTable(spark, str(tmp_path / "r"), ["vec_id"])
    idx = ParquetUpsertTable(spark, str(tmp_path / "i"), ["vec_id"])
    long_t = ParquetUpsertTable(spark, str(tmp_path / "l"),
                                ["vec_id", "bi"], partition_col="bkp")
    ingest = EmbeddingIngestJob(spark, corpus, rejects, band_index=idx,
                                band_long_index=long_t, threshold=0.9,
                                bands=BANDS16, n_parts=N_PARTS)

    def feed(name, rows):
        _df(spark, rows).coalesce(1).write.parquet(str(src / name))

    def start_fn(checkpoint):
        stream = (spark.readStream
                  .schema("vec_id bigint, embedding array<double>")
                  .parquet(str(src) + "/*"))
        return (ingest.writer(stream, checkpoint)
                .trigger(availableNow=True).start())

    mgr = JobManager(str(tmp_path / "ckpt"))
    job = mgr.add_job("tenant-a", "embedding-ingest", start_fn)

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
    # both index tables consistent with the corpus across the pause
    want_doc = {(r.vec_id, tuple(r.band_keys))
                for r in embedding_index_frame(
                    corpus.read(), "vec_id", "embedding",
                    BANDS16).collect()}
    assert {(r.vec_id, tuple(r.band_keys))
            for r in idx.read().collect()} == want_doc
    want_long = sorted(map(tuple, embedding_band_index_rows(
        corpus.read(), "vec_id", "embedding", BANDS16, N_PARTS)
        .select("vec_id", "bi", "bk", "bkp").collect()))
    got_long = sorted(map(tuple, long_t.read()
                          .select("vec_id", "bi", "bk", "bkp")
                          .collect()))
    assert got_long == want_long


def test_known_check_plan_prunes_corpus_partitions(spark, tmp_path):
    """Round 9: with the idp-partitioned corpus, the known-id scan
    carries real PartitionFilters on idp (batch partitions only)."""
    import re

    corpus = ParquetUpsertTable(spark, str(tmp_path / "c"), ["vec_id"],
                                partition_col="idp")
    job = EmbeddingIngestJob(spark, corpus, threshold=0.9,
                             bands=BANDS16, idp_parts=IDP_PARTS)
    job.process_batch(_df(spark, [(i, _vec(i))
                                  for i in range(1, 20)]), 0)
    batch = _df(spark, [(3, _vec(3)), (100, _vec(100))])
    known = job._known_ids(corpus.read(), batch)
    plan = known._jdf.queryExecution().executedPlan().toString()
    pf = re.findall(r"PartitionFilters: \[([^\]]*idp[^\]]*)\]", plan)
    assert pf and all(re.search(r"#\d+L? (=|IN|INSET)", f)
                      for f in pf), plan
    assert {r.vec_id for r in known
            .join(batch.select("vec_id"), "vec_id", "left_semi")
            .collect()} == {3}


def test_reshard_index_migrates_moduli(spark, tmp_path):
    """reshard_index(): long band index rebuilds from corpus vectors
    at the new bkp modulus, corpus idp re-stamps, recipe migrates,
    and post-migration probes match the recompute path."""
    from aether_firebase_consumer_spark.operators.dedup import (
        band_partition,
        id_partition,
    )
    from aether_firebase_consumer_spark.plans.similarity_queries import (
        embedding_band_index_rows,
    )

    (a := tmp_path / "a").mkdir()
    corpus = ParquetUpsertTable(spark, str(a / "c"), ["vec_id"],
                                partition_col="idp")
    long_t = ParquetUpsertTable(spark, str(a / "l"), ["vec_id", "bi"],
                                partition_col="bkp")
    jp = EmbeddingIngestJob(spark, corpus, band_long_index=long_t,
                            threshold=0.9, bands=BANDS16,
                            n_parts=N_PARTS, idp_parts=IDP_PARTS)
    (b := tmp_path / "b").mkdir()
    jr = EmbeddingIngestJob(
        spark, ParquetUpsertTable(spark, str(b / "c"), ["vec_id"]),
        threshold=0.9, bands=BANDS16)

    b0 = [(i, _vec(i)) for i in range(1, 9)]
    for j in (jp, jr):
        j.process_batch(_df(spark, b0), 0)

    jp.reshard_index(n_parts=32, idp_parts=4)
    stored = jp.band_long_index.read()
    assert stored.filter(
        F.col("bkp") != band_partition(F.col("bk"), 32)).count() == 0
    assert jp.corpus.read().filter(
        F.col("idp") != id_partition(F.col("vec_id"), 4)).count() == 0
    fresh = embedding_band_index_rows(jp.corpus.read(), "vec_id",
                                      "embedding", BANDS16, 32)
    cols = ["vec_id", "bi", "bk", "bkp"]
    assert (sorted(map(tuple, stored.select(*cols).collect()))
            == sorted(map(tuple, fresh.select(*cols).collect())))
    with pytest.raises(ValueError, match="recipe mismatch"):
        EmbeddingIngestJob(spark, corpus, band_long_index=long_t,
                           threshold=0.9, bands=BANDS16,
                           n_parts=N_PARTS, idp_parts=IDP_PARTS)

    b1 = [(20, _near(_vec(3), "n20")), (21, _vec(21))]
    for j in (jp, jr):
        j.process_batch(_df(spark, b1), 1)
    assert sorted((r.vec_id, tuple(r.embedding))
                  for r in jp.corpus.read().collect()) == \
        sorted((r.vec_id, tuple(r.embedding))
               for r in jr.corpus.read().collect())
    assert jp.stats == jr.stats
