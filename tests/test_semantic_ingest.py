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


def _mk_job(spark, root, with_index: bool, n_sub: int = 1,
            corpus_idp: bool = False):
    root.mkdir()
    corpus = ParquetUpsertTable(
        spark, str(root / "c"), ["vec_id"],
        partition_col="idp" if corpus_idp else None)
    rejects = ParquetUpsertTable(spark, str(root / "r"), ["vec_id"])
    idx = ParquetUpsertTable(spark, str(root / "i"), ["vec_id"],
                             partition_col="cp") if with_index else None
    return SemanticIngestJob(spark, corpus, rejects, cluster_index=idx,
                             centroids=CENTS, threshold=0.9,
                             n_sub=n_sub, n_parts=4, idp_parts=8)


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
    assert job.stats == {"batches": 2, "accepted": 3, "rejected": 2,
                         "deleted": 0}
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


def _corpus_snap(table):
    return sorted((r.vec_id, tuple(r.embedding))
                  for r in table.read().collect())


def test_corpus_idp_partitioned_matches_plain(spark, tmp_path):
    """The idp-partitioned corpus (round 9: partition-pruned embedding
    fetch + known-id check) accepts/rejects identically to the plain
    corpus across in-batch dups, cross-batch dups, and updates."""
    jp = _mk_job(spark, tmp_path / "jp", with_index=True,
                 corpus_idp=True)
    jr = _mk_job(spark, tmp_path / "jr", with_index=False)
    v1, v2, v5 = _vec(1), _vec(2), _vec(5)
    batches = [
        [(1, v1), (2, v2), (3, _near(v1, "n3"))],
        [(4, _near(v2, "n4")), (5, v5), (6, _vec(6))],
        [(5, _vec(55)), (7, _near(_vec(55), "n7"))],
        [(8, _near(v5, "n8"))],
    ]
    for n, rows in enumerate(batches):
        jp.process_batch(_df(spark, rows), n)
        jr.process_batch(_df(spark, rows), n)
    assert _corpus_snap(jp.corpus) == _corpus_snap(jr.corpus)
    assert {(r.vec_id, r.dup_of) for r in jp.rejects.read().collect()} \
        == {(r.vec_id, r.dup_of) for r in jr.rejects.read().collect()}
    assert jp.stats == jr.stats
    # every corpus row sits in the partition its id hashes to
    from aether_firebase_consumer_spark.operators.dedup import (
        id_partition,
    )
    bad = jp.corpus.read().filter(
        F.col("idp") != id_partition(F.col("vec_id"), 8))
    assert bad.count() == 0


def test_probe_prunes_corpus_partitions(spark, tmp_path):
    """With an idp-partitioned corpus, the probe's embedding-fetch scan
    carries real PartitionFilters on idp — candidate partitions only."""
    import re
    job = _mk_job(spark, tmp_path / "j", with_index=True,
                  corpus_idp=True)
    job.process_batch(_df(spark, [(i, _vec(i))
                                  for i in range(1, 9)]), 0)
    index = job.cluster_index.read()
    existing = job.corpus.read()
    # probe a near-dup so a candidate (hence an idp filter) exists
    fresh = job._assign(_df(spark, [(100, _near(_vec(3), "p"))]))
    pairs = job._probe_pairs(index, existing, fresh, materialize=False)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    idp_f = re.findall(r"PartitionFilters: \[([^\]]*idp[^\]]*)\]", plan)
    assert idp_f and all(re.search(r"#\d+L? (=|IN|INSET)", f)
                         for f in idp_f), plan


def test_reshard_matches_recompute_path(spark, tmp_path):
    """VERDICT r9 #5 done-criterion: after reshard(new_n_sub), the
    indexed job's probe decisions equal the recompute path's at the
    same modulus — across batches before AND after the migration."""
    ji = _mk_job(spark, tmp_path / "ji", with_index=True, n_sub=1)
    jr = _mk_job(spark, tmp_path / "jr", with_index=False, n_sub=1)
    v = _vec(1)
    pre = [
        [(i, _vec(i)) for i in range(1, 8)],
        [(8, _near(v, "n8")), (9, _vec(9))],
    ]
    for n, rows in enumerate(pre):
        ji.process_batch(_df(spark, rows), n)
        jr.process_batch(_df(spark, rows), n)
    ji.reshard(3)
    # the recompute twin has no persisted state: its "reshard" is just
    # the new modulus taking effect
    jr.n_sub = 3
    # post-reshard batches include identical vectors that now split
    # across subclusters (accepted) or share a cell (rejected) — the
    # exact behavior that diverges if index and assignment moduli
    # disagree
    post = [
        [(i, v) for i in range(20, 40)],
        [(50, _near(_vec(9), "n50")), (51, _vec(51))],
    ]
    for n, rows in enumerate(post, start=len(pre)):
        ji.process_batch(_df(spark, rows), n)
        jr.process_batch(_df(spark, rows), n)
    assert _corpus_snap(ji.corpus) == _corpus_snap(jr.corpus)
    assert {(r.vec_id, r.dup_of) for r in ji.rejects.read().collect()} \
        == {(r.vec_id, r.dup_of) for r in jr.rejects.read().collect()}
    assert ji.stats == jr.stats


def test_reshard_is_one_atomic_swap_and_exact(spark, tmp_path):
    """reshard = exactly ONE new index version (the atomic pointer
    swap), bit-identical to a from-scratch assignment of the corpus at
    the new modulus, with the previous version retained on disk for
    concurrent readers; the partition LAYOUT is unchanged (cp doesn't
    depend on n_sub)."""
    import os
    job = _mk_job(spark, tmp_path / "j", with_index=True, n_sub=1)
    job.process_batch(_df(spark, [(i, _vec(i))
                                  for i in range(1, 12)]), 0)
    idx = job.cluster_index
    v0 = idx.current_version()
    before_dirs = sorted(d for d in os.listdir(idx._data_dir(v0))
                         if d.startswith("cp="))
    job.reshard(4)
    assert job.n_sub == 4
    assert idx.current_version() == v0 + 1
    assert os.path.isdir(idx._data_dir(v0))  # old version retained
    after_dirs = sorted(d for d in os.listdir(idx._data_dir(v0 + 1))
                        if d.startswith("cp="))
    assert after_dirs == before_dirs
    got = {(r.vec_id, r.cluster, r.sub, r.cp)
           for r in idx.read().collect()}
    want = {(r.vec_id, r.cluster, r.sub, r.cp)
            for r in job.index_rows(job.corpus.read()).collect()}
    assert got == want
    # the rebuilt index really is at the new modulus: with 11 vectors
    # and n_sub=4, at least one sub value outside {0} exists
    assert {r.sub for r in idx.read().collect()} - {0}


def test_reshard_without_persisted_state_is_modulus_only(spark,
                                                         tmp_path):
    job = _mk_job(spark, tmp_path / "j", with_index=True, n_sub=1)
    job.reshard(2)          # empty corpus + empty index: no version
    assert job.n_sub == 2
    assert job.cluster_index.current_version() == -1
    jr = _mk_job(spark, tmp_path / "jr", with_index=False, n_sub=1)
    jr.reshard(5)
    assert jr.n_sub == 5


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


def _dir_bytes(path: str) -> int:
    import os
    total = 0
    for root, _dirs, files in os.walk(path):
        for fn in files:
            total += os.path.getsize(os.path.join(root, fn))
    return total


def test_semantic_probe_io_flat_while_corpus_grows(spark, tmp_path):
    """The measured 100 TB claim for the semantic job (VERDICT r9 #4,
    mirroring the band-index twin's choreography): grow the corpus over
    5 batches whose vectors land OUTSIDE the probe's partitions — other
    clusters (index cp dirs) and other id hashes (corpus idp dirs) —
    then assert the bytes held by the partitions a probe actually reads
    (its cp dirs on the index; the candidate's and its own idp dirs on
    the corpus) stay CONSTANT while both tables grow."""
    import os

    job = _mk_job(spark, tmp_path / "j", with_index=True,
                  corpus_idp=True)
    probe_vec = _vec(9999)
    probe_id = 1000
    probe = _df(spark, [(probe_id, probe_vec)])
    pa = job._with_idp(job._assign(probe)).collect()[0]
    probe_cp, probe_idp = pa["cp"], pa["idp"]

    # seed a planted near-dup so every probe has a real match to find
    seed_id = 7
    seed = _df(spark, [(seed_id, _near(probe_vec, "seed"))])
    sa = job._with_idp(job._assign(seed)).collect()[0]
    assert sa["cp"] == probe_cp  # near-dup shares the cluster
    job.process_batch(seed, 0)

    # filler pool: vectors in OTHER clusters whose ids hash to OTHER
    # idp partitions — rejected driver-side by the same pure functions
    # the job partitions with, so growth lands elsewhere by construction
    pool = _df(spark, [(3000 + i, _vec(3000 + i)) for i in range(400)])
    ok = [(r["vec_id"], r[job.vec_col])
          for r in job._with_idp(job._assign(pool)).collect()
          if r["cp"] != probe_cp
          and r["idp"] not in (probe_idp, sa["idp"])]
    assert len(ok) >= 200, f"pool too selective: {len(ok)}"

    def probed_bytes() -> int:
        cdir = job.corpus._data_dir(job.corpus.current_version())
        idir = job.cluster_index._data_dir(
            job.cluster_index.current_version())
        total = 0
        for d in (os.path.join(idir, f"cp={probe_cp}"),
                  os.path.join(cdir, f"idp={probe_idp}"),
                  os.path.join(cdir, f"idp={sa['idp']}")):
            if os.path.isdir(d):
                total += _dir_bytes(d)
        return total

    def table_bytes() -> int:
        return (_dir_bytes(job.corpus._data_dir(
                    job.corpus.current_version()))
                + _dir_bytes(job.cluster_index._data_dir(
                    job.cluster_index.current_version())))

    base = probed_bytes()
    sizes, totals = [], []
    for b in range(5):
        fillers = _df(spark, ok[b * 40:(b + 1) * 40])
        job.process_batch(fillers, 1 + 2 * b)
        # the probe: same id, same vector, every round — rejected
        # against the seed via the pruned index + pruned fetch
        job.process_batch(probe, 2 + 2 * b)
        rej = {(r.vec_id, r.dup_of)
               for r in job.rejects.read().collect()}
        assert (probe_id, seed_id) in rej
        assert probe_id not in {
            r.vec_id for r in job.corpus.read().collect()}
        sizes.append(probed_bytes())
        totals.append(table_bytes())

    # probed-partition bytes: FLAT across all 5 growth rounds
    assert set(sizes) == {base}, (base, sizes)
    # while the tables themselves genuinely grew every round
    assert all(b > a for a, b in zip(totals, totals[1:])), totals
    assert totals[0] > base


def test_recipe_guard_on_cluster_index(spark, tmp_path):
    """Round 9: the persisted cell index records its derivation
    recipe; attaching a job at a different n_sub (or with different
    centroids) fails loudly, and reshard migrates the recipe with the
    table."""
    root = tmp_path / "j"
    job = _mk_job(spark, root, with_index=True, n_sub=1)
    job.process_batch(_df(spark, [(1, _vec(1))]), 0)

    def attach(n_sub):
        idx = ParquetUpsertTable(spark, str(root / "i"), ["vec_id"],
                                 partition_col="cp")
        corpus = ParquetUpsertTable(spark, str(root / "c"), ["vec_id"])
        return SemanticIngestJob(spark, corpus, cluster_index=idx,
                                 centroids=CENTS, threshold=0.9,
                                 n_sub=n_sub, n_parts=4)

    attach(1)  # identical recipe re-attaches fine
    with pytest.raises(ValueError, match="recipe mismatch.*n_sub"):
        attach(3)
    job.reshard(3)
    attach(3)  # recipe migrated with the rebuild
    with pytest.raises(ValueError, match="recipe mismatch.*n_sub"):
        attach(1)


def test_reshard_between_triggers_under_lifecycle(spark, tmp_path):
    """The documented operational flow: pause the managed stream,
    reshard the index, resume — the checkpoint continues, the gate
    semantics hold at the new modulus, and the index stays consistent
    with the corpus."""
    from aether_firebase_consumer_spark.control.jobs import JobManager

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
    job = mgr.add_job("tenant-a", "sem-reshard", start_fn)

    v = _vec(1)
    feed("b1", [(1, v), (2, _vec(2))])
    job.start()
    job.query.awaitTermination()
    job.pause()

    ingest.reshard(2)  # migration between triggers

    # post-reshard: an identical vector in the SAME (cluster, sub)
    # cell as vector 1 must still be rejected; a different-sub twin
    # accepted — the n_sub=2 semantics, against the REBUILT index
    subs = {r.vec_id: r.sub for r in ingest._assign(
        _df(spark, [(i, v) for i in range(1, 40)])).collect()}
    # start at 3: ids 1 and 2 are already in the corpus (a known id
    # is an UPDATE and bypasses the gate)
    same = next(i for i in range(3, 40) if subs[i] == subs[1])
    diff = next(i for i in range(3, 40) if subs[i] != subs[1])
    feed("b2", [(same, v), (diff, v)])
    job.resume()
    job.query.awaitTermination()
    ids = {r.vec_id for r in corpus.read().collect()}
    assert diff in ids and same not in ids
    got = {(r.vec_id, r.cluster, r.sub, r.cp)
           for r in idx.read().collect()}
    want = {(r.vec_id, r.cluster, r.sub, r.cp)
            for r in ingest.index_rows(corpus.read()).collect()}
    assert got == want


def test_reshard_corpus_idp_migration(spark, tmp_path):
    """reshard_corpus: the idp-partitioned corpus migrates to a new
    modulus (rows re-stamped, recipe migrated crash-safely) and the
    gate semantics afterwards still match the plain-corpus recompute
    path exactly."""
    from aether_firebase_consumer_spark.operators.dedup import (
        id_partition,
    )

    jp = _mk_job(spark, tmp_path / "jp", with_index=True,
                 corpus_idp=True)
    jr = _mk_job(spark, tmp_path / "jr", with_index=False)
    v1 = _vec(1)
    b0 = [(1, v1), (2, _vec(2)), (3, _vec(3))]
    jp.process_batch(_df(spark, b0), 0)
    jr.process_batch(_df(spark, b0), 0)

    jp.reshard_corpus(4)
    # rows re-stamped at the new modulus, recipe migrated
    assert jp.corpus.read().filter(
        F.col("idp") != id_partition(F.col("vec_id"), 4)).count() == 0
    with pytest.raises(ValueError, match="recipe mismatch.*idp_parts"):
        SemanticIngestJob(
            spark, jp.corpus, cluster_index=jp.cluster_index,
            centroids=CENTS, threshold=0.9, n_sub=1, n_parts=4,
            idp_parts=8)

    # post-migration: update bypass and near-dup gate behave exactly
    # like the recompute twin (a missed known-id would reject id 1
    # as a dup of itself)
    b1 = [(1, v1), (4, _near(v1, "n4")), (5, _vec(5))]
    jp.process_batch(_df(spark, b1), 1)
    jr.process_batch(_df(spark, b1), 1)
    assert _corpus_snap(jp.corpus) == _corpus_snap(jr.corpus)
    assert {(r.vec_id, r.dup_of) for r in jp.rejects.read().collect()} \
        == {(r.vec_id, r.dup_of) for r in jr.rejects.read().collect()}
    assert jp.stats == jr.stats
