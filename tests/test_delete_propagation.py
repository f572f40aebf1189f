"""delete(ids) across the persisted-index ingest-job family
(round 10, VERDICT r9 item 1): a takedown/retention delete must remove
a document from the corpus AND every persisted index table — a ghost
row in a codes/cells/band table would keep serving the deleted doc as
a neighbor or dedup gate forever. Done-criteria pinned here:
post-delete probe/gate results hash-equal the recompute path on the
remaining corpus, including after OPTIMIZE, plus lifecycle tests
deleting between triggers."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from aether_firebase_consumer_spark.functions.vectors import (
    hyperplane_signs,
    ivf_centroids,
    pq_codebooks,
)
from aether_firebase_consumer_spark.sinks.upsert import ParquetUpsertTable
from aether_firebase_consumer_spark.streaming.ann_ingest import AnnIndexJob
from aether_firebase_consumer_spark.streaming.dedup_ingest import (
    DedupIngestJob,
)
from aether_firebase_consumer_spark.streaming.embedding_ingest import (
    EmbeddingIngestJob,
)
from aether_firebase_consumer_spark.streaming.semantic_ingest import (
    SemanticIngestJob,
)

DIM = 16
CENTS = ivf_centroids("test-del-16", 4, DIM)
BOOKS = pq_codebooks("test-del-pq", m=4, k=8, dim=DIM)
_PLANES16 = hyperplane_signs("test-del-lsh", n_planes=8, dim=DIM)
BANDS16 = [_PLANES16[:4], _PLANES16[4:]]


def _vec(i: int) -> list[float]:
    return [int(hashlib.md5(f"d{i}:{j}".encode()).hexdigest()[:8], 16)
            / 2**31 - 1.0 for j in range(DIM)]


def _near(vec: list[float], salt: str, eps: float = 0.05) -> list[float]:
    nrm = math.sqrt(sum(x * x for x in vec))
    return [x + eps * nrm / math.sqrt(DIM)
            * (int(hashlib.md5(f"{salt}:{j}".encode()).hexdigest()[:8],
                   16) / 2**31 - 1.0)
            for j, x in enumerate(vec)]


def _vdf(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>")


# ---------------------------------------------------------------- ANN

def _mk_ann(spark, root):
    root.mkdir()
    corpus = ParquetUpsertTable(spark, str(root / "c"), ["vec_id"],
                                partition_col="idp")
    codes = ParquetUpsertTable(spark, str(root / "i"), ["vec_id"],
                               partition_col="cp")
    return AnnIndexJob(spark, corpus, codes, CENTS, BOOKS,
                       n_parts=4, idp_parts=8)


def _topk_snap(df):
    return sorted((r.query_id, r.neighbor_id, round(r.cos_sim, 9))
                  for r in df.collect())


def test_ann_delete_matches_recompute(spark, tmp_path):
    """After delete(ids), topk() against the persisted index equals a
    SECOND job built from scratch on only the remaining vectors —
    including after OPTIMIZE rewrote both tables."""
    state = {i: _vec(i) for i in range(1, 13)}
    job = _mk_ann(spark, tmp_path / "a")
    job.process_batch(_vdf(spark, list(state.items())), 0)

    doomed = [3, 7, 11]
    n = job.delete(doomed)
    assert n == 3
    assert job.stats["deleted"] == 3
    for i in doomed:
        del state[i]

    # both tables are clean of the deleted ids
    assert {r.vec_id for r in job.corpus.read().collect()} \
        == set(state)
    assert {r.vec_id for r in job.codes.read().collect()} \
        == set(state)

    # probe parity vs a from-scratch job over the remaining corpus
    fresh = _mk_ann(spark, tmp_path / "b")
    fresh.process_batch(_vdf(spark, list(state.items())), 0)
    queries = _vdf(spark, [(900, _near(state[1], "q1")),
                           (901, _near(state[5], "q2"))])
    assert _topk_snap(job.topk(queries)) \
        == _topk_snap(fresh.topk(queries))
    # a deleted id never appears as a neighbor
    assert all(r.neighbor_id not in doomed
               for r in job.topk(queries, k=12, shortlist=100)
               .collect())

    # OPTIMIZE rewrites both tables; parity must survive
    job.corpus.optimize()
    job.codes.optimize()
    assert _topk_snap(job.topk(queries)) \
        == _topk_snap(fresh.topk(queries))


def test_ann_delete_lifecycle_between_triggers(spark, tmp_path):
    """Delete between process_batch triggers; later batches keep
    maintaining the index, and a RE-DELIVERY of a deleted id is a
    fresh insert again (takedown then legitimate re-publish)."""
    job = _mk_ann(spark, tmp_path / "a")
    job.process_batch(_vdf(spark, [(i, _vec(i)) for i in (1, 2, 3)]), 0)
    assert job.delete([2]) == 1
    job.process_batch(_vdf(spark, [(4, _vec(4))]), 1)
    assert {r.vec_id for r in job.corpus.read().collect()} == {1, 3, 4}
    # re-delivery of the deleted id
    job.process_batch(_vdf(spark, [(2, _vec(22))]), 2)
    got = {r.vec_id: tuple(r.embedding)
           for r in job.corpus.read().collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[2] == tuple(_vec(22))
    # codes mirror the corpus after the whole choreography
    want = {(r.vec_id, r.cell, tuple(r.codes)) for r in job.code_rows(
        _vdf(spark, [(i, _vec(i)) for i in (1, 3, 4)]
             + [(2, _vec(22))])).collect()}
    got_idx = {(r.vec_id, r.cell, tuple(r.codes))
               for r in job.codes.read().collect()}
    assert got_idx == want


def test_ann_delete_missing_and_dataframe_input(spark, tmp_path):
    """Deleting ids the corpus doesn't hold is a no-op (returns 0, no
    version churn); the delete set can be a DataFrame."""
    job = _mk_ann(spark, tmp_path / "a")
    job.process_batch(_vdf(spark, [(1, _vec(1)), (2, _vec(2))]), 0)
    vc = job.corpus.current_version()
    vi = job.codes.current_version()
    assert job.delete([99, 100]) == 0
    assert (job.corpus.current_version(), job.codes.current_version()) \
        == (vc, vi)
    ids_df = spark.createDataFrame([(1,)], "vec_id bigint")
    assert job.delete(ids_df) == 1
    assert {r.vec_id for r in job.corpus.read().collect()} == {2}


def test_ann_delete_empty_corpus(spark, tmp_path):
    job = _mk_ann(spark, tmp_path / "a")
    assert job.delete([1]) == 0


# ----------------------------------------------------------- semantic

def _mk_sem(spark, root, with_index=True, corpus_idp=True):
    root.mkdir()
    corpus = ParquetUpsertTable(
        spark, str(root / "c"), ["vec_id"],
        partition_col="idp" if corpus_idp else None)
    idx = ParquetUpsertTable(spark, str(root / "i"), ["vec_id"],
                             partition_col="cp") if with_index else None
    return SemanticIngestJob(spark, corpus, cluster_index=idx,
                             centroids=CENTS, threshold=0.9,
                             n_sub=1, n_parts=4, idp_parts=8)


def test_semantic_delete_stops_ghost_gating(spark, tmp_path):
    """The gate parity pin: after deleting vector 1, a near-dup of it
    must be ACCEPTED (no ghost cell row keeps gating), exactly like a
    job that never saw vector 1 — across the indexed, recompute, and
    unpartitioned-corpus paths."""
    for tag, (with_index, idp) in {
            "idx": (True, True), "rec": (False, True),
            "flat": (True, False)}.items():
        job = _mk_sem(spark, tmp_path / tag, with_index, idp)
        v1, v2 = _vec(1), _vec(2)
        job.process_batch(_vdf(spark, [(1, v1), (2, v2)]), 0)
        # pre-delete: the near-dup IS rejected
        job.process_batch(_vdf(spark, [(3, _near(v1, "n3"))]), 1)
        assert {r.vec_id for r in job.corpus.read().collect()} \
            == {1, 2}, tag
        assert job.delete([1]) == 1, tag
        # post-delete: the same near-dup is now accepted
        job.process_batch(_vdf(spark, [(4, _near(v1, "n4"))]), 2)
        assert {r.vec_id for r in job.corpus.read().collect()} \
            == {2, 4}, tag
        if with_index:
            idx_ids = {r.vec_id
                       for r in job.cluster_index.read().collect()}
            assert idx_ids == {2, 4}, tag
        assert job.stats["deleted"] == 1, tag


# ---------------------------------------------------------- embedding

def test_embedding_delete_full_index_shape(spark, tmp_path):
    """EmbeddingIngestJob at the full 100 TB shape (idp corpus +
    per-doc index + bkp long index): delete removes the vector from
    all three tables and un-gates its near-dups."""
    root = tmp_path / "e"
    root.mkdir()
    corpus = ParquetUpsertTable(spark, str(root / "c"), ["vec_id"],
                                partition_col="idp")
    doc_t = ParquetUpsertTable(spark, str(root / "d"), ["vec_id"])
    long_t = ParquetUpsertTable(spark, str(root / "l"),
                                ["vec_id", "bi"], partition_col="bkp")
    job = EmbeddingIngestJob(spark, corpus, band_index=doc_t,
                             band_long_index=long_t, threshold=0.9,
                             bands=BANDS16, n_parts=16, idp_parts=8)
    v1, v2 = _vec(1), _vec(2)
    job.process_batch(_vdf(spark, [(1, v1), (2, v2)]), 0)
    job.process_batch(_vdf(spark, [(3, _near(v1, "n3"))]), 1)
    assert {r.vec_id for r in corpus.read().collect()} == {1, 2}

    assert job.delete([1]) == 1
    assert {r.vec_id for r in corpus.read().collect()} == {2}
    assert {r.vec_id for r in doc_t.read().collect()} == {2}
    assert {r.vec_id for r in long_t.read().collect()} == {2}

    # the near-dup of the deleted vector is now accepted
    job.process_batch(_vdf(spark, [(4, _near(v1, "n4"))]), 2)
    assert {r.vec_id for r in corpus.read().collect()} == {2, 4}
    # and the index tables track the accepted vector
    assert {r.vec_id for r in long_t.read().collect()} == {2, 4}
    assert job.stats["deleted"] == 1


# -------------------------------------------------------------- dedup

def _mk_doc(i: int, words: int = 30) -> str:
    return " ".join(f"w{i}x{j}" for j in range(words))


def _ddf(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_dedup_delete_full_index_shape(spark, tmp_path):
    """DedupIngestJob at the full shape (idp per-doc index + bkp long
    index): delete purges the doc's stored band keys from the long
    table WITHOUT re-shingling, un-gates its near-dups, and the long
    table stays exactly the explode of the per-doc table."""
    root = tmp_path / "d"
    root.mkdir()
    corpus = ParquetUpsertTable(spark, str(root / "c"), ["doc_id"])
    doc_t = ParquetUpsertTable(spark, str(root / "d"), ["doc_id"],
                               partition_col="idp")
    long_t = ParquetUpsertTable(spark, str(root / "l"),
                                ["doc_id", "band_key"],
                                partition_col="bkp")
    job = DedupIngestJob(spark, corpus, band_index=doc_t,
                         band_long_index=long_t, n_parts=64,
                         idp_parts=8)
    job.process_batch(_ddf(spark, [(1, _mk_doc(1)), (2, _mk_doc(2))]), 0)
    # near-dup of doc 2 → rejected while doc 2 lives
    job.process_batch(_ddf(spark, [(3, _mk_doc(2) + " y")]), 1)
    assert {r.doc_id for r in corpus.read().collect()} == {1, 2}

    assert job.delete([2]) == 1
    assert {r.doc_id for r in corpus.read().collect()} == {1}
    assert {r.doc_id for r in doc_t.read().collect()} == {1}
    assert {r.doc_id for r in long_t.read().collect()} == {1}

    # the same near-dup is accepted now
    job.process_batch(_ddf(spark, [(4, _mk_doc(2) + " y")]), 2)
    assert {r.doc_id for r in corpus.read().collect()} == {1, 4}
    # long table == explode of per-doc table (MERGE-exact invariant)
    got = {(r.doc_id, r.band_key)
           for r in long_t.read().collect()}
    want = {(r.doc_id, r.band_key)
            for r in job._explode_long(doc_t.read()).collect()}
    assert got == want
    assert job.stats["deleted"] == 1


def test_dedup_delete_recompute_path(spark, tmp_path):
    """No index tables at all: delete(ids) still works (corpus-only)
    and the recompute probe no longer sees the deleted doc."""
    root = tmp_path / "r"
    root.mkdir()
    corpus = ParquetUpsertTable(spark, str(root / "c"), ["doc_id"])
    job = DedupIngestJob(spark, corpus)
    job.process_batch(_ddf(spark, [(1, _mk_doc(1)), (2, _mk_doc(2))]), 0)
    assert job.delete([2]) == 1
    job.process_batch(_ddf(spark, [(3, _mk_doc(2) + " y")]), 1)
    assert {r.doc_id for r in corpus.read().collect()} == {1, 3}
    assert job.delete(_ddf(spark, [(1, "ignored")])) == 1
    assert {r.doc_id for r in corpus.read().collect()} == {3}


def test_delete_appears_in_change_feed(spark, tmp_path):
    """The CDC story for takedowns: a delete(ids) produces ordinary
    table versions, so a downstream change-feed consumer sees explicit
    `delete` rows for the removed ids (corpus AND index tables) and
    can propagate the takedown — no side channel needed."""
    job = _mk_ann(spark, tmp_path / "a")
    job.process_batch(_vdf(spark, [(i, _vec(i)) for i in (1, 2, 3)]), 0)
    v_before = job.corpus.current_version()
    assert job.delete([2]) == 1
    corpus_changes = {(r.vec_id, r.change_type)
                      for r in job.corpus.change_feed(
                          v_before + 1).collect()}
    codes_changes = {(r.vec_id, r.change_type)
                     for r in job.codes.change_feed(
                         job.codes.current_version()).collect()}
    assert corpus_changes == {(2, "delete")}
    assert codes_changes == {(2, "delete")}


def test_delete_rewrites_only_touched_partitions(spark, tmp_path):
    """I/O evidence for the pruned delete: removing ids from one idp
    partition carries every OTHER partition's data files into the new
    version as hardlinks (same inodes — zero bytes rewritten), the
    on-disk form of 'delete cost ∝ delete set, not table'."""
    import os

    from aether_firebase_consumer_spark.operators.dedup import (
        id_partition,
    )

    t = ParquetUpsertTable(spark, str(tmp_path / "t"), ["vec_id"],
                           partition_col="idp")
    rows = spark.createDataFrame([(i, f"v{i}") for i in range(64)],
                                 "vec_id bigint, v string") \
        .withColumn("idp", id_partition(F.col("vec_id"), 8))
    t.merge(rows)
    v0 = t.current_version()

    def inodes(version):
        out = {}
        root = t._data_dir(version)
        for base, dirs, files in os.walk(root):
            # data files only — the _changes recording is new per
            # version by design (it records that version's delta)
            dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
            for fn in files:
                if fn.endswith(".parquet"):
                    p = os.path.join(base, fn)
                    out[os.path.relpath(p, root)] = os.stat(p).st_ino
        return out

    before = inodes(v0)
    # delete two ids that live in ONE partition
    doomed = [r.vec_id for r in rows.where("idp = 3")
              .limit(2).collect()]
    keys = spark.createDataFrame([(i,) for i in doomed],
                                 "vec_id bigint") \
        .withColumn("idp", id_partition(F.col("vec_id"), 8))
    t.delete_keys(keys)
    after = inodes(t.current_version())
    touched = {p for p in after if p.startswith("idp=3/")}
    untouched = set(after) - touched
    assert touched                        # partition was rewritten
    # every other partition's files are the SAME inodes as before
    assert untouched
    for p in untouched:
        assert after[p] == before[p], p
    # and the deleted ids are gone while all others survive
    got = {r.vec_id for r in t.read().collect()}
    assert got == set(range(64)) - set(doomed)


# ---------------------------------------------------- reconcile (r10)

def test_ann_reconcile_repairs_crash_divergence(spark, tmp_path):
    """reconcile(): both crash-divergence states repaired — a corpus
    vector missing its codes row (invisible to probes) is re-encoded;
    a codes row whose vector left the corpus (wasted shortlist slots)
    is dropped. After repair, topk equals a from-scratch job; a second
    reconcile is a no-op."""
    state = {i: _vec(i) for i in range(1, 9)}
    job = _mk_ann(spark, tmp_path / "a")
    job.process_batch(_vdf(spark, list(state.items())), 0)

    # simulate crash A: codes row for id 2 never landed
    row2 = job.code_rows(_vdf(spark, [(2, state[2])])) \
        .select("vec_id", "cp")
    job.codes.delete_keys(row2)
    # simulate crash B: corpus row for id 5 deleted, codes row left
    job.corpus.delete_keys(
        spark.createDataFrame([(5,)], "vec_id bigint")
        .withColumn("idp", F.lit(None).cast("int"))
        .select("vec_id"))
    out = job.reconcile()
    assert out == {"re_encoded": 1, "orphans_dropped": 1}
    assert job.reconcile() == {"re_encoded": 0, "orphans_dropped": 0}

    del state[5]
    fresh = _mk_ann(spark, tmp_path / "b")
    fresh.process_batch(_vdf(spark, list(state.items())), 0)
    queries = _vdf(spark, [(900, _near(state[2], "q"))])
    assert _topk_snap(job.topk(queries, k=8, shortlist=50)) \
        == _topk_snap(fresh.topk(queries, k=8, shortlist=50))


def test_semantic_reconcile_restores_gating(spark, tmp_path):
    """reconcile() on the semantic job: a vector whose cell row went
    missing stops gating its near-dups — after reconcile it gates
    again; an orphan cell row (ghost gate) is dropped so near-dups of
    the DELETED vector are accepted."""
    job = _mk_sem(spark, tmp_path / "s")
    v1, v2 = _vec(1), _vec(2)
    job.process_batch(_vdf(spark, [(1, v1), (2, v2)]), 0)

    # crash A: drop vector 1's cell row — its near-dup would slip in
    idx_row1 = job.index_rows(_vdf(spark, [(1, v1)])) \
        .select("vec_id", "cp")
    job.cluster_index.delete_keys(idx_row1)
    out = job.reconcile()
    assert out == {"re_assigned": 1, "orphans_dropped": 0}
    job.process_batch(_vdf(spark, [(3, _near(v1, "n3"))]), 1)
    assert {r.vec_id for r in job.corpus.read().collect()} == {1, 2}

    # crash B: vector 2 deleted from the corpus only — ghost cell row
    job.corpus.delete_keys(
        spark.createDataFrame([(2,)], "vec_id bigint").withColumn(
            "idp", (F.lit(None)).cast("int")).select("vec_id"))
    out = job.reconcile()
    assert out["orphans_dropped"] == 1
    job.process_batch(_vdf(spark, [(4, _near(v2, "n4"))]), 2)
    assert 4 in {r.vec_id for r in job.corpus.read().collect()}


def test_dedup_reconcile_full_index_shape(spark, tmp_path):
    """reconcile() on the band family: a corpus doc whose per-doc row
    vanished is re-shingled into BOTH index tables and gates again;
    per-doc orphans purge via stored band keys; a long index missing
    keys (crash between the two index merges) is re-synced row-level
    from the per-doc table."""
    root = tmp_path / "d"
    root.mkdir()
    corpus = ParquetUpsertTable(spark, str(root / "c"), ["doc_id"])
    doc_t = ParquetUpsertTable(spark, str(root / "dx"), ["doc_id"],
                               partition_col="idp")
    long_t = ParquetUpsertTable(spark, str(root / "l"),
                                ["doc_id", "band_key"],
                                partition_col="bkp")
    job = DedupIngestJob(spark, corpus, band_index=doc_t,
                         band_long_index=long_t, n_parts=64,
                         idp_parts=8)
    job.process_batch(_ddf(spark, [(1, _mk_doc(1)), (2, _mk_doc(2))]), 0)
    assert job.reconcile() == {"re_indexed": 0, "orphans_dropped": 0,
                               "long_repaired": 0}

    # crash A: doc 1's per-doc row vanished (its long rows too) — a
    # near-dup of doc 1 would slip past the gate
    keys1 = (doc_t.read().filter(F.col("doc_id") == 1)
             .select("doc_id", "idp"))
    long1 = (long_t.read().filter(F.col("doc_id") == 1)
             .select("doc_id", "band_key", "bkp"))
    long_t.delete_keys(long1)
    doc_t.delete_keys(keys1)
    out = job.reconcile()
    assert out["re_indexed"] == 1 and out["orphans_dropped"] == 0
    job.process_batch(_ddf(spark, [(3, _mk_doc(1) + " y")]), 1)
    assert {r.doc_id for r in corpus.read().collect()} == {1, 2}

    # crash B: long index lost doc 2's keys only — candidates missed
    long2 = (long_t.read().filter(F.col("doc_id") == 2)
             .select("doc_id", "band_key", "bkp"))
    n_keys2 = long2.count()
    long_t.delete_keys(long2)
    out = job.reconcile()
    assert out == {"re_indexed": 0, "orphans_dropped": 0,
                   "long_repaired": n_keys2}
    # long table is again exactly the explode of the per-doc table
    want = {(r.doc_id, r.band_key) for r in
            job._explode_long(doc_t.read()).collect()}
    got = {(r.doc_id, r.band_key) for r in long_t.read().collect()}
    assert got == want

    # crash C: doc 2 left the corpus, index rows remained (ghosts)
    corpus.delete_keys(spark.createDataFrame([(2,)], "doc_id bigint"))
    out = job.reconcile()
    assert out["orphans_dropped"] == 1
    assert {r.doc_id for r in doc_t.read().collect()} == {1}
    assert {r.doc_id for r in long_t.read().collect()} == {1}
    job.process_batch(_ddf(spark, [(4, _mk_doc(2) + " z")]), 2)
    assert 4 in {r.doc_id for r in corpus.read().collect()}


def test_embedding_reconcile_full_index_shape(spark, tmp_path):
    """reconcile() on the sign-LSH family: both index tables diffed
    key-level against a recompute from the corpus — missing rows
    merged, orphans dropped, second call a no-op."""
    root = tmp_path / "e"
    root.mkdir()
    corpus = ParquetUpsertTable(spark, str(root / "c"), ["vec_id"],
                                partition_col="idp")
    doc_t = ParquetUpsertTable(spark, str(root / "d"), ["vec_id"])
    long_t = ParquetUpsertTable(spark, str(root / "l"),
                                ["vec_id", "bi"], partition_col="bkp")
    job = EmbeddingIngestJob(spark, corpus, band_index=doc_t,
                             band_long_index=long_t, threshold=0.9,
                             bands=BANDS16, n_parts=16, idp_parts=8)
    v1, v2 = _vec(1), _vec(2)
    job.process_batch(_vdf(spark, [(1, v1), (2, v2)]), 0)
    assert job.reconcile() == {"re_indexed": 0, "orphans_dropped": 0}

    # crash A: vector 1's long rows vanished — candidates missed
    long1 = (long_t.read().filter(F.col("vec_id") == 1)
             .select("vec_id", "bi", "bkp"))
    n1 = long1.count()
    long_t.delete_keys(long1)
    out = job.reconcile()
    assert out == {"re_indexed": n1, "orphans_dropped": 0}
    job.process_batch(_vdf(spark, [(3, _near(v1, "n3"))]), 1)
    assert {r.vec_id for r in corpus.read().collect()} == {1, 2}

    # crash B: vector 2 left the corpus, index rows remained
    corpus.delete_keys(spark.createDataFrame(
        [(2,)], "vec_id bigint"))
    out = job.reconcile()
    assert out["orphans_dropped"] > 0
    assert {r.vec_id for r in doc_t.read().collect()} == {1}
    assert {r.vec_id for r in long_t.read().collect()} == {1}
    assert job.reconcile() == {"re_indexed": 0, "orphans_dropped": 0}
