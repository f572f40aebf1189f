"""Sharded stats manifests (round 11): a partitioned table's
per-version manifest is one shard JSON per hive partition directory
under ``_STATS.d/``, with a root ``_STATS.json`` of counts +
signatures. Pins the two scale claims — untouched shards HARDLINK
(write cost ∝ touched partitions) and partition-equality probes parse
ONLY their shard — plus exactness, null-partition handling, flat
back-compat, and corrupt-shard degradation to an unpruned read."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from aether_firebase_consumer_spark.sinks.stats import (
    ShardedManifest,
    load_manifest,
    prune_files,
)
from aether_firebase_consumer_spark.sinks.upsert import ParquetUpsertTable


def _mk(spark, tmp_path, rows=None):
    t = ParquetUpsertTable(spark, str(tmp_path / "t"), ["k"],
                           partition_col="p",
                           stats_cols=["k"], bloom_cols=["k"],
                           retain_versions=10)
    rows = rows if rows is not None else \
        [(i, i % 4, f"v{i}") for i in range(40)]
    t.merge(spark.createDataFrame(rows, "k bigint, p int, v string"))
    return t


def _on_disk(vdir):
    out = set()
    for root, dirs, names in os.walk(vdir):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        out |= {os.path.relpath(os.path.join(root, n), vdir)
                for n in names if n.endswith(".parquet")}
    return out


def test_partitioned_table_writes_sharded_layout(spark, tmp_path):
    t = _mk(spark, tmp_path)
    vdir = t._data_dir(t.current_version())
    with open(os.path.join(vdir, "_STATS.json")) as fh:
        root = json.load(fh)
    assert root["sharded"] is True
    assert set(root["shards"]) == {f"p={i}" for i in range(4)}
    assert all(set(m) == {"n", "sig", "rows"}
               for m in root["shards"].values())
    shard_files = set(os.listdir(os.path.join(vdir, "_STATS.d")))
    assert shard_files == {f"p={i}.json" for i in range(4)}
    # flat-dict compat: man["files"] is the authoritative file list
    man = load_manifest(vdir)
    assert isinstance(man, ShardedManifest)
    assert set(man["files"]) == _on_disk(vdir)
    assert man.total_files == len(man["files"])


def test_unpartitioned_table_stays_flat(spark, tmp_path):
    t = ParquetUpsertTable(spark, str(tmp_path / "f"), ["k"],
                           stats_cols=["k"])
    t.merge(spark.createDataFrame([(1, "a"), (2, "b")],
                                  "k bigint, v string"))
    vdir = t._data_dir(t.current_version())
    man = load_manifest(vdir)
    assert isinstance(man, dict) and "files" in man
    assert not os.path.exists(os.path.join(vdir, "_STATS.d"))


def test_untouched_shards_hardlink_from_parent(spark, tmp_path):
    """Manifest write cost ∝ touched partitions: a merge into p=0
    leaves every other partition's shard JSON inode-identical to the
    parent's — zero parse, zero serialization."""
    t = _mk(spark, tmp_path)
    v0 = t.current_version()
    t.merge(spark.createDataFrame([(100, 0, "new")],
                                  "k bigint, p int, v string"))
    v1 = t.current_version()
    d0, d1 = t._data_dir(v0), t._data_dir(v1)

    def ino(d, shard):
        return os.stat(os.path.join(d, "_STATS.d", shard)).st_ino

    for shard in ("p=1.json", "p=2.json", "p=3.json"):
        assert ino(d0, shard) == ino(d1, shard)
    assert ino(d0, "p=0.json") != ino(d1, "p=0.json")
    # and the rebuilt shard knows its new file
    man = load_manifest(d1)
    assert set(man["files"]) == _on_disk(d1)


def test_partition_equality_probe_parses_only_its_shard(spark,
                                                        tmp_path):
    t = _mk(spark, tmp_path)
    man = load_manifest(t._data_dir(t.current_version()))
    kept, total = prune_files(man, [("p", "=", 2)], partition_col="p")
    assert man.loaded == {"p=2"}
    assert kept and all(r.startswith("p=2" + os.sep) for r in kept)
    assert total == man.total_files
    # IN-list loads exactly the named shards
    man2 = load_manifest(t._data_dir(t.current_version()))
    kept2, _ = prune_files(man2, [("p", "in", [1, 3])],
                           partition_col="p")
    assert man2.loaded == {"p=1", "p=3"}
    assert {r.partition(os.sep)[0] for r in kept2} == {"p=1", "p=3"}
    # a non-partition predicate still consults every shard
    man3 = load_manifest(t._data_dir(t.current_version()))
    prune_files(man3, [("k", ">=", 100)], partition_col="p")
    assert man3.loaded == {f"p={i}" for i in range(4)}


def test_sharded_read_where_and_delete_where_exact(spark, tmp_path):
    t = _mk(spark, tmp_path)
    full = t.read()
    want = sorted(map(tuple, full.filter(
        (F.col("p") == 2) & (F.col("k") >= 10)).collect()))
    got = sorted(map(tuple, t.read_where(
        ("p", "=", 2), ("k", ">=", 10)).collect()))
    assert got == want
    # predicate delete through the sharded plan
    n = t.delete_where(("p", "=", 1))
    assert n == 10
    assert sorted(r.p for r in t.read().select("p").distinct()
                  .collect()) == [0, 2, 3]
    assert t.read().count() == 30


def test_null_partition_shard(spark, tmp_path):
    rows = [(i, i % 2, f"v{i}") for i in range(10)] + \
        [(99, None, "nullp")]
    t = _mk(spark, tmp_path, rows=rows)
    vdir = t._data_dir(t.current_version())
    man = load_manifest(vdir)
    assert "p=__HIVE_DEFAULT_PARTITION__" in man.shards
    # equality on p can never match the null shard: pruned unparsed
    kept, _ = prune_files(man, [("p", "=", 1)], partition_col="p")
    assert man.loaded == {"p=1"}
    assert all(r.startswith("p=1" + os.sep) for r in kept)
    # and the exact read agrees with a plain filter
    got = sorted(r.k for r in t.read_where(("p", "=", 1)).collect())
    want = sorted(r.k for r in t.read().filter("p = 1").collect())
    assert got == want
    # the null row is still reachable without a p predicate
    assert sorted(r.k for r in
                  t.read_where(("k", ">=", 99)).collect()) == [99]


def test_flat_backcompat_prunes_identically(spark, tmp_path):
    """A pre-shard flat manifest over the same files prunes to the
    same kept set (minus the name-level laziness) — old versions on
    disk keep working."""
    t = _mk(spark, tmp_path)
    vdir = t._data_dir(t.current_version())
    sharded = load_manifest(vdir)
    flat = {"cols": sharded["cols"],
            "bloom_cols": sharded.get("bloom_cols", []),
            "files": dict(sharded["files"])}
    for preds in ([("p", "=", 2)], [("k", ">=", 20), ("k", "<", 30)],
                  [("k", "in", [5, 17])]):
        k_flat, t_flat = prune_files(flat, preds, partition_col="p")
        k_sh, t_sh = prune_files(
            load_manifest(vdir), preds, partition_col="p")
        assert t_flat == t_sh
        # name-level pruning may drop MORE files than interval stats
        # alone (p is not a stats col), never fewer matching ones
        assert set(k_sh) <= set(k_flat)
        base = vdir
        df_flat = (spark.read.option("basePath", base)
                   .parquet(*[os.path.join(base, r) for r in k_flat])
                   ) if k_flat else None
        cond = None
        for c, op, v in preds:
            if op == "in":
                e = F.col(c).isin(list(v))
            elif op == "=":
                e = F.col(c) == v
            elif op == ">=":
                e = F.col(c) >= v
            else:
                e = F.col(c) < v
            cond = e if cond is None else cond & e
        if df_flat is not None:
            rows_flat = sorted(r.k for r in
                               df_flat.filter(cond).collect())
            df_sh = (spark.read.option("basePath", base)
                     .parquet(*[os.path.join(base, r) for r in k_sh]))
            rows_sh = sorted(r.k for r in df_sh.filter(cond).collect())
            assert rows_sh == rows_flat


def test_corrupt_shard_degrades_to_unpruned_read(spark, tmp_path):
    t = _mk(spark, tmp_path)
    vdir = t._data_dir(t.current_version())
    os.unlink(os.path.join(vdir, "_STATS.d", "p=2.json"))
    # structurally incomplete manifest: no skipping at all
    assert load_manifest(vdir) is None
    assert t.files_for([("p", "=", 2)]) is None
    # read_where falls back to the full filtered read — still exact
    got = sorted(r.k for r in t.read_where(("p", "=", 2)).collect())
    want = sorted(r.k for r in t.read().filter("p = 2").collect())
    assert got == want


def test_optimize_rebuilds_touched_shards(spark, tmp_path):
    """OPTIMIZE rewrites files: sigs change, shards rebuild, and the
    manifest file list still matches disk; pruned reads stay exact."""
    t = _mk(spark, tmp_path)
    t.merge(spark.createDataFrame([(200 + i, i % 4, "x")
                                   for i in range(8)],
                                  "k bigint, p int, v string"))
    t.optimize()
    vdir = t._data_dir(t.current_version())
    man = load_manifest(vdir)
    assert set(man["files"]) == _on_disk(vdir)
    got = sorted(r.k for r in t.read_where(("k", ">=", 200)).collect())
    assert got == sorted(200 + i for i in range(8))


def test_metadata_row_counts(spark, tmp_path):
    """COUNT(*) and GROUP BY partition counts from the manifest alone
    — exact through merges, deletes, null partitions, and OPTIMIZE;
    no file is opened (the counts come from root-doc sums)."""
    rows = [(i, i % 3, f"v{i}") for i in range(30)] + \
        [(90, None, "np"), (91, None, "np2")]
    t = _mk(spark, tmp_path, rows=rows)

    def check(t):
        assert t.row_count() == t.read().count()
        got = dict(t.partition_row_counts())
        want = {(None if r.p is None else str(r.p)): r.n for r in
                t.read().groupBy("p").agg(
                    F.count("*").alias("n")).collect()}
        assert got == want

    check(t)
    # the root doc alone answers: no shard is ever parsed
    man = load_manifest(t._data_dir(t.current_version()))
    from aether_firebase_consumer_spark.sinks.stats import (
        partition_row_counts as prc,
        row_count as rc,
    )
    assert rc(man) == 32 and len(prc(man)) == 4
    assert man.loaded == set()
    # counts track merges (update + insert), deletes, and optimize
    t.merge(spark.createDataFrame([(0, 0, "upd"), (200, 1, "ins")],
                                  "k bigint, p int, v string"))
    check(t)
    t.delete_where(("p", "=", 2))
    check(t)
    t.delete_keys(spark.createDataFrame([(91,)], "k bigint"))
    check(t)
    t.optimize()
    check(t)


def test_time_travel_read_where(spark, tmp_path):
    """read_where(version=...) skips against THAT version's manifest
    (committed atomically with its data): pre-delete state stays
    queryable with pruning, results exact vs read_version + filter,
    and a vacuumed version raises like read_version does."""
    t = _mk(spark, tmp_path)
    v0 = t.current_version()
    t.delete_where(("p", "=", 1))
    t.merge(spark.createDataFrame([(500, 2, "new")],
                                  "k bigint, p int, v string"))

    def want(v, cond):
        return sorted(r.k for r in
                      t.read_version(v).filter(cond).collect())

    got0 = sorted(r.k for r in
                  t.read_where(("p", "=", 1), version=v0).collect())
    assert got0 == want(v0, "p = 1") and len(got0) == 10
    # current version: p=1 is gone, the new row visible
    assert t.read_where(("p", "=", 1)).count() == 0
    assert sorted(r.k for r in
                  t.read_where(("k", ">=", 500)).collect()) == [500]
    # intermediate version: deletion applied, insert not yet
    got1 = sorted(r.k for r in
                  t.read_where(("k", ">=", 500),
                               version=v0 + 1).collect())
    assert got1 == []
    with pytest.raises(ValueError, match="vacuumed|retained"):
        t.read_where(("p", "=", 1), version=99)


def test_flat_row_count(spark, tmp_path):
    t = ParquetUpsertTable(spark, str(tmp_path / "f"), ["k"],
                           stats_cols=["k"])
    t.merge(spark.createDataFrame([(i, "x") for i in range(25)],
                                  "k bigint, v string"))
    assert t.row_count() == 25
    assert t.partition_row_counts() is None  # flat: no shard meta
    # pre-rows manifests answer None, never a wrong count
    import json as _json
    vdir = t._data_dir(t.current_version())
    with open(os.path.join(vdir, "_STATS.json")) as fh:
        doc = _json.load(fh)
    for st in doc["files"].values():
        st.pop("__rows__", None)
    with open(os.path.join(vdir, "_STATS.json"), "w") as fh:
        _json.dump(doc, fh)
    assert t.row_count() is None


def test_point_lookup_bloom_on_sharded(spark, tmp_path):
    """Bloom equality pruning composes with shard-name pruning: a
    (p, k) point probe parses one shard and keeps at most the files
    whose bloom admits k."""
    t = _mk(spark, tmp_path)
    man = load_manifest(t._data_dir(t.current_version()))
    kept, _ = prune_files(man, [("p", "=", 3), ("k", "=", 7)],
                          partition_col="p")
    assert man.loaded == {"p=3"}
    got = sorted(map(tuple, t.read_where(("p", "=", 3), ("k", "=", 7))
                     .select("k", "p").collect()))
    assert got == [(7, 3)]
    # absent key: bloom proves absence file-by-file
    assert t.read_where(("p", "=", 3), ("k", "=", 7777)).count() == 0
