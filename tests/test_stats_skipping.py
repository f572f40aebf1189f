"""Manifest-level data skipping (round 10): per-version `_STATS.json`
file stats in ParquetUpsertTable — the pruning layer between partition
pruning and parquet row-group pruning. Pins: manifests are written
atomically with commits and carried forward for hardlinked files (new
files only pay the footer read), read_where() provably skips files
while staying row-exact vs the full filtered read, and every
uncertain-stats case degrades to keep-the-file, never to a dropped
row."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from aether_firebase_consumer_spark.sinks import stats as stats_mod
from aether_firebase_consumer_spark.sinks.stats import (
    keeps,
    load_manifest,
)
from aether_firebase_consumer_spark.sinks.upsert import ParquetUpsertTable


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "k bigint, n bigint, s string, p int")


def _rows(lo, hi, p):
    return [(i, i * 10, f"w{i:04d}", p) for i in range(lo, hi)]


def _mk(spark, root, **kw):
    return ParquetUpsertTable(spark, str(root), ["k"],
                              partition_col="p",
                              stats_cols=["n", "s"], **kw)


def _snap(df):
    return sorted((r.k, r.n, r.s, r.p) for r in df.collect())


def test_manifest_written_and_read_where_exact(spark, tmp_path):
    """Each commit's version dir carries its manifest; read_where over
    a range predicate returns exactly what a full filtered read does,
    from a strict subset of the version's files."""
    t = _mk(spark, tmp_path / "t")
    # three commits with disjoint n-ranges -> narrow per-file stats
    t.merge(_df(spark, _rows(0, 20, 0)).coalesce(1))
    t.merge(_df(spark, _rows(20, 40, 1)).coalesce(1))
    t.merge(_df(spark, _rows(40, 60, 2)).coalesce(1))

    man = load_manifest(t._data_dir(t.current_version()))
    assert man is not None and man["cols"] == ["n", "s"]
    assert len(man["files"]) >= 3
    for rel, st in man["files"].items():
        assert "n" in st and "s" in st, (rel, st)

    preds = [("n", ">=", 250), ("n", "<", 450)]
    plan = t.files_for(preds)
    assert plan is not None
    _v, kept, total = plan
    assert 0 < len(kept) < total, (kept, total)
    got = _snap(t.read_where(*preds))
    want = _snap(t.read().filter((F.col("n") >= 250)
                                 & (F.col("n") < 450)))
    assert got == want and len(got) == 20


def test_carried_files_inherit_stats_without_footer_reads(
        spark, tmp_path, monkeypatch):
    """Incrementality: a merge touching one partition re-reads footers
    only for its NEW files; every hardlinked carry-over inherits its
    manifest entry verbatim (cost ∝ batch, the Delta add-file
    shape)."""
    t = _mk(spark, tmp_path / "t")
    t.merge(_df(spark, _rows(0, 20, 0) + _rows(20, 40, 1)
                + _rows(40, 60, 2)))
    before = load_manifest(t._data_dir(t.current_version()))["files"]

    calls = []
    real = stats_mod.file_column_stats

    def counting(path, cols):
        calls.append(path)
        return real(path, cols)

    monkeypatch.setattr(stats_mod, "file_column_stats", counting)
    t.merge(_df(spark, [(5, 999, "zz", 0)]))  # touches partition 0 only
    after = load_manifest(t._data_dir(t.current_version()))["files"]

    # footer reads happened only under partition p=0's new files
    assert calls and all("p=0" in c for c in calls)
    carried = {r: s for r, s in after.items() if not r.startswith("p=0")}
    assert carried == {r: s for r, s in before.items()
                      if not r.startswith("p=0")}
    # and the moved bound is visible in the new partition-0 stats
    n_hi = max(s["n"][1] for r, s in after.items()
               if r.startswith("p=0"))
    assert n_hi == 999


def test_read_where_empty_selection_and_no_manifest(spark, tmp_path):
    """Out-of-range predicates fold to an empty scan with the right
    schema; a stats-less table transparently falls back to the full
    filtered read."""
    t = _mk(spark, tmp_path / "t")
    t.merge(_df(spark, _rows(0, 10, 0)))
    empty = t.read_where(("n", ">", 10_000))
    assert empty.count() == 0
    assert set(empty.columns) == {"k", "n", "s", "p"}
    plan = t.files_for([("n", ">", 10_000)])
    assert plan is not None and plan[1] == []

    plain = ParquetUpsertTable(spark, str(tmp_path / "u"), ["k"],
                               partition_col="p")
    plain.merge(_df(spark, _rows(0, 10, 0)))
    assert plain.files_for([("n", ">", 50)]) is None
    got = _snap(plain.read_where(("n", ">", 50)))
    assert got == _snap(plain.read().filter(F.col("n") > 50))


def test_stats_survive_optimize_and_delete(spark, tmp_path):
    """Maintenance commits (optimize, delete_keys) regenerate the
    manifest for their rewritten files; read_where stays exact."""
    t = _mk(spark, tmp_path / "t")
    for lo in range(0, 60, 20):
        t.merge(_df(spark, _rows(lo, lo + 20, lo // 20)))
    t.delete_keys(spark.createDataFrame([(45, 2)], "k bigint, p int"))
    t.optimize(num_files=2)
    man = load_manifest(t._data_dir(t.current_version()))
    assert man is not None and len(man["files"]) >= 2
    preds = [("n", ">=", 400)]
    got = _snap(t.read_where(*preds))
    want = _snap(t.read().filter(F.col("n") >= 400))
    assert got == want and (45, 450, "w0045", 2) not in got


def test_string_stats_prune_and_long_strings_stay_safe(spark, tmp_path):
    """String bounds prune too — but a bound at the writer-truncation
    threshold is dropped from the manifest, so a file with long
    strings is always kept (never wrongly skipped)."""
    t = _mk(spark, tmp_path / "t")
    t.merge(_df(spark, _rows(0, 20, 0)).coalesce(1))
    t.merge(_df(spark, _rows(20, 40, 1)).coalesce(1))
    preds = [("s", ">=", "w0025")]
    _v, kept, total = t.files_for(preds)
    assert 0 < len(kept) < total
    assert _snap(t.read_where(*preds)) == \
        _snap(t.read().filter(F.col("s") >= "w0025"))

    long_t = ParquetUpsertTable(spark, str(tmp_path / "l"), ["k"],
                                stats_cols=["s"])
    long_t.merge(spark.createDataFrame(
        [(1, "x" * 100), (2, "y" * 100)], "k bigint, s string")
        .coalesce(1))
    man = load_manifest(long_t._data_dir(long_t.current_version()))
    assert all("s" not in st for st in man["files"].values())
    # untrusted bounds -> file kept -> rows still found
    assert long_t.read_where(("s", ">=", "y")).count() == 1


def test_keeps_conservative_cases():
    """Interval logic unit cases incl. the conservative keeps."""
    st = {"n": [10, 20]}
    assert keeps(st, "n", "<", 11) and not keeps(st, "n", "<", 10)
    assert keeps(st, "n", "<=", 10) and not keeps(st, "n", "<=", 9)
    assert keeps(st, "n", ">", 19) and not keeps(st, "n", ">", 20)
    assert keeps(st, "n", ">=", 20) and not keeps(st, "n", ">=", 21)
    assert keeps(st, "n", "=", 15) and not keeps(st, "n", "=", 21)
    assert keeps({}, "n", "=", 5)            # no stats for col
    assert keeps(st, "other", "=", 5)        # untracked col
    assert keeps(st, "n", "=", "str")        # incomparable literal
    try:
        keeps(st, "n", "!=", 5)
        assert False, "unsupported op must raise"
    except ValueError:
        pass


def test_manifest_atomic_with_commit(spark, tmp_path):
    """The manifest lives INSIDE the version dir the CAS publishes —
    whatever version the pointer names, its manifest describes exactly
    that version's files (checked across two quick commits)."""
    t = _mk(spark, tmp_path / "t")
    t.merge(_df(spark, _rows(0, 10, 0)))
    t.merge(_df(spark, _rows(10, 20, 1)))
    for v in t.versions():
        man = load_manifest(t._data_dir(v))
        assert man is not None
        on_disk = set()
        base = t._data_dir(v)
        for root, _d, names in os.walk(base):
            # the manifest is the DATA file list; `_changes`
            # recordings are bookkeeping and rightly absent
            _d[:] = [d for d in _d if not d.startswith(("_", "."))]
            for nm in names:
                if nm.endswith(".parquet"):
                    on_disk.add(
                        os.path.relpath(os.path.join(root, nm), base))
        assert set(man["files"]) == on_disk


# ------------------------------------------------------ delete_where


def test_delete_where_rewrites_only_admitting_files(spark, tmp_path):
    """Retention delete: only files whose stats admit the predicate
    are rewritten; every other file carries as a hardlink (same
    inode). Row results equal the full filtered rewrite."""
    t = _mk(spark, tmp_path / "t")
    t.merge(_df(spark, _rows(0, 20, 0)).coalesce(1))
    t.merge(_df(spark, _rows(20, 40, 1)).coalesce(1))
    t.merge(_df(spark, _rows(40, 60, 2)).coalesce(1))
    v_before = t.current_version()
    base = t._data_dir(v_before)
    inodes_before = {}
    for root, _d, names in os.walk(base):
        _d[:] = [d for d in _d if not d.startswith(("_", "."))]
        for nm in names:
            if nm.endswith(".parquet"):
                p = os.path.join(root, nm)
                inodes_before[os.path.relpath(p, base)] = \
                    os.stat(p).st_ino

    n = t.delete_where(("n", ">=", 200), ("n", "<", 400))
    assert n == 20
    got = _snap(t.read())
    assert got == _snap(_df(spark, _rows(0, 20, 0) + _rows(40, 60, 2)))

    newbase = t._data_dir(t.current_version())
    carried = 0
    for root, _d, names in os.walk(newbase):
        for nm in names:
            if nm.endswith(".parquet"):
                p = os.path.join(root, nm)
                rel = os.path.relpath(p, newbase)
                if rel in inodes_before \
                        and os.stat(p).st_ino == inodes_before[rel]:
                    carried += 1
    # partitions 0 and 2's files carried untouched; partition 1's were
    # rewritten away
    assert carried >= 2
    assert not any(rel.startswith("p=1") for rel in
                   load_manifest(newbase)["files"])


def test_delete_where_null_rows_survive(spark, tmp_path):
    """SQL DELETE semantics: rows where the predicate is NULL are
    kept, not deleted."""
    t = ParquetUpsertTable(spark, str(tmp_path / "t"), ["k"],
                           stats_cols=["n"])
    t.merge(spark.createDataFrame(
        [(1, 5), (2, None), (3, 50)], "k bigint, n bigint"))
    assert t.delete_where(("n", "<", 10)) == 1
    assert {r.k for r in t.read().collect()} == {2, 3}


def test_delete_where_no_match_commits_nothing(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.merge(_df(spark, _rows(0, 10, 0)))
    v = t.current_version()
    assert t.delete_where(("n", ">", 10_000)) == 0
    assert t.current_version() == v


def test_delete_where_without_manifest_full_rewrite(spark, tmp_path):
    t = ParquetUpsertTable(spark, str(tmp_path / "t"), ["k"],
                           partition_col="p")
    t.merge(_df(spark, _rows(0, 30, 0)))
    assert t.delete_where(("n", ">=", 150)) == 15
    assert _snap(t.read()) == _snap(_df(spark, _rows(0, 15, 0)))


def test_delete_where_everything_stays_readable(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.merge(_df(spark, _rows(0, 10, 0)))
    assert t.delete_where(("n", ">=", 0)) == 10
    assert t.read().count() == 0
    t.merge(_df(spark, _rows(0, 5, 0)))   # table still usable
    assert t.read().count() == 5


def test_timestamp_retention_delete_and_read(spark, tmp_path):
    """The canonical retention op: ts bounds are tracked as epoch
    micros in the manifest, a datetime literal prunes files, and
    delete_where(("ts", "<", cutoff)) rewrites only the files whose
    range admits the cutoff — old segments drop, recent segments
    carry as hardlinks."""
    import datetime as dt

    t = ParquetUpsertTable(spark, str(tmp_path / "t"), ["k"],
                           partition_col="p", stats_cols=["ts"])

    def day(d, lo, hi, p):
        base = dt.datetime(2026, 1, d)
        return [(d * 100 + i,
                 base + dt.timedelta(minutes=i), p)
                for i in range(lo, hi)]

    sch = "k bigint, ts timestamp, p int"
    t.merge(spark.createDataFrame(day(1, 0, 10, 0), sch).coalesce(1))
    t.merge(spark.createDataFrame(day(2, 0, 10, 1), sch).coalesce(1))
    t.merge(spark.createDataFrame(day(3, 0, 10, 2), sch).coalesce(1))

    cutoff = dt.datetime(2026, 1, 2)
    plan = t.files_for([("ts", "<", cutoff)])
    assert plan is not None and 0 < len(plan[1]) < plan[2]
    assert t.read_where(("ts", "<", cutoff)).count() == 10

    base = t._data_dir(t.current_version())
    inode = {os.path.relpath(os.path.join(r, n), base):
             os.stat(os.path.join(r, n)).st_ino
             for r, _d, ns in os.walk(base) for n in ns
             if n.endswith(".parquet")}
    assert t.delete_where(("ts", "<", cutoff)) == 10
    assert t.read().count() == 20
    assert t.read().agg(F.min("ts")).first()[0] == \
        dt.datetime(2026, 1, 2)
    newbase = t._data_dir(t.current_version())
    carried = sum(
        1 for r, _d, ns in os.walk(newbase) for n in ns
        if n.endswith(".parquet")
        and os.path.relpath(os.path.join(r, n), newbase) in inode
        and os.stat(os.path.join(r, n)).st_ino
        == inode[os.path.relpath(os.path.join(r, n), newbase)])
    assert carried >= 2  # day-2 and day-3 segments untouched


# ----------------------------------------------------- bloom skipping


def test_bloom_point_lookup_prunes_unsorted_files(spark, tmp_path):
    """The takedown-by-id case: ids are hash-scattered so every file's
    [min, max] spans the whole domain (interval stats prune nothing);
    the per-file bloom still narrows an equality probe to ~1 file, and
    every present id is FOUND (false negatives impossible)."""
    t = ParquetUpsertTable(spark, str(tmp_path / "t"), ["k"],
                           partition_col="p",
                           stats_cols=["k"], bloom_cols=["k"])
    # 4 hash-interleaved files (one per p): every file's k range spans
    # the whole domain
    rows = spark.createDataFrame(
        [(i, f"v{i}", i % 4) for i in range(400)],
        "k bigint, s string, p int")
    t.merge(rows.repartition(1))

    _v, all_kept, total = t.files_for([("k", ">=", 0)])
    assert total == 4 and len(all_kept) == 4   # intervals: no pruning

    pruned_counts = []
    for probe in (1, 102, 203, 304):
        _v, kept, _tot = t.files_for([("k", "=", probe)])
        pruned_counts.append(len(kept))
        rows = t.read_where(("k", "=", probe)).collect()
        assert [r.k for r in rows] == [probe]   # always found
    # bloom fp ~1%: overwhelmingly 1 file per probe
    assert sum(pruned_counts) <= 6, pruned_counts

    # absent id: provably nowhere -> zero files, zero rows
    _v, kept, _tot = t.files_for([("k", "=", 9999)])
    assert kept == [] or len(kept) <= 1         # fp tolerance
    assert t.read_where(("k", "=", 9999)).count() == 0


def test_bloom_type_guard_and_range_ops_unaffected(spark, tmp_path):
    """A mistyped literal can't produce a wrong skip, and blooms never
    participate in range predicates."""
    t = ParquetUpsertTable(spark, str(tmp_path / "t"), ["k"],
                           stats_cols=["k"], bloom_cols=["s"])
    t.merge(spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "k bigint, s string").coalesce(1))
    # string bloom, unbloomable literal types -> keep (never a skip)
    _v, kept, _tot = t.files_for([("s", "=", 1.5)])
    assert len(kept) == 1
    _v, kept, _tot = t.files_for([("s", "=", None)])
    assert len(kept) == 1
    # present / absent strings
    assert t.read_where(("s", "=", "alpha")).count() == 1
    _v, kept, _tot = t.files_for([("s", "=", "zzz")])
    assert kept == []
    # range op on the bloomed col ignores the bloom (interval on "s"
    # still applies via stats_cols? "s" is not in stats_cols -> kept)
    assert t.read_where(("s", ">=", "a")).count() == 2


def test_bloom_carries_forward_and_survives_delete(spark, tmp_path):
    """Bloom entries ride the same carry-forward as interval stats;
    after delete_where removes a file's rows, probes for its ids
    return empty (the rewritten file's bloom no longer claims them)."""
    t = ParquetUpsertTable(spark, str(tmp_path / "t"), ["k"],
                           partition_col="p",
                           stats_cols=["n"], bloom_cols=["k"])
    t.merge(_df(spark, _rows(0, 20, 0)).coalesce(1))
    t.merge(_df(spark, _rows(20, 40, 1)).coalesce(1))
    man = load_manifest(t._data_dir(t.current_version()))
    assert all("__bloom__" in st and "k" in st["__bloom__"]
               for st in man["files"].values())
    assert t.delete_where(("n", ">=", 200)) == 20   # drops p=1 rows
    _v, kept, _tot = t.files_for([("k", "=", 25)])
    assert kept == []
    assert t.read_where(("k", "=", 5)).count() == 1


def test_in_list_point_lookup_and_delete(spark, tmp_path):
    """The id-LIST takedown shape: one ("k", "in", ids) predicate
    prunes with blooms in a single manifest pass, reads exactly the
    listed rows, and delete_where removes them rewriting only the
    files that might hold them."""
    t = ParquetUpsertTable(spark, str(tmp_path / "t"), ["k"],
                           partition_col="p",
                           stats_cols=["k"], bloom_cols=["k"])
    rows = spark.createDataFrame(
        [(i, f"v{i}", i % 4) for i in range(400)],
        "k bigint, s string, p int")
    t.merge(rows.repartition(1))

    ids = [3, 101, 9999]                    # 9999 absent
    _v, kept, total = t.files_for([("k", "in", ids)])
    assert total == 4 and len(kept) <= 3    # bloom-pruned disjunction
    got = sorted(r.k for r in t.read_where(("k", "in", ids)).collect())
    assert got == [3, 101]

    assert t.delete_where(("k", "in", ids)) == 2
    assert t.read().count() == 398
    assert t.read_where(("k", "in", ids)).count() == 0


def test_keeps_in_semantics():
    from aether_firebase_consumer_spark.sinks.stats import keeps
    st = {"n": [10, 20]}
    assert keeps(st, "n", "in", [1, 15])     # one member inside
    assert not keeps(st, "n", "in", [1, 25])  # all outside
    assert not keeps(st, "n", "in", [])       # empty list: no match
    assert keeps(st, "n", "in", ["x", 12])    # incomparable member kept
