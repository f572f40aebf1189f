"""Layout management: range clustering provably narrows per-file key
ranges (footer-stats pruning), compaction fixes small-file sprawl.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aether_firebase_consumer_spark.sinks.layout import (
    cluster_ranges,
    compact_small_files,
    overlap_fraction,
    write_range_clustered,
)

SF = "/root/testdata/sf0.001"


def test_range_clustered_write_is_prunable(spark, tmp_path):
    ev = spark.read.parquet(f"{SF}/events.parquet")

    # arrival-order baseline: shuffle rows, write unclustered
    base = str(tmp_path / "base")
    ev.repartition(8).write.parquet(base)
    base_overlap = overlap_fraction(cluster_ranges(base, "user_id"))

    clustered = str(tmp_path / "clustered")
    write_range_clustered(ev, clustered, ["user_id"], num_files=8)
    ranges = cluster_ranges(clustered, "user_id")
    clustered_overlap = overlap_fraction(ranges)

    assert len(ranges) >= 4
    # arrival order: nearly every file spans the whole domain
    assert base_overlap > 0.9
    # range clustering: near-disjoint files (sampling may leave a
    # boundary value shared by two adjacent files)
    assert clustered_overlap < 0.2
    # round-trip integrity
    assert spark.read.parquet(clustered).count() == ev.count()


def test_compact_small_files(spark, tmp_path):
    path = str(tmp_path / "t")
    ev = spark.read.parquet(f"{SF}/events.parquet")
    # simulate streaming sprawl: 16 tiny files
    ev.repartition(16).write.parquet(path)
    import os
    before = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    assert before >= 16

    total = ev.count()
    sums = ev.agg(F.sum("value")).collect()[0][0]

    after = compact_small_files(spark, path, target_file_bytes=10**9)
    assert after == 1
    got = spark.read.parquet(path)
    assert got.count() == total
    assert abs(got.agg(F.sum("value")).collect()[0][0] - sums) < 1e-6


def test_zorder_clustered_prunes_both_columns(spark, tmp_path):
    """Z-order layout must narrow footer ranges on BOTH cluster
    columns at once — the property single-key range clustering lacks
    (its trailing column stays arrival-ordered within each file)."""
    from aether_firebase_consumer_spark.sinks.layout import (
        write_zorder_clustered,
    )
    ev = spark.read.parquet(f"{SF}/events.parquet") \
        .select("event_id", "user_id", "value")

    base = str(tmp_path / "base")
    ev.repartition(16).write.parquet(base)
    zpath = str(tmp_path / "z")
    write_zorder_clustered(ev, zpath, ["user_id", "value"], num_files=16)

    def widths(path, col):
        rs = cluster_ranges(path, col)
        return sum(float(hi) - float(lo) for lo, hi in rs) / len(rs)

    # mean per-file range width shrinks on BOTH columns vs arrival order
    for col in ("user_id", "value"):
        assert widths(zpath, col) < 0.7 * widths(base, col), col

    # a 2-D box predicate must skip a real fraction of files on
    # footer stats alone
    uid_r = cluster_ranges(zpath, "user_id")
    val_r = cluster_ranges(zpath, "value")
    hit = sum(1 for (ul, uh), (vl, vh) in zip(uid_r, val_r)
              if ul <= 10 and uh >= 0 and float(vl) <= 10.0
              and float(vh) >= 0.0)
    assert hit < len(uid_r) / 2

    # round-trip integrity
    got = spark.read.parquet(zpath)
    assert got.count() == ev.count()
    assert got.agg(F.sum("user_id")).first()[0] \
        == ev.agg(F.sum("user_id")).first()[0]


def test_zorder_key_constant_column(spark):
    """A constant cluster column (min == max) must not divide by zero
    and must leave ordering to the other column."""
    from aether_firebase_consumer_spark.sinks.layout import zorder_key
    df = spark.range(100).selectExpr("id", "42 AS k")
    key, bounds = zorder_key(df, ["k", "id"], bits=4)
    assert bounds["k"] == (42, 42)
    vals = [r[0] for r in df.select(key).collect()]
    assert len(set(vals)) > 1  # id still differentiates


def test_upsert_table_optimize_zorder(spark, tmp_path):
    """OPTIMIZE ZORDER on the upsert table: content identical, new
    version behind the pointer, footer ranges narrowed on both
    cluster columns, pre-optimize snapshot still time-travelable."""
    from aether_firebase_consumer_spark.sinks.upsert import (
        ParquetUpsertTable,
    )
    t = ParquetUpsertTable(spark, str(tmp_path / "opt"), ["event_id"],
                           retain_versions=5)
    ev = spark.read.parquet(f"{SF}/events.parquet") \
        .select("event_id", "user_id", "value").repartition(16)
    t.merge(ev)
    v_before = t.current_version()
    before_sum = t.read().agg(F.sum("user_id")).first()[0]

    t.optimize(zorder_cols=["user_id", "value"], num_files=16)

    assert t.current_version() == v_before + 1
    got = t.read()
    assert got.count() == ev.count()
    assert got.agg(F.sum("user_id")).first()[0] == before_sum
    # clustered layout: mean footer range width shrinks on BOTH columns
    import os
    vdir = os.path.join(str(tmp_path / "opt"), f"v{v_before + 1}")
    pdir = os.path.join(str(tmp_path / "opt"), f"v{v_before}")

    def widths(path, col):
        rs = cluster_ranges(path, col)
        return sum(float(hi) - float(lo) for lo, hi in rs) / len(rs)

    for col in ("user_id", "value"):
        assert widths(vdir, col) < 0.7 * widths(pdir, col), col
    # pre-optimize version still readable (time travel)
    assert t.read_version(v_before).count() == ev.count()


def test_upsert_table_replace_atomic(spark, tmp_path):
    """replace(): full-table rebuild as ONE new version — absent keys
    drop (merge can't do that), the previous version survives for
    concurrent readers, and an empty replace refuses loudly instead of
    writing an unreadable all-empty version."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from aether_firebase_consumer_spark.sinks.upsert import (
        ParquetUpsertTable,
    )

    t = ParquetUpsertTable(spark, str(tmp_path / "t"), ["k"],
                           partition_col="p")
    t.merge(spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b"), (3, 30, "a")], "k int, v int, p string"))
    v0 = t.current_version()
    t.replace(spark.createDataFrame(
        [(2, 99, "b"), (9, 90, "c")], "k int, v int, p string"))
    assert t.current_version() == v0 + 1
    assert os.path.isdir(t._data_dir(v0))  # old version retained
    got = sorted(map(tuple, t.read().select("k", "v", "p").collect()))
    assert got == [(2, 99, "b"), (9, 90, "c")]  # keys 1,3 dropped
    # keys deduplicate like merge
    t.replace(spark.createDataFrame(
        [(5, 1, "x"), (5, 2, "x")], "k int, v int, p string"))
    assert t.read().count() == 1
    with pytest.raises(ValueError, match="empty"):
        t.replace(t.read().filter(F.lit(False)))


def test_snapshot_manifest_and_export(spark, tmp_path):
    """Dataset snapshot manifests: a training run can freeze EXACTLY
    the bytes it read (hardlinked snapshot + per-file md5 manifest),
    verify them later, and the live table's merges/GC never disturb
    the snapshot."""
    import os

    import pytest

    from aether_firebase_consumer_spark.sinks.manifest import (
        export_snapshot,
        read_snapshot_manifest,
        table_manifest,
        verify_manifest,
    )
    from aether_firebase_consumer_spark.sinks.upsert import (
        ParquetUpsertTable,
    )

    t = ParquetUpsertTable(spark, str(tmp_path / "t"), ["k"],
                           partition_col="p")
    t.merge(spark.createDataFrame(
        [(i, i * 10, f"p{i % 3}") for i in range(20)],
        "k int, v int, p string"))
    man = table_manifest(t)
    assert man["n_files"] > 0 and man["total_bytes"] > 0
    assert verify_manifest(t._data_dir(man["version"]), man) == []

    snap = str(tmp_path / "snap")
    export_snapshot(t, snap)
    assert read_snapshot_manifest(snap)["version"] == man["version"]
    snap_rows = sorted(map(tuple, spark.read.parquet(snap)
                           .select("k", "v").collect()))

    # live table moves on: merge + vacuum churn versions and GC the
    # snapshotted one — the snapshot is unaffected (hardlink pinning)
    for i in range(3):
        t.merge(spark.createDataFrame(
            [(100 + i, 1, "p0")], "k int, v int, p string"))
    t.vacuum(keep_last_n=2)
    assert not os.path.isdir(t._data_dir(man["version"]))
    assert verify_manifest(snap, read_snapshot_manifest(snap)) == []
    assert sorted(map(tuple, spark.read.parquet(snap)
                      .select("k", "v").collect())) == snap_rows

    # verification catches drift: truncate one file, add another
    f0 = os.path.join(snap, man["files"][0]["path"])
    os.remove(f0)  # remove, don't truncate: it is hardlink-shared
    with open(f0, "wb") as fh:
        fh.write(b"tampered")
    extra = os.path.join(snap, "rogue.parquet")
    with open(extra, "wb") as fh:
        fh.write(b"x")
    problems = verify_manifest(snap, read_snapshot_manifest(snap))
    assert any("drift" in p or "missing" in p for p in problems)
    assert any("unmanifested" in p for p in problems)

    # snapshots are immutable: re-export to the same path refuses
    with pytest.raises(ValueError, match="already exists"):
        export_snapshot(t, snap)
    # and a GC'd version cannot be manifested
    with pytest.raises(ValueError, match="no such version"):
        table_manifest(t, version=man["version"])


def test_snapshot_import_restores_table(spark, tmp_path):
    """import_snapshot (round 10): export → import → read() equals the
    snapshotted version exactly; the imported version verifies against
    the manifest; provenance lands in commit metadata; REPLACE
    semantics drop keys added after the export."""
    import os

    import pytest

    from aether_firebase_consumer_spark.sinks.manifest import (
        export_snapshot,
        import_snapshot,
        table_manifest,
        verify_manifest,
    )
    from aether_firebase_consumer_spark.sinks.upsert import (
        ParquetUpsertTable,
    )

    t = ParquetUpsertTable(spark, str(tmp_path / "src"), ["k"],
                           partition_col="p")
    t.merge(spark.createDataFrame(
        [(i, i * 10, f"p{i % 3}") for i in range(20)],
        "k int, v int, p string"))
    snap = str(tmp_path / "snap")
    man = export_snapshot(t, snap)
    pinned = sorted(map(tuple, spark.read.parquet(snap)
                        .select("k", "v", "p").collect()))

    # restore into a FRESH table
    fresh = ParquetUpsertTable(spark, str(tmp_path / "restored"), ["k"],
                               partition_col="p")
    got = import_snapshot(snap, fresh)
    assert got["version"] == man["version"]
    assert sorted(map(tuple, fresh.read()
                      .select("k", "v", "p").collect())) == pinned
    # the imported version dir verifies against the manifest
    # (ignoring the commit-meta sidecar, which is not a data file)
    assert verify_manifest(fresh._data_dir(fresh.current_version()),
                           man) == []
    assert fresh.commit_meta()["imported_snapshot"]["source_version"] \
        == man["version"]
    # and the restored table is a live table again
    fresh.merge(spark.createDataFrame([(100, 1, "p0")],
                                      "k int, v int, p string"))
    assert fresh.read().count() == 21

    # restore ONTO the drifted source table: REPLACE semantics — the
    # post-export merge's key drops out, the snapshot rows return
    t.merge(spark.createDataFrame([(999, 5, "p1")],
                                  "k int, v int, p string"))
    import_snapshot(snap, t)
    assert sorted(map(tuple, t.read()
                      .select("k", "v", "p").collect())) == pinned
    # time travel still reaches the pre-restore state
    assert t.read_version(t.current_version() - 1) \
        .where("k = 999").count() == 1

    # a tampered snapshot refuses to import
    f0 = os.path.join(snap, man["files"][0]["path"])
    os.remove(f0)
    with open(f0, "wb") as fh:
        fh.write(b"tampered")
    with pytest.raises(ValueError, match="fails verification"):
        import_snapshot(snap, fresh)

    # partition-layout mismatch refuses to import
    flat = ParquetUpsertTable(spark, str(tmp_path / "flat"), ["k"])
    snap2 = str(tmp_path / "snap2")
    export_snapshot(t, snap2)
    with pytest.raises(ValueError, match="partition layout mismatch"):
        import_snapshot(snap2, flat)


def test_snapshot_import_fresh_partitioned_manifest(spark, tmp_path):
    """Manifesting and re-importing the IMPORTED version again is
    byte-stable (hardlinks share inodes, but the manifest is content-
    addressed, not inode-addressed)."""
    from aether_firebase_consumer_spark.sinks.manifest import (
        export_snapshot,
        import_snapshot,
        table_manifest,
    )
    from aether_firebase_consumer_spark.sinks.upsert import (
        ParquetUpsertTable,
    )

    t = ParquetUpsertTable(spark, str(tmp_path / "a"), ["k"])
    t.merge(spark.createDataFrame([(1, "x"), (2, "y")], "k int, v string"))
    snap = str(tmp_path / "s")
    man = export_snapshot(t, snap)
    b = ParquetUpsertTable(spark, str(tmp_path / "b"), ["k"])
    import_snapshot(snap, b)
    man_b = table_manifest(b)
    assert {f["md5"] for f in man_b["files"]} \
        == {f["md5"] for f in man["files"]}
