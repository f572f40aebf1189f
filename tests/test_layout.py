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
