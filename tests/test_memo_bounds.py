"""Driver-side memo caches stay bounded (r15, VERDICT r14 #2 /
ADVICE r14): a long-lived writer or a driver that retrains per batch
must not accumulate handles forever.

- ``ParquetUpsertTable._read_memo``: one entry per version (plus one
  per skipped-read file set) — evicted in lockstep with the on-disk
  retention window at commit and vacuum time.
- ``tables._TABLE_MEMO`` / ``_FAN_MEMO`` and
  ``functions.vectors._LIT_CACHE``: LRU-capped.
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401

from aether_firebase_consumer_spark.sinks.upsert import ParquetUpsertTable


def test_read_memo_bounded_by_retention(spark, tmp_path):
    t = ParquetUpsertTable(spark, str(tmp_path / "t"), ["k"],
                           retain_versions=2)
    for i in range(7):
        t.merge(spark.createDataFrame([(i, i * 10)], "k int, v int"))
        t.read().count()  # populate the memo for the live version
    # 7 commits with retain_versions=2: only versions {5, 6} remain on
    # disk, and the memo must mirror that window instead of pinning one
    # DataFrame handle per historical version
    versions = {k if isinstance(k, int) else k[0]
                for k in t._read_memo}
    assert versions <= set(t.versions()), (
        f"memo holds vacuumed versions: {versions} vs {t.versions()}")
    assert len(t._read_memo) <= t.retain_versions + 1

    t.vacuum(1)
    versions = {k if isinstance(k, int) else k[0]
                for k in t._read_memo}
    assert versions <= set(t.versions())


def test_table_and_fan_memos_lru_capped(spark, tmp_path):
    from aether_firebase_consumer_spark import tables

    # synthesize cap+50 distinct keys; the memos must stay at the cap
    df = spark.range(4).toDF("doc_id")
    for i in range(tables._MEMO_CAP + 50):
        tables._memo_put(tables._TABLE_MEMO, (id(spark), f"/fake/{i}", "x"),
                         df)
        tables._memo_put(tables._FAN_MEMO, (i, 32), (df, df))
    assert len(tables._TABLE_MEMO) <= tables._MEMO_CAP
    assert len(tables._FAN_MEMO) <= tables._MEMO_CAP
    # real path still functional after the churn
    got = tables.load_table(spark, "/root/testdata/sf0.001", "nation")
    assert got is tables.load_table(spark, "/root/testdata/sf0.001",
                                    "nation")


def test_lit_cache_lru_capped():
    from aether_firebase_consumer_spark.functions import vectors

    for i in range(vectors._LIT_CACHE_CAP + 64):
        vectors.lit_doubles([float(i)])
    assert len(vectors._LIT_CACHE) <= vectors._LIT_CACHE_CAP
    # memo hit still returns the same instance for a live key
    a = vectors.lit_doubles([1.5, 2.5])
    assert vectors.lit_doubles([1.5, 2.5]) is a
