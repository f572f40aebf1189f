"""Streaming-operator semantics on the batch events table (SURVEY.md
§2.2 streaming rows): tumbling / sliding / session windows and
keep-first dedup. The same expressions run in Structured Streaming
(tests/test_streaming.py drives them through readStream); here they are
registered as batch queries so the DuckDB oracle can verify the window
semantics exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from aether_firebase_consumer_spark.plans import register
from aether_firebase_consumer_spark.tables import load_table

_TS_FMT = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


def _dec(col):
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,2)")


@register(
    "stream_tumbling_window",
    oracle=f"""
    SELECT strftime(date_trunc('hour', ts), '{_TS_FMT_DUCK}') AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window (epoch-aligned, same alignment
    as date_trunc). In streaming this is
    ``withWatermark("ts","10 minutes").groupBy(window("ts","1 hour"))``."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"),
             F.sum(_dec("value")).cast("double").alias("total_value"))
        .select(F.date_format("window.start", _TS_FMT).alias("window_start"),
                "event_type", "n", "total_value")
    )


@register(
    "stream_sliding_window",
    oracle=f"""
    SELECT strftime(date_trunc('hour', ts) - j * INTERVAL 1 HOUR,
                    '{_TS_FMT_DUCK}') AS window_start,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events, unnest([0, 1]) AS t(j)
    GROUP BY 1
    """,
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (2h length, 1h slide): each event lands in two
    epoch-aligned windows."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour"))
        .agg(F.count("*").alias("n"),
             F.sum(_dec("value")).cast("double").alias("total_value"))
        .select(F.date_format("window.start", _TS_FMT).alias("window_start"),
                "n", "total_value")
    )


@register(
    "stream_session_window",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM ordered
    )
    SELECT user_id,
           strftime(MIN(ts), '{_TS_FMT_DUCK}') AS session_start,
           strftime(MAX(ts) + INTERVAL 30 MINUTE, '{_TS_FMT_DUCK}')
               AS session_end,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM sess
    GROUP BY user_id, sid
    """,
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min gap) per user via F.session_window — the
    one windowing mode with data-driven extents. The oracle reproduces
    the merge semantics with gaps-and-islands."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n"),
             F.sum(_dec("value")).cast("double").alias("total_value"))
        .select("user_id",
                F.date_format("session_window.start", _TS_FMT)
                .alias("session_start"),
                F.date_format("session_window.end", _TS_FMT)
                .alias("session_end"),
                "n", "total_value")
    )


@register(
    "stream_dedup_keepfirst",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM (
      SELECT event_id, user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events
    ) t WHERE rn = 1
    """,
)
def stream_dedup_keepfirst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dropDuplicates semantics (first arrival wins per key),
    made deterministic with an explicit event-time order — the batch
    twin of ``dropDuplicates(["user_id","event_type"])`` with watermark."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (ev.withColumn("rn", F.row_number().over(w))
              .filter(F.col("rn") == 1)
              .select("event_id", "user_id", "event_type"))


@register(
    "stream_stateful_change_detect",
    oracle="""
    SELECT CAST(doc_id AS VARCHAR) AS id, lang, md5(text) AS hash
    FROM documents
    """,
)
def stream_stateful_change_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O10 change detection as TRUE streaming state
    (applyInPandasWithState): an availableNow pass over documents where
    each doc id's content hash is held in the keyed state store and
    only new/changed docs are emitted. First sight of the fixture emits
    every doc, so the single-pass result is oracle-checkable as a plain
    projection; the *stateful* semantics (restart recovery, changed-only
    emission on batch 2) are exercised in tests/test_streaming.py.
    """
    import os
    import tempfile
    import uuid

    from aether_firebase_consumer_spark.streaming.stateful import (
        change_detect_stream,
    )
    # file stream sources read directories; symlink the fixture file in
    src_dir = tempfile.mkdtemp(prefix="afcs_cd_src_")
    os.symlink(f"{sf_dir}/documents.parquet",
               os.path.join(src_dir, "documents.parquet"))
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    stream = (
        spark.readStream.schema(schema).parquet(src_dir)
        .select(F.col("doc_id").cast("string").alias("id"),
                "lang", F.md5("text").alias("hash"))
    )
    out = change_detect_stream(stream, "id", "hash")
    name = "cd_" + uuid.uuid4().hex
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(name)
