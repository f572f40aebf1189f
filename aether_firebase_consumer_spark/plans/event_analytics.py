"""Event-stream product analytics: funnel, cohort retention, and
event-transition matrix over the events fixture — the query shapes a
consumer of the reference's event pipeline runs downstream of ingestion.

All pure Catalyst (joins + windows + conditional aggs); DECIMAL used
where sums feed the bit-exact oracle. Scale notes inline — each query's
only wide operation is keyed on user_id (or a low-cardinality group),
which is the natural partitioning of an event stream at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from aether_firebase_consumer_spark.plans import register
from aether_firebase_consumer_spark.tables import load_table


@register(
    "events_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view
      FROM events GROUP BY user_id
    ),
    c AS (
      SELECT v.user_id, MIN(e.ts) AS t_click
      FROM v JOIN events e
        ON e.user_id = v.user_id AND e.event_type = 'click'
       AND e.ts > v.t_view
      GROUP BY v.user_id
    ),
    p AS (
      SELECT c.user_id, MIN(e.ts) AS t_purchase
      FROM c JOIN events e
        ON e.user_id = c.user_id AND e.event_type = 'purchase'
       AND e.ts > c.t_click
      GROUP BY c.user_id
    )
    SELECT COUNT(v.t_view) AS n_view,
           COUNT(c.t_click) AS n_view_then_click,
           COUNT(p.t_purchase) AS n_full_funnel
    FROM v
    LEFT JOIN c ON c.user_id = v.user_id
    LEFT JOIN p ON p.user_id = v.user_id
    WHERE v.t_view IS NOT NULL
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view → click → purchase: per-user first-view,
    first click strictly after it, first purchase strictly after that.
    Three keyed aggregations + two joins, all partitioned on user_id —
    the stream's natural key, so at scale each stage is a co-located
    shuffle (or none, with the events table bucketed by user)."""
    ev = load_table(spark, sf_dir, "events")
    v = (ev.groupBy("user_id")
         .agg(F.min(F.when(F.col("event_type") == "view", F.col("ts")))
              .alias("t_view"))
         .filter(F.col("t_view").isNotNull()))
    c = (v.join(ev, "user_id")
         .filter((F.col("event_type") == "click")
                 & (F.col("ts") > F.col("t_view")))
         .groupBy("user_id").agg(F.min("ts").alias("t_click")))
    p = (c.join(ev, "user_id")
         .filter((F.col("event_type") == "purchase")
                 & (F.col("ts") > F.col("t_click")))
         .groupBy("user_id").agg(F.min("ts").alias("t_purchase")))
    return (v.join(c, "user_id", "left").join(p, "user_id", "left")
            .agg(F.count("t_view").alias("n_view"),
                 F.count("t_click").alias("n_view_then_click"),
                 F.count("t_purchase").alias("n_full_funnel")))


@register(
    "events_cohort_retention",
    oracle="""
    WITH first_day AS (
      SELECT user_id, CAST(MIN(date_trunc('day', ts)) AS DATE) AS cohort_day
      FROM events GROUP BY user_id
    )
    SELECT f.cohort_day,
           date_diff('day', f.cohort_day,
                     CAST(date_trunc('day', e.ts) AS DATE)) AS day_offset,
           COUNT(DISTINCT e.user_id) AS active_users
    FROM events e JOIN first_day f ON f.user_id = e.user_id
    WHERE date_diff('day', f.cohort_day,
                    CAST(date_trunc('day', e.ts) AS DATE)) <= 7
    GROUP BY 1, 2
    ORDER BY cohort_day, day_offset
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity day, distinct
    active users at each day offset ≤ 7. The cohort table is one row
    per user (broadcastable at moderate scale; co-partitioned join on
    user_id otherwise); the distinct-count shuffles on the small
    (cohort, offset) key after partial aggregation."""
    ev = load_table(spark, sf_dir, "events")
    first_day = (ev.groupBy("user_id")
                 .agg(F.min(F.date_trunc("day", "ts")).cast("date")
                      .alias("cohort_day")))
    offset = F.datediff(F.date_trunc("day", "ts").cast("date"),
                        F.col("cohort_day"))
    return (
        ev.join(first_day, "user_id")
        .withColumn("day_offset", offset)
        .filter(F.col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
        .orderBy("cohort_day", "day_offset")
    )


@register(
    "events_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    )
    SELECT event_type, next_type, COUNT(*) AS n
    FROM seq
    WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    ORDER BY event_type, next_type
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-style event transition counts: each user's event sequence
    (ordered by ts, tie-broken by event_id) paired with its successor
    via lead(), then counted per (from, to). One shuffle on user_id for
    the window, one tiny exchange for the 5x5 matrix."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count("*").alias("n"))
        .orderBy("event_type", "next_type")
    )


@register(
    "events_latest_per_user",
    oracle="""
    SELECT user_id, event_id, event_type, value
    FROM (
      SELECT user_id, event_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def events_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-state compaction: the newest event per user (ts desc,
    event_id tie-break) via ``sinks.upsert.latest_per_key`` — the
    collapse that runs before every MERGE when a micro-batch carries
    multiple versions of one key, here as a standalone query. One
    shuffle on user_id; rank-limited sort per partition, no global
    sort."""
    from aether_firebase_consumer_spark.sinks.upsert import latest_per_key
    ev = load_table(spark, sf_dir, "events")
    return latest_per_key(ev, ["user_id"], ["ts", "event_id"]) \
        .select("user_id", "event_id", "event_type", "value")


@register(
    "events_sessionize",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS us
      FROM events
    ),
    f AS (
      SELECT user_id, event_id, event_type, us,
             CASE WHEN LAG(us) OVER w IS NULL
                       OR us - LAG(us) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    s AS (
      SELECT user_id, event_type, us,
             CAST(SUM(new_sess) OVER (
               PARTITION BY user_id ORDER BY us, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
      FROM f
    )
    SELECT user_id, session_seq,
           COUNT(*) AS n_events,
           CAST(MAX(us) - MIN(us) AS BIGINT) AS duration_us,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
    FROM s
    GROUP BY user_id, session_seq
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based batch sessionization (30-minute inactivity gap): the
    lag-flag + running-sum pattern — session id = cumulative count of
    gap breaks per user — then per-session rollup. Everything windows
    and aggregates on user_id, the stream's natural key: one shuffle,
    map-side partials on the final rollup. Timestamps compared as
    integer epoch-microseconds on both engines (exact; no float
    epoch)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type",
        F.unix_micros("ts").alias("us"))
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    gap = 30 * 60 * 1_000_000
    flagged = ev.withColumn(
        "new_sess",
        F.when(F.lag("us").over(w).isNull()
               | ((F.col("us") - F.lag("us").over(w)) > gap), 1)
        .otherwise(0))
    sess = flagged.withColumn(
        "session_seq",
        F.sum("new_sess").over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)))
    return (sess.groupBy("user_id", "session_seq")
            .agg(F.count("*").alias("n_events"),
                 (F.max("us") - F.min("us")).alias("duration_us"),
                 F.countDistinct("event_type").cast("bigint")
                 .alias("n_types")))


@register(
    "events_max_concurrency",
    oracle="""
    WITH pts AS (
      SELECT event_type, epoch_us(ts) AS t, 1 AS d FROM events
      UNION ALL
      SELECT event_type, epoch_us(ts) + 300000000 AS t, -1 AS d
      FROM events
    ),
    swept AS (
      SELECT event_type,
             SUM(d) OVER (PARTITION BY event_type ORDER BY t, d
                          ROWS UNBOUNDED PRECEDING) AS concur
      FROM pts
    )
    SELECT event_type, MAX(concur) AS max_concurrent
    FROM swept GROUP BY event_type
    """,
)
def events_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per event type: each event is active for 5
    minutes; the classic sweep line (+1 at start, −1 at end, running
    sum, max) — but computed as a DISTRIBUTED prefix-sum, because a
    naive ``PARTITION BY event_type ORDER BY t`` window serializes an
    entire type (a handful of partitions at 100 TB):

    1. bucket the ±1 points into 1-hour windows; the local running sum
       sorts only within (type, bucket) — parallelism = types ×
       buckets,
    2. per-bucket totals (types × buckets rows, tiny) get a prefix-sum
       window for each bucket's carry-in,
    3. peak = max over buckets of carry-in + local max.

    The oracle runs the textbook single-sweep form; both orderings
    break start/end ties end-first (``ORDER BY t, d``) — the half-open
    interval convention, so back-to-back intervals never double-count.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.unix_micros("ts").alias("ts_us"))
    dur = 300_000_000
    starts = ev.select("event_type", F.col("ts_us").alias("t"),
                       F.lit(1).alias("d"))
    ends = ev.select("event_type", (F.col("ts_us") + dur).alias("t"),
                     F.lit(-1).alias("d"))
    bucket_us = 3600 * 1_000_000
    pts = starts.unionAll(ends).withColumn(
        "bucket", F.floor(F.col("t") / bucket_us))
    wloc = (W.partitionBy("event_type", "bucket").orderBy("t", "d")
            .rowsBetween(W.unboundedPreceding, W.currentRow))
    loc = pts.withColumn("run", F.sum("d").over(wloc))
    per_bucket = loc.groupBy("event_type", "bucket").agg(
        F.max("run").alias("local_max"),
        F.sum("d").alias("total"))
    wcarry = (W.partitionBy("event_type").orderBy("bucket")
              .rowsBetween(W.unboundedPreceding, -1))
    carried = per_bucket.withColumn(
        "carry", F.coalesce(F.sum("total").over(wcarry), F.lit(0)))
    return (carried.groupBy("event_type")
            .agg(F.max(F.col("carry") + F.col("local_max"))
                 .alias("max_concurrent")))


@register(
    "events_running_global_sum",
    oracle="""
    SELECT event_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2)))
                OVER (ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE)
               AS running_value
    FROM events
    """,
)
def events_running_global_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLOBAL running sum over the whole event stream — the query shape
    that is a scale-killer as a naive window (no PARTITION BY → one
    task) — via :func:`~.operators.prefix.global_running_sum`: local
    running sums within hour buckets, a bounded carry prefix over
    bucket totals, broadcast join back. DECIMAL accumulation makes the
    distributed grouping bit-identical to the oracle's single sweep;
    DOUBLE only at the surface."""
    from aether_firebase_consumer_spark.operators.prefix import (
        global_running_sum,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", F.col("value").cast("decimal(18,2)").alias("v"),
        F.unix_micros("ts").alias("us"))
    out = global_running_sum(
        ev, ["us", "event_id"], F.col("v"),
        F.floor(F.col("us") / (3600 * 1_000_000)),
        out_col="running_value")
    return out.select("event_id",
                      F.col("running_value").cast("double")
                      .alias("running_value"))
