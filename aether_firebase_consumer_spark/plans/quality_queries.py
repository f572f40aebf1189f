"""Data-quality audit and temporal (SCD-2) queries — the validation
layer a production ingest runs before publishing a dataset version,
plus the change-history compaction a CDC consumer maintains.

The reference consumer trusts its input wholesale (messages flow from
poll to sink with no integrity checks, ``firebase/app/artifacts.py:
302-327``); a 100 TB pipeline cannot — a bad shard must surface as a
metric, not as silent corruption three jobs downstream.

100 TB posture:

- ``dq_audit`` is a union of independent small aggregates; each
  (orphan count, dup count, null rate, range violation) reduces to a
  handful of rows before the union, and the referential check is a
  broadcast/shuffle anti-join — the canonical distributed integrity
  scan. No collect, no driver-side row handling.
- ``events_scd2_intervals`` is the lag/lead compaction of an event
  stream into validity intervals: one shuffle on the entity key, then
  pure window functions. This is how a MERGE-maintained dimension
  table gets its history rebuilt at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from aether_firebase_consumer_spark.plans import register
from aether_firebase_consumer_spark.tables import load_table


@register(
    "dq_audit",
    oracle="""
    SELECT 'lineitem_orphans' AS metric,
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS DOUBLE) AS value
    UNION ALL
    SELECT 'orders_dup_pk',
           CAST((SELECT COUNT(*) FROM (
                   SELECT o_orderkey FROM orders
                   GROUP BY o_orderkey HAVING COUNT(*) > 1))
                AS DOUBLE)
    UNION ALL
    SELECT 'customer_null_mktsegment_rate',
           (SELECT CAST(SUM(CASE WHEN c_mktsegment IS NULL THEN 1
                                 ELSE 0 END) AS DOUBLE) / COUNT(*)
            FROM customer)
    UNION ALL
    SELECT 'lineitem_bad_discount',
           CAST((SELECT COUNT(*) FROM lineitem
                 WHERE l_discount < 0 OR l_discount > 1) AS DOUBLE)
    UNION ALL
    SELECT 'orders_bad_status',
           CAST((SELECT COUNT(*) FROM orders
                 WHERE o_orderstatus NOT IN ('F', 'O', 'P')) AS DOUBLE)
    """,
)
def dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-quality audit: referential integrity (orphan lineitems
    via anti-join), primary-key uniqueness, null rate, numeric-range
    violations, and enum-domain violations — one (metric, value) row
    each. Every check is an independent aggregate that
    reduces before the final tiny union; the anti-join is the only
    join and Spark picks broadcast/shuffle-hash per AQE stats."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    def one(name: str, df: DataFrame) -> DataFrame:
        return df.select(F.lit(name).alias("metric"),
                         F.col("value").cast("double").alias("value"))

    orphans = one("lineitem_orphans", li.join(
        orders, li.l_orderkey == orders.o_orderkey, "left_anti")
        .agg(F.count("*").alias("value")))
    dup_pk = one("orders_dup_pk", orders.groupBy("o_orderkey")
                 .agg(F.count("*").alias("n")).where(F.col("n") > 1)
                 .agg(F.count("*").alias("value")))
    null_rate = one("customer_null_mktsegment_rate", cust.agg(
        (F.sum(F.when(F.col("c_mktsegment").isNull(), 1).otherwise(0))
         .cast("double") / F.count("*")).alias("value")))
    bad_disc = one("lineitem_bad_discount", li.where(
        (F.col("l_discount") < 0) | (F.col("l_discount") > 1))
        .agg(F.count("*").alias("value")))
    bad_status = one("orders_bad_status", orders.where(
        ~F.col("o_orderstatus").isin("F", "O", "P"))
        .agg(F.count("*").alias("value")))
    return (orphans.unionAll(dup_pk).unionAll(null_rate)
            .unionAll(bad_disc).unionAll(bad_status))


@register(
    "events_scd2_intervals",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS us
      FROM events
    ),
    marked AS (
      SELECT user_id, event_id, event_type, us,
             CASE WHEN LAG(event_type) OVER w IS NULL
                       OR LAG(event_type) OVER w <> event_type
                  THEN 1 ELSE 0 END AS chg
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    runs AS (
      SELECT user_id, event_type, us,
             CAST(SUM(chg) OVER (
               PARTITION BY user_id ORDER BY us, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_id
      FROM marked
    ),
    intervals AS (
      SELECT user_id, run_id, event_type,
             MIN(us) AS valid_from_us,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM runs GROUP BY user_id, run_id, event_type
    )
    SELECT user_id, run_id, event_type, valid_from_us,
           LEAD(valid_from_us) OVER (
             PARTITION BY user_id ORDER BY run_id) AS valid_to_us,
           n_events
    FROM intervals
    """,
)
def events_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 history compaction: collapse each user's event stream
    into contiguous same-``event_type`` runs with [valid_from,
    valid_to) microsecond intervals (open-ended current run → NULL).
    The lag-flag → running-sum → rollup → lead chain all windows and
    groups on user_id, so the whole history rebuild is ONE shuffle on
    the entity key — the plan a CDC dimension-maintenance job needs at
    scale. Epochs compared as integer microseconds on both engines."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type",
        F.unix_micros("ts").alias("us"))
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    marked = ev.withColumn(
        "chg",
        F.when(F.lag("event_type").over(w).isNull()
               | (F.lag("event_type").over(w) != F.col("event_type")), 1)
        .otherwise(0))
    runs = marked.withColumn(
        "run_id",
        F.sum("chg").over(w.rowsBetween(W.unboundedPreceding,
                                        W.currentRow)))
    intervals = (runs.groupBy("user_id", "run_id", "event_type")
                 .agg(F.min("us").alias("valid_from_us"),
                      F.count("*").alias("n_events")))
    w2 = W.partitionBy("user_id").orderBy("run_id")
    return intervals.select(
        "user_id", "run_id", "event_type", "valid_from_us",
        F.lead("valid_from_us").over(w2).alias("valid_to_us"),
        "n_events")


@register(
    "corpus_dup_rate_by_source",
    oracle="""
    WITH f AS (
      SELECT source, md5(text) AS fp FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_unique,
           ROUND(1.0 - CAST(COUNT(DISTINCT fp) AS DOUBLE) / COUNT(*), 6)
             AS dup_rate
    FROM f GROUP BY source
    """,
)
def corpus_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-duplicate rate — the ingest-health metric that
    tells a curation pipeline WHICH feed is flooding it with copies.
    One scan; the shuffle carries (source, 16-byte fingerprint), never
    text; COUNT(DISTINCT) expands to the standard two-phase partial
    aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    f = docs.select("source", F.md5("text").alias("fp"))
    return (f.groupBy("source")
            .agg(F.count("*").cast("bigint").alias("n_docs"),
                 F.countDistinct("fp").cast("bigint").alias("n_unique"))
            .select("source", "n_docs", "n_unique",
                    F.round(1.0 - F.col("n_unique").cast("double")
                            / F.col("n_docs"), 6).alias("dup_rate")))


@register(
    "events_anomaly_zscore",
    oracle="""
    WITH stats AS (
      SELECT event_type,
             AVG(value) AS mu,
             STDDEV_POP(value) AS sigma
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           ROUND((e.value - s.mu) / s.sigma, 6) AS z,
           ABS((e.value - s.mu) / s.sigma) > 3.0 AS is_anomaly
    FROM events e JOIN stats s USING (event_type)
    WHERE s.sigma > 0
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population z-score anomaly flags per event: group stats are a
    tiny aggregate broadcast back onto the stream of events, so the
    fact side never shuffles — the standard two-pass outlier scan.
    z rounded to 6 decimals on both engines (aggregation-order float
    tolerance); the >3-sigma flag is computed on the unrounded value."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"),
        F.stddev_pop("value").alias("sigma"))
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (ev.join(F.broadcast(stats), "event_type")
            .where(F.col("sigma") > 0)
            .select("event_id", "event_type",
                    F.round(z, 6).alias("z"),
                    (F.abs(z) > 3.0).alias("is_anomaly")))


_LINPROBE_DET = ("n*(s11*s22-s12*s12) - s1*(s1*s22-s12*s2) "
                 "+ s2*(s1*s12-s11*s2)")


@register(
    "quality_linear_probe_trained",
    oracle=f"""
    WITH f AS MATERIALIZED (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS HUGEINT) AS f1,
             CAST(len(list_distinct(string_split(text, ' ')))
                  AS HUGEINT) AS f2,
             CAST(length(text) AS HUGEINT) AS y
      FROM documents
    ),
    s AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(f1) AS s1, SUM(f2) AS s2,
             SUM(f1*f1) AS s11, SUM(f1*f2) AS s12, SUM(f2*f2) AS s22,
             SUM(y) AS sy, SUM(f1*y) AS s1y, SUM(f2*y) AS s2y
      FROM f
    ),
    w AS MATERIALIZED (
      SELECT
        CAST(sy*(s11*s22-s12*s12) - s1*(s1y*s22-s12*s2y)
             + s2*(s1y*s12-s11*s2y) AS DOUBLE)
          / CAST({_LINPROBE_DET} AS DOUBLE) AS w0,
        CAST(n*(s1y*s22-s12*s2y) - sy*(s1*s22-s12*s2)
             + s2*(s1*s2y-s1y*s2) AS DOUBLE)
          / CAST({_LINPROBE_DET} AS DOUBLE) AS w1,
        CAST(n*(s11*s2y-s1y*s12) - s1*(s1*s2y-s1y*s2)
             + sy*(s1*s12-s11*s2) AS DOUBLE)
          / CAST({_LINPROBE_DET} AS DOUBLE) AS w2
      FROM s
    )
    SELECT doc_id,
           w.w0 + w.w1*CAST(f1 AS DOUBLE) + w.w2*CAST(f2 AS DOUBLE)
             AS pred_chars,
           CAST(y AS DOUBLE) AS actual_chars
    FROM f CROSS JOIN w
    ORDER BY pred_chars DESC, doc_id
    LIMIT 100
    """,
)
def quality_linear_probe_trained(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """TRAINED linear quality probe (round 9, the regression member of
    the trained-model family: Lloyd-step SemDeDup, trained-PQ, BPE):
    fit ``n_chars ~ w0 + w1*n_tokens + w2*n_unique_tokens`` by least
    squares over the whole corpus, then score every document and
    return the top-100 by predicted quality.

    The normal-equation solve is EXACT integer arithmetic end to end —
    the cross-engine trick that avoids every float-summation-order
    trap: the nine sufficient statistics (Σf, Σff', Σfy) are exact
    integer sums accumulated in DECIMAL(38,0) — the same headroom
    as the oracle's HUGEINT, so no corpus size can silently wrap a
    non-ANSI long sum (one map-side-combined aggregate, a 1-row
    collect), the 3×3
    solve is Cramer's rule on Python arbitrary-precision ints
    (DuckDB re-derives it in HUGEINT — identical values), and floats
    appear only at the very end: each weight is ONE double division of
    two exact integers, and each score is the same 5-literal double
    expression in both engines. No ROUND(), no tolerance — the hash
    gate compares raw doubles.

    100 TB posture: training is one partial-aggregated scan to 1 row;
    scoring is a map-only second scan with the model as plan literals
    (the broadcast-model idiom); top-100 compiles to
    TakeOrderedAndProject. The 1-row collect is the bounded
    driver-side model state the trained family always pays."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    feats = docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("f1"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("f2"),
        F.length("text").cast("bigint").alias("y"))
    # per-row products fit bigint (features are per-document counts,
    # far below 3e9); the SUMS accumulate in DECIMAL(38,0) so a
    # 100 TB corpus cannot silently wrap a non-ANSI long sum — the
    # same headroom as the oracle's HUGEINT
    def dsum(col):
        return F.sum(col.cast("decimal(38,0)"))

    row = feats.agg(
        F.count("*").alias("n"),
        dsum(F.col("f1")).alias("s1"), dsum(F.col("f2")).alias("s2"),
        dsum(F.col("f1") * F.col("f1")).alias("s11"),
        dsum(F.col("f1") * F.col("f2")).alias("s12"),
        dsum(F.col("f2") * F.col("f2")).alias("s22"),
        dsum(F.col("y")).alias("sy"),
        dsum(F.col("f1") * F.col("y")).alias("s1y"),
        dsum(F.col("f2") * F.col("y")).alias("s2y"),
    ).collect()[0]  # bounded: the 9 sufficient statistics, one row
    n, s1, s2 = int(row["n"]), int(row["s1"]), int(row["s2"])
    s11, s12, s22 = int(row["s11"]), int(row["s12"]), int(row["s22"])
    sy, s1y, s2y = int(row["sy"]), int(row["s1y"]), int(row["s2y"])
    det = (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
           + s2 * (s1 * s12 - s11 * s2))
    if det == 0:
        raise ValueError(
            "degenerate design matrix: token-count features are "
            "collinear on this corpus — the least-squares system has "
            "no unique solution")
    num0 = (sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
            + s2 * (s1y * s12 - s11 * s2y))
    num1 = (n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
            + s2 * (s1 * s2y - s1y * s2))
    num2 = (n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
            + sy * (s1 * s12 - s11 * s2))
    # the ONLY rounding points: int -> nearest double (same rule as
    # DuckDB's HUGEINT -> DOUBLE cast), then one double division each
    w0 = float(num0) / float(det)
    w1 = float(num1) / float(det)
    w2 = float(num2) / float(det)
    pred = (F.lit(w0) + F.lit(w1) * F.col("f1").cast("double")
            + F.lit(w2) * F.col("f2").cast("double"))
    return (feats.select("doc_id", pred.alias("pred_chars"),
                         F.col("y").cast("double")
                         .alias("actual_chars"))
            .orderBy(F.desc("pred_chars"), "doc_id").limit(100))
