"""Relational surface, part 2: the remaining classic TPC-H query shapes
(adapted to the fixture columns), GROUPING SETS, temporal as-of / range
joins over the events stream table, and TF-IDF term ranking.

The reference implements none of these (SURVEY.md §2.2 verified
absences) — this is the capability-parity-and-beyond surface, all pure
Catalyst. Numeric aggregates go through DECIMAL (exact, associative)
and cast to DOUBLE at the end so results are bit-stable under Spark's
partial-aggregation order and hash-match the DuckDB oracle (see
plans/relational.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from aether_firebase_consumer_spark.plans import register
from aether_firebase_consumer_spark.tables import load_table


def _dec(col, p=18, s=2):
    return F.col(col).cast(f"decimal({p},{s})") if isinstance(col, str) \
        else col.cast(f"decimal({p},{s})")


# ------------------------------------------------------------------ TPC-H Q6

@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan+filter+agg — the pushdown showcase. All three
    predicates reach the parquet reader (PushedFilters) and only 4
    columns are read; the agg reduces to one row with map-side combine,
    so the exchange is num_partitions rows total."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
                  & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
                  & (F.col("l_discount").between(0.05, 0.07))
                  & (F.col("l_quantity") < 24))
        .agg(F.sum(_dec("l_extendedprice") * _dec("l_discount"))
             .cast("double").alias("revenue"),
             F.count("*").alias("n_lines"))
    )


# ------------------------------------------------------------------ TPC-H Q4

@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= DATE '1995-01-01'
      AND o.o_orderdate < DATE '1995-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (fixtures lack l_commitdate, so "late" = shipped
    >60 days after order date): EXISTS → left-semi join. The semi join
    shuffles only the join keys of lineitem, and the date filter on
    orders prunes the probe side before the exchange."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1995-07-01").cast("date")))
    li = load_table(spark, sf_dir, "lineitem")
    late = li.join(o.select("o_orderkey", "o_orderdate"),
                   li.l_orderkey == F.col("o_orderkey")) \
             .filter(F.col("l_shipdate")
                     > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")) \
             .select("l_orderkey")
    return (
        o.join(late, o.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ------------------------------------------------------------------ TPC-H Q7

@register(
    "q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           EXTRACT(year FROM l.l_shipdate) AS l_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
       OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
    GROUP BY n1.n_name, n2.n_name, EXTRACT(year FROM l.l_shipdate)
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between two nations by year.
    nation joins broadcast; the disjunctive nation-pair predicate is
    applied after both lookups. The only large exchange is
    lineitem⋈orders on orderkey."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"),
                  F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"),
                  F.col("n_name").alias("cust_nation"))
    one = F.lit(1).cast("decimal(18,2)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(((F.col("supp_nation") == "NATION_3")
                 & (F.col("cust_nation") == "NATION_7"))
                | ((F.col("supp_nation") == "NATION_7")
                   & (F.col("cust_nation") == "NATION_3")))
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_dec("l_extendedprice") * (one - _dec("l_discount")))
             .cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ----------------------------------------------------------------- TPC-H Q10

@register(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue,
           CAST(c.c_acctbal AS DOUBLE) AS c_acctbal,
           n.n_name AS nation
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate < DATE '1996-07-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: lost-revenue ranking of customers with returned items.
    Returnflag + date filters push to the scans; top-20 is TakeOrdered
    (no global sort materialization)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("date")))
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    one = F.lit(1).cast("decimal(18,2)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal",
                 F.col("n_name").alias("nation"))
        .agg(F.sum(_dec("l_extendedprice") * (one - _dec("l_discount")))
             .cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue",
                F.col("c_acctbal").cast("double").alias("c_acctbal"), "nation")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ----------------------------------------------------------------- TPC-H Q12

@register(
    "q12_priority_shipping",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= DATE '1996-01-01'
      AND l.l_shipdate < DATE '1997-01-01'
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (fixtures lack l_shipmode; grouped by returnflag):
    conditional aggregation — CASE folded into SUM, one pass, no extra
    join or union for the two counts."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date")))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_returnflag")
        .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
             F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"))
        .orderBy("l_returnflag")
    )


# ----------------------------------------------------------------- TPC-H Q14

@register(
    "q14_promo_effect",
    oracle="""
    SELECT CAST(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                    THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                         * CAST(1 - l.l_discount AS DECIMAL(18,2))
                    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
               / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * CAST(1 - l.l_discount AS DECIMAL(18,2)))
                      AS DOUBLE) AS DOUBLE) AS promo_revenue_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= DATE '1995-09-01'
      AND l.l_shipdate < DATE '1995-10-01'
    """,
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share. part is broadcast (bounded dim);
    both SUMs run in exact DECIMAL, the ratio is computed once in
    DOUBLE at the end."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1995-10-01").cast("date")))
    p = load_table(spark, sf_dir, "part")
    one = F.lit(1).cast("decimal(18,2)")
    zero = F.lit(0).cast("decimal(18,2)")
    disc_price = _dec("l_extendedprice") * (one - _dec("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg((F.lit(100.0)
              * F.sum(F.when(F.col("p_type") == "PROMO", disc_price)
                      .otherwise(zero)).cast("double")
              / F.sum(disc_price).cast("double"))
             .cast("double").alias("promo_revenue_pct"))
    )


# ----------------------------------------------------------------- TPC-H Q18

@register(
    "q18_large_volume_customer",
    oracle="""
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS o_orderdate,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey,
             CAST(o.o_orderdate AS DATE), o.o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: large-volume orders (sum qty > 150). ONE lineitem
    aggregation serves both the HAVING filter and the output sum_qty
    (r14: the original shape semi-joined the HAVING keys and then
    re-joined RAW lineitem and re-aggregated it — a second full
    lineitem shuffle plus a 5-key group-by that recomputed the value
    the HAVING step already held; since o_orderkey is unique in
    orders, attaching the aggregated row is equivalent
    row-for-row). Decimal sums are exact and associative, so the
    single-aggregation value is bit-identical to the re-aggregated
    one. Plan: one lineitem shuffle, the (selective) big-order set
    joins orders/customer, TakeOrderedAndProject caps the sort."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (li.groupBy("l_orderkey")
             .agg(F.sum(_dec("l_quantity")).alias("q"))
             .filter(F.col("q") > 150))
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey",
                F.col("o_orderdate").cast("date").alias("o_orderdate"),
                F.col("o_totalprice").cast("double").alias("o_totalprice"),
                F.col("q").cast("double").alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


# ----------------------------------------------------------------- TPC-H Q19

@register(
    "q19_bracketed_disjunction",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#21' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_bracketed_disjunction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunctive bracketed predicates across both join
    sides. Catalyst derives the implied single-side filters (brand/size
    on part, quantity range on lineitem) and pushes them below the
    broadcast join; the full disjunction is evaluated post-join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    one = F.lit(1).cast("decimal(18,2)")
    qty, brand, size = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (((brand == "Brand#15") & size.between(1, 5) & qty.between(1, 11))
            | ((brand == "Brand#23") & size.between(1, 10) & qty.between(10, 20))
            | ((brand == "Brand#21") & size.between(1, 15) & qty.between(20, 30)))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(F.sum(_dec("l_extendedprice") * (one - _dec("l_discount")))
             .cast("double").alias("revenue"),
             F.count("*").alias("n_lines"))
    )


# ----------------------------------------------------------- GROUPING SETS

@register(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                            (o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (finer than rollup/cube): detail, per-
    priority subtotal, grand total — one Expand-based pass, not three
    scans."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupingSets([["o_orderpriority", "o_orderstatus"],
                        ["o_orderpriority"], []],
                       "o_orderpriority", "o_orderstatus")
        .agg(F.count("*").alias("n"),
             F.sum(_dec("o_totalprice")).cast("double").alias("total"))
    )


# ------------------------------------------------------------- as-of join

@register(
    "asof_join_events",
    oracle="""
    WITH u AS (
      SELECT user_id, ts, event_id, 0 AS is_p, value AS cv
      FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT user_id, ts, event_id, 1 AS is_p, NULL AS cv
      FROM events WHERE event_type = 'purchase'
    ),
    w AS (
      SELECT user_id, ts, event_id, is_p,
             last_value(cv IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY ts, is_p, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS last_click_value,
             last_value(CASE WHEN is_p = 0 THEN ts END IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY ts, is_p, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS last_click_ts
      FROM u
    )
    SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
           last_click_ts, CAST(last_click_value AS DOUBLE) AS last_click_value
    FROM w WHERE is_p = 1
    """,
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent click
    at-or-before it — implemented as union + ordered window last(ignore
    nulls), NOT a join. One shuffle on user_id, no range-join blowup,
    no per-key driver loop; ties broken (ts, side, event_id) so the
    result is deterministic. This is the scalable as-of pattern: state
    flows forward in a single sort within each key partition."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", F.lit(0).alias("is_p"),
        F.col("value").alias("cv"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.lit(1).alias("is_p"),
        F.lit(None).cast("double").alias("cv"))
    w = (W.partitionBy("user_id").orderBy("ts", "is_p", "event_id")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    u = clicks.unionByName(purchases)
    return (
        u.withColumn("last_click_value", F.last("cv", ignorenulls=True).over(w))
        .withColumn("last_click_ts",
                    F.last(F.when(F.col("is_p") == 0, F.col("ts")),
                           ignorenulls=True).over(w))
        .filter(F.col("is_p") == 1)
        .select(F.col("event_id").alias("purchase_id"), "user_id",
                F.col("ts").alias("purchase_ts"), "last_click_ts",
                F.col("last_click_value").cast("double").alias("last_click_value"))
    )


# ------------------------------------------------------------- range join

@register(
    "range_join_events",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id,
           COUNT(*) AS n_clicks_1h,
           CAST(SUM(CAST(c.value AS DECIMAL(18,4))) AS DOUBLE)
               AS click_value_1h
    FROM events p
    JOIN events c
      ON c.user_id = p.user_id
     AND c.event_type = 'click'
     AND c.ts >= p.ts - INTERVAL 1 HOUR
     AND c.ts < p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id, p.user_id
    """,
)
def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range join: clicks within the hour before each purchase,
    same user. The user_id equi-component keeps this a hash join with
    the time range as a residual filter — never a cartesian. At 100 TB
    you'd additionally bucket both sides by time window to bound each
    probe; here the per-user key bound suffices."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"),
        F.col("value").alias("c_value"))
    return (
        p.join(c, (F.col("c_user") == F.col("p_user"))
               & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
               & (F.col("c_ts") < F.col("p_ts")))
        .groupBy("purchase_id", F.col("p_user").alias("user_id"))
        .agg(F.count("*").alias("n_clicks_1h"),
             F.sum(F.col("c_value").cast("decimal(18,4)"))
             .cast("double").alias("click_value_1h"))
    )


# ---------------------------------------------------------------- TF-IDF

@register(
    "text_tfidf_topk",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM tok GROUP BY doc_id, term
    ),
    df AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             CAST(tf.tf * n.n_docs AS DOUBLE) / df.df AS score,
             ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                                ORDER BY CAST(tf.tf * n.n_docs AS DOUBLE)
                                         / df.df DESC, tf.term) AS rn
      FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
    )
    SELECT doc_id, term, score, rn
    FROM scored WHERE rn <= 3
    """,
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 terms per document by tf·(N/df) relevance (rational-form
    idf — exact double arithmetic in both engines, unlike ln whose last
    bit can differ). Document frequency is a broadcast-sized side;
    top-k per doc via window row_number, one shuffle on doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.count()
    score = (F.col("tf") * F.lit(n_docs)).cast("double") / F.col("df")
    w = W.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (
        tf.join(F.broadcast(df_), "term")
        .withColumn("score", score)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "score", "rn")
    )


# ------------------------------------------------------- stats aggregates

@register(
    "agg_percentiles_stats",
    oracle="""
    SELECT o_orderpriority,
           quantile_cont(o_totalprice, 0.5) AS median_price,
           quantile_cont(o_totalprice, 0.9) AS p90_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS avg_price,
           COUNT(*) AS n
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def agg_percentiles_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median/p90) per priority plus a
    DECIMAL-backed mean. Spark's exact `percentile` matches DuckDB's
    quantile_cont bit-for-bit; at 100 TB it becomes `approx_percentile`
    (mergeable t-digest sketch) — the exact form is the correctness
    baseline. Variance/stddev/corr are deliberately NOT oracle-gated:
    their x-squared sums exceed 2^53 so the decimal-to-double cast (and
    the built-ins' central-moment merges) differ between engines in the
    last ulp."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(F.percentile("o_totalprice", 0.5).alias("median_price"),
             F.percentile("o_totalprice", 0.9).alias("p90_price"),
             (F.sum(_dec("o_totalprice")).cast("double") / F.count("*"))
             .alias("avg_price"),
             F.count("*").alias("n"))
        .orderBy("o_orderpriority")
    )


# ----------------------------------------------------------------- TPC-H Q13

@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: order-count histogram over customers — two stacked
    aggregations (per-customer count, then distribution). The second
    group-by key has tiny cardinality, so the second exchange is
    negligible after partial agg."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (c.join(o, c.c_custkey == o.o_custkey, "left")
                .groupBy(c.c_custkey)
                .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count("*").alias("custdist"))
            .orderBy(F.desc("custdist"), F.desc("c_count")))


# ----------------------------------------------------------------- TPC-H Q15

@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(1 - l_discount AS DECIMAL(18,2))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with maximum quarterly revenue. The
    revenue CTE is computed once and self-compared against its MAX via
    a broadcast of the 1-row max — no window over the whole table, no
    recomputation. DECIMAL revenue so the max-equality is exact (a
    double `=` here would be engine-dependent)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    one = F.lit(1).cast("decimal(18,2)")
    revenue = (
        li.filter((F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
                  & (F.col("l_shipdate") < F.lit("1996-04-01").cast("date")))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_dec("l_extendedprice") * (one - _dec("l_discount")))
             .alias("total_rev")))
    max_rev = revenue.agg(F.max("total_rev").alias("max_rev"))
    return (
        revenue.join(F.broadcast(max_rev),
                     F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name",
                F.col("total_rev").cast("double").alias("total_revenue"))
        .orderBy("s_suppkey")
    )


# ----------------------------------------------------------------- TPC-H Q17

@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (
      SELECT l_partkey, 0.2 * AVG(l_quantity) AS qty_threshold
      FROM lineitem GROUP BY l_partkey
    ) t ON t.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23' AND p.p_type = 'SMALL'
      AND l.l_quantity < t.qty_threshold
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: correlated aggregate subquery (per-part average
    quantity) decorrelated into a pre-aggregated join — lineitem is
    aggregated once, not once per probe row. The brand/type filter
    broadcasts through part."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_type") == "SMALL"))
    thresholds = (li.groupBy(F.col("l_partkey").alias("t_partkey"))
                  .agg((F.lit(0.2) * F.avg("l_quantity"))
                       .alias("qty_threshold")))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(thresholds, li.l_partkey == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg((F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0))
             .alias("avg_yearly"))
    )


# ----------------------------------------------------------------- TPC-H Q22

@register(
    "q22_global_sales_opportunity",
    oracle="""
    WITH avg_bal AS (
      SELECT AVG(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_mktsegment,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000)
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery (global average balance)
    broadcast as a 1-row cross join, then anti-join against orders for
    customers who never placed a large order — the reference's O10
    anti-join pattern driving a business query (fixture customers all
    have orders, so the TPC-H "no orders at all" form would be empty). AVG in plain double is safe here: both
    engines sum a single partition in the same order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0) \
        .agg(F.avg("c_acctbal").alias("a"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(o.filter(F.col("o_totalprice") > 300000),
              c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("numcust"),
             F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"))
        .orderBy("c_mktsegment")
    )


# -------------------------------------------------------------- histogram

@register(
    "histogram_value_buckets",
    oracle="""
    SELECT CASE WHEN value < 0.0 THEN 0
                WHEN value >= 100.0 THEN 11
                ELSE CAST(floor(value / 10.0) AS BIGINT) + 1 END AS bucket,
           COUNT(*) AS n,
           CAST(MIN(value) AS DOUBLE) AS lo,
           CAST(MAX(value) AS DOUBLE) AS hi
    FROM events
    GROUP BY 1
    ORDER BY bucket
    """,
)
def histogram_value_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of event values via width_bucket — the
    single-pass distribution profile (one low-cardinality shuffle after
    partial agg; at 100 TB this is how you size joins and spot skew
    before running them)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.width_bucket("value", F.lit(0.0), F.lit(100.0),
                                  F.lit(10)).alias("bucket"))
        .agg(F.count("*").alias("n"),
             F.min("value").cast("double").alias("lo"),
             F.max("value").cast("double").alias("hi"))
        .orderBy("bucket")
    )


# ------------------------------------------------------- gap fill / ffill

@register(
    "timeseries_gapfill_ffill",
    oracle="""
    WITH per_hour AS (
      SELECT user_id, date_trunc('hour', ts) AS hour_ts,
             SUM(CAST(value AS DECIMAL(18,2))) AS hour_value
      FROM events
      WHERE user_id < 20 AND event_type = 'purchase'
      GROUP BY 1, 2
    ),
    bounds AS (
      SELECT user_id, MIN(hour_ts) AS lo, MAX(hour_ts) AS hi
      FROM per_hour GROUP BY user_id
    ),
    spine AS (
      SELECT b.user_id, unnest(generate_series(b.lo, b.hi,
                                               INTERVAL 1 HOUR)) AS hour_ts
      FROM bounds b
    ),
    joined AS (
      SELECT s.user_id, s.hour_ts, p.hour_value,
             COUNT(p.hour_value) OVER (
               PARTITION BY s.user_id ORDER BY s.hour_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      FROM spine s
      LEFT JOIN per_hour p
        ON p.user_id = s.user_id AND p.hour_ts = s.hour_ts
    )
    SELECT user_id, hour_ts,
           CAST(max(hour_value) OVER (PARTITION BY user_id, grp)
                AS DOUBLE) AS filled_value,
           (hour_value IS NULL) AS was_filled
    FROM joined
    """,
)
def timeseries_gapfill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization: hourly resample per user, dense hour
    spine via sequence+explode (no driver-side date loop), left join,
    forward-fill through an ordered window last(ignore nulls). The
    spine explode is per-key and bounded by that key's own time range —
    shuffle stays proportional to output rows at any scale."""
    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("user_id") < 20) & (F.col("event_type") == "purchase"))
    per_hour = (ev.groupBy("user_id",
                           F.date_trunc("hour", "ts").alias("hour_ts"))
                .agg(F.sum(F.col("value").cast("decimal(18,2)"))
                     .alias("hour_value")))
    spine = (per_hour.groupBy("user_id")
             .agg(F.min("hour_ts").alias("lo"), F.max("hour_ts").alias("hi"))
             .select("user_id",
                     F.explode(F.sequence("lo", "hi",
                                          F.expr("INTERVAL 1 HOUR")))
                     .alias("hour_ts")))
    w = (W.partitionBy("user_id").orderBy("hour_ts")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return (
        spine.join(per_hour, ["user_id", "hour_ts"], "left")
        .select("user_id", "hour_ts",
                F.last("hour_value", ignorenulls=True).over(w)
                .cast("double").alias("filled_value"),
                F.col("hour_value").isNull().alias("was_filled"))
    )


# ------------------------------------------------------------------ TPC-H Q8

@register(
    "q8_market_share",
    oracle="""
    SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
           CAST(CAST(SUM(CASE WHEN n2.n_name = 'NATION_3'
                    THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                         * CAST(1 - l.l_discount AS DECIMAL(18,2))
                    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
               / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * CAST(1 - l.l_discount AS DECIMAL(18,2)))
                      AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n1.n_regionkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
    WHERE r.r_name = 'ASIA'
    GROUP BY EXTRACT(year FROM o.o_orderdate)
    ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one supplier nation's share of a region's revenue by
    year — conditional DECIMAL sums, single ratio in double at the end.
    Five of the six joins broadcast; lineitem⋈orders is the only big
    exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"),
                  F.col("n_regionkey").alias("n1_region"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"),
                  F.col("n_name").alias("supp_nation"))
    one = F.lit(1).cast("decimal(18,2)")
    zero = F.lit(0).cast("decimal(18,2)")
    vol = _dec("l_extendedprice") * (one - _dec("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg((F.sum(F.when(F.col("supp_nation") == "NATION_3", vol)
                    .otherwise(zero)).cast("double")
              / F.sum(vol).cast("double")).cast("double").alias("mkt_share"))
        .orderBy("o_year")
    )


# ------------------------------------------------------------------ TPC-H Q9

@register(
    "q9_product_type_profit",
    oracle="""
    SELECT n.n_name AS nation,
           EXTRACT(year FROM o.o_orderdate) AS o_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(18,2))
                    - CAST(0.5 AS DECIMAL(18,2))
                      * CAST(p.p_retailprice AS DECIMAL(18,2))
                      * CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY n.n_name, EXTRACT(year FROM o.o_orderdate)
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (fixtures lack partsupp, so cost = 0.5 x retail
    price): profit by supplier nation and year for parts matching a
    name pattern. The LIKE filter broadcasts through part and prunes
    lineitem before the orders join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    one = F.lit(1).cast("decimal(18,2)")
    half = F.lit(0.5).cast("decimal(18,2)")
    profit = (_dec("l_extendedprice") * (one - _dec("l_discount"))
              - half * _dec("p_retailprice") * _dec("l_quantity"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# ----------------------------------------------------------------- TPC-H Q16

@register(
    "q16_parts_supplier_stats",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#15'
      AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def q16_parts_supplier_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (lineitem stands in for partsupp): distinct
    supplier count per part attribute, excluding suppliers from a NOT IN
    subquery — which compiles to a broadcast left-anti join, not a
    per-row scan. NOT IN's NULL trap doesn't apply (s_suppkey is a
    non-null key) and the anti join is the safe plan for it."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#15")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
    bad_supp = load_table(spark, sf_dir, "supplier") \
        .filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad_supp),
                li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ----------------------------------------------------------------- TPC-H Q21

@register(
    "q21_suppliers_kept_waiting",
    oracle="""
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY
    )
    SELECT s.s_name, COUNT(DISTINCT lt.l_orderkey) AS numwait
    FROM late lt
    JOIN supplier s ON s.s_suppkey = lt.l_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = lt.l_orderkey
                    AND l2.l_suppkey <> lt.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late lt2
                      WHERE lt2.l_orderkey = lt.l_orderkey
                        AND lt2.l_suppkey <> lt.l_suppkey)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    """,
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape ("late" = shipped >45 days after order date since
    fixtures lack commit/receipt dates): suppliers who were the SOLE
    late supplier on a multi-supplier order. Stacked semi + anti joins
    on the same key — Catalyst plans both as one-shuffle hash joins;
    the `late` intermediate is computed once and reused for probe and
    anti sides."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    late = (li.join(o, li.l_orderkey == o.o_orderkey)
            .filter(F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 45 DAY"))
            .select("l_orderkey", "l_suppkey"))
    lt = late.alias("lt")
    other_supp = li.select(F.col("l_orderkey").alias("o_key"),
                           F.col("l_suppkey").alias("o_supp"))
    other_late = late.select(F.col("l_orderkey").alias("ol_key"),
                             F.col("l_suppkey").alias("ol_supp"))
    return (
        lt.join(other_supp, (F.col("lt.l_orderkey") == F.col("o_key"))
                & (F.col("lt.l_suppkey") != F.col("o_supp")), "left_semi")
        .join(other_late, (F.col("lt.l_orderkey") == F.col("ol_key"))
              & (F.col("lt.l_suppkey") != F.col("ol_supp")), "left_anti")
        .join(F.broadcast(s), F.col("lt.l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.countDistinct("lt.l_orderkey").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )
