"""Relational parity surface: joins + aggregations (SURVEY.md §2.2).

The reference has no joins or aggregations at all (verified absences,
SURVEY §0); this module supplies the standard relational surface through
Catalyst. Numeric aggregates are computed in DECIMAL (exact, associative
— identical across engines and partition orders) and cast to DOUBLE at
the end, so results are bit-stable under Spark's nondeterministic
partial-aggregation order AND hash-match the DuckDB oracle.

Scale notes per query are inline; the common posture:
- dimensions (region/nation/supplier/part/customer) are broadcast —
  the fact side never shuffles for the join;
- fact-fact joins (orders⋈lineitem) shuffle on the join key once, and
  AQE handles skew;
- aggregates are partial (map-side combine) automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aether_firebase_consumer_spark.plans import register
from aether_firebase_consumer_spark.tables import load_table


def _dec(col, p=18, s=2):
    return F.col(col).cast(f"decimal({p},{s})") if isinstance(col, str) \
        else col.cast(f"decimal({p},{s})")


# ------------------------------------------------------------------ TPC-H Q1

@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(18,2))
                    * CAST(1 + l_tax AS DECIMAL(18,2))) AS DOUBLE) AS sum_charge,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                / COUNT(*) AS DOUBLE) AS avg_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                / COUNT(*) AS DOUBLE) AS avg_price,
           CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
                / COUNT(*) AS DOUBLE) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: scan-heavy group-by with 8 aggregates. One shuffle on a
    low-cardinality key after map-side partial aggregation — at 100 TB
    the reduce side receives only (num_partitions × groups) rows."""
    li = load_table(spark, sf_dir, "lineitem")
    qty, price, disc, tax = (_dec("l_quantity"), _dec("l_extendedprice"),
                             _dec("l_discount"), _dec("l_tax"))
    one = F.lit(1).cast("decimal(18,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (one - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (one - disc) * (one + tax)).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / F.count("*")).cast("double").alias("avg_qty"),
            (F.sum(price).cast("double") / F.count("*")).cast("double").alias("avg_price"),
            (F.sum(disc).cast("double") / F.count("*")).cast("double").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ------------------------------------------------------------------ joins

@register(
    "join_broadcast_dim",
    oracle="""
    SELECT n.n_name AS nation, r.r_name AS region,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal,
           COUNT(*) AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name, r.r_name
    """,
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact ⋈ two broadcast dimensions. With F.broadcast the
    customer side never shuffles for the joins — the only exchange is the
    final group-by, on ≤25 keys after partial agg."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.sum(_dec("c_acctbal")).cast("double").alias("total_acctbal"),
            F.count("*").alias("n_customers"),
        )
    )


@register(
    "join_fact_fact",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderstatus = 'O'
    GROUP BY o.o_orderpriority
    """,
)
def join_fact_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact equi-join: both sides shuffle on o_orderkey (sort-merge
    or shuffled-hash per AQE). The o_orderstatus filter pushes to the
    orders scan, shrinking the shuffled side before the exchange."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_lines"),
             F.sum(_dec("l_extendedprice")).cast("double").alias("revenue"))
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, COUNT(o.o_orderkey) AS n_orders
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders; COUNT(col)
    semantics (NULLs uncounted) match SQL."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): only the key column of the right side is
    shuffled; output carries no right-side columns (no duplication)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (c.join(o, c.c_custkey == o.o_custkey, "left_semi")
              .select("c_custkey", "c_name", "c_mktsegment"))


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS) — the load-bearing primitive for the
    reference's O10 change detection."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti") \
            .select("c_custkey", "c_name")


@register(
    "join_theta_range",
    oracle="""
    SELECT p.p_partkey, p.p_size, s.s_suppkey
    FROM part p
    JOIN supplier s
      ON s.s_nationkey = p.p_size
     AND s.s_acctbal > p.p_retailprice / 100.0
    WHERE p.p_size <= 10
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join: equi component (s_nationkey = p_size) lets Catalyst
    use a hash join with the range predicate as a post-join filter —
    avoiding the O(n·m) pure-NLJ plan."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    s = load_table(spark, sf_dir, "supplier")
    return (
        p.join(s, (s.s_nationkey == p.p_size)
               & (s.s_acctbal > p.p_retailprice / 100.0))
        .select("p_partkey", "p_size", "s_suppkey")
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           CAST(o.o_orderdate AS DATE) AS o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < DATE '1995-03-15'
      AND l.l_shipdate > DATE '1995-03-15'
    GROUP BY l.l_orderkey, CAST(o.o_orderdate AS DATE)
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter broadcast into a fact-fact
    join, then top-k by revenue. LIMIT after ORDER BY is a TakeOrdered
    physical op — no full sort materialization. Tie-broken by l_orderkey
    for determinism."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("date"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("date"))
    one = F.lit(1).cast("decimal(18,2)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", F.col("o_orderdate").cast("date").alias("o_orderdate"))
        .agg(F.sum(_dec("l_extendedprice") * (one - _dec("l_discount")))
             .cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    ORDER BY revenue DESC, nation
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join. Dimensions broadcast; the only big
    exchange is orders⋈lineitem on orderkey. Join order lets Catalyst
    push the ASIA filter through region→nation→supplier before any fact
    is touched."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    one = F.lit(1).cast("decimal(18,2)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(c, (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(_dec("l_extendedprice") * (one - _dec("l_discount")))
             .cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "nation")
    )


# ------------------------------------------------------------------ aggs

@register(
    "agg_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_distinct_cust,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregate: Catalyst expands to a two-phase plan (distinct
    on (group, cust) then count) — partial-agg friendly."""
    o = load_table(spark, sf_dir, "orders")
    return (o.groupBy("o_orderpriority")
              .agg(F.countDistinct("o_custkey").alias("n_distinct_cust"),
                   F.count("*").alias("n_orders")))


@register(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (subtotals + grand total)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(F.count("*").alias("n"))


@register(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (all combinations)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(F.count("*").alias("n"))


@register(
    "agg_stats",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(MIN(value) AS DOUBLE) AS min_value,
           CAST(MAX(value) AS DOUBLE) AS max_value,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-aggregate over the event stream table (min/max/sum/distinct)."""
    ev = load_table(spark, sf_dir, "events")
    return (ev.groupBy("event_type")
              .agg(F.count("*").alias("n"),
                   F.min("value").cast("double").alias("min_value"),
                   F.max("value").cast("double").alias("max_value"),
                   F.sum(_dec("value")).cast("double").alias("sum_value"),
                   F.countDistinct("user_id").alias("n_users")))


@register(
    "join_full_outer",
    oracle="""
    WITH clicks AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_clicks
      FROM events WHERE event_type = 'click' GROUP BY user_id
    ),
    buys AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_purchases
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT COALESCE(c.user_id, b.user_id) AS user_id,
           COALESCE(c.n_clicks, 0) AS n_clicks,
           COALESCE(b.n_purchases, 0) AS n_purchases
    FROM clicks c FULL OUTER JOIN buys b ON c.user_id = b.user_id
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join: per-user click counts vs purchase counts, each
    side surviving without a partner (users who only click, users who
    only buy). Both sides pre-aggregate BEFORE the join, so the outer
    join matches |users| rows against |users| rows — never raw events
    against raw events — and the join key is the shuffle key already
    used by the aggregates (no extra exchange)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = (ev.where(F.col("event_type") == "click").groupBy("user_id")
              .agg(F.count("*").cast("bigint").alias("n_clicks")))
    buys = (ev.where(F.col("event_type") == "purchase").groupBy("user_id")
            .agg(F.count("*").cast("bigint").alias("n_purchases")))
    c, b = clicks.alias("c"), buys.alias("b")
    return (c.join(b, F.col("c.user_id") == F.col("b.user_id"),
                   "full_outer")
            .select(F.coalesce(F.col("c.user_id"), F.col("b.user_id"))
                    .alias("user_id"),
                    F.coalesce(F.col("c.n_clicks"), F.lit(0).cast("bigint"))
                    .alias("n_clicks"),
                    F.coalesce(F.col("b.n_purchases"),
                               F.lit(0).cast("bigint"))
                    .alias("n_purchases")))
