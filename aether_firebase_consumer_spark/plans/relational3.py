"""Relational surface, part 3: the partsupp-centric TPC-H shapes
(Q2 / Q11 / Q20), closing the classic-analytics inventory at 22 of 22
query patterns.

The driver fixtures have no ``partsupp`` table, so these queries derive
one from ``lineitem`` — ``ps(partkey, suppkey, supplycost, availqty)``
with ``supplycost = MIN(l_extendedprice)`` (an order-insensitive double
min, bit-exact across engines) and ``availqty = SUM(l_quantity)``
accumulated in DECIMAL. The derivation itself is the interesting part at
scale: it is one map-side-combinable groupBy over the fact table whose
output (~|part|×avg-suppliers rows) is then small enough to drive the
dimensional logic, so each query costs one lineitem shuffle keyed by
``(l_partkey, l_suppkey)`` — and under AQE the downstream joins against
it broadcast.

Cross-engine exactness: the Q11 threshold comparison stays entirely in
DECIMAL (``v * 1000 > total`` instead of ``v > total * 0.001``) because
the corpus-wide total at sf0.1 exceeds 2^53 scaled units and a
decimal→double cast can differ by 1 ulp between Spark and DuckDB; the
per-part output values are small enough to cast exactly.

Reference parity note: the reference (eHealthAfrica/aether-firebase-consumer)
has no analytic surface at all — SURVEY.md §2.2 verified absences — so
these, like the rest of plans/relational*.py, are capability-gap
queries graded against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from aether_firebase_consumer_spark.plans import register
from aether_firebase_consumer_spark.tables import load_table


def _dec(col, p=18, s=2):
    return F.col(col).cast(f"decimal({p},{s})") if isinstance(col, str) \
        else col.cast(f"decimal({p},{s})")


_PS_SQL = """WITH ps AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         MIN(l_extendedprice) AS ps_supplycost,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS ps_availqty
  FROM lineitem GROUP BY 1, 2
)"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem-derived partsupp: one shuffle on (l_partkey, l_suppkey),
    partial aggregation map-side; output is dimension-sized."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_partkey").alias("ps_partkey"),
                   F.col("l_suppkey").alias("ps_suppkey"))
        .agg(F.min("l_extendedprice").alias("ps_supplycost"),
             F.sum(_dec("l_quantity")).cast("double").alias("ps_availqty"))
    )


def _supplier_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)


# ------------------------------------------------------------------ TPC-H Q2

@register(
    "q2_min_cost_supplier",
    oracle=_PS_SQL + """
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
           ps_supplycost AS min_cost
    FROM part, supplier, ps, nation, region
    WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
      AND p_size = 15 AND p_type LIKE '%OMY'
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
      AND ps_supplycost = (
        SELECT MIN(ps2.ps_supplycost)
        FROM ps ps2, supplier s2, nation n2, region r2
        WHERE ps2.ps_partkey = p_partkey AND s2.s_suppkey = ps2.ps_suppkey
          AND s2.s_nationkey = n2.n_nationkey
          AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest supplier per part within a region. The
    correlated MIN subquery becomes a window min over ps_partkey — one
    pass instead of a self-join re-scan. Plan at scale: lineitem→ps is
    the only fact shuffle; supplier⋈nation⋈region is broadcast; the
    window min runs on the already-partkey-clustered ps rows, and the
    part filter broadcasts into the final join. The classic LIMIT 100 is
    dropped: boundary ties would make the result nondeterministic under
    partition order, and the oracle hash is order-insensitive anyway."""
    ps = _partsupp(spark, sf_dir)
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nat = load_table(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & F.col("p_type").like("%OMY"))

    eligible = ps.join(F.broadcast(supp.select("s_suppkey", "s_name",
                                               "s_acctbal", "n_name")),
                       ps.ps_suppkey == F.col("s_suppkey"))
    min_w = W.partitionBy("ps_partkey")
    best = (eligible
            .withColumn("min_cost", F.min("ps_supplycost").over(min_w))
            .filter(F.col("ps_supplycost") == F.col("min_cost")))
    return (
        best.join(F.broadcast(part), best.ps_partkey == part.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
                F.col("ps_supplycost").alias("min_cost"))
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
    )


# ----------------------------------------------------------------- TPC-H Q11

@register(
    "q11_important_stock",
    oracle=_PS_SQL + """
    , nat AS (SELECT s_suppkey FROM supplier JOIN nation
              ON s_nationkey = n_nationkey
              WHERE n_name IN ('NATION_7','NATION_12','NATION_22'))
    , val AS (SELECT ps_partkey,
                     SUM(CAST(ps_supplycost AS DECIMAL(18,2))
                         * CAST(ps_availqty AS DECIMAL(18,2))) AS v
              FROM ps JOIN nat ON ps_suppkey = s_suppkey
              GROUP BY ps_partkey)
    SELECT ps_partkey, CAST(v AS DOUBLE) AS part_value
    FROM val
    WHERE CAST(v AS DECIMAL(30,4)) * 8000 >
          (SELECT SUM(CAST(ps_supplycost AS DECIMAL(18,2))
                      * CAST(ps_availqty AS DECIMAL(18,2)))
           FROM ps JOIN nat ON ps_suppkey = s_suppkey)
    ORDER BY part_value DESC
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose inventory value within a supplier
    group exceeds 1/8000 of the group total (the classic 1/1000 fraction
    widened so per-part share stays non-vacuous as |part| grows across
    fixture SFs). The scalar subquery becomes a single-row aggregate
    broadcast-cross-joined back onto the per-part rows — NOT a window
    over an empty partition spec, which would funnel every per-part row
    through one partition and cap out when |part| is large. The val
    relation is computed once and reused for both sides (same Spark
    stage under plan reuse). Threshold compare stays in DECIMAL
    (v*8000 > total): the group total at sf≥0.1 exceeds 2^53 scaled
    units, where a decimal→double cast is 1-ulp unstable across
    engines."""
    ps = _partsupp(spark, sf_dir)
    nat = _supplier_nation(spark, sf_dir).filter(
        F.col("n_name").isin("NATION_7", "NATION_12", "NATION_22")) \
        .select("s_suppkey")
    val = (ps.join(F.broadcast(nat), ps.ps_suppkey == F.col("s_suppkey"))
           .groupBy("ps_partkey")
           .agg(F.sum(_dec("ps_supplycost") * _dec("ps_availqty")).alias("v")))
    total = val.agg(F.sum("v").alias("total"))  # one row
    return (
        val.join(F.broadcast(total))
        .filter(F.col("v").cast("decimal(30,4)") * 8000 > F.col("total"))
        .select("ps_partkey", F.col("v").cast("double").alias("part_value"))
        .orderBy(F.desc("part_value"))
    )


# ----------------------------------------------------------------- TPC-H Q20

@register(
    "q20_drawn_down_suppliers",
    oracle=_PS_SQL + """
    , shipped AS (SELECT l_partkey, l_suppkey,
                         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS q96
                  FROM lineitem
                  WHERE l_shipdate >= DATE '1996-01-01'
                    AND l_shipdate < DATE '1997-01-01'
                  GROUP BY 1, 2)
    SELECT s_name, s_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_3','NATION_8','NATION_13')
      AND s_suppkey IN (
        SELECT ps_suppkey FROM ps
        JOIN part ON p_partkey = ps_partkey AND p_name LIKE 'red%'
        JOIN shipped ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        WHERE CAST(ps_availqty AS DECIMAL(18,2)) < q96 * 2)
    ORDER BY s_name
    """,
)
def q20_drawn_down_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers of 'red' parts whose one-year shipments
    (1996) drew down at least half their total supplied quantity —
    inverted from the classic availqty threshold because the derived
    availqty is a superset of any year's shipments, which would make the
    original predicate vacuous. The IN becomes a left-semi join; ps and
    shipped are two aggregations over the SAME (l_partkey, l_suppkey)
    clustering, so AQE reuses the exchange rather than shuffling
    lineitem twice; part and nation filters broadcast."""
    ps = _partsupp(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    shipped = (li.filter((F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
                         & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date")))
               .groupBy("l_partkey", "l_suppkey")
               .agg(F.sum(_dec("l_quantity")).alias("q96")))
    red_parts = load_table(spark, sf_dir, "part") \
        .filter(F.col("p_name").like("red%")).select("p_partkey")
    drawn = (ps.join(F.broadcast(red_parts), ps.ps_partkey == F.col("p_partkey"))
             .join(shipped, (ps.ps_partkey == shipped.l_partkey)
                   & (ps.ps_suppkey == shipped.l_suppkey))
             .filter(_dec("ps_availqty") < F.col("q96") * 2)
             .select("ps_suppkey"))
    sn = _supplier_nation(spark, sf_dir).filter(
        F.col("n_name").isin("NATION_3", "NATION_8", "NATION_13"))
    return (
        sn.join(drawn, sn.s_suppkey == drawn.ps_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@register(
    "join_bloom_prefilter",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                         WHERE o_orderpriority = '1-URGENT')
    GROUP BY l_returnflag
    """,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join reduction via a broadcast Bloom-style pre-filter — the
    100 TB pattern for fact⋈selective-dim when the dim key set is too
    large to broadcast exactly but its HASH-BUCKET fingerprint is not.

    Stage 1 builds the filter: distinct pmod(xxhash64(key), 4096)
    buckets of the selected orders — at most 4096 rows whatever the
    dim's cardinality, so it ALWAYS broadcasts. Stage 2 applies it to
    lineitem as a broadcast semi-join BEFORE the exact semi-join's
    shuffle: like a Bloom filter it admits false positives (bucket
    collisions) but never false negatives, so the exact semi join
    afterwards sees a fraction of the fact table and the final result
    is exactly the plain semi join the oracle states. Spark's own
    runtime-filter rewrite (spark.sql.optimizer.runtime.bloomFilter)
    does this automatically for some shapes; this query is the
    explicit, always-available form of the same reduction."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    sel = orders.filter(F.col("o_orderpriority") == "1-URGENT") \
                .select("o_orderkey")
    buckets = sel.select(
        F.pmod(F.xxhash64("o_orderkey"), F.lit(4096)).alias("bk")).distinct()
    pruned = li.join(
        F.broadcast(buckets),
        F.pmod(F.xxhash64("l_orderkey"), F.lit(4096)) == F.col("bk"),
        "left_semi")
    exact = pruned.join(sel, pruned.l_orderkey == sel.o_orderkey,
                        "left_semi")
    return (exact.groupBy("l_returnflag")
            .agg(F.count("*").cast("bigint").alias("n_rows"),
                 F.sum(_dec("l_quantity")).cast("double").alias("sum_qty")))


#: One SQL text, two engines: the same ANSI string runs through
#: spark.sql() AND as the DuckDB oracle (modulo nothing — kept to the
#: dialect intersection), proving the SQL front-end surface on top of
#: the same Catalyst plans the DataFrame queries compile to.
_SQL_FRONTEND = """
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2))))
                AS DOUBLE) AS revenue,
           CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderpriority LIKE '1-%'
    GROUP BY n.n_name
    HAVING COUNT(DISTINCT o.o_orderkey) > 5
"""


@register("sql_frontend_revenue", oracle=_SQL_FRONTEND)
def sql_frontend_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's SQL front end: fixture tables registered as temp
    views, the query submitted as ONE ANSI SQL string through
    ``spark.sql`` — the exact same text the DuckDB oracle executes, so
    the gate proves dialect-intersection portability, not just result
    parity. Catalyst plans it identically to the DataFrame-built
    equivalents (broadcast dims, partial aggregation); DECIMAL
    accumulation keeps the DOUBLE projection bit-stable."""
    for t in ("lineitem", "orders", "customer", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_SQL_FRONTEND)
