"""Scalar-function surface: string / date / math / array / JSON /
conditional expressions (SURVEY.md §2.2 gap table).

The reference only ever uses strip/format/split (O5/O7) and JSON
get/set (O11); this module exercises the full built-in surface the new
engine exposes. Everything is whole-stage-codegen'd — zero Python.
Oracle notes: only functions with engine-identical semantics are used
(sqrt is IEEE-exact; transcendentals are avoided; regexes are kept to
the common RE2/Java subset).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aether_firebase_consumer_spark.plans import register
from aether_firebase_consumer_spark.tables import load_table


@register(
    "string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           lower(p_brand) AS brand_lower,
           length(p_name) AS name_len,
           substr(p_name, 1, 5) AS name_head,
           trim(p_name) AS name_trim,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           concat_ws('|', p_brand, p_type) AS brand_type,
           replace(p_type, ' ', '_') AS type_snake,
           reverse(p_brand) AS brand_rev,
           CASE WHEN p_name LIKE '%blue%' THEN 1 ELSE 0 END AS has_blue,
           instr(p_name, 'a') AS first_a
    FROM part
    """,
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Core string functions over part names."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.trim("p_name").alias("name_trim"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.reverse("p_brand").alias("brand_rev"),
        F.when(F.col("p_name").like("%blue%"), 1).otherwise(0).alias("has_blue"),
        F.instr("p_name", "a").alias("first_a"),
    )


@register(
    "regex_funcs",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_type, '([A-Z]+)', 1) AS first_upper_word,
           regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel,
           CASE WHEN regexp_matches(p_brand, '^Brand#[0-9]+$')
                THEN 1 ELSE 0 END AS brand_wellformed
    FROM part
    WHERE regexp_matches(p_type, 'ECONOMY|SMALL')
    """,
)
def regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extract / replace / match (patterns restricted to the
    RE2∩Java common subset so oracle semantics align)."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_type").rlike("ECONOMY|SMALL"))
        .select(
            "p_partkey",
            F.regexp_extract("p_type", "([A-Z]+)", 1).alias("first_upper_word"),
            F.regexp_replace("p_name", "[aeiou]", "").alias("name_novowel"),
            F.when(F.col("p_brand").rlike("^Brand#[0-9]+$"), 1)
             .otherwise(0).alias("brand_wellformed"),
        )
    )


@register(
    "date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS odate,
           EXTRACT(year FROM o_orderdate) AS oyear,
           EXTRACT(month FROM o_orderdate) AS omonth,
           EXTRACT(day FROM o_orderdate) AS oday,
           EXTRACT(quarter FROM o_orderdate) AS oquarter,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE)
               AS due_date,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           strftime(o_orderdate, '%Y-%m-%d') AS odate_str
    FROM orders
    """,
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time surface: extract, trunc, arithmetic, formatting."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        d.alias("odate"),
        F.year("o_orderdate").cast("bigint").alias("oyear"),
        F.month("o_orderdate").cast("bigint").alias("omonth"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("oday"),
        F.quarter("o_orderdate").cast("bigint").alias("oquarter"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.date_add(d, 30).alias("due_date"),
        F.last_day(d).alias("month_end"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("odate_str"),
    )


@register(
    "date_agg_monthly_revenue",
    oracle="""
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY 1
    ORDER BY 1
    """,
)
def date_agg_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar rollup — the standard time-series reporting shape."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM")
                  .alias("month"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
             .cast("double").alias("revenue"),
             F.count("*").alias("n_orders"))
        .orderBy("month")
    )


@register(
    "math_funcs",
    oracle="""
    SELECT s_suppkey,
           abs(s_acctbal) AS bal_abs,
           CAST(ceil(s_acctbal) AS BIGINT) AS bal_ceil,
           CAST(floor(s_acctbal) AS BIGINT) AS bal_floor,
           round(s_acctbal, 1) AS bal_round1,
           CAST(sqrt(abs(s_acctbal)) AS DOUBLE) AS bal_sqrt,
           CASE WHEN s_acctbal > 0 THEN 1
                WHEN s_acctbal < 0 THEN -1 ELSE 0 END AS bal_sign,
           s_suppkey % 7 AS key_mod,
           CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 2 AS DOUBLE) AS bal_x2,
           greatest(s_acctbal, 0.0) AS bal_pos,
           least(s_acctbal, 0.0) AS bal_neg
    FROM supplier
    """,
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math surface (exact + IEEE-deterministic functions only: sqrt is
    correctly rounded; transcendentals excluded from the oracle set)."""
    s = load_table(spark, sf_dir, "supplier")
    bal = F.col("s_acctbal")
    return s.select(
        "s_suppkey",
        F.abs(bal).alias("bal_abs"),
        F.ceil(bal).alias("bal_ceil"),
        F.floor(bal).alias("bal_floor"),
        F.round(bal, 1).alias("bal_round1"),
        F.sqrt(F.abs(bal)).cast("double").alias("bal_sqrt"),
        F.when(bal > 0, 1).when(bal < 0, -1).otherwise(0).alias("bal_sign"),
        (F.col("s_suppkey") % 7).alias("key_mod"),
        (bal.cast("decimal(18,2)") * 2).cast("double").alias("bal_x2"),
        F.greatest(bal, F.lit(0.0)).alias("bal_pos"),
        F.least(bal, F.lit(0.0)).alias("bal_neg"),
    )


@register(
    "array_funcs",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents)
    SELECT doc_id,
           len(toks) AS n_tokens,
           toks[1] AS first_tok,
           toks[-1] AS last_tok,
           CASE WHEN list_contains(toks, 'spark') THEN 1 ELSE 0 END
               AS has_spark,
           len(list_distinct(toks)) AS n_unique,
           list_sort(list_distinct(toks))[1] AS min_tok,
           array_to_string(toks[1:3], '-') AS head3
    FROM t
    """,
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array surface over tokenized text: size, indexing, contains,
    distinct, sort, slice, join."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.get(toks, 0).alias("first_tok"),
        F.element_at(toks, -1).alias("last_tok"),
        F.when(F.array_contains(toks, "spark"), 1).otherwise(0).alias("has_spark"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        F.get(F.sort_array(F.array_distinct(toks)), 0).alias("min_tok"),
        F.array_join(F.slice(toks, 1, 3), "-").alias("head3"),
    )


@register(
    "array_explode_agg",
    oracle="""
    SELECT tok, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
          FROM documents)
    GROUP BY tok
    ORDER BY n DESC, tok
    LIMIT 25
    """,
)
def array_explode_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode → term statistics (the df-idf building block). Map-side
    partial agg keeps the exploded shuffle small."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n"), F.countDistinct("doc_id").alias("n_docs"))
        .orderBy(F.desc("n"), "tok")
        .limit(25)
    )


@register(
    "array_higher_order",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents)
    SELECT doc_id,
           list_transform(toks[1:5], x -> upper(x)) AS head_upper,
           len(list_filter(toks, x -> length(x) > 4)) AS n_long,
           list_reduce(list_prepend(0, list_transform(toks, x -> length(x))),
                       (acc, x) -> acc + x) AS total_chars
    FROM t
    """,
)
def array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions: transform / filter / aggregate
    (lambda expressions run JVM-side — no UDF)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.transform(F.slice(toks, 1, 5), lambda x: F.upper(x)).alias("head_upper"),
        F.size(F.filter(toks, lambda x: F.length(x) > 4)).alias("n_long"),
        F.aggregate(toks, F.lit(0),
                    lambda acc, x: acc + F.length(x)).alias("total_chars"),
    )


@register(
    "json_funcs",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           json_extract_string(props, '$.missing') AS missing,
           CASE WHEN json_valid(props) THEN 1 ELSE 0 END AS is_valid
    FROM events
    """,
)
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON surface on the untyped props payload (O11's JSON flavor)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        F.get_json_object("props", "$.missing").alias("missing"),
        F.when(F.from_json("props", "k BIGINT").isNotNull(), 1)
         .otherwise(0).alias("is_valid"),
    )


@register(
    "conditional_funcs",
    oracle="""
    SELECT event_id,
           CASE WHEN value >= 50 THEN 'high'
                WHEN value >= 10 THEN 'mid'
                ELSE 'low' END AS bucket,
           coalesce(NULLIF(event_type, 'error'), 'UNKNOWN') AS type_clean,
           CASE WHEN event_type = 'error' AND value > 50 THEN 1 ELSE 0 END
               AS big_error
    FROM events
    """,
)
def conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/coalesce/nullif and boolean composition."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.when(F.col("value") >= 50, "high")
         .when(F.col("value") >= 10, "mid")
         .otherwise("low").alias("bucket"),
        F.coalesce(F.nullif(F.col("event_type"), F.lit("error")),
                   F.lit("UNKNOWN")).alias("type_clean"),
        F.when((F.col("event_type") == "error") & (F.col("value") > 50), 1)
         .otherwise(0).alias("big_error"),
    )


@register(
    "bitwise_funcs",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS k_and,
           o_orderkey | 4096 AS k_or,
           xor(o_orderkey, o_custkey) AS k_xor,
           o_orderkey << 2 AS k_shl,
           o_orderkey >> 3 AS k_shr,
           CAST(bit_count(o_orderkey) AS INT) AS k_bits,
           ~o_orderkey AS k_not
    FROM orders
    """,
)
def bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise surface (and/or/xor/shifts/popcount/not) — exact int64
    semantics on both engines, pure codegen."""
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("k_and"),
        k.bitwiseOR(F.lit(4096)).alias("k_or"),
        k.bitwiseXOR(F.col("o_custkey")).alias("k_xor"),
        F.shiftleft(k, 2).alias("k_shl"),
        F.shiftright(k, 3).alias("k_shr"),
        F.bit_count(k).alias("k_bits"),
        F.bitwise_not(k).alias("k_not"),
    )


@register(
    "variant_json_ops",
    oracle="""
    WITH v AS (
      SELECT event_type,
             CAST(json_extract(props, '$.k') AS INT) AS k
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           CAST(COUNT(*) FILTER (k % 2 = 1) AS BIGINT) AS n_odd_k,
           CAST(MIN(k) AS INT) AS min_k,
           CAST(MAX(k) AS INT) AS max_k
    FROM v GROUP BY event_type
    """,
)
def variant_json_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured data through Spark 4's VARIANT type — the
    engine-native mapping for the reference's 'arbitrary JSON value'
    columns (RTDB accepts scalars/lists/maps,
    ``/root/reference/firebase/tests/test_unit.py:57-60``; SURVEY.md
    §1.2 last row). ``parse_json`` decodes each payload ONCE into the
    binary variant encoding; ``variant_get`` then extracts typed paths
    without re-parsing strings per access — at 100 TB this beats
    repeated ``get_json_object`` (one string parse per path per row)
    and columnar stores can shred the variant for pruning. The
    aggregate is a plain one-shuffle groupBy on the extracted ints."""
    ev = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "int")
    v = ev.select("event_type", k.alias("k"))
    return (v.groupBy("event_type")
            .agg(F.count("*").cast("bigint").alias("n_events"),
                 F.sum("k").cast("bigint").alias("sum_k"),
                 F.sum(F.when(F.col("k") % 2 == 1, 1).otherwise(0))
                  .cast("bigint").alias("n_odd_k"),
                 F.min("k").cast("int").alias("min_k"),
                 F.max("k").cast("int").alias("max_k")))
