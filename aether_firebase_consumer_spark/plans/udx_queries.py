"""Queries exercising the user-extension surface (UDAF + UDTF) under
the oracle gate — SURVEY.md §2.2's "UDF/UDAF/UDTF" row as runnable,
hash-checked proof (the scalar pandas UDF exemplar lives in
``functions/hashing.py`` with its own golden test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aether_firebase_consumer_spark.functions.udx import (
    count_rows,
    median_long,
    register_udtfs,
)
from aether_firebase_consumer_spark.plans import register
from aether_firebase_consumer_spark.tables import load_table


@register(
    "udaf_median_doclen",
    oracle="""
    SELECT lang,
           quantile_cont(n_chars, 0.5) AS median_chars,
           COUNT(*) AS n_docs
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def udaf_median_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median document length per language via a GROUPED-AGG pandas
    UDF — the UDAF mechanism under the oracle gate. The median of a
    BIGINT column is an int or a .5 half (exactly representable), so
    the Arrow-side ``Series.median()`` hash-matches DuckDB's
    ``quantile_cont``. Plan shape: a normal aggregate — partial shuffle
    on ``lang``, the Python kernel sees one group's values at a time.
    (For production medians the JVM ``percentile`` /
    ``approx_percentile`` built-ins win — ``agg_percentiles_stats``
    carries that; this query pins the extension mechanism.)"""
    docs = load_table(spark, sf_dir, "documents")
    # both aggregates are pandas UDAFs: Spark refuses GROUPED_AGG
    # pandas UDFs mixed with JVM aggregates in one agg()
    return (docs.groupBy("lang")
            .agg(median_long(F.col("n_chars")).alias("median_chars"),
                 count_rows(F.col("n_chars")).alias("n_docs"))
            .orderBy("lang"))


@register(
    "udtf_word_ngrams",
    oracle="""
    WITH sel AS (
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents WHERE doc_id % 50 = 0
    )
    SELECT doc_id,
           generate_subscripts(list_transform(
             generate_series(1, greatest(len(toks) - 2, 0)),
             i -> array_to_string(toks[i:i+2], ' ')), 1) AS pos,
           unnest(list_transform(
             generate_series(1, greatest(len(toks) - 2, 0)),
             i -> array_to_string(toks[i:i+2], ' '))) AS ngram
    FROM sel
    """,
)
def udtf_word_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional word 3-grams through a Python UDTF joined LATERALly
    in SQL — the table-function mechanism under the oracle gate, on a
    deterministic 2% document slice (the Python generator is the slow
    path; the production n-gram queries use codegen transforms). The
    oracle zips ``unnest`` with ``generate_subscripts`` to reproduce
    the (pos, ngram) pairs."""
    register_udtfs(spark)
    docs = load_table(spark, sf_dir, "documents") \
        .filter(F.col("doc_id") % 50 == 0)
    docs.createOrReplaceTempView("udtf_docs_sel")
    return spark.sql(
        "SELECT d.doc_id, g.pos, g.ngram "
        "FROM udtf_docs_sel d, LATERAL word_ngrams(d.text) g")
