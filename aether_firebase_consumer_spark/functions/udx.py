"""User-extension surface (SURVEY.md §2.2 "UDF/UDAF/UDTF" row): one
exemplar of each extension mechanism beyond the scalar pandas UDF that
``functions/hashing.py`` already carries.

- :func:`median_long` — GROUPED-AGGREGATE pandas UDF (a UDAF): Arrow
  ships each group's column as one pandas Series, the aggregate runs
  vectorized, one scalar returns per group. The engine plans it like
  any aggregate (partial shuffle on the grouping key); the Python
  kernel only ever sees one group's values.
- :func:`word_ngrams_udtf` — a Python UDTF (table function): one input
  row → N output rows, usable from SQL via ``LATERAL`` like any
  generator.

The UDF/UDTF rule from the repo's performance posture still holds:
built-ins first, Arrow-vectorized Python only when the logic can't be
expressed otherwise — these exist to prove the extension surface works
end-to-end under the oracle gate, and both registered queries keep the
Python path bounded (grouped medians of a BIGINT column; a
deterministic 2% document slice for the generator).

Construction is lazy (inside functions): pandas_udf/udtf decorators
resolve their return-type strings against the ACTIVE SparkSession, so
module-level decoration would break plain imports in sessionless
processes (the driver imports ``__spark_entry__`` before building its
own session).
"""

from __future__ import annotations

from functools import lru_cache


@lru_cache(maxsize=1)
def median_long_udf():
    """Exact median of a BIGINT column per group (grouped-agg pandas
    UDF). Restricted to integer inputs on purpose: the median of ints
    is an int or a .5 half — exactly representable, so the result
    hash-matches DuckDB's ``quantile_cont(x, 0.5)`` (a float column
    would re-open summation-order drift)."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf
    from pyspark.sql.types import DoubleType

    # explicit GROUPED_AGG: annotation-based inference would read the
    # stringized annotations this module's `from __future__ import
    # annotations` produces and fail
    @pandas_udf(DoubleType(), PandasUDFType.GROUPED_AGG)
    def median_long(v):
        return float(v.median())

    return median_long


@lru_cache(maxsize=1)
def count_rows_udf():
    """Row count as a grouped-agg pandas UDF — exists because Spark
    refuses to mix GROUPED_AGG pandas UDFs with JVM aggregates in one
    ``agg()`` (INVALID_PANDAS_UDF_PLACEMENT), so a UDAF query needs
    its companions in pandas too."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf
    from pyspark.sql.types import LongType

    @pandas_udf(LongType(), PandasUDFType.GROUPED_AGG)
    def count_rows(v):
        return len(v)

    return count_rows


def median_long(col):
    return median_long_udf()(col)


def count_rows(col):
    return count_rows_udf()(col)


@lru_cache(maxsize=1)
def word_ngrams_udtf():
    """Python UDTF: explode a document into positional word 3-grams
    (NON-distinct, unlike the dedup shingle sets — position matters
    here). One input row yields len(tokens)-2 output rows."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType([StructField("pos", IntegerType()),
                         StructField("ngram", StringType())])

    @udtf(returnType=schema)
    class WordNgrams:
        def eval(self, text: str):
            if text is None:
                return
            toks = text.split(" ")
            for i in range(max(len(toks) - 2, 0)):
                yield i + 1, " ".join(toks[i:i + 3])

    return WordNgrams


def register_udtfs(spark) -> None:
    """Idempotent SQL registration (``LATERAL word_ngrams(text)``)."""
    spark.udtf.register("word_ngrams", word_ngrams_udtf())
