"""Multimodal-column queries (SURVEY.md §2.3): binary payload +
metadata projection, and the Arrow-batched feature-extraction pipeline
(deterministic fake kernel — the codecs aren't in the container, the
Spark plumbing is real).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aether_firebase_consumer_spark.operators.multimodal import (
    attach_binary,
    extract_features,
)
from aether_firebase_consumer_spark.plans import register
from aether_firebase_consumer_spark.tables import fan_out_for_compute, load_table


@register(
    "multimodal_binary_meta",
    oracle="""
    SELECT doc_id,
           encode(text) AS payload,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           'application/octet-stream' AS mime,
           'mem://doc/' || CAST(doc_id AS VARCHAR) AS source_uri
    FROM documents
    """,
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque binary column + typed metadata struct — the multimodal
    storage pattern (blob stays columnar; metadata queryable without
    touching bytes thanks to parquet column pruning)."""
    docs = load_table(spark, sf_dir, "documents")
    out = attach_binary(docs)
    return out.select(
        "doc_id", "payload",
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col("media_meta.mime").alias("mime"),
        F.col("media_meta.source_uri").alias("source_uri"),
    )


@register(
    "multimodal_feature_extract",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           ascii(substr(text, 1, 1)) AS first_byte,
           md5(text) AS content_md5
    FROM documents
    """,
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction over binary payloads (Arrow batch
    in/out — the decode-kernel distribution path, with a deterministic
    fake kernel standing in for the absent codecs)."""
    docs = fan_out_for_compute(load_table(spark, sf_dir, "documents"))
    return extract_features(attach_binary(docs))
