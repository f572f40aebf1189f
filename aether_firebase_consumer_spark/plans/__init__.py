"""Query registry.

Every implemented operator/query registers itself here with an optional
DuckDB oracle SQL twin. ``__spark_entry__.py`` exposes this registry to
the driver.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # ANSI SQL for DuckDB, or None → rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: Optional[str] = None):
    """Decorator: register a (spark, sf_dir) -> DataFrame query builder."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, builder=fn, oracle=oracle,
                                   doc=(fn.__doc__ or "").strip())
        return fn

    return wrap


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: spec.builder for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {name: spec.oracle for name, spec in REGISTRY.items()
            if spec.oracle is not None}


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from aether_firebase_consumer_spark.plans import (  # noqa: F401
        reference_pipeline,
        relational,
        relational2,
        relational3,
        windows_setops,
        functions_queries,
        streaming_batch,
        dedup_queries,
        similarity_queries,
        text_queries,
        multimodal_queries,
        event_analytics,
        training_queries,
        corpus_queries,
        quality_queries,
        clustering_queries,
        kafka_queries,
        udx_queries,
    )
    _LOADED = True
