"""Predicate filter (reference O3).

The reference installs a per-topic ``FilterConfig(filter_path,
filter_passes, filter_required)`` into its Kafka consumer so rows are
dropped during deserialization (``firebase/app/artifacts.py:346-358``;
schema fields ``firebase/app/fixtures/schemas.py:232-262``; example:
path ``operational_status``, pass ``['operational']`` at
``firebase/app/fixtures/examples.py:43-45``).

Spark-first: the same semantics are one declarative ``df.filter`` —
Catalyst pushes the predicate into the parquet/Kafka scan
(PushDownPredicates), which *is* the reference's "filter before the job
sees the batch" behavior, but vectorized and short-circuited in the
scan instead of per-dict Python checks.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class FilterConfig:
    """Mirror of the SDK FilterConfig the reference builds per topic."""

    check_condition_path: str
    pass_conditions: Sequence[Any] = field(default_factory=tuple)
    requires_approval: bool = True  # `filter_required` in the subscription


def field_at_path(path: str) -> Column:
    """Resolve a dotted field path against a typed DataFrame.

    Reference filters address a (possibly nested) field by dotted path;
    on a typed schema this is exactly Spark's nested column reference.
    """
    return F.col(path)


def json_field_at_path(json_col: str | Column, path: str) -> Column:
    """Resolve a dotted path inside an untyped JSON string payload.

    For payloads kept as raw JSON (the reference's documents are
    schemaless dicts downstream), ``get_json_object`` evaluates JSONPath
    JVM-side — no Python in the hot path.
    """
    col = F.col(json_col) if isinstance(json_col, str) else json_col
    return F.get_json_object(col, "$." + path)


def apply_filter(df: DataFrame, cfg: FilterConfig,
                 json_payload_col: str | None = None) -> DataFrame:
    """Keep rows whose value at ``check_condition_path`` is in
    ``pass_conditions`` — iff the filter is required.

    `requires_approval=False` disables the gate entirely, matching the
    reference's `filter_required` subscription flag
    (``firebase/app/artifacts.py:350-352``).
    """
    if not cfg.requires_approval:
        return df
    if json_payload_col is not None:
        target = json_field_at_path(json_payload_col, cfg.check_condition_path)
        # get_json_object yields strings; compare stringified pass values.
        passes = [str(v) for v in cfg.pass_conditions]
    else:
        target = field_at_path(cfg.check_condition_path)
        passes = list(cfg.pass_conditions)
    return df.filter(target.isin(passes))
