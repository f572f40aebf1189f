"""Classification-based column masking (reference O4).

The reference drops every field whose ``@aether_masking`` classification
exceeds the subscription's ``masking_emit_level`` within the ordered
``masking_levels`` list (config build ``firebase/app/artifacts.py:359-370``;
schema fields ``firebase/app/fixtures/schemas.py:198-231``; example levels
``['public','private']`` emitting ``public`` at
``firebase/app/fixtures/examples.py:40-42``; annotated fields
``firebase/tests/__init__.py:954,965,976,1008``).

Spark-first: masking is a *projection*. We compute the allowed column
set once at plan-build time and emit a single ``select`` — Catalyst's
ColumnPruning then propagates the projection all the way into the scan
(masked columns are never even read from parquet). No per-row work at
all, at any scale.

Classification metadata lives either in ``StructField.metadata['masking']``
(set by the Avro→Spark schema mapper) or an explicit ``{column: level}``
dict.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Mapping, Sequence

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class MaskConfig:
    """Mirror of the SDK MaskConfig (``firebase/app/artifacts.py:359-370``)."""

    mask_levels: Sequence[str]          # ordered low → high sensitivity
    emit_level: str                     # highest level allowed out
    annotation: str = "masking"         # StructField.metadata key


def allowed_columns(df: DataFrame, cfg: MaskConfig,
                    classifications: Mapping[str, str] | None = None) -> list[str]:
    """Columns whose classification rank ≤ emit-level rank.

    Unclassified columns are treated as the lowest level (the reference
    only drops fields that carry an annotation above the emit level).
    """
    levels = list(cfg.mask_levels)
    if cfg.emit_level not in levels:
        # Emit level outside the ordered list → nothing is restricted
        # beyond annotated fields unknown to the list; treat as highest.
        emit_rank = len(levels)
    else:
        emit_rank = levels.index(cfg.emit_level)

    def rank(level: str | None) -> int:
        if level is None or level not in levels:
            return 0
        return levels.index(level)

    out = []
    for f in df.schema.fields:
        cls = None
        if classifications is not None:
            cls = classifications.get(f.name)
        elif f.metadata and cfg.annotation in f.metadata:
            cls = f.metadata[cfg.annotation]
        if rank(cls) <= emit_rank:
            out.append(f.name)
    return out


def apply_mask(df: DataFrame, cfg: MaskConfig,
               classifications: Mapping[str, str] | None = None) -> DataFrame:
    """Project to the columns emittable at ``cfg.emit_level``."""
    return df.select(*allowed_columns(df, cfg, classifications))
