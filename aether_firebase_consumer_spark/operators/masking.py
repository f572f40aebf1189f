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

    Fail-closed rules (this is a PII operator — a typo'd config must
    never leak a private column):

    * ``emit_level`` not present in ``mask_levels`` → ``ValueError``.
      Treating it as "highest" would emit everything on a misspelt
      config.
    * A column annotated with a classification that is *not* in
      ``mask_levels`` is **dropped**. An unknown level cannot be
      proven emittable, so it isn't.
    """
    levels = list(cfg.mask_levels)
    if cfg.emit_level not in levels:
        raise ValueError(
            f"emit_level {cfg.emit_level!r} is not in mask_levels {levels!r}; "
            "refusing to emit (fail-closed)")
    emit_rank = levels.index(cfg.emit_level)

    out = []
    for f in df.schema.fields:
        cls = None
        if classifications is not None:
            cls = classifications.get(f.name)
        elif f.metadata and cfg.annotation in f.metadata:
            cls = f.metadata[cfg.annotation]
        if cls is None:
            out.append(f.name)          # unannotated → lowest level
        elif cls in levels and levels.index(cls) <= emit_rank:
            out.append(f.name)
        # annotated with unknown or too-high level → dropped
    return out


def apply_mask(df: DataFrame, cfg: MaskConfig,
               classifications: Mapping[str, str] | None = None) -> DataFrame:
    """Project to the columns emittable at ``cfg.emit_level``."""
    return df.select(*allowed_columns(df, cfg, classifications))
