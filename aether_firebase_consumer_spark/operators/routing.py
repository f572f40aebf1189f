"""Topic naming, path templating, and subscription routing
(reference O2 / O5 / O6 / O7).

- Tenant-prefix strip (O5): the reference uses
  ``topic.lstrip(f'{tenant}.')`` (``firebase/app/artifacts.py:375-376``)
  — a *character-set* strip that corrupts names sharing letters with the
  tenant. We implement the documented intent with an anchored regex
  (divergence recorded in README).
- Target-path templating (O7): ``path_for_topic``
  (``firebase/app/artifacts.py:180-186``), default template
  ``_aether/entities/{topic}``; validation requires an odd number of
  path segments and no unresolved ``{...}`` substitutions
  (``firebase/app/artifacts.py:159-172``).
- Topic-pattern subscription (O2): trailing-``*`` fnmatch, tenant
  prefixed (``firebase/app/artifacts.py:174-178,287-300``).
- Subscription routing (O6): first matching subscription by sorted id
  (``firebase/app/artifacts.py:250-256``), cached per topic.

Spark-first: all of these are string *expressions* (regexp_replace /
format_string / when-chains) evaluated JVM-side inside whole-stage
codegen; the subscription table is tiny so routing a stream against it
is a broadcast lookup, never a shuffle.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_TEMPLATE = "_aether/entities/{topic}"


# ---------------------------------------------------------------- O5

def strip_tenant(topic: Column | str, tenant: str) -> Column:
    """Remove the ``{tenant}.`` *prefix* (anchored — fixes the reference's
    ``str.lstrip`` charset bug, ``firebase/app/artifacts.py:375-376``)."""
    col = F.col(topic) if isinstance(topic, str) else topic
    return F.regexp_replace(col, "^" + re.escape(tenant) + "\\.", "")


def add_tenant(name: Column | str, tenant: str) -> Column:
    """``{tenant}.{name}`` prefixing (``firebase/app/artifacts.py:287-300``)."""
    col = F.col(name) if isinstance(name, str) else name
    return F.concat(F.lit(tenant + "."), col)


# ---------------------------------------------------------------- O7

def validate_path(template: str) -> list[str]:
    """Imperative secondary validation of a target path
    (``firebase/app/artifacts.py:159-172``): after substituting a dummy
    topic, the path must have an odd segment count (Firestore alternates
    collection/document and a *collection* path has odd length) and no
    unresolved ``{...}`` blocks. Returns a list of error strings (empty
    = valid)."""
    errors: list[str] = []
    substituted = template.replace("{topic}", "topic")
    if re.findall(r"\{.+?\}", substituted):
        errors.append(
            f"path {template} has unresolved substitutions; only {{topic}} is allowed")
    segments = [s for s in substituted.split("/") if s != ""]
    if len(segments) % 2 != 1:
        errors.append(
            f"path {template} must have an odd number of segments (got {len(segments)})")
    return errors


def path_for_topic(topic: Column | str, template: str = DEFAULT_TEMPLATE) -> Column:
    """Substitute ``{topic}`` into the sink-path template
    (``firebase/app/artifacts.py:180-186``)."""
    col = F.col(topic) if isinstance(topic, str) else topic
    pattern = template.replace("%", "%%").replace("{topic}", "%s")
    return F.format_string(pattern, col)


# ---------------------------------------------------------------- O2

def topic_pattern_to_regex(pattern: str, tenant: str) -> str:
    """Tenant-prefixed trailing-``*`` glob → anchored regex, for Kafka
    ``subscribePattern`` (``firebase/app/artifacts.py:174-178,289-294``)."""
    if pattern.endswith("*"):
        body = re.escape(pattern[:-1]) + ".*"
    else:
        body = re.escape(pattern)
    return "^" + re.escape(tenant) + "\\." + body + "$"


def handles_topic(topic: str, pattern: str, tenant: str) -> bool:
    """Driver-side topic match, identical semantics to the regex above."""
    return re.match(topic_pattern_to_regex(pattern, tenant), topic) is not None


# ---------------------------------------------------------------- O6

@dataclass(frozen=True)
class Subscription:
    """The routing-relevant slice of a Subscription resource
    (``firebase/app/fixtures/schemas.py:128-296``)."""

    id: str
    topic_pattern: str
    target_path: str = DEFAULT_TEMPLATE


def route_topics(df: DataFrame, topic_col: str,
                 subscriptions: Sequence[Subscription], tenant: str,
                 out_col: str = "target_path") -> DataFrame:
    """Attach the sink path for each row's topic.

    Reference semantics (``firebase/app/artifacts.py:250-256``): pick the
    *first matching* subscription in sorted-id order; unmatched topics get
    no route (dropped by the reference's poll loop — here: null path,
    filterable downstream).

    The subscription list is control-plane tiny, so this compiles to a
    ``when``-chain of rlike tests — constant-folded, broadcast-free, no
    shuffle at any scale.
    """
    name = strip_tenant(F.col(topic_col), tenant)
    expr: Column = F.lit(None).cast("string")
    for sub in sorted(subscriptions, key=lambda s: s.id, reverse=True):
        rx = topic_pattern_to_regex(sub.topic_pattern, tenant)
        expr = F.when(F.col(topic_col).rlike(rx),
                      path_for_topic(name, sub.target_path)).otherwise(expr)
    return df.withColumn(out_col, expr)
