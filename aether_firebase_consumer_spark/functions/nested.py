"""Nested get / nested set (reference O11).

The reference recursively fetches / replaces a value at a key path in a
nested dict (``get_nested`` / ``replace_nested``,
``firebase/app/utils.py:42-57``), used to read and write the stored
document hash under ``_aether/entityHash`` (``firebase/app/config.py:37``).

Spark-first: on typed rows a dotted path is a native nested column
reference; on JSON payloads it is ``get_json_object`` — both JVM-side.
Nested *set* is ``withField`` (Catalyst rewrites it into a struct
rebuild, still codegen'd).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def get_nested(root: Column | str, keys: Sequence[str]) -> Column:
    """``get_nested(_dict, keys)`` (``firebase/app/utils.py:42-49``) on a
    typed struct column: missing intermediate keys yield NULL (the
    reference raises KeyError; NULL is the relational equivalent)."""
    col = F.col(root) if isinstance(root, str) else root
    for k in keys:
        col = col.getField(k)
    return col


def get_nested_json(json_col: Column | str, keys: Sequence[str]) -> Column:
    """Same semantics on an untyped JSON string payload."""
    col = F.col(json_col) if isinstance(json_col, str) else json_col
    return F.get_json_object(col, "$." + ".".join(keys))


def replace_nested(root: Column | str, keys: Sequence[str], value: Column) -> Column:
    """``replace_nested(_dict, keys, value)``
    (``firebase/app/utils.py:52-57``): returns the struct with the leaf at
    ``keys`` replaced (intermediate structs must exist in the schema)."""
    col = F.col(root) if isinstance(root, str) else root
    return col.withField(".".join(f"`{k}`" for k in keys), value)
