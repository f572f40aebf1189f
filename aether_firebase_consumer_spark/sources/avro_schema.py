"""Avro → Spark schema mapping for Aether-annotated schemas (§1.2).

The reference's entire ingest is Avro-with-attached-schema
(``firebase/app/artifacts.py:310-321``; spavro round-trip in
``firebase/tests/__init__.py:40,192``), and its schemas carry Aether
annotations: ``@aether_extended_type`` (extended logical types,
``firebase/app/config.py:56-62``) and ``@aether_masking``
(classification levels, ``firebase/tests/__init__.py:954,965,976,1008``).

Two layers, deliberately separate:

1. :func:`avro_to_spark_schema` — STRUCTURAL mapping, the schema
   ``from_avro`` decodes with. A ``dateTime`` field is physically a
   string on the wire, so it stays ``StringType`` here; the annotation
   is recorded in ``StructField.metadata`` instead (keys
   ``extended_type`` and ``masking`` — the latter is exactly what
   ``operators.masking.allowed_columns`` reads, so classification
   masking works straight off the mapped schema with no extra config).

2. :func:`apply_extended_types` — SEMANTIC casts after decode:
   ``dateTime`` strings → ``timestamp`` columns. ``geopoint`` is
   already a struct (record) structurally; ``select``/``select1``/
   ``group`` map to string/struct with no cast needed.

Union rules follow spark-avro's public conventions:
``[null, X]`` → nullable X; ``[int, long]`` → long; ``[float, double]``
→ double; any other multi-branch union → a struct of ``member0..N``
fields (one per non-null branch, all nullable).
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_PRIMITIVES: dict[str, DataType] = {
    "boolean": BooleanType(),
    "int": IntegerType(),
    "long": LongType(),
    "float": FloatType(),
    "double": DoubleType(),
    "bytes": BinaryType(),
    "string": StringType(),
}

# Aether extended types (reference ``config.py:56-62``) that need a
# post-decode cast; everything else is structurally final.
_EXTENDED_CASTS = {"dateTime": TimestampType()}

# Annotation keys copied into StructField.metadata (stripped of the
# ``@aether_`` prefix; ``masking`` matches MaskConfig.annotation).
_ANNOTATIONS = {
    "@aether_extended_type": "extended_type",
    "@aether_masking": "masking",
}


def _logical(avsc: Mapping[str, Any]) -> DataType | None:
    lt = avsc.get("logicalType")
    if lt == "date":
        return DateType()
    if lt in ("timestamp-millis", "timestamp-micros"):
        return TimestampType()
    if lt == "decimal":
        return DecimalType(int(avsc.get("precision", 10)),
                           int(avsc.get("scale", 0)))
    return None


def avro_to_spark_type(avsc: Any) -> tuple[DataType, bool]:
    """Map one Avro type (str | dict | union list) to
    ``(spark_type, nullable)``."""
    if isinstance(avsc, str):
        if avsc == "null":
            return StringType(), True  # bare null only appears in unions
        if avsc in _PRIMITIVES:
            return _PRIMITIVES[avsc], False
        raise ValueError(f"unsupported avro type {avsc!r}")
    if isinstance(avsc, list):  # union
        branches = [b for b in avsc if b != "null"]
        nullable = len(branches) != len(avsc)
        if not branches:
            return StringType(), True
        if len(branches) == 1:
            t, n = avro_to_spark_type(branches[0])
            return t, nullable or n
        names = {b if isinstance(b, str) else b.get("type") for b in branches}
        if names <= {"int", "long"}:
            return LongType(), nullable
        if names <= {"float", "double"}:
            return DoubleType(), nullable
        fields = []
        for i, b in enumerate(branches):
            t, _ = avro_to_spark_type(b)
            fields.append(StructField(f"member{i}", t, True))
        return StructType(fields), nullable
    # dict form
    lt = _logical(avsc)
    if lt is not None:
        return lt, False
    kind = avsc["type"]
    if kind == "record":
        return _record_struct(avsc), False
    if kind == "enum":
        return StringType(), False
    if kind == "fixed":
        return BinaryType(), False
    if kind == "array":
        t, n = avro_to_spark_type(avsc["items"])
        return ArrayType(t, containsNull=n), False
    if kind == "map":
        t, n = avro_to_spark_type(avsc["values"])
        return MapType(StringType(), t, valueContainsNull=n), False
    if isinstance(kind, (list, dict)):
        return avro_to_spark_type(kind)
    if kind in _PRIMITIVES:
        return _PRIMITIVES[kind], False
    raise ValueError(f"unsupported avro type {avsc!r}")


def _record_struct(record: Mapping[str, Any]) -> StructType:
    fields = []
    for f in record["fields"]:
        t, nullable = avro_to_spark_type(f["type"])
        meta = {out: f[key] for key, out in _ANNOTATIONS.items() if key in f}
        fields.append(StructField(f["name"], t, nullable, metadata=meta))
    return StructType(fields)


def avro_to_spark_schema(avsc: Mapping[str, Any]) -> StructType:
    """Structural StructType for an Avro record schema, with Aether
    annotations preserved in field metadata."""
    if avsc.get("type") != "record":
        raise ValueError("top-level avro schema must be a record")
    return _record_struct(avsc)


def apply_extended_types(df: DataFrame) -> DataFrame:
    """Cast top-level columns whose ``extended_type`` metadata demands a
    semantic type (``dateTime`` → timestamp; ISO-8601 strings cast
    natively). Pure projection — codegen, no UDF."""
    cols = []
    for f in df.schema.fields:
        ext = (f.metadata or {}).get("extended_type")
        target = _EXTENDED_CASTS.get(ext)
        if target is not None:
            cols.append(F.col(f.name).cast(target).alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)


def decode_avro_docs(df: DataFrame, avsc_json: str, value_col: str = "value",
                     options: Mapping[str, str] | None = None) -> DataFrame:
    """``from_avro`` wiring: decode a binary Avro ``value_col`` with the
    writer schema, explode the record to columns, then apply extended-
    type casts. Requires the spark-avro jar on the classpath (absent
    from this image — the structural mapper and cast layer above are
    fully tested without it; this call raises a clear error when the
    jar is missing)."""
    import json

    from pyspark.sql.avro.functions import from_avro

    decoded = df.withColumn(
        "_rec", from_avro(F.col(value_col), avsc_json, dict(options or {})))
    schema = avro_to_spark_schema(json.loads(avsc_json))
    out = decoded.select([F.col(f"_rec.{f.name}").alias(f.name)
                          for f in schema.fields])
    # re-attach annotation metadata lost through from_avro, then cast
    for f in schema.fields:
        if f.metadata:
            out = out.withMetadata(f.name, f.metadata)
    return apply_extended_types(out)
