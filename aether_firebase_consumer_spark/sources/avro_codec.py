"""Pure-Python Avro BINARY codec + Arrow-batched Spark decode path.

The reference's entire ingest is Avro-with-attached-schema
(``firebase/app/artifacts.py:310-321``), but this image carries no
spark-avro datasource jar, so ``from_avro`` is unavailable. The Avro
binary encoding is a small public specification (zigzag varint longs,
little-endian IEEE floats, length-prefixed bytes/strings, union-index
prefix, block-encoded arrays/maps), so the engine ships its own codec:

- :func:`encode_record` / :func:`decode_record` — spec-faithful
  single-record binary round-trip, schema-driven.
- :func:`decode_avro_docs_py` — the jar-free sibling of
  ``avro_schema.decode_avro_docs``: decodes a binary column via
  ``mapInPandas`` (Arrow batches, vectorized exchange; the Python body
  is a tight per-row loop over the batch — the same execution shape as
  any Avro decoder, which is inherently per-record), emits the mapped
  Spark schema from ``avro_to_spark_schema``, then applies extended-
  type casts. At 100 TB the decode parallelizes with the scan: no
  shuffle, no state, one pass.

Union values decode into the mapper's conventions: ``[null, X]`` →
plain X; ``[int,long]`` → long; ``[float,double]`` → double; other
multi-branch unions → a ``member0..N`` struct with exactly one branch
set.
"""

from __future__ import annotations

import datetime
import decimal
import json
import math
import os
import struct as _struct
from typing import Any, Iterator, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aether_firebase_consumer_spark.sources.avro_schema import (
    apply_extended_types,
    avro_to_spark_schema,
)

_EPOCH_DATE = datetime.date(1970, 1, 1)
_EPOCH = datetime.datetime(1970, 1, 1)


# ---------------------------------------------------------------------------
# primitive wire format
# ---------------------------------------------------------------------------

def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_long(out: bytearray, n: int) -> None:
    z = _zigzag_encode(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_long(data: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = data[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _zigzag_decode(acc), pos
        shift += 7


# ---------------------------------------------------------------------------
# schema-driven encode
# ---------------------------------------------------------------------------

def _matches(value: Any, b: Any, strict: bool = False) -> bool:
    """Does ``value`` fit union branch ``b``?  ``strict`` is a first
    pass used by union encoding so that branches which share a Python
    shape stay distinguishable: records match only on an exact
    field-name set, enums only on symbol membership, fixed only on
    exact size, and map never matches strictly (it is the lenient
    fallback for any dict)."""
    if isinstance(b, dict) and b.get("logicalType"):
        # semantic values for logical branches (see encoder conversions)
        lt = b["logicalType"]
        if lt == "date":
            return isinstance(value, datetime.date) \
                and not isinstance(value, datetime.datetime) \
                or isinstance(value, int)
        if lt in ("timestamp-millis", "timestamp-micros"):
            return isinstance(value, (datetime.datetime, int))
        if lt == "decimal":
            return isinstance(value, (decimal.Decimal, bytes, bytearray))
    kind = b if isinstance(b, str) else b.get("type")
    if kind == "null":
        return value is None
    if kind == "boolean":
        return isinstance(value, bool)
    if kind in ("int", "long"):
        if isinstance(value, bool):
            return False
        if isinstance(value, int):
            return True
        # lenient: Arrow/pandas deliver nullable int columns as
        # float64 — an integral float fits an int/long branch
        return (not strict and isinstance(value, float)
                and value.is_integer())
    if kind in ("float", "double"):
        if isinstance(value, float):
            return True
        # lenient: JSON-sourced integral values (3 for 3.0)
        return (not strict and isinstance(value, int)
                and not isinstance(value, bool))
    if kind == "enum":
        if not isinstance(value, str):
            return False
        return value in b["symbols"] if strict else True
    if kind == "string":
        return isinstance(value, str)
    if kind == "fixed":
        if not isinstance(value, (bytes, bytearray)):
            return False
        return len(value) == int(b["size"]) if strict else True
    if kind == "bytes":
        return isinstance(value, (bytes, bytearray))
    if kind == "array":
        return isinstance(value, list)
    if kind == "record":
        if not isinstance(value, dict):
            return False
        if strict:
            return set(value) == {f["name"] for f in b["fields"]}
        return True
    if kind == "map":
        return isinstance(value, dict) and not strict
    return False


def _encode(out: bytearray, avsc: Any, value: Any) -> None:
    if isinstance(avsc, list):  # union: write branch index, then value
        # Two passes: strict (records by field-name set, enums by symbol,
        # fixed by size) first so [recordA, recordB] / [map, record] /
        # [string, enum] / [bytes, fixed] unions pick the right branch;
        # lenient second for anything the strict pass leaves unmatched.
        for strict in (True, False):
            for i, b in enumerate(avsc):
                if _matches(value, b, strict=strict):
                    _write_long(out, i)
                    _encode(out, b, value)
                    return
        raise ValueError(f"no union branch of {avsc!r} matches {value!r}")
    if isinstance(avsc, dict):
        # logical types: accept semantic Python values, write wire form
        lt = avsc.get("logicalType")
        if lt == "date" and isinstance(value, datetime.date):
            value = (value - _EPOCH_DATE).days
        elif lt == "timestamp-millis" and isinstance(value, datetime.datetime):
            value = int((value - _EPOCH).total_seconds() * 1_000)
        elif lt == "timestamp-micros" and isinstance(value, datetime.datetime):
            value = ((value - _EPOCH).days * 86_400_000_000
                     + (value - _EPOCH).seconds * 1_000_000
                     + (value - _EPOCH).microseconds)
        elif lt == "decimal" and isinstance(value, decimal.Decimal):
            unscaled = int(value.scaleb(int(avsc.get("scale", 0)))
                           .to_integral_value())
            nbytes = max(1, (unscaled.bit_length() + 8) // 8)
            value = unscaled.to_bytes(nbytes, "big", signed=True)
    kind = avsc if isinstance(avsc, str) else avsc["type"]
    if isinstance(kind, (list, dict)):
        _encode(out, kind, value)
        return
    if kind == "null":
        return
    if kind == "boolean":
        out.append(1 if value else 0)
    elif kind in ("int", "long"):
        _write_long(out, int(value))
    elif kind == "float":
        out += _struct.pack("<f", float(value))
    elif kind == "double":
        out += _struct.pack("<d", float(value))
    elif kind in ("bytes",):
        raw = bytes(value)
        _write_long(out, len(raw))
        out += raw
    elif kind == "string":
        raw = str(value).encode("utf-8")
        _write_long(out, len(raw))
        out += raw
    elif kind == "fixed":
        out += bytes(value)
    elif kind == "enum":
        _write_long(out, avsc["symbols"].index(value))
    elif kind == "record":
        for f in avsc["fields"]:
            _encode(out, f["type"], value[f["name"]])
    elif kind == "array":
        if value:
            _write_long(out, len(value))
            for item in value:
                _encode(out, avsc["items"], item)
        _write_long(out, 0)
    elif kind == "map":
        if value:
            _write_long(out, len(value))
            for k, v in value.items():
                _encode(out, "string", k)
                _encode(out, avsc["values"], v)
        _write_long(out, 0)
    else:
        raise ValueError(f"unsupported avro type {avsc!r}")


def encode_record(avsc: Mapping[str, Any], record: Mapping[str, Any]) -> bytes:
    """Encode one record to Avro binary (no container framing — the
    message-level encoding Kafka value payloads use)."""
    out = bytearray()
    _encode(out, dict(avsc), dict(record))
    return bytes(out)


# ---------------------------------------------------------------------------
# schema-driven decode
# ---------------------------------------------------------------------------

class _UnionVal:
    """Decoded union value tagged with the WIRE branch index, so the
    shaping layer never has to re-infer the branch (multi-branch unions
    whose branches share a Python shape — record|record, map|record,
    string|enum, bytes|fixed — are only distinguishable by this index)."""

    __slots__ = ("idx", "value")

    def __init__(self, idx: int, value: Any) -> None:
        self.idx = idx
        self.value = value

    def __repr__(self) -> str:  # debugging aid only
        return f"_UnionVal({self.idx}, {self.value!r})"


def _untag(value: Any) -> Any:
    """Strip ``_UnionVal`` tags recursively → plain Python values."""
    if isinstance(value, _UnionVal):
        return _untag(value.value)
    if isinstance(value, dict):
        return {k: _untag(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_untag(v) for v in value]
    return value


def _decode(data: bytes, pos: int, avsc: Any) -> tuple[Any, int]:
    if isinstance(avsc, list):  # union: tag the wire branch index
        idx, pos = _read_long(data, pos)
        value, pos = _decode(data, pos, avsc[idx])
        return _UnionVal(idx, value), pos
    kind = avsc if isinstance(avsc, str) else avsc["type"]
    if isinstance(kind, (list, dict)):
        return _decode(data, pos, kind)
    if kind == "null":
        return None, pos
    if kind == "boolean":
        return data[pos] == 1, pos + 1
    if kind in ("int", "long"):
        return _read_long(data, pos)
    if kind == "float":
        return _struct.unpack_from("<f", data, pos)[0], pos + 4
    if kind == "double":
        return _struct.unpack_from("<d", data, pos)[0], pos + 8
    if kind == "bytes":
        n, pos = _read_long(data, pos)
        return bytes(data[pos:pos + n]), pos + n
    if kind == "string":
        n, pos = _read_long(data, pos)
        return data[pos:pos + n].decode("utf-8"), pos + n
    if kind == "fixed":
        n = int(avsc["size"])
        return bytes(data[pos:pos + n]), pos + n
    if kind == "enum":
        idx, pos = _read_long(data, pos)
        return avsc["symbols"][idx], pos
    if kind == "record":
        rec = {}
        for f in avsc["fields"]:
            rec[f["name"]], pos = _decode(data, pos, f["type"])
        return rec, pos
    if kind == "array":
        items = []
        while True:
            n, pos = _read_long(data, pos)
            if n == 0:
                return items, pos
            if n < 0:  # block with byte-size prefix
                n = -n
                _, pos = _read_long(data, pos)
            for _ in range(n):
                item, pos = _decode(data, pos, avsc["items"])
                items.append(item)
    if kind == "map":
        entries = {}
        while True:
            n, pos = _read_long(data, pos)
            if n == 0:
                return entries, pos
            if n < 0:
                n = -n
                _, pos = _read_long(data, pos)
            for _ in range(n):
                k, pos = _decode(data, pos, "string")
                entries[k], pos = _decode(data, pos, avsc["values"])
    raise ValueError(f"unsupported avro type {avsc!r}")


def _decode_record_tagged(avsc: Mapping[str, Any], data: bytes) -> Any:
    """Decode one record keeping ``_UnionVal`` tags (for ``_shape``)."""
    value, pos = _decode(data, 0, dict(avsc))
    if pos != len(data):
        raise ValueError(f"trailing bytes after record: {len(data) - pos}")
    return value


def decode_record(avsc: Mapping[str, Any], data: bytes) -> dict[str, Any]:
    return _untag(_decode_record_tagged(avsc, data))


# ---------------------------------------------------------------------------
# value shaping: decoded Avro -> the mapper's Spark-facing conventions
# ---------------------------------------------------------------------------

def _shape(avsc: Any, value: Any) -> Any:
    """Convert a decoded value to the shape ``avro_to_spark_schema``
    promises for the same node (logical types, union structs)."""
    if isinstance(avsc, list):
        branches = [b for b in avsc if b != "null"]
        if isinstance(value, _UnionVal):
            # tagged path: the wire branch index is authoritative — no
            # shape re-inference, so record|record / map|record /
            # string|enum / bytes|fixed unions decode losslessly
            branch = avsc[value.idx]
            if branch == "null":
                return None
            inner = value.value
            if len(branches) <= 1:
                return _shape(branch, inner)
            names = {b if isinstance(b, str) else b.get("type")
                     for b in branches}
            if names <= {"int", "long"}:
                return int(inner)
            if names <= {"float", "double"}:
                return float(inner)
            bi = sum(1 for b in avsc[:value.idx] if b != "null")
            return {f"member{i}": (_shape(b, inner) if i == bi else None)
                    for i, b in enumerate(branches)}
        if value is None or len(branches) <= 1:
            return None if value is None else _shape(branches[0], value)
        names = {b if isinstance(b, str) else b.get("type") for b in branches}
        if names <= {"int", "long"}:
            return int(value)
        if names <= {"float", "double"}:
            return float(value)
        # untagged fallback (plain decode_record output): infer the
        # branch by shape — ambiguous-shape unions need the tagged path
        rec = {}
        matched = False
        for i, b in enumerate(branches):
            if not matched and _matches(value, b, strict=True):
                rec[f"member{i}"] = _shape(b, value)
                matched = True
            else:
                rec[f"member{i}"] = None
        if not matched:
            for i, b in enumerate(branches):
                if _matches(value, b):
                    rec[f"member{i}"] = _shape(b, value)
                    matched = True
                    break
        if not matched:
            raise ValueError(f"cannot shape {value!r} for union {avsc!r}")
        return rec
    if isinstance(value, _UnionVal):  # defensive: tag without a union node
        value = _untag(value)
    if isinstance(avsc, str):
        return value
    lt = avsc.get("logicalType")
    if lt == "date":
        return _EPOCH_DATE + datetime.timedelta(days=int(value))
    if lt == "timestamp-millis":
        return _EPOCH + datetime.timedelta(milliseconds=int(value))
    if lt == "timestamp-micros":
        return _EPOCH + datetime.timedelta(microseconds=int(value))
    if lt == "decimal":
        scale = int(avsc.get("scale", 0))
        unscaled = int.from_bytes(value, "big", signed=True)
        return decimal.Decimal(unscaled).scaleb(-scale)
    kind = avsc["type"]
    if isinstance(kind, (list, dict)):
        return _shape(kind, value)
    if kind == "record":
        return {f["name"]: _shape(f["type"], value[f["name"]])
                for f in avsc["fields"]}
    if kind == "array":
        return [_shape(avsc["items"], v) for v in value]
    if kind == "map":
        return {k: _shape(avsc["values"], v) for k, v in value.items()}
    return value


# ---------------------------------------------------------------------------
# Spark wiring
# ---------------------------------------------------------------------------

def decode_avro_docs_py(df: DataFrame, avsc_json: str,
                        value_col: str = "value",
                        mode: str = "failfast",
                        keep_value: bool = False) -> DataFrame:
    """Jar-free ``from_avro``: decode binary Avro ``value_col`` into the
    columns of the mapped schema via ``mapInPandas`` (Arrow batches),
    then apply extended-type casts. Non-value columns are dropped, as
    with ``decode_avro_docs``; select them alongside beforehand if
    needed. Scales with scan parallelism — no shuffle, no state.

    ``mode`` mirrors the JVM ``from_avro`` parse-mode contract:
    ``failfast`` (default) raises on a malformed payload — the whole
    task fails, surfacing corruption loudly; ``permissive`` turns the
    malformed message into an all-null row (the same shape a tombstone
    takes), so one poison message cannot kill a long-running stream —
    pair it with an ``observe()`` null-count metric to keep corruption
    visible. ``keep_value`` appends the ORIGINAL binary payload as a
    trailing ``value_col`` column — with permissive mode this is the
    dead-letter-queue enabler: rows decoding all-null with a non-null
    payload ARE the poison messages, ready to route to a DLQ topic
    byte-identical."""
    import pandas as pd

    from pyspark.sql.types import StructField, StructType

    if mode not in ("failfast", "permissive"):
        raise ValueError(f"mode must be failfast|permissive, got {mode!r}")
    avsc = json.loads(avsc_json)
    schema = avro_to_spark_schema(avsc)
    # tombstones (null payloads) null every field of their row, so the
    # decode output must be nullable even where the Avro schema is not
    # — matching from_avro's null-struct contract
    fields = [StructField(f.name, f.dataType, True, f.metadata)
              for f in schema.fields]
    if keep_value:
        from pyspark.sql.types import BinaryType
        if any(f.name == value_col for f in fields):
            # the decoded record would collide with the appended raw
            # payload column: the name check below would drop the
            # DECODED field from field_names while the StructType kept
            # both, mis-aligning pandas columns against the declared
            # schema at runtime — fail loudly at plan-build instead
            raise ValueError(
                f"decode_avro_docs_py(keep_value=True): the Avro "
                f"schema already has a field named {value_col!r}; "
                f"pass a different value_col (e.g. read the raw "
                f"column under another name) so the kept payload "
                "does not shadow the decoded field")
        fields.append(StructField(value_col, BinaryType(), True))
    schema = StructType(fields)
    field_names = [f.name for f in schema.fields
                   if not (keep_value and f.name == value_col)]

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for raw in pdf[value_col]:
                raw = None if raw is None else bytes(raw)
                tail = [raw] if keep_value else []
                if raw is None:
                    # tombstone / null payload: an all-null row, the
                    # same contract as from_avro — one bad message
                    # must not poison the stream
                    rows.append([None] * len(field_names) + tail)
                    continue
                try:
                    rec = _shape(avsc, _decode_record_tagged(avsc, raw))
                except Exception:
                    if mode == "failfast":
                        raise
                    rows.append([None] * len(field_names) + tail)
                    continue
                rows.append([rec.get(n) for n in field_names] + tail)
            yield pd.DataFrame(rows, columns=field_names
                               + ([value_col] if keep_value else []))

    out = df.select(value_col).mapInPandas(decode_batches, schema=schema)
    for f in schema.fields:
        if f.metadata:
            out = out.withMetadata(f.name, f.metadata)
    return apply_extended_types(out)


# ---------------------------------------------------------------------------
# Object Container Files (the .avro file format: header + sync-framed blocks)
# ---------------------------------------------------------------------------

_MAGIC = b"Obj\x01"


def write_avro_container(path: str, avsc: Mapping[str, Any],
                         records: list[Mapping[str, Any]],
                         codec: str = "null",
                         sync: bytes = b"\x00" * 16,
                         records_per_block: int = 1000) -> None:
    """Write an Avro Object Container File (header with avro.schema /
    avro.codec metadata, then sync-framed blocks). Test/fixture writer
    — a production sink would shard one file per partition via
    ``foreachPartition`` with exactly this function."""
    import zlib

    out = bytearray()
    out += _MAGIC
    meta = {"avro.schema": json.dumps(avsc).encode(),
            "avro.codec": codec.encode()}
    _write_long(out, len(meta))
    for k, v in meta.items():
        _encode(out, "string", k)
        _write_long(out, len(v))
        out += v
    _write_long(out, 0)
    out += sync
    for i in range(0, len(records), records_per_block):
        block = records[i:i + records_per_block]
        body = bytearray()
        for rec in block:
            _encode(body, dict(avsc), dict(rec))
        data = bytes(body)
        if codec == "deflate":
            # RFC-1951 raw deflate (no zlib header, no Adler-32 trailer),
            # as the Avro spec requires for the "deflate" codec
            co = zlib.compressobj(zlib.Z_DEFAULT_COMPRESSION,
                                  zlib.DEFLATED, -15)
            data = co.compress(data) + co.flush()
        _write_long(out, len(block))
        _write_long(out, len(data))
        out += data
        out += sync
    with open(path, "wb") as fh:
        fh.write(bytes(out))


def _parse_container_header(
        data: bytes) -> tuple[dict[str, Any], str, bytes, int]:
    """Parse a container header prefix → (schema, codec, sync, pos of
    first block). Raises IndexError if ``data`` is too short — callers
    that read incrementally catch that and grow the buffer."""
    if data[:4] != _MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _read_long(data, pos)
        if n == 0:
            break
        if n < 0:
            n = -n
            _, pos = _read_long(data, pos)
        for _ in range(n):
            k, pos = _decode(data, pos, "string")
            size, pos = _read_long(data, pos)
            if pos + size > len(data):
                raise IndexError("header truncated")
            meta[k] = bytes(data[pos:pos + size])
            pos += size
    avsc = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    if pos + 16 > len(data):
        raise IndexError("header truncated")
    sync = bytes(data[pos:pos + 16])
    return avsc, codec, sync, pos + 16


def read_container_schema(path: str, max_bytes: int = 1 << 26) -> dict[str, Any]:
    """Read ONE file's writer schema with a bounded, incremental header
    read: start at 64 KiB and double until the header parses — never
    loads the data blocks. ``max_bytes`` (default 64 MiB) caps runaway
    headers."""
    size = 1 << 16
    while True:
        with open(path, "rb") as fh:
            head = fh.read(size)
        try:
            return _parse_container_header(head)[0]
        except IndexError:
            if len(head) < size or size >= max_bytes:
                raise ValueError(
                    f"avro header in {path!r} unparseable within "
                    f"{len(head)} bytes")
            size *= 2


def parse_avro_container(data: bytes,
                         tagged: bool = False) -> tuple[dict[str, Any], list[dict]]:
    """Parse one container file: returns (writer schema, records).
    ``tagged=True`` keeps union wire-branch tags for ``_shape``."""
    import zlib

    avsc, codec, sync, pos = _parse_container_header(data)
    records: list[dict] = []
    while pos < len(data):
        count, pos = _read_long(data, pos)
        size, pos = _read_long(data, pos)
        body = bytes(data[pos:pos + size])
        pos += size
        if codec == "deflate":
            body = zlib.decompress(body, -15)
        elif codec != "null":
            raise ValueError(f"unsupported avro codec {codec!r}")
        bpos = 0
        for _ in range(count):
            rec, bpos = _decode(body, bpos, avsc)
            records.append(rec if tagged else _untag(rec))
        if data[pos:pos + 16] != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
        pos += 16
    return avsc, records


def read_avro_container_py(spark, path: str,
                           avsc_json: str | None = None) -> DataFrame:
    """Jar-free distributed .avro scan: ``binaryFile`` datasource lists
    and ships whole files to executors (one row per file), and
    ``mapInPandas`` parses each container and emits typed rows — so
    parallelism = file count, the natural Avro split unit (blocks
    within a file are decoded sequentially, as every Avro reader does).

    The output schema must be known before execution: pass
    ``avsc_json``, or the writer schema is read from one file's header
    driver-side (a bounded, incremental header read via
    :func:`read_container_schema` — data blocks are never loaded)."""
    import glob as _glob
    import os as _os

    if avsc_json is None:
        candidates = sorted(
            _glob.glob(_os.path.join(path, "*.avro"))
            or _glob.glob(path))
        if candidates:
            avsc = read_container_schema(candidates[0])
        else:
            # non-local filesystems (s3a://, hdfs://): the driver's
            # glob can't list them, but Spark's binaryFile source can —
            # pull ONE file's bytes and parse its header (bounded by
            # that file's size; the local path above avoids even that)
            try:
                first = (spark.read.format("binaryFile")
                         .option("pathGlobFilter", "*.avro").load(path)
                         .select("content").limit(1).collect())
            except Exception as err:  # PATH_NOT_FOUND AnalysisException
                raise FileNotFoundError(
                    f"no avro files under {path!r}") from err
            if not first:
                raise FileNotFoundError(f"no avro files under {path!r}")
            avsc = _parse_container_header(
                bytes(first[0]["content"]))[0]
    else:
        avsc = json.loads(avsc_json)

    import pandas as pd

    schema = avro_to_spark_schema(avsc)
    field_names = [f.name for f in schema.fields]

    def decode_files(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                writer, recs = parse_avro_container(bytes(content),
                                                    tagged=True)
                rows = []
                if json.dumps(writer, sort_keys=True) \
                        == json.dumps(avsc, sort_keys=True):
                    for r in recs:
                        shaped = _shape(avsc, r)
                        rows.append([shaped.get(n) for n in field_names])
                else:
                    # schema evolution: this file was written under a
                    # DIFFERENT schema — decode with the writer's (the
                    # only correct way to read its bytes), then apply
                    # spec Schema Resolution toward the reader schema
                    # (defaults, dropped fields, promotions). Per-file
                    # dispatch, so one directory can mix generations.
                    for r in recs:
                        resolved = resolve_record(writer, avsc, _untag(r))
                        shaped = _shape(avsc, resolved)
                        rows.append([shaped.get(n) for n in field_names])
                yield pd.DataFrame(rows, columns=field_names)

    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.avro").load(path)
             .select("content"))
    out = files.mapInPandas(decode_files, schema=schema)
    for f in schema.fields:
        if f.metadata:
            out = out.withMetadata(f.name, f.metadata)
    return apply_extended_types(out)


# ---------------------------------------------------------------------------
# write path: Spark schema -> Avro schema, distributed container writes
# ---------------------------------------------------------------------------

_SPARK_TO_AVRO = {
    "boolean": "boolean",
    "integer": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "binary": "bytes",
}


def spark_to_avro_schema(schema, name: str = "row") -> dict[str, Any]:
    """Inverse of ``avro_to_spark_schema``: StructType → Avro record.
    Nullable fields become ``[null, T]`` unions; date/timestamp map to
    their Avro logical types; nested structs/arrays/maps recurse."""
    from pyspark.sql import types as T

    def conv(dt, field_name: str) -> Any:
        tn = dt.typeName()
        if tn in _SPARK_TO_AVRO:
            return _SPARK_TO_AVRO[tn]
        if tn == "date":
            return {"type": "int", "logicalType": "date"}
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            return {"type": "long", "logicalType": "timestamp-micros"}
        if isinstance(dt, T.DecimalType):
            return {"type": "bytes", "logicalType": "decimal",
                    "precision": dt.precision, "scale": dt.scale}
        if isinstance(dt, T.ArrayType):
            item = conv(dt.elementType, field_name + "_item")
            return {"type": "array",
                    "items": ["null", item] if dt.containsNull else item}
        if isinstance(dt, T.MapType):
            val = conv(dt.valueType, field_name + "_value")
            return {"type": "map",
                    "values": ["null", val] if dt.valueContainsNull else val}
        if isinstance(dt, T.StructType):
            return {"type": "record", "name": field_name, "fields": [
                {"name": f.name,
                 "type": (["null", conv(f.dataType, f.name)]
                          if f.nullable else conv(f.dataType, f.name))}
                for f in dt.fields]}
        raise ValueError(f"unsupported spark type {dt!r} for avro write")

    return {"type": "record", "name": name, "fields": [
        {"name": f.name,
         "type": (["null", conv(f.dataType, f.name)]
                  if f.nullable else conv(f.dataType, f.name))}
        for f in schema.fields]}


def _pyify(v: Any) -> Any:
    """numpy/pandas scalars -> plain Python for the encoder.

    Known limitation: the Arrow/pandas bridge represents BOTH null and
    NaN doubles as NaN in a float64 column, so a genuine NaN value
    cannot be distinguished from null here and round-trips as null.
    Corpora that carry meaningful NaNs should encode them as a
    sentinel or a separate flag column before the Avro write."""
    import numpy as np
    import pandas as pd

    if v is None or (isinstance(v, float) and math.isnan(v)) \
            or v is pd.NaT:
        return None
    if isinstance(v, np.bool_):
        return bool(v)
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, np.floating):
        return float(v)
    if isinstance(v, pd.Timestamp):
        if v.tzinfo is not None:  # normalize to naive UTC for the epoch math
            v = v.tz_convert("UTC").tz_localize(None)
        return v.to_pydatetime()
    if isinstance(v, np.ndarray):
        return [_pyify(x) for x in v.tolist()]
    if isinstance(v, list):
        return [_pyify(x) for x in v]
    if isinstance(v, dict):
        return {k: _pyify(x) for k, x in v.items()}
    return v


def write_avro_dataset(df: DataFrame, path: str,
                       codec: str = "deflate") -> int:
    """Distributed .avro write: every Spark partition writes ONE
    container file (``part-<pid>.avro``) under ``path`` via
    ``mapInPandas``, and the returned manifest (file, n_rows — a few
    rows per partition) is the only data the driver sees. The Avro
    schema derives from the DataFrame schema (``spark_to_avro_schema``).
    Returns total rows written. Parallelism = partition count, the
    same contract as every Spark file sink; ``path`` must be shared
    storage on a real cluster."""
    import pandas as pd

    os.makedirs(path, exist_ok=True)
    avsc = spark_to_avro_schema(df.schema)
    cols = [f.name for f in df.schema.fields]

    def write_files(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        recs: list[dict] = []
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                recs.append({c: _pyify(v) for c, v in zip(cols, row)})
        if not recs:
            yield pd.DataFrame({"file": [], "n_rows": []})
            return
        fname = os.path.join(path, f"part-{pid:05d}.avro")
        write_avro_container(fname, avsc, recs, codec=codec)
        yield pd.DataFrame({"file": [fname], "n_rows": [len(recs)]})

    manifest = df.mapInPandas(write_files, schema="file string, n_rows long")
    return sum(r["n_rows"] for r in manifest.collect())


# ---------------------------------------------------------------------------
# schema resolution (Avro spec "Schema Resolution"): reader vs writer
# ---------------------------------------------------------------------------

#: legal primitive promotions, (writer, reader)
_PROMOTIONS = {
    ("int", "long"), ("int", "float"), ("int", "double"),
    ("long", "float"), ("long", "double"),
    ("float", "double"),
    ("string", "bytes"), ("bytes", "string"),
}


def _kind(t: Any) -> Any:
    """Normalized type tag: primitive name, 'union', or the dict for
    named/complex types (unwrapping {'type': 'int', ...} wrappers)."""
    if isinstance(t, list):
        return "union"
    if isinstance(t, str):
        return t
    inner = t.get("type")
    if inner in ("record", "enum", "array", "map", "fixed"):
        return t
    return inner  # primitive carrying logicalType/metadata


def _default_value(r: Any, default: Any) -> Any:
    """Avro JSON default -> Python value for reader type ``r``."""
    k = _kind(r)
    if k == "union":
        return _default_value(r[0], default)  # default typed by branch 0
    if k == "bytes" or (isinstance(k, dict) and k["type"] == "fixed"):
        return default.encode("latin-1") if isinstance(default, str) \
            else default
    if isinstance(k, dict) and k["type"] == "record":
        return {f["name"]: _default_value(f["type"], f.get("default"))
                for f in k["fields"]} if default is None else {
            f["name"]: _default_value(f["type"],
                                      default.get(f["name"], f.get("default")))
            for f in k["fields"]}
    return default


def resolve_value(w: Any, r: Any, v: Any) -> Any:
    """Resolve a value decoded under writer type ``w`` to reader type
    ``r`` per the spec's Schema Resolution rules (untagged values;
    ambiguous-shape reader unions are out of scope and raise)."""
    wk, rk = _kind(w), _kind(r)
    # unions on either side: pick the branches that apply
    if wk == "union" and v is None:
        wb = "null"
    elif wk == "union":
        wb = next((b for b in w if b != "null" and _matches(v, b, True)),
                  None) or next(b for b in w if b != "null" and _matches(v, b))
    else:
        wb = w
    if rk == "union":
        if v is None and "null" in r:
            return None
        for cand in r:
            if cand == "null":
                continue
            try:
                return resolve_value(wb, cand, v)
            except (ValueError, TypeError, KeyError):
                continue
        raise ValueError(f"no reader union branch accepts {v!r}")
    if wk == "union":
        return resolve_value(wb, r, v)

    wn = wb if isinstance(wb, str) else wb["type"]
    rn = rk if isinstance(rk, str) else rk["type"]
    if wn == rn:
        if rn == "record":
            wfields = {f["name"]: f for f in wb["fields"]}
            out = {}
            for f in rk["fields"]:
                if f["name"] in wfields:
                    out[f["name"]] = resolve_value(
                        wfields[f["name"]]["type"], f["type"],
                        v[f["name"]])
                elif "default" in f:
                    out[f["name"]] = _default_value(f["type"], f["default"])
                else:
                    raise ValueError(
                        f"reader field {f['name']!r} missing from writer "
                        "and has no default")
            return out
        if rn == "array":
            return [resolve_value(wb["items"], rk["items"], x) for x in v]
        if rn == "map":
            return {k2: resolve_value(wb["values"], rk["values"], x)
                    for k2, x in v.items()}
        if rn == "enum":
            if v not in rk["symbols"]:
                if "default" in rk:
                    return rk["default"]
                raise ValueError(f"enum symbol {v!r} not in reader symbols")
            return v
        if rn == "fixed":
            if wb.get("size") != rk.get("size"):
                raise ValueError("fixed size mismatch")
            return v
        return v
    if (wn, rn) in _PROMOTIONS:
        if rn == "long":
            return int(v)
        if rn in ("float", "double"):
            return float(v)
        if rn == "bytes":
            return v.encode("utf-8")
        if rn == "string":
            return v.decode("utf-8")
    raise ValueError(f"cannot resolve writer {wn!r} to reader {rn!r}")


def resolve_record(writer_avsc: Mapping[str, Any],
                   reader_avsc: Mapping[str, Any],
                   record: Mapping[str, Any]) -> dict[str, Any]:
    """Spec schema resolution for one decoded record: reader-side field
    defaults, writer-only fields dropped, primitive promotions
    (int→long→float→double, string↔bytes), recursing through
    records/arrays/maps/nullable unions."""
    return resolve_value(writer_avsc, reader_avsc, record)


# ---------------------------------------------------------------------------
# schema-id framed messages (registry wire format: magic 0x00 + int32 id)
# ---------------------------------------------------------------------------

def encode_framed(schema_id: int, avsc: Mapping[str, Any],
                  record: Mapping[str, Any]) -> bytes:
    """Frame one record the way schema-registry producers do on the
    public wire format: ``0x00`` magic byte, big-endian int32 schema
    id, then the plain Avro binary body. The id is the topic's pointer
    into whatever registry maps ids to writer schemas — here a plain
    dict, on a real deployment an HTTP registry client with the same
    contract."""
    return (b"\x00" + int(schema_id).to_bytes(4, "big")
            + encode_record(avsc, record))


def decode_avro_docs_py_framed(df: DataFrame,
                               writer_schemas: Mapping[int, str],
                               reader_avsc_json: str,
                               value_col: str = "value") -> DataFrame:
    """Multi-generation topic decode: each message carries its schema
    id (``encode_framed`` wire format); every record decodes under ITS
    OWN writer schema and then resolves to the single reader schema
    via spec Schema Resolution (defaults for reader-added fields,
    writer-only fields dropped, primitive promotions) — so one topic
    can mix producer generations and the stream still lands in one
    typed frame, the message-level twin of the mixed-generation
    container-directory read.

    ``writer_schemas`` maps schema id → avsc JSON. An id missing from
    the map raises (a registry-configuration error, unlike a tombstone
    which stays an all-null row). Arrow-batched ``mapInPandas`` like
    ``decode_avro_docs_py`` — no shuffle, scales with scan splits."""
    import pandas as pd

    from pyspark.sql.types import StructField, StructType

    reader = json.loads(reader_avsc_json)
    writers = {int(i): json.loads(s) if isinstance(s, str) else s
               for i, s in writer_schemas.items()}
    schema = avro_to_spark_schema(reader)
    schema = StructType([
        StructField(f.name, f.dataType, True, f.metadata)
        for f in schema.fields])
    field_names = [f.name for f in schema.fields]

    def decode_batches(batches: Iterator[pd.DataFrame]
                       ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for raw in pdf[value_col]:
                if raw is None:
                    rows.append([None] * len(field_names))
                    continue
                raw = bytes(raw)
                if len(raw) < 5 or raw[0] != 0:
                    raise ValueError(
                        "framed Avro message must start with magic 0x00 "
                        f"+ int32 schema id; got {raw[:5]!r}")
                sid = int.from_bytes(raw[1:5], "big")
                writer = writers.get(sid)
                if writer is None:
                    raise KeyError(
                        f"schema id {sid} not in the registry map "
                        f"(known: {sorted(writers)})")
                rec = _shape(writer, _decode_record_tagged(writer, raw[5:]))
                rec = resolve_record(writer, reader, rec)
                rows.append([rec.get(n) for n in field_names])
            yield pd.DataFrame(rows, columns=field_names)

    out = df.select(value_col).mapInPandas(decode_batches, schema=schema)
    for f in schema.fields:
        if f.metadata:
            out = out.withMetadata(f.name, f.metadata)
    return apply_extended_types(out)
