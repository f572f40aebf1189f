"""Pure-Python Avro binary codec + jar-free Spark decode path.

Wire-format fixtures come from the public Avro spec's own worked
example (record {a: long=27, b: string="foo"} encodes to
36 06 66 6f 6f), so the codec is pinned to the spec, not to itself.
"""

from __future__ import annotations

import datetime
import decimal
import json

import pytest

from aether_firebase_consumer_spark.sources.avro_codec import (
    decode_avro_docs_py,
    decode_record,
    encode_record,
)

SPEC_SCHEMA = {
    "type": "record", "name": "test",
    "fields": [{"name": "a", "type": "long"},
               {"name": "b", "type": "string"}],
}


def test_spec_worked_example_bytes():
    data = encode_record(SPEC_SCHEMA, {"a": 27, "b": "foo"})
    assert data == b"\x36\x06foo"
    assert decode_record(SPEC_SCHEMA, data) == {"a": 27, "b": "foo"}


def test_zigzag_negative_and_large():
    schema = {"type": "record", "name": "t",
              "fields": [{"name": "v", "type": "long"}]}
    for v in (0, -1, 1, -2, 2, 63, 64, -64, -65, 2**40, -(2**40),
              2**62, -(2**62)):
        assert decode_record(schema, encode_record(schema, {"v": v})) == \
            {"v": v}


RICH_SCHEMA = {
    "type": "record", "name": "doc",
    "fields": [
        {"name": "id", "type": "string"},
        {"name": "flag", "type": "boolean"},
        {"name": "score", "type": "double"},
        {"name": "opt", "type": ["null", "string"]},
        {"name": "status", "type": {"type": "enum", "name": "st",
                                    "symbols": ["NEW", "DONE"]}},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "attrs", "type": {"type": "map", "values": "long"}},
        {"name": "raw", "type": "bytes"},
        {"name": "fx", "type": {"type": "fixed", "name": "f8", "size": 4}},
        {"name": "nested", "type": {
            "type": "record", "name": "geo",
            "fields": [{"name": "lat", "type": "double"},
                       {"name": "lon", "type": "double"}]}},
        {"name": "d", "type": {"type": "int", "logicalType": "date"}},
        {"name": "ts", "type": {"type": "long",
                                "logicalType": "timestamp-micros"}},
        {"name": "amount", "type": {"type": "bytes", "logicalType": "decimal",
                                    "precision": 10, "scale": 2}},
        {"name": "either", "type": ["null", "string", "long"]},
    ],
}

RICH_VALUES = {
    "id": "d1", "flag": True, "score": 2.5, "opt": None, "status": "DONE",
    "tags": ["a", "b"], "attrs": {"k1": 7, "k2": -9}, "raw": b"\x01\x02",
    "fx": b"wxyz", "nested": {"lat": 1.25, "lon": -3.5},
    "d": 19000, "ts": 1_700_000_000_000_000,
    "amount": b"\x30\x39",  # unscaled 12345, scale 2 -> 123.45
    "either": 42,
}


def test_rich_roundtrip_wire_values():
    data = encode_record(RICH_SCHEMA, RICH_VALUES)
    assert decode_record(RICH_SCHEMA, data) == RICH_VALUES


def test_encode_accepts_semantic_logical_values():
    sem = dict(RICH_VALUES)
    sem["d"] = datetime.date(1970, 1, 1) + datetime.timedelta(days=19000)
    sem["ts"] = (datetime.datetime(1970, 1, 1)
                 + datetime.timedelta(microseconds=1_700_000_000_000_000))
    sem["amount"] = decimal.Decimal("123.45")
    assert encode_record(RICH_SCHEMA, sem) == \
        encode_record(RICH_SCHEMA, RICH_VALUES)


def test_trailing_bytes_rejected():
    data = encode_record(SPEC_SCHEMA, {"a": 1, "b": "x"}) + b"\x00"
    with pytest.raises(ValueError, match="trailing"):
        decode_record(SPEC_SCHEMA, data)


# --- ambiguous-shape unions: branch fidelity through the wire index ---

AMBIG_RR = {
    "type": "record", "name": "t", "fields": [
        {"name": "u", "type": [
            {"type": "record", "name": "A",
             "fields": [{"name": "x", "type": "int"}]},
            {"type": "record", "name": "B",
             "fields": [{"name": "y", "type": "string"}]},
        ]}]}


def test_union_record_record_branch1_roundtrip():
    """record|record union: branch-1 data must encode to branch 1 and
    decode+shape without re-inference (the round-4 ADVICE repro)."""
    from aether_firebase_consumer_spark.sources.avro_codec import (
        _decode_record_tagged, _shape)

    data = encode_record(AMBIG_RR, {"u": {"y": "hi"}})
    # wire: union index 1 (zigzag 1 -> 0x02), then string "hi"
    assert data[0] == 0x02
    assert decode_record(AMBIG_RR, data) == {"u": {"y": "hi"}}
    shaped = _shape(AMBIG_RR, _decode_record_tagged(AMBIG_RR, data))
    assert shaped == {"u": {"member0": None, "member1": {"y": "hi"}}}
    # branch 0 still works
    d0 = encode_record(AMBIG_RR, {"u": {"x": 7}})
    assert d0[0] == 0x00
    shaped0 = _shape(AMBIG_RR, _decode_record_tagged(AMBIG_RR, d0))
    assert shaped0 == {"u": {"member0": {"x": 7}, "member1": None}}


def test_union_map_record_prefers_exact_record():
    schema = {"type": "record", "name": "t", "fields": [
        {"name": "u", "type": [
            {"type": "map", "values": "string"},
            {"type": "record", "name": "R",
             "fields": [{"name": "k", "type": "string"}]}]}]}
    # exact field-name match -> record branch (index 1)
    assert encode_record(schema, {"u": {"k": "v"}})[0] == 0x02
    # any other dict -> map branch (index 0)
    data = encode_record(schema, {"u": {"other": "v"}})
    assert data[0] == 0x00
    assert decode_record(schema, data) == {"u": {"other": "v"}}


def test_union_string_enum_and_bytes_fixed():
    schema = {"type": "record", "name": "t", "fields": [
        {"name": "se", "type": [
            "string", {"type": "enum", "name": "E", "symbols": ["A", "B"]}]},
        {"name": "bf", "type": [
            "bytes", {"type": "fixed", "name": "F4", "size": 4}]},
    ]}
    # enum symbol -> enum branch; 4-byte value -> fixed branch
    data = encode_record(schema, {"se": "A", "bf": b"wxyz"})
    assert decode_record(schema, data) == {"se": "A", "bf": b"wxyz"}
    # non-symbol string -> string branch; 3-byte value -> bytes branch
    data2 = encode_record(schema, {"se": "hello", "bf": b"abc"})
    assert decode_record(schema, data2) == {"se": "hello", "bf": b"abc"}


ANNOTATED_SCHEMA = {
    "type": "record", "name": "person",
    "fields": [
        {"name": "id", "type": "string"},
        {"name": "name", "type": "string",
         "@aether_masking": "private"},
        {"name": "joined", "type": "string",
         "@aether_extended_type": "dateTime"},
        {"name": "n", "type": ["null", "int", "long"]},
    ],
}


def test_spark_decode_avro_docs_py(spark):
    """End-to-end jar-free decode: binary column -> typed columns with
    extended-type cast and masking metadata intact."""
    avsc_json = json.dumps(ANNOTATED_SCHEMA)
    recs = [
        {"id": "a", "name": "Ann", "joined": "2024-01-02T03:04:05", "n": 5},
        {"id": "b", "name": "Bob", "joined": "2023-12-31T23:59:59",
         "n": None},
    ]
    rows = [(encode_record(ANNOTATED_SCHEMA, r),) for r in recs]
    df = spark.createDataFrame(rows, "value binary")
    out = decode_avro_docs_py(df, avsc_json)

    assert [f.dataType.simpleString() for f in out.schema.fields] == \
        ["string", "string", "timestamp", "bigint"]
    got = {r["id"]: r for r in out.collect()}
    assert got["a"]["joined"] == datetime.datetime(2024, 1, 2, 3, 4, 5)
    assert got["a"]["n"] == 5 and got["b"]["n"] is None
    assert out.schema["name"].metadata.get("masking") == "private"


def test_spark_decode_multibranch_union_struct(spark):
    """A string|long union surfaces as the member0/member1 struct the
    schema mapper promises."""
    schema = {"type": "record", "name": "u",
              "fields": [{"name": "id", "type": "string"},
                         {"name": "v", "type": ["null", "string", "long"]}]}
    # force the struct path: string+long branches are not coercible
    from aether_firebase_consumer_spark.sources.avro_schema import (
        avro_to_spark_type,
    )
    t, nullable = avro_to_spark_type(["null", "string", "long"])
    assert t.simpleString() == "struct<member0:string,member1:bigint>"
    assert nullable

    rows = [(encode_record(schema, {"id": "x", "v": "s"}),),
            (encode_record(schema, {"id": "y", "v": 9}),),
            (encode_record(schema, {"id": "z", "v": None}),)]
    df = spark.createDataFrame(rows, "value binary")
    out = decode_avro_docs_py(df, json.dumps(schema))
    got = {r["id"]: r["v"] for r in out.collect()}
    assert got["x"]["member0"] == "s" and got["x"]["member1"] is None
    assert got["y"]["member1"] == 9 and got["y"]["member0"] is None
    assert got["z"] is None


def test_container_roundtrip_null_and_deflate(tmp_path):
    from aether_firebase_consumer_spark.sources.avro_codec import (
        parse_avro_container,
        write_avro_container,
    )
    recs = [{"a": i, "b": f"s{i}"} for i in range(25)]
    for codec in ("null", "deflate"):
        p = str(tmp_path / f"t_{codec}.avro")
        write_avro_container(p, SPEC_SCHEMA, recs, codec=codec,
                             records_per_block=10)
        avsc, got = parse_avro_container(open(p, "rb").read())
        assert avsc["name"] == "test"
        assert got == recs


def test_deflate_blocks_are_raw_rfc1951(tmp_path):
    """Deflate block bodies must be exact raw-deflate streams (no zlib
    header, no Adler-32 trailer, no trailing garbage) so strict readers
    that validate stream length accept them."""
    import zlib

    from aether_firebase_consumer_spark.sources.avro_codec import (
        _parse_container_header,
        _read_long,
        write_avro_container,
    )
    p = str(tmp_path / "t.avro")
    recs = [{"a": i, "b": "x" * 40} for i in range(30)]
    write_avro_container(p, SPEC_SCHEMA, recs, codec="deflate",
                         records_per_block=10)
    data = open(p, "rb").read()
    _, codec, _, pos = _parse_container_header(data)
    assert codec == "deflate"
    while pos < len(data):
        _, pos = _read_long(data, pos)  # record count
        size, pos = _read_long(data, pos)
        body = data[pos:pos + size]
        d = zlib.decompressobj(-15)
        d.decompress(body)
        assert d.eof, "block is not a complete raw-deflate stream"
        assert d.unused_data == b"", \
            "trailing bytes after the raw-deflate stream"
        pos += size + 16  # skip sync


def test_bounded_header_schema_read(tmp_path):
    from aether_firebase_consumer_spark.sources.avro_codec import (
        read_container_schema,
        write_avro_container,
    )
    p = str(tmp_path / "t.avro")
    write_avro_container(p, SPEC_SCHEMA,
                         [{"a": i, "b": "y" * 100} for i in range(5000)])
    assert read_container_schema(p)["name"] == "test"
    # corrupt magic -> clear error, not a silent full read
    bad = tmp_path / "bad.avro"
    bad.write_bytes(b"nope")
    with pytest.raises(ValueError):
        read_container_schema(str(bad))


def test_container_corrupt_sync_detected(tmp_path):
    from aether_firebase_consumer_spark.sources.avro_codec import (
        parse_avro_container,
        write_avro_container,
    )
    p = str(tmp_path / "t.avro")
    write_avro_container(p, SPEC_SCHEMA, [{"a": 1, "b": "x"}])
    raw = bytearray(open(p, "rb").read())
    raw[-1] ^= 0xFF  # flip a sync byte
    with pytest.raises(ValueError, match="sync"):
        parse_avro_container(bytes(raw))


def test_spark_read_avro_jar_free_fallback(spark, tmp_path):
    """readers.read_avro serves .avro directories with no spark-avro
    jar: binaryFile scan + mapInPandas decode, one task per file."""
    from aether_firebase_consumer_spark.sources.avro_codec import (
        write_avro_container,
    )
    from aether_firebase_consumer_spark.sources.readers import read_avro
    d = tmp_path / "data"
    d.mkdir()
    for shard in range(3):
        recs = [{"a": shard * 100 + i, "b": f"r{shard}-{i}"}
                for i in range(50)]
        write_avro_container(str(d / f"part-{shard}.avro"),
                             SPEC_SCHEMA, recs,
                             codec="deflate" if shard % 2 else "null")
    df = read_avro(spark, str(d))
    assert df.schema.simpleString() == "struct<a:bigint,b:string>"
    assert df.count() == 150
    got = {r["a"]: r["b"] for r in df.collect()}
    assert got[205] == "r2-5" and got[0] == "r0-0"


def test_read_avro_routes_by_jar_presence(spark, tmp_path, monkeypatch):
    """Routing must be the explicit classpath probe: with no jar the
    plan is the Arrow fallback (MapInPandas); with the probe forced
    true, read_avro must commit to the JVM datasource (which then
    fails loudly in this jarless image — proving it does NOT silently
    fall back to per-row Python when a jar is expected)."""
    from aether_firebase_consumer_spark.sources import readers
    from aether_firebase_consumer_spark.sources.avro_codec import (
        write_avro_container,
    )
    d = tmp_path / "data"
    d.mkdir()
    write_avro_container(str(d / "part-0.avro"), SPEC_SCHEMA,
                         [{"a": 1, "b": "x"}])
    # this image has no spark-avro jar
    assert readers.avro_jar_available(spark) is False
    plan = readers.read_avro(spark, str(d)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    monkeypatch.setattr(readers, "avro_jar_available", lambda s: True)
    with pytest.raises(Exception):  # jar path chosen, jar absent
        readers.read_avro(spark, str(d))


def test_streaming_avro_message_decode(spark, tmp_path):
    """The reference's actual ingest shape — a stream of binary Avro
    message values — decoded in-stream by the jar-free codec:
    readStream → mapInPandas decode → memory sink. mapInPandas binds
    to streaming DataFrames unchanged, so the same decode path serves
    batch backfills and live streams."""
    avsc_json = json.dumps(SPEC_SCHEMA)
    recs = [{"a": i, "b": f"m{i}"} for i in range(40)]
    src = tmp_path / "src"
    src.mkdir()
    rows = [(encode_record(SPEC_SCHEMA, r),) for r in recs]
    spark.createDataFrame(rows, "value binary") \
        .write.parquet(str(src / "batch0"))

    stream = (spark.readStream.schema("value binary")
              .option("pathGlobFilter", "*.parquet")
              .parquet(str(src / "batch0")))
    decoded = decode_avro_docs_py(stream, avsc_json)
    assert decoded.isStreaming
    q = (decoded.writeStream.outputMode("append")
         .format("memory").queryName("avro_stream_out").start())
    q.processAllAvailable()
    q.stop()
    got = {r["a"]: r["b"]
           for r in spark.sql("SELECT * FROM avro_stream_out").collect()}
    assert got == {r["a"]: r["b"] for r in recs}


def test_write_avro_dataset_roundtrip(spark, tmp_path):
    """Distributed write: one container file per partition via
    mapInPandas (driver sees only the manifest), schema derived from
    the DataFrame, then read back through the jar-free reader —
    including timestamp/date/array columns and nulls."""
    from aether_firebase_consumer_spark.sources.avro_codec import (
        spark_to_avro_schema,
        write_avro_dataset,
    )
    from aether_firebase_consumer_spark.sources.readers import read_avro
    from aether_firebase_consumer_spark.tables import normalize_event_ts

    ev = normalize_event_ts(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ).select("event_id", "ts", "user_id", "event_type", "value") \
     .repartition(4)

    avsc = spark_to_avro_schema(ev.schema)
    assert {f["name"] for f in avsc["fields"]} == set(ev.columns)

    path = str(tmp_path / "avro_out")
    n = write_avro_dataset(ev, path)
    assert n == ev.count()
    import os
    files = [f for f in os.listdir(path) if f.endswith(".avro")]
    assert len(files) == 4  # one file per partition

    back = read_avro(spark, path)
    assert back.count() == n
    a = {r["event_id"]: r for r in ev.collect()}
    b = {r["event_id"]: r for r in back.collect()}
    assert a.keys() == b.keys()
    probe = next(iter(a))
    assert a[probe]["event_type"] == b[probe]["event_type"]
    assert abs(a[probe]["value"] - b[probe]["value"]) < 1e-12
    assert a[probe]["ts"] == b[probe]["ts"]


# --- property: random records round-trip bit-faithfully ---

PROP_SCHEMA = {
    "type": "record", "name": "doc", "fields": [
        {"name": "id", "type": "string"},
        {"name": "n", "type": ["null", "long"]},
        {"name": "f", "type": "double"},
        {"name": "flag", "type": "boolean"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "props", "type": {"type": "map",
                                   "values": ["null", "int"]}},
        {"name": "nested", "type": {
            "type": "record", "name": "geo", "fields": [
                {"name": "lat", "type": "float"},
                {"name": "lon", "type": "float"}]}},
        {"name": "u", "type": [
            {"type": "record", "name": "A",
             "fields": [{"name": "x", "type": "int"}]},
            {"type": "record", "name": "B",
             "fields": [{"name": "y", "type": "string"}]}]},
    ]}


def _record_strategy():
    import struct as _s

    from hypothesis import strategies as st

    f32 = st.floats(allow_nan=False, allow_infinity=True, width=32) \
        .map(lambda v: _s.unpack("<f", _s.pack("<f", v))[0])
    i32 = st.integers(-(2**31), 2**31 - 1)
    i64 = st.integers(-(2**63), 2**63 - 1)
    return st.fixed_dictionaries({
        "id": st.text(max_size=20),
        "n": st.none() | i64,
        "f": st.floats(allow_nan=False),
        "flag": st.booleans(),
        "tags": st.lists(st.text(max_size=8), max_size=5),
        "props": st.dictionaries(st.text(max_size=6), st.none() | i32,
                                 max_size=4),
        "nested": st.fixed_dictionaries({"lat": f32, "lon": f32}),
        "u": (st.fixed_dictionaries({"x": i32})
              | st.fixed_dictionaries({"y": st.text(max_size=8)})),
    })


def test_property_record_roundtrip():
    from hypothesis import given, settings

    @settings(max_examples=200, deadline=None)
    @given(rec=_record_strategy())
    def check(rec):
        data = encode_record(PROP_SCHEMA, rec)
        assert decode_record(PROP_SCHEMA, data) == rec

    check()


def test_property_container_roundtrip(tmp_path):
    """Container files (null + raw-deflate blocks) must round-trip
    random record batches through write → parse, preserving order."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aether_firebase_consumer_spark.sources.avro_codec import (
        parse_avro_container,
        write_avro_container,
    )

    counter = [0]

    @settings(max_examples=20, deadline=None)
    @given(recs=st.lists(_record_strategy(), min_size=1, max_size=8),
           codec=st.sampled_from(["null", "deflate"]))
    def check(recs, codec):
        counter[0] += 1
        p = str(tmp_path / f"prop_{counter[0]}.avro")
        write_avro_container(p, PROP_SCHEMA, recs, codec=codec)
        avsc, got = parse_avro_container(open(p, "rb").read())
        assert got == recs
        assert avsc["name"] == "doc"

    check()


# --- schema resolution (reader vs writer) ---

V1 = {"type": "record", "name": "doc", "fields": [
    {"name": "id", "type": "string"},
    {"name": "n", "type": "int"},
    {"name": "legacy", "type": "string"},
    {"name": "xs", "type": {"type": "array", "items": "int"}},
    {"name": "m", "type": {"type": "map", "values": "float"}},
    {"name": "u", "type": ["null", "int"]},
]}
V2 = {"type": "record", "name": "doc", "fields": [
    {"name": "id", "type": "bytes"},                      # string->bytes
    {"name": "n", "type": "long"},                        # int->long
    {"name": "tag", "type": "string", "default": "x"},    # added w/default
    {"name": "xs", "type": {"type": "array", "items": "double"}},
    {"name": "m", "type": {"type": "map", "values": "double"}},
    {"name": "u", "type": ["null", "long"]},              # union promote
    {"name": "nested", "type": {
        "type": "record", "name": "geo", "fields": [
            {"name": "lat", "type": "float"}]},
     "default": {"lat": 0.5}},                            # record default
]}


def test_schema_resolution_rules():
    from aether_firebase_consumer_spark.sources.avro_codec import (
        resolve_record,
    )
    rec = {"id": "a", "n": 3, "legacy": "drop me",
           "xs": [1, 2], "m": {"k": 1.5}, "u": 7}
    got = resolve_record(V1, V2, rec)
    assert got == {"id": b"a", "n": 3, "tag": "x",
                   "xs": [1.0, 2.0], "m": {"k": 1.5}, "u": 7,
                   "nested": {"lat": 0.5}}
    # null union branch survives
    rec2 = dict(rec, u=None)
    assert resolve_record(V1, V2, rec2)["u"] is None
    # reader field missing from writer without default -> error
    import pytest as _pytest
    bad_reader = {"type": "record", "name": "doc", "fields": [
        {"name": "nope", "type": "int"}]}
    with _pytest.raises(ValueError, match="no default"):
        resolve_record(V1, bad_reader, rec)


def test_container_read_resolves_mixed_schema_directory(spark, tmp_path):
    """One directory, two schema generations: files decode under their
    OWN writer schema, then resolve to the reader schema — the
    evolution scenario every long-lived ingest directory hits."""
    from aether_firebase_consumer_spark.sources.avro_codec import (
        read_avro_container_py,
        write_avro_container,
    )
    import json as _json

    d = tmp_path / "mixed"
    d.mkdir()
    old = {"type": "record", "name": "doc", "fields": [
        {"name": "id", "type": "string"},
        {"name": "n", "type": "int"}]}
    new = {"type": "record", "name": "doc", "fields": [
        {"name": "id", "type": "string"},
        {"name": "n", "type": "long"},
        {"name": "tag", "type": "string", "default": "legacy"}]}
    write_avro_container(str(d / "gen1.avro"), old,
                         [{"id": "a", "n": 1}, {"id": "b", "n": 2}])
    write_avro_container(str(d / "gen2.avro"), new,
                         [{"id": "c", "n": 3, "tag": "fresh"}])
    df = read_avro_container_py(spark, str(d),
                                avsc_json=_json.dumps(new))
    rows = {r["id"]: (r["n"], r["tag"]) for r in df.collect()}
    assert rows == {"a": (1, "legacy"), "b": (2, "legacy"),
                    "c": (3, "fresh")}
    assert dict(df.dtypes)["n"] == "bigint"


# --- review-finding regressions ---

def test_union_numeric_leniency():
    """Arrow delivers nullable int columns as float64: integral floats
    must fit int/long union branches (and ints fit float/double) —
    previously both raised 'no union branch matches'."""
    sch = {"type": "record", "name": "t", "fields": [
        {"name": "n", "type": ["null", "long"]},
        {"name": "x", "type": ["null", "double"]}]}
    data = encode_record(sch, {"n": 3.0, "x": 3})
    assert decode_record(sch, data) == {"n": 3, "x": 3.0}
    # non-integral float still refuses a long branch
    import pytest as _pytest
    with _pytest.raises(ValueError, match="no union branch"):
        encode_record(sch, {"n": 3.5, "x": 1.0})


def test_write_dataset_nullable_int_column(spark, tmp_path):
    """write_avro_dataset must survive a nullable LongType column with
    nulls (pandas float64 upcast) — the common case that crashed."""
    from aether_firebase_consumer_spark.sources.avro_codec import (
        read_avro_container_py,
        write_avro_dataset,
    )
    df = spark.createDataFrame([(1, 10), (2, None)], "id long, n long")
    path = str(tmp_path / "nullable")
    total = write_avro_dataset(df.repartition(1), path)
    assert total == 2
    got = {r["id"]: r["n"] for r in
           read_avro_container_py(spark, path).collect()}
    assert got == {1: 10, 2: None}


def test_decode_docs_null_value_tombstone(spark):
    """A NULL binary payload (Kafka tombstone) must yield an all-null
    row, not a TypeError in the executor."""
    import json as _json

    payload = encode_record(SPEC_SCHEMA, {"a": 5, "b": "y"})
    df = spark.createDataFrame(
        [(bytearray(payload),), (None,)], "value binary")
    out = decode_avro_docs_py(df, _json.dumps(SPEC_SCHEMA))
    rows = sorted(out.collect(), key=lambda r: (r["a"] is None, r["a"] or 0))
    assert (rows[0]["a"], rows[0]["b"]) == (5, "y")
    assert rows[1]["a"] is None and rows[1]["b"] is None


def test_decode_avro_docs_py_parse_modes(spark):
    """from_avro parse-mode contract on the jar-free decoder: failfast
    raises on a malformed payload, permissive turns it into an all-null
    row while good rows around it decode normally."""
    import json as _json

    from aether_firebase_consumer_spark.sources.avro_codec import (
        decode_avro_docs_py,
        encode_record,
    )

    avsc = {"type": "record", "name": "R", "fields": [
        {"name": "id", "type": "string"},
        {"name": "n", "type": "long"}]}
    good1 = encode_record(avsc, {"id": "a", "n": 1})
    good2 = encode_record(avsc, {"id": "b", "n": 2})
    poison = b"\xff\xff\xff\xff\xff"  # not a valid R record
    df = spark.createDataFrame(
        [(good1,), (poison,), (good2,)], "value binary")

    out = decode_avro_docs_py(df, _json.dumps(avsc), mode="permissive")
    rows = sorted([(r["id"], r["n"]) for r in out.collect()],
                  key=lambda t: (t[0] is None, t))
    assert rows == [("a", 1), ("b", 2), (None, None)]

    import pytest as _pytest
    with _pytest.raises(Exception):
        decode_avro_docs_py(df, _json.dumps(avsc)).collect()  # failfast
    with _pytest.raises(ValueError, match="failfast|permissive"):
        decode_avro_docs_py(df, _json.dumps(avsc), mode="lenient")


def test_decode_keep_value_rejects_schema_field_collision(spark):
    """keep_value=True with an Avro schema that itself has a field
    named value_col would emit duplicate columns and mis-align the
    pandas batch against the declared StructType — the decoder must
    fail loudly at plan-build time instead (ADVICE r5)."""
    import json as _json

    import pytest as _pytest

    from aether_firebase_consumer_spark.sources.avro_codec import (
        decode_avro_docs_py,
        encode_record,
    )

    avsc = {"type": "record", "name": "R", "fields": [
        {"name": "id", "type": "string"},
        {"name": "value", "type": "long"}]}
    raw = encode_record(avsc, {"id": "a", "value": 1})
    df = spark.createDataFrame([(raw,)], "value binary")
    with _pytest.raises(ValueError, match="value_col|shadow"):
        decode_avro_docs_py(df, _json.dumps(avsc), keep_value=True)
    # same schema decodes fine without keep_value, and with keep_value
    # when the raw column is read under a non-colliding name
    assert decode_avro_docs_py(df, _json.dumps(avsc)).collect()[0]["id"] \
        == "a"
    df2 = df.withColumnRenamed("value", "_raw")
    out = decode_avro_docs_py(df2, _json.dumps(avsc), keep_value=True,
                              value_col="_raw").collect()[0]
    assert out["id"] == "a" and bytes(out["_raw"]) == raw
