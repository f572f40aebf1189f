"""Sources (csv/json round-trip, json-doc decode, gated avro/kafka) and
multimodal plumbing (binary+meta, mapInPandas kernel, codec stubs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aether_firebase_consumer_spark.operators.multimodal import (
    attach_binary,
    decode_audio,
    decode_image,
    extract_features,
    frame_sample,
)
from aether_firebase_consumer_spark.sources.readers import (
    decode_json_docs,
    read_avro,
    read_csv,
    read_json,
    stream_file_source,
)


def test_csv_json_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string")
    csv_path, json_path = str(tmp_path / "c"), str(tmp_path / "j")
    df.write.option("header", "true").csv(csv_path)
    df.write.json(json_path)
    got_csv = read_csv(spark, csv_path, schema="id int, name string")
    got_json = read_json(spark, json_path, schema="id int, name string")
    assert sorted((r["id"], r["name"]) for r in got_csv.collect()) == \
        [(1, "a"), (2, "b")]
    assert sorted((r["id"], r["name"]) for r in got_json.collect()) == \
        [(1, "a"), (2, "b")]


def test_decode_json_docs(spark):
    raw = spark.createDataFrame(
        [("t1.surveys", '{"id": "x", "beds": 4}'),
         ("t1.surveys", '{"id": "y", "beds": null}')],
        "topic string, value string")
    out = decode_json_docs(raw, "id string, beds int")
    rows = {r["id"]: r for r in out.collect()}
    assert out.columns == ["topic", "id", "beds"]
    assert rows["x"]["beds"] == 4 and rows["y"]["beds"] is None


def test_avro_falls_back_jar_free(spark, tmp_path):
    """With no spark-avro jar, read_avro serves .avro data via the
    pure-Python container reader (tested end-to-end in
    test_avro_codec.py); a missing path surfaces as FileNotFoundError,
    not a jar error."""
    with pytest.raises(FileNotFoundError):
        read_avro(spark, str(tmp_path / "nope"))


def test_file_stream_source(spark, tmp_path):
    src = tmp_path / "s"
    src.mkdir()
    spark.createDataFrame([(1,)], "id int").write.parquet(str(src / "p"))
    stream = stream_file_source(spark, str(src / "p"), "id int")
    assert stream.isStreaming


def test_multimodal_attach_and_extract(spark):
    docs = spark.createDataFrame([(7, "hello")], "doc_id long, text string")
    out = attach_binary(docs)
    row = out.first()
    assert bytes(row["payload"]) == b"hello"
    assert row["media_meta"]["n_bytes"] == 5
    assert row["media_meta"]["source_uri"] == "mem://doc/7"
    feats = extract_features(out).first()
    assert feats["n_bytes"] == 5
    assert feats["first_byte"] == ord("h")
    import hashlib
    assert feats["content_md5"] == hashlib.md5(b"hello").hexdigest()


def test_codec_stubs_raise():
    for fn in (decode_image, decode_audio, frame_sample):
        with pytest.raises(NotImplementedError):
            fn(b"\x00\x01")


def test_binary_meta_prunes_payload(spark, tmp_path):
    # metadata-only query must not read payload bytes from parquet
    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    path = str(tmp_path / "mm")
    attach_binary(docs).write.parquet(path)
    df = spark.read.parquet(path).select("doc_id", "media_meta.n_bytes")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan


def test_resize_pipeline_shape(spark):
    """1→1 Arrow transform: bounded output payloads, typed dims."""
    from aether_firebase_consumer_spark.operators.multimodal import (
        attach_binary,
        resize_images,
    )
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = resize_images(attach_binary(docs), target_w=8, target_h=8)
    rows = out.collect()
    assert len(rows) == docs.count()
    assert out.columns == ["doc_id", "width", "height", "payload"]
    assert all(r["width"] == 8 and r["height"] == 8 for r in rows)
    assert all(len(r["payload"]) <= 64 for r in rows)


def test_frame_sample_fanout(spark):
    """1→N Arrow flatMap: every blob yields ceil(chunks/every_n) frame
    rows, deterministic content per (doc, frame_idx)."""
    from aether_firebase_consumer_spark.operators.multimodal import (
        attach_binary,
        sample_frames,
    )
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .limit(50)
    src = attach_binary(docs)
    out = sample_frames(src, frame_bytes=64, every_n=2)
    rows = out.collect()
    assert out.columns == ["doc_id", "frame_idx", "frame"]
    n_in = src.count()
    assert len(rows) >= n_in  # fan-out: at least one frame per doc
    # deterministic: second run yields identical frames
    again = {(r["doc_id"], r["frame_idx"]): bytes(r["frame"])
             for r in sample_frames(src, frame_bytes=64, every_n=2).collect()}
    for r in rows:
        assert again[(r["doc_id"], r["frame_idx"])] == bytes(r["frame"])
    # frame indices step by every_n
    assert all(r["frame_idx"] % 2 == 0 for r in rows)


# ------------------------------------------------------- avro schema mapper

# Echo of the reference's annotated test schema structures
# (firebase/tests/__init__.py:257-1160): nullable unions, dateTime
# extended strings, a geopoint record, select/select1 lookups, and
# @aether_masking classifications.
_AVSC = {
    "name": "MySurvey", "type": "record",
    "fields": [
        {"name": "_id", "type": ["null", "string"]},
        {"name": "_submitted_at", "type": ["null", "string"],
         "@aether_extended_type": "dateTime"},
        {"name": "geometry", "@aether_extended_type": "geopoint",
         "type": ["null", {
             "name": "geometry", "type": "record",
             "@aether_extended_type": "geopoint",
             "fields": [
                 {"name": "latitude", "type": ["null", "float"]},
                 {"name": "longitude", "type": ["null", "float"]},
                 {"name": "altitude", "type": ["null", "float"]},
                 {"name": "accuracy", "type": ["null", "float"]}]}]},
        {"name": "operational_status", "type": ["null", "string"],
         "@aether_extended_type": "select1"},
        {"name": "beds", "type": ["null", "int"],
         "@aether_extended_type": "int", "@aether_masking": "private"},
        {"name": "insurance",
         "type": ["null", {"type": "array", "items": "string"}],
         "@aether_extended_type": "select", "@aether_masking": "public"},
        {"name": "color", "type": {"type": "enum", "name": "Color",
                                   "symbols": ["RED", "GREEN"]}},
        {"name": "digest", "type": {"type": "fixed", "name": "MD5",
                                    "size": 16}},
        {"name": "counts", "type": {"type": "map", "values": "long"}},
        {"name": "n", "type": ["null", "int", "long"]},
        {"name": "x", "type": ["float", "double"]},
        {"name": "mixed", "type": ["null", "string", "long"]},
        {"name": "when", "type": {"type": "long",
                                  "logicalType": "timestamp-millis"}},
        {"name": "price", "type": {"type": "bytes", "logicalType": "decimal",
                                   "precision": 12, "scale": 2}},
    ],
}


def test_avro_schema_structural_mapping():
    from pyspark.sql.types import (
        ArrayType, BinaryType, DecimalType, DoubleType, FloatType,
        IntegerType, LongType, MapType, StringType, StructType,
        TimestampType,
    )
    from aether_firebase_consumer_spark.sources.avro_schema import (
        avro_to_spark_schema,
    )
    s = avro_to_spark_schema(_AVSC)
    t = {f.name: f for f in s.fields}
    assert t["_id"].dataType == StringType() and t["_id"].nullable
    # dateTime stays string STRUCTURALLY (that's what's on the wire)
    assert t["_submitted_at"].dataType == StringType()
    assert t["_submitted_at"].metadata["extended_type"] == "dateTime"
    geo = t["geometry"].dataType
    assert isinstance(geo, StructType)
    assert [f.name for f in geo.fields] == [
        "latitude", "longitude", "altitude", "accuracy"]
    assert geo.fields[0].dataType == FloatType() and geo.fields[0].nullable
    assert t["beds"].dataType == IntegerType()
    assert t["beds"].metadata["masking"] == "private"
    assert t["insurance"].dataType == ArrayType(StringType(), False)
    assert t["insurance"].metadata["masking"] == "public"
    assert t["color"].dataType == StringType()       # enum → string
    assert t["digest"].dataType == BinaryType()      # fixed → binary
    assert t["counts"].dataType == MapType(StringType(), LongType(), False)
    assert t["n"].dataType == LongType() and t["n"].nullable   # int|long
    assert t["x"].dataType == DoubleType() and not t["x"].nullable
    mixed = t["mixed"].dataType                      # string|long → members
    assert isinstance(mixed, StructType)
    assert [f.dataType for f in mixed.fields] == [StringType(), LongType()]
    assert t["when"].dataType == TimestampType()
    assert t["price"].dataType == DecimalType(12, 2)


def test_avro_extended_types_and_masking_integration(spark):
    """apply_extended_types casts dateTime strings to timestamps, and
    the mapper's masking metadata drives allowed_columns directly."""
    import datetime as dt
    from aether_firebase_consumer_spark.sources.avro_schema import (
        apply_extended_types, avro_to_spark_schema,
    )
    from aether_firebase_consumer_spark.operators.masking import (
        MaskConfig, allowed_columns,
    )
    avsc = {"name": "r", "type": "record", "fields": [
        {"name": "id", "type": "string"},
        {"name": "seen", "type": ["null", "string"],
         "@aether_extended_type": "dateTime"},
        {"name": "beds", "type": ["null", "int"],
         "@aether_masking": "private"},
    ]}
    schema = avro_to_spark_schema(avsc)
    df = spark.createDataFrame(
        [("a", "2001-05-01 10:30:00", 4)], schema)
    out = apply_extended_types(df)
    assert dict(out.dtypes)["seen"] == "timestamp"
    assert out.collect()[0]["seen"] == dt.datetime(2001, 5, 1, 10, 30)
    # masking reads the mapper's metadata — no explicit dict needed
    cfg = MaskConfig(["public", "private"], "public")
    assert allowed_columns(df, cfg) == ["id", "seen"]


def test_avro_decode_gated(spark):
    import json
    from aether_firebase_consumer_spark.sources.avro_schema import (
        decode_avro_docs,
    )
    df = spark.createDataFrame([(bytearray(b"x"),)], "value binary")
    avsc = json.dumps({"name": "r", "type": "record",
                       "fields": [{"name": "id", "type": "string"}]})
    with pytest.raises(Exception):  # spark-avro jar absent from image
        decode_avro_docs(df, avsc).collect()


# ------------------------------------------------------------ kafka options

def test_kafka_option_assembly():
    """The Kafka reader's option map is assembled correctly without a
    broker: tenant-anchored subscribePattern, offset bounds, kafka.-
    prefixed security passthrough, and NO auto-commit (checkpointing
    owns offsets)."""
    from aether_firebase_consumer_spark.operators.routing import (
        topic_pattern_to_regex,
    )
    from aether_firebase_consumer_spark.sources.readers import (
        kafka_source_options,
    )
    pattern = topic_pattern_to_regex("fhir-resource-*", "tenant1")
    opts = kafka_source_options(
        "broker1:9092,broker2:9092", pattern,
        starting_offsets="latest", max_offsets_per_trigger=5000,
        security={"security.protocol": "SASL_SSL",
                  "kafka.sasl.mechanism": "SCRAM-SHA-256"})
    assert opts["kafka.bootstrap.servers"] == "broker1:9092,broker2:9092"
    assert opts["subscribePattern"] == r"^tenant1\.fhir\-resource\-.*$"
    assert opts["startingOffsets"] == "latest"
    assert opts["maxOffsetsPerTrigger"] == "5000"
    assert opts["kafka.security.protocol"] == "SASL_SSL"   # prefix added
    assert opts["kafka.sasl.mechanism"] == "SCRAM-SHA-256"  # kept as-is
    assert not any("auto.commit" in k for k in opts)
    # defaults: earliest offsets, no trigger bound
    d = kafka_source_options("b:9092", "^t\\..*$")
    assert d["startingOffsets"] == "earliest"
    assert "maxOffsetsPerTrigger" not in d


def _ppm(w, h, pixel=(255, 0, 0)):
    body = bytes(pixel) * (w * h)
    return b"P6\n# test image\n%d %d\n255\n" % (w, h) + body


def test_ppm_decode_and_resize_real_pixels(spark):
    """PPM (P6) decodes with the engine's own codec — real pixels, no
    PIL — and the nearest-neighbor resize kernel halves dimensions
    correctly, end to end through the Arrow pipeline."""
    from aether_firebase_consumer_spark.operators.multimodal import (
        decode_image,
        decode_ppm,
        resize_rgb_nearest,
    )
    img = _ppm(4, 2)
    w, h, raw = decode_ppm(img)
    assert (w, h) == (4, 2) and len(raw) == 24
    assert raw[:3] == b"\xff\x00\x00"
    # decode_image routes PPM to the native codec
    assert decode_image(img) == (4, 2, raw)

    # gradient image: check nearest-neighbor picks the right source px
    grad = b"P6\n2 2\n255\n" + bytes([0, 0, 0, 255, 255, 255,
                                      10, 10, 10, 200, 200, 200])
    w, h, raw = decode_ppm(grad)
    up = resize_rgb_nearest(w, h, raw, 4, 4)
    assert len(up) == 48
    assert up[:3] == b"\x00\x00\x00"          # top-left stays black
    assert up[9:12] == b"\xff\xff\xff"        # top-right stays white

    # Spark e2e: decode dims via mapInPandas over a binary column
    import pandas as pd
    rows = [(i, _ppm(4 + i, 3)) for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")

    def kernel(batches):
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, _ = decode_ppm(bytes(payload))
                out.append((int(doc_id), w, h))
            yield pd.DataFrame(out, columns=["doc_id", "width", "height"])

    got = {r["doc_id"]: (r["width"], r["height"])
           for r in df.mapInPandas(
               kernel, "doc_id long, width int, height int").collect()}
    assert got == {i: (4 + i, 3) for i in range(8)}


def test_ppm_decode_rejects_malformed():
    from aether_firebase_consumer_spark.operators.multimodal import (
        decode_ppm,
    )
    with pytest.raises(ValueError, match="not a binary PPM"):
        decode_ppm(b"JFIF....")
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(b"P6\n4 4\n255\n\x00\x00")


def test_wav_decode_real_samples(spark):
    """PCM WAV decodes with the stdlib wave module — sample-exact."""
    import io
    import struct
    import wave
    from aether_firebase_consumer_spark.operators.multimodal import (
        decode_audio,
        decode_wav,
    )
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        samples = [0, 1000, -1000, 32767, -32768]
        w.writeframes(b"".join(struct.pack("<h", s) for s in samples))
    payload = buf.getvalue()

    rate, ch, n, raw = decode_wav(payload)
    assert (rate, ch, n) == (8000, 1, 5)
    assert [struct.unpack("<h", raw[i:i + 2])[0]
            for i in range(0, 10, 2)] == samples
    # decode_audio routes RIFF to the native codec
    assert decode_audio(payload) == (rate, ch, n, raw)

    # Spark e2e: extract (rate, n_frames) via mapInPandas
    import pandas as pd
    df = spark.createDataFrame([(1, payload)], "doc_id long, payload binary")

    def kernel(batches):
        for pdf in batches:
            out = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                rate, ch, n, _ = decode_wav(bytes(p))
                out.append((int(doc_id), rate, n))
            yield pd.DataFrame(out, columns=["doc_id", "rate", "n_frames"])

    row = df.mapInPandas(
        kernel, "doc_id long, rate int, n_frames int").collect()[0]
    assert (row["rate"], row["n_frames"]) == (8000, 5)


def test_ppm_stream_frame_sampling():
    """Concatenated-PPM 'video' parses frame-exactly; every_n sampling
    picks frames 0, n, 2n..."""
    from aether_firebase_consumer_spark.operators.multimodal import (
        decode_ppm_stream,
        frame_sample,
    )
    frames = [_ppm(2, 2, (i, i, i)) for i in range(5)]
    stream = b"".join(frames)
    got = decode_ppm_stream(stream)
    assert len(got) == 5
    assert [raw[0] for (_, _, raw) in got] == [0, 1, 2, 3, 4]
    sampled = frame_sample(stream, every_n=2)
    assert [raw[0] for (_, _, raw) in sampled] == [0, 2, 4]
    # malformed boundary raises
    import pytest as _pytest
    with _pytest.raises(ValueError, match="frame boundary"):
        decode_ppm_stream(stream + b"JUNK")


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    """ORC is a first-class scan format: round-trip equality with the
    parquet fixture, and filters/projections reach the ORC scan
    (PushedFilters + pruned ReadSchema in the physical plan)."""
    from aether_firebase_consumer_spark.sources.readers import read_orc

    src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    path = str(tmp_path / "orders_orc")
    src.write.orc(path)

    got = read_orc(spark, path)
    assert got.count() == src.count()
    a = {r["o_orderkey"] for r in src.select("o_orderkey").collect()}
    b = {r["o_orderkey"] for r in got.select("o_orderkey").collect()}
    assert a == b

    plan = (got.filter(F.col("o_custkey") == 7)
            .select("o_orderkey")
            ._jdf.queryExecution().executedPlan().toString())
    assert "PushedFilters: [" in plan and "o_custkey" in plan.split(
        "PushedFilters")[1][:120]
    read_schema = plan.split("ReadSchema")[1][:200]
    assert "o_orderkey" in read_schema and "o_comment" not in read_schema


def test_csv_malformed_row_handling(spark, tmp_path):
    """Production CSV ingest contract: PERMISSIVE mode quarantines
    malformed rows into _corrupt_record instead of failing the scan;
    DROPMALFORMED silently drops them; FAILFAST raises."""
    p = tmp_path / "bad.csv"
    p.write_text("id,qty\n1,10\n2,not_a_number\n3,30\n")
    schema = ("id int, qty int, _corrupt_record string")

    permissive = (spark.read.option("header", "true")
                  .option("mode", "PERMISSIVE")
                  .option("columnNameOfCorruptRecord", "_corrupt_record")
                  .schema(schema).csv(str(p))).cache()
    rows = {r["id"]: r for r in permissive.collect()}
    assert rows[1]["qty"] == 10 and rows[1]["_corrupt_record"] is None
    assert rows[2]["qty"] is None
    assert rows[2]["_corrupt_record"] == "2,not_a_number"
    permissive.unpersist()

    dropped = (spark.read.option("header", "true")
               .option("mode", "DROPMALFORMED")
               .schema("id int, qty int").csv(str(p)))
    assert {r["id"] for r in dropped.collect()} == {1, 3}

    import pytest as _pytest
    with _pytest.raises(Exception):
        (spark.read.option("header", "true").option("mode", "FAILFAST")
         .schema("id int, qty int").csv(str(p)).collect())


def test_mulaw_wav_decode():
    """G.711 mu-law expansion against spec landmark values, plus a
    hand-built RIFF mu-law file decode."""
    from aether_firebase_consumer_spark.operators.multimodal import (
        decode_wav_mulaw,
        mulaw_expand,
    )
    # spec landmarks: 0xFF -> 0, 0x7F -> -0 side is 0 too at the top
    assert mulaw_expand(0xFF) == 0
    assert mulaw_expand(0x7F) == 0
    # 16-bit-scaled table convention (CCITT 14-bit +-8031 << 2),
    # the same values audioop.ulaw2lin(width=2) produces
    assert mulaw_expand(0x00) == -32124  # most negative encodable
    assert mulaw_expand(0x80) == 32124   # most positive
    # monotone within the positive half: larger code -> smaller sample
    pos = [mulaw_expand(b) for b in range(0x80, 0x100)]
    assert all(a >= b for a, b in zip(pos, pos[1:]))

    body = bytes(range(0x80, 0x90))  # 16 positive samples
    fmt = (b"\x07\x00\x01\x00\x40\x1f\x00\x00\x40\x1f\x00\x00"
           b"\x01\x00\x08\x00")
    riff = (b"RIFF" + (4 + 8 + len(fmt) + 8 + len(body))
            .to_bytes(4, "little") + b"WAVE"
            + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
            + b"data" + len(body).to_bytes(4, "little") + body)
    rate, ch, n, samples = decode_wav_mulaw(riff)
    assert (rate, ch, n) == (8000, 1, 16)
    assert samples == [mulaw_expand(b) for b in body]

    import pytest as _pytest
    with _pytest.raises(ValueError, match="mu-law"):
        # PCM fmt code routed away with a clear message
        decode_wav_mulaw(riff.replace(b"\x07\x00\x01\x00", b"\x01\x00\x01\x00", 1))


def test_mulaw_expand_matches_audioop_all_codes():
    """Cross-validate the hand-rolled expansion against CPython's
    audioop (the authoritative G.711 table) over all 256 codes —
    skipped automatically when audioop is gone (removed in 3.13)."""
    import struct

    import pytest as _pytest

    audioop = _pytest.importorskip("audioop")
    from aether_firebase_consumer_spark.operators.multimodal import (
        mulaw_expand,
    )
    raw = audioop.ulaw2lin(bytes(range(256)), 2)
    want = struct.unpack("<256h", raw)
    got = tuple(mulaw_expand(b) for b in range(256))
    assert got == want


def test_scan_image_files_mixed_directory(spark, tmp_path):
    """End-to-end file ingestion: a directory of real PNG/BMP/GIF/JPEG
    files (written by the engine's own encoders) plus one corrupt file
    scans into typed metadata rows; the corrupt file quarantines as
    ok=false instead of failing the job."""
    from aether_firebase_consumer_spark.operators.image_codecs import (
        encode_bmp,
        encode_gif,
        encode_png,
    )
    from aether_firebase_consumer_spark.operators.jpeg_codec import (
        encode_jpeg_gray,
    )
    from aether_firebase_consumer_spark.operators.multimodal import (
        scan_image_files,
    )
    d = tmp_path / "imgs"
    d.mkdir()
    rgb = bytes(range(12)) * 4  # 4x4 RGB
    (d / "a.png").write_bytes(encode_png(4, 4, rgb))
    (d / "b.bmp").write_bytes(encode_bmp(4, 4, rgb))
    (d / "c.gif").write_bytes(encode_gif(
        2, 2, bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 8, 7]),
        [0, 1, 2, 3]))
    (d / "d.jpg").write_bytes(encode_jpeg_gray(8, 8, bytes([9] * 64)))
    from aether_firebase_consumer_spark.operators.image_codecs import (
        encode_tiff,
    )
    (d / "e.tif").write_bytes(encode_tiff(4, 4, rgb))
    (d / "bad.png").write_bytes(b"\x89PNG\r\n\x1a\n garbage")

    out = scan_image_files(spark, str(d))
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in out.collect()}
    assert rows["a.png"]["ok"] and rows["a.png"]["width"] == 4 \
        and rows["a.png"]["channels"] == 3
    assert rows["b.bmp"]["ok"] and rows["b.bmp"]["n_pixel_bytes"] == 48
    assert rows["c.gif"]["ok"] and (rows["c.gif"]["width"],
                                    rows["c.gif"]["height"]) == (2, 2)
    assert rows["d.jpg"]["ok"] and rows["d.jpg"]["channels"] == 1
    assert rows["e.tif"]["ok"] and rows["e.tif"]["fmt"] == "tiff"
    assert not rows["bad.png"]["ok"]
    assert rows["bad.png"]["error"]  # quarantined with a reason


def test_ima_adpcm_nibble_hand_vectors():
    """The quantizer state machine pinned on hand-computed steps from
    the public tables: index 0 -> step 7; nibble 4 adds the full step;
    bit 8 negates; index moves by the index table, clamped."""
    from aether_firebase_consumer_spark.operators.multimodal import (
        _ima_decode_nibble,
    )
    # pred=0, idx=0 (step 7), nibble 4: diff = 7>>3 + 7 = 7? no:
    # diff = step>>3 (=0) + step (bit4) = 7; idx += 2
    assert _ima_decode_nibble(4, 0, 0) == (7, 2)
    # pred=7, idx=2 (step 9), nibble 12 (8|4): diff = 1 + 9 = 10,
    # negated -> pred 7-10 = -3; idx 2+2 = 4
    assert _ima_decode_nibble(12, 7, 2) == (-3, 4)
    # clamping: idx 0 + table[0] = -1 -> 0; pred clamps at int16
    assert _ima_decode_nibble(0, 0, 0) == (0, 0)
    assert _ima_decode_nibble(7, 32767, 88) == (32767, 88)
    assert _ima_decode_nibble(15, -32768, 88) == (-32768, 88)


@pytest.mark.parametrize("channels", [1, 2])
def test_ima_adpcm_wav_roundtrip(channels):
    """encode -> decode reconstructs a sine within ADPCM's expected
    error envelope (lossy 4:1 codec; locked encoder/decoder states
    keep the error bounded, not drifting)."""
    import math

    from aether_firebase_consumer_spark.operators.multimodal import (
        decode_audio,
        decode_wav_ima_adpcm,
        encode_wav_ima_adpcm,
    )
    n = 2000
    samples = []
    for i in range(n):
        for c in range(channels):
            samples.append(int(12000 * math.sin(
                2 * math.pi * (i * (220 + 110 * c)) / 8000)))
    wav = encode_wav_ima_adpcm(8000, channels, samples,
                               samples_per_block=505)
    rate, ch, frames, got = decode_wav_ima_adpcm(wav)
    assert (rate, ch) == (8000, channels)
    assert frames >= n                      # tail block padded
    err = [abs(a - b) for a, b in zip(got[:n * channels], samples)]
    assert max(err) < 2000                  # worst step at this slope
    assert sum(err) / len(err) < 200        # and small on average
    # dispatch: decode_audio routes fmt 0x11 to the ADPCM decoder
    assert decode_audio(wav)[0] == 8000


def test_ima_adpcm_block_boundary_reset():
    """Each block restarts from its own header (seekability — the
    reason the format is block-structured): decoding blocks
    independently equals decoding the stream."""
    from aether_firebase_consumer_spark.operators.multimodal import (
        decode_wav_ima_adpcm,
        encode_wav_ima_adpcm,
    )
    samples = [((i * 37) % 9000) - 4500 for i in range(1200)]
    wav = encode_wav_ima_adpcm(8000, 1, samples, samples_per_block=505)
    _, _, _, full = decode_wav_ima_adpcm(wav)
    # rebuild a one-block file from the second block's bytes
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(wav):
        cid = wav[pos:pos + 4]
        size = int.from_bytes(wav[pos + 4:pos + 8], "little")
        if cid == b"fmt ":
            fmt = wav[pos + 8:pos + 8 + size]
        elif cid == b"data":
            data = wav[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
    block_align = int.from_bytes(fmt[12:14], "little")
    blk2 = data[block_align:2 * block_align]
    solo = (b"RIFF" + (4 + 8 + len(fmt) + 8 + len(blk2))
            .to_bytes(4, "little") + b"WAVE"
            + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
            + b"data" + len(blk2).to_bytes(4, "little") + blk2)
    _, _, _, got = decode_wav_ima_adpcm(solo)
    assert got == full[505:1010]


def test_ima_adpcm_rejects_bad_input():
    from aether_firebase_consumer_spark.operators.multimodal import (
        decode_wav_ima_adpcm,
        encode_wav_ima_adpcm,
    )
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav_ima_adpcm(b"nope")
    wav = bytearray(encode_wav_ima_adpcm(8000, 1, [0] * 600))
    # corrupt the first block header's step index past 88
    data_at = wav.index(b"data") + 8
    wav[data_at + 2] = 90
    with pytest.raises(ValueError, match="step index"):
        decode_wav_ima_adpcm(bytes(wav))


def test_ima_adpcm_fact_chunk_trims_padding():
    """The encoder writes a fact chunk with the TRUE frame count and
    the decoder honors it: final-block pad frames are not emitted
    (round 7 — previously decode returned the padded length)."""
    from aether_firebase_consumer_spark.operators.multimodal import (
        decode_wav_ima_adpcm,
        encode_wav_ima_adpcm,
    )
    samples = [((i * 53) % 7000) - 3500 for i in range(25)]
    wav = encode_wav_ima_adpcm(8000, 1, samples, samples_per_block=9)
    assert b"fact" in wav
    rate, ch, frames, got = decode_wav_ima_adpcm(wav)
    assert (rate, ch, frames) == (8000, 1, 25)   # not 27 (3 blocks x 9)
    assert len(got) == 25


def test_ima_adpcm_decodes_trailing_partial_block():
    """A short final block (non-padding encoder) decodes its tail
    samples instead of being silently dropped (ADVICE r6): constant
    input reconstructs exactly, so the tail values are checkable."""
    from aether_firebase_consumer_spark.operators.multimodal import (
        decode_wav_ima_adpcm,
        encode_wav_ima_adpcm,
    )
    v = -12345
    wav = encode_wav_ima_adpcm(8000, 1, [v] * 18, samples_per_block=9)
    # extract fmt/data, rebuild WITHOUT fact and with the final
    # block's body truncated to 2 bytes (header + 4 nibbles = 5
    # samples), sizes corrected
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(wav):
        cid = wav[pos:pos + 4]
        size = int.from_bytes(wav[pos + 4:pos + 8], "little")
        if cid == b"fmt ":
            fmt = wav[pos + 8:pos + 8 + size]
        elif cid == b"data":
            data = wav[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
    block_align = int.from_bytes(fmt[12:14], "little")
    cut = data[:block_align + 4 + 2]
    short = (b"RIFF" + (4 + 8 + len(fmt) + 8 + len(cut))
             .to_bytes(4, "little") + b"WAVE"
             + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
             + b"data" + len(cut).to_bytes(4, "little") + cut)
    _, _, frames, got = decode_wav_ima_adpcm(short)
    assert frames == 9 + 5                  # full block + partial tail
    assert got == [v] * 14                  # constant input is exact

    # a fragment shorter than the block header is malformed, loudly
    import pytest as _pytest
    frag = data[:block_align + 3]
    bad = (b"RIFF" + (4 + 8 + len(fmt) + 8 + len(frag))
           .to_bytes(4, "little") + b"WAVE"
           + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
           + b"data" + len(frag).to_bytes(4, "little") + frag)
    with _pytest.raises(ValueError, match="block header"):
        decode_wav_ima_adpcm(bad)


# ------------------------------------------------------------ FLAC (r7)

def test_flac_roundtrip_lossless():
    """Lossless: encode → decode is bit-exact for random, smooth, and
    constant int16 signals, mono and stereo, across frame boundaries."""
    import math
    import random

    from aether_firebase_consumer_spark.operators.flac_codec import (
        decode_flac,
        encode_flac,
    )
    rng = random.Random(11)
    for ch in (1, 2):
        for n in (0, 1, 191, 192, 193, 1000):
            sig = [rng.randint(-32768, 32767) for _ in range(n * ch)]
            rate, c, fr, got = decode_flac(
                encode_flac(44100, ch, sig, block_size=192))
            assert (rate, c, fr) == (44100, ch, n)
            assert got == sig
    smooth = [int(9000 * math.sin(i / 25)) for i in range(3000)]
    enc = encode_flac(8000, 1, smooth)
    assert decode_flac(enc)[3] == smooth
    assert len(enc) < 2 * len(smooth) * 0.6   # fixed predictors bite
    const = [-777] * 500
    enc_c = encode_flac(8000, 1, const)
    assert decode_flac(enc_c)[3] == const
    assert len(enc_c) < 100                    # CONSTANT subframes


def test_flac_hand_built_constant_frame():
    """Decoder anchored independently of the encoder: a one-frame
    stream with a CONSTANT subframe built BIT BY BIT from the spec
    (RFC 9639 frame/subframe layouts, CRC-8 poly 0x07, CRC-16 poly
    0x8005)."""
    from aether_firebase_consumer_spark.operators.flac_codec import (
        _BitWriter,
        _crc8,
        _crc16,
        decode_flac,
    )
    si = _BitWriter()
    si.write(4, 16)        # min block size
    si.write(4, 16)        # max block size
    si.write(0, 24)
    si.write(0, 24)
    si.write(8000, 20)     # rate
    si.write(0, 3)         # channels - 1
    si.write(15, 5)        # bps - 1
    si.write(4, 36)        # total frames
    stream = (b"fLaC" + b"\x80" + (34).to_bytes(3, "big")
              + bytes(si.buf) + b"\x00" * 16)
    hdr = _BitWriter()
    hdr.write(0b11111111111110, 14)
    hdr.write(0, 1)
    hdr.write(0, 1)        # fixed blocksize strategy
    hdr.write(0b0110, 4)   # blocksize-1 in 8 bits follows
    hdr.write(0b0000, 4)   # rate from STREAMINFO
    hdr.write(0, 4)        # 1 channel
    hdr.write(0b100, 3)    # 16-bit
    hdr.write(0, 1)
    head = bytes(hdr.buf) + b"\x00" + bytes([4 - 1])   # frame 0, bs 4
    head += bytes([_crc8(head)])
    body = _BitWriter()
    body.write(0, 1)
    body.write(0b000000, 6)            # CONSTANT
    body.write(0, 1)
    body.write((-12345) & 0xFFFF, 16)
    body.align()
    frame = head + bytes(body.buf)
    frame += _crc16(frame).to_bytes(2, "big")
    rate, ch, fr, got = decode_flac(stream + frame)
    assert (rate, ch, fr) == (8000, 1, 4)
    assert got == [-12345] * 4


def test_flac_validation_and_gaps():
    import pytest as _pytest

    from aether_firebase_consumer_spark.operators.flac_codec import (
        decode_flac,
        encode_flac,
    )
    sig = [((i * 37) % 9000) - 4500 for i in range(600)]
    enc = bytearray(encode_flac(8000, 1, sig, block_size=256))
    with _pytest.raises(ValueError, match="stream marker"):
        decode_flac(b"nope" + bytes(enc[4:]))
    # flip a bit in the last frame's audio bytes → CRC-16 catches it
    bad = bytearray(enc)
    bad[-3] ^= 0x10
    with _pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(bad))
    # dispatch through decode_audio via the fLaC magic
    from aether_firebase_consumer_spark.operators.multimodal import (
        decode_audio,
    )
    assert decode_audio(bytes(enc))[3] == sig
