"""avro_py DataSource: batch read/write of Avro container directories
through the standard Spark format API, jar-free."""

from __future__ import annotations

import json
import os

import pytest

from aether_firebase_consumer_spark.sources.avro_pysource import (
    register_avro_py,
)


def test_roundtrip_multifile(spark, tmp_path):
    register_avro_py(spark)
    d = str(tmp_path / "out")
    src = spark.createDataFrame(
        [(i, f"s{i}", i * 1.5, None if i % 2 else f"o{i}")
         for i in range(100)],
        "id bigint, s string, v double, opt string")
    src.repartition(4).write.format("avro_py") \
        .option("path", d).mode("append").save()
    files = [f for f in os.listdir(d) if f.endswith(".avro")]
    assert len(files) == 4 and not any(f.endswith(".tmp")
                                       for f in os.listdir(d))
    back = spark.read.format("avro_py").load(d)
    assert back.rdd.getNumPartitions() == 4  # one task per file
    assert sorted(tuple(r) for r in back.collect()) \
        == sorted(tuple(r) for r in src.collect())


def test_deflate_codec_option(spark, tmp_path):
    register_avro_py(spark)
    d = str(tmp_path / "defl")
    src = spark.createDataFrame([(i, "x" * 100) for i in range(500)],
                                "id bigint, pad string")
    src.coalesce(1).write.format("avro_py") \
        .option("path", d).option("codec", "deflate").mode("append").save()
    raw = spark.read.format("avro_py").load(d)
    assert raw.count() == 500
    # deflate actually compressed the highly-redundant payload
    f = [os.path.join(d, x) for x in os.listdir(d)
         if x.endswith(".avro")][0]
    assert os.path.getsize(f) < 500 * 100 / 2


def test_mixed_generation_directory_resolves(spark, tmp_path):
    """Files written under different schemas read under the FIRST
    file's schema via spec Schema Resolution (same contract as
    read_avro_container_py)."""
    from aether_firebase_consumer_spark.sources.avro_codec import (
        write_avro_container,
    )

    d = tmp_path / "mixed"
    d.mkdir()
    v2 = {"type": "record", "name": "row", "fields": [
        {"name": "id", "type": "long"},
        {"name": "src", "type": "string", "default": "legacy"}]}
    v1 = {"type": "record", "name": "row", "fields": [
        {"name": "id", "type": "long"}]}
    # first file (sorted order) carries the reader schema: name it 'a'
    write_avro_container(str(d / "a.avro"), v2,
                         [{"id": 1, "src": "web"}])
    write_avro_container(str(d / "b.avro"), v1, [{"id": 2}])
    register_avro_py(spark)
    rows = {r.id: r.src
            for r in spark.read.format("avro_py").load(str(d)).collect()}
    assert rows == {1: "web", 2: "legacy"}


def test_explicit_reader_schema_option(spark, tmp_path):
    from aether_firebase_consumer_spark.sources.avro_codec import (
        write_avro_container,
    )

    d = tmp_path / "expl"
    d.mkdir()
    v1 = {"type": "record", "name": "row", "fields": [
        {"name": "id", "type": "long"}]}
    v2 = {"type": "record", "name": "row", "fields": [
        {"name": "id", "type": "long"},
        {"name": "n", "type": "int", "default": 7}]}
    write_avro_container(str(d / "a.avro"), v1, [{"id": 5}])
    register_avro_py(spark)
    out = (spark.read.format("avro_py")
           .option("avroschema", json.dumps(v2)).load(str(d)))
    assert [(r.id, r.n) for r in out.collect()] == [(5, 7)]


def test_error_surfaces(spark, tmp_path):
    register_avro_py(spark)
    with pytest.raises(Exception, match="no .avro files"):
        spark.read.format("avro_py").load(str(tmp_path / "empty")).collect()
    df = spark.createDataFrame([(1,)], "id bigint")
    with pytest.raises(Exception, match="path"):
        df.write.format("avro_py").mode("append").save()
    with pytest.raises(Exception, match="overwrite"):
        df.write.format("avro_py").option("path", str(tmp_path / "x")) \
            .mode("overwrite").save()


def test_streaming_growing_directory(spark, tmp_path):
    """readStream.format('avro_py') ingests files as they appear:
    incremental triggers, checkpoint restart without re-reading."""
    from aether_firebase_consumer_spark.sources.avro_codec import (
        write_avro_container,
    )

    avsc = {"type": "record", "name": "row", "fields": [
        {"name": "id", "type": "long"}]}
    d = tmp_path / "stream"
    d.mkdir()
    write_avro_container(str(d / "f1.avro"), avsc, [{"id": 1}, {"id": 2}])
    register_avro_py(spark)
    ckpt, outdir = str(tmp_path / "ck"), str(tmp_path / "out")

    sdf = spark.readStream.format("avro_py").load(str(d))

    def run_once():
        q = (sdf.writeStream.format("parquet").option("path", outdir)
             .option("checkpointLocation", ckpt).start())
        q.processAllAvailable()
        q.stop()

    run_once()
    assert sorted(r.id for r in spark.read.parquet(outdir).collect()) \
        == [1, 2]
    write_avro_container(str(d / "f2.avro"), avsc, [{"id": 3}])
    run_once()  # restart: only the new file
    assert sorted(r.id for r in spark.read.parquet(outdir).collect()) \
        == [1, 2, 3]


def test_typed_roundtrip_temporal_decimal_nested(spark, tmp_path):
    """Logical and nested types survive the format boundary exactly:
    micros timestamps, dates, decimals, arrays, structs."""
    register_avro_py(spark)
    d = str(tmp_path / "typed")
    df = spark.sql(
        "SELECT 1 AS id, TIMESTAMP'2024-01-02 03:04:05.123456' AS ts, "
        "DATE'2024-06-30' AS dt, CAST(12.34 AS DECIMAL(10,2)) AS dec, "
        "ARRAY(1,2,3) AS arr, NAMED_STRUCT('a', 'x', 'b', 2) AS st")
    df.write.format("avro_py").option("path", d).mode("append").save()
    back = spark.read.format("avro_py").load(d)
    assert back.schema.simpleString() == df.schema.simpleString() or \
        [f.dataType.simpleString() for f in back.schema.fields] \
        == [f.dataType.simpleString() for f in df.schema.fields]
    a, b = df.collect()[0], back.collect()[0]
    assert tuple(a) == tuple(b)
