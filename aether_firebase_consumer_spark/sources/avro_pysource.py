"""``avro_py`` — the jar-free Avro container format as a first-class
Spark DataSource (batch read + write), so .avro directories work
through the standard reader/writer API:

    spark.read.format("avro_py").load(path)
    df.write.format("avro_py").option("path", p).mode("append").save()

A thin facade over :mod:`avro_codec`'s container machinery — the same
decode/resolution kernel as :func:`~.avro_codec.read_avro_container_py`
(which remains the remote-filesystem-capable path via ``binaryFile``).
This DataSource opens file paths directly on executors, so it serves
local / shared-filesystem storage; parallelism = file count, the
natural Avro split unit. Mixed schema generations in one directory
read under the first file's schema via spec Schema Resolution, exactly
like the functional reader.

Writes: one container file per Spark partition, written to a ``.tmp``
name and renamed on close — per-file atomicity (a killed task leaves a
``.tmp`` orphan, never a half-readable ``.avro``).
"""

from __future__ import annotations

import glob
import json
import os
import uuid
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)


class AvroFilePartition(InputPartition):
    def __init__(self, path: str, reader_avsc_json: str) -> None:
        self.path = path
        self.reader_avsc_json = reader_avsc_json


class AvroPyReader(DataSourceReader):
    def __init__(self, options: dict, avsc_json: str) -> None:
        self._path = options.get("path")
        self._avsc_json = avsc_json

    def partitions(self):
        files = sorted(glob.glob(os.path.join(self._path, "*.avro")))
        if not files:
            raise FileNotFoundError(f"no .avro files under {self._path!r}")
        return [AvroFilePartition(f, self._avsc_json) for f in files]

    def read(self, p: AvroFilePartition) -> Iterator[tuple]:
        from aether_firebase_consumer_spark.sources.avro_codec import (
            _shape,
            _untag,
            avro_to_spark_schema,
            parse_avro_container,
            resolve_record,
        )

        reader_avsc = json.loads(p.reader_avsc_json)
        names = [f.name
                 for f in avro_to_spark_schema(reader_avsc).fields]
        with open(p.path, "rb") as fh:
            writer, recs = parse_avro_container(fh.read(), tagged=True)
        same = json.dumps(writer, sort_keys=True) \
            == json.dumps(reader_avsc, sort_keys=True)
        for r in recs:
            if same:
                shaped = _shape(reader_avsc, r)
            else:  # schema evolution: decode under writer, resolve
                shaped = _shape(reader_avsc,
                                resolve_record(writer, reader_avsc,
                                               _untag(r)))
            yield tuple(shaped.get(n) for n in names)


class AvroWriteCommit(WriterCommitMessage):
    def __init__(self, path: str, n: int) -> None:
        self.path, self.n = path, n


class AvroPyWriter(DataSourceWriter):
    def __init__(self, options: dict, spark_schema) -> None:
        self._path = options.get("path")
        if not self._path:
            raise ValueError("avro_py writer: 'path' option required")
        self._codec = options.get("codec", "null")
        self._schema_json = spark_schema.json()

    def write(self, rows) -> AvroWriteCommit:
        from pyspark.sql.types import StructType

        from aether_firebase_consumer_spark.sources.avro_codec import (
            spark_to_avro_schema,
            write_avro_container,
        )

        schema = StructType.fromJson(json.loads(self._schema_json))
        avsc = spark_to_avro_schema(schema)
        records = [row.asDict(recursive=True) for row in rows]
        os.makedirs(self._path, exist_ok=True)
        final = os.path.join(self._path, f"part-{uuid.uuid4().hex}.avro")
        tmp = final + ".tmp"
        write_avro_container(tmp, avsc, records, codec=self._codec)
        os.rename(tmp, final)  # per-file atomicity
        return AvroWriteCommit(final, len(records))

    def commit(self, messages) -> None:
        pass  # files are final at rename time

    def abort(self, messages) -> None:
        # completed tasks' files stay (same as a plain file sink without
        # a commit protocol); .tmp partials are never readable as .avro
        pass


class AvroPyDataSource(DataSource):
    """Register with ``spark.dataSource.register(AvroPyDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "avro_py"

    def schema(self):
        from aether_firebase_consumer_spark.sources.avro_codec import (
            avro_to_spark_schema,
        )

        return avro_to_spark_schema(self._reader_avsc())

    def _reader_avsc(self) -> dict:
        from aether_firebase_consumer_spark.sources.avro_codec import (
            read_container_schema,
        )

        opts = dict(self.options)
        if opts.get("avroschema"):
            return json.loads(opts["avroschema"])
        path = opts.get("path")
        files = sorted(glob.glob(os.path.join(path or "", "*.avro")))
        if not files:
            raise FileNotFoundError(f"no .avro files under {path!r}")
        return read_container_schema(files[0])

    def reader(self, schema) -> AvroPyReader:
        return AvroPyReader(dict(self.options),
                            json.dumps(self._reader_avsc()))

    def streamReader(self, schema) -> "AvroPyStreamReader":
        return AvroPyStreamReader(dict(self.options),
                                  json.dumps(self._reader_avsc()))

    def writer(self, schema, overwrite: bool) -> AvroPyWriter:
        if overwrite:
            raise ValueError(
                "avro_py: overwrite not supported; write to a fresh dir")
        return AvroPyWriter(dict(self.options), schema)


def register_avro_py(spark) -> None:
    spark.dataSource.register(AvroPyDataSource)


class AvroPyStreamReader(DataSourceStreamReader):
    """Streaming over a GROWING .avro directory — the capability
    Spark's native file stream has for parquet/json/csv but cannot
    offer for a custom format. Offsets are the sorted list of ingested
    file names: ``latestOffset`` lists the directory, ``partitions``
    reads exactly the files in end−start, each as one task (same
    per-file decode as the batch reader).

    The file-list offset is the SIMPLE form: it grows with the
    directory and round-trips through Spark's offset JSON every
    trigger, so it is right for directories up to thousands of files.
    Spark's own file source moves the seen-file log into checkpoint
    state for unbounded directories — at that scale, compact ingested
    files away (or rotate directories) rather than grow one listing
    forever; the reader raises past a hard cap instead of degrading
    silently."""

    MAX_TRACKED_FILES = 10_000

    def __init__(self, options: dict, avsc_json: str) -> None:
        self._path = options.get("path")
        self._avsc_json = avsc_json

    def _list(self) -> list[str]:
        names = sorted(os.path.basename(f) for f in
                       glob.glob(os.path.join(self._path, "*.avro")))
        if len(names) > self.MAX_TRACKED_FILES:
            raise RuntimeError(
                f"avro_py stream: {len(names)} files exceeds the "
                f"{self.MAX_TRACKED_FILES}-file offset cap — compact or "
                "rotate the directory (see class docstring)")
        return names

    def initialOffset(self) -> dict:
        return {"files": []}

    def latestOffset(self) -> dict:
        return {"files": self._list()}

    def partitions(self, start: dict, end: dict):
        seen = set(start.get("files", []))
        new = [f for f in end.get("files", []) if f not in seen]
        return [AvroFilePartition(os.path.join(self._path, f),
                                  self._avsc_json) for f in new]

    def read(self, p: AvroFilePartition):
        return AvroPyReader({"path": self._path},
                            self._avsc_json).read(p)

    def commit(self, end: dict) -> None:
        pass

    def stop(self) -> None:
        pass
