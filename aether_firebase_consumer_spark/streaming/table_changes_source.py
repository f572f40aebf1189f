"""``table_changes`` — a Python DataSource exposing a
:class:`~aether_firebase_consumer_spark.sinks.upsert.ParquetUpsertTable`
change feed as a Spark source (round 11, VERDICT r10 item 3).

Round 10's :class:`~.change_follower.ChangeFeedFollower` is a hand
poll loop with its own cursor file; this source makes index
maintenance a STANDARD streaming query instead — versions are the
offsets, Spark's checkpoint is the cursor, and restart/exactly-once
semantics come from the engine (the same proof-of-semantics move
``kafka_py`` made for Kafka):

    spark.dataSource.register(TableChangesDataSource)
    (spark.readStream.format("table_changes")
        .option("path", table_root).option("keyCols", "doc_id")
        .load()
        .writeStream.foreachBatch(apply_deletes)
        .option("checkpointLocation", ckpt).start())

Offsets are ``{"version": n}`` — the table's commit protocol makes
version numbers a total order of atomic commits, and they only grow,
satisfying the engine's monotonic-``latestOffset`` contract (see
``sources/kafka_pysource.py`` for the observed protocol facts).
Each micro-batch plans one :class:`InputPartition` per version in
``(start, end]`` holding that version's RECORDED change files
(``_changes/`` parquet, committed atomically with the data) — reads
are O(changed rows), never a table diff; executors read the files
via pyarrow, so the table root must be on storage all nodes see
(same assumption the table itself makes). A version without a
recording (pre-r11 history, ``import_snapshot``) or vacuumed away
fails the batch loudly rather than silently skipping history — the
recovery path is :meth:`~.change_follower.ChangeFeedFollower.
bootstrap`-style snapshot resync.

Rows: ``key_cols..., change_type string, version bigint`` — the same
schema ``ParquetUpsertTable.change_feed`` returns. With
``.option("includeValues", "true")`` the non-key columns of the table
(probed at stream start) are appended after the keys: post-image
values for inserts/updates when the table records them
(``record_change_values=True``), nulls otherwise and on deletes —
``change_feed_with_values`` as a stream, enough to maintain a full
mirror downstream (see ``tests/test_table_changes_source.py::
test_streaming_mirror_include_values``). With
``.option("includeImages", "true")`` (implies includeValues) the
pre-image twins ``_pre_<col>`` follow the post columns —
``change_feed_with_images`` as a stream, the retraction feed that
drives incremental aggregate maintenance
(``streaming/incremental_agg.py::CdfAggregateView.fold_stream_batch``)
from a standard streaming query; recordings without pre-images
(all-insert versions) null-fill, which is exact (an insert has no
pre-image). The source itself never derives images from a version
read: it stays O(changed rows) by construction.

The reference pushes every change 1-by-1 into its sink as it polls
(``/root/reference/firebase/app/artifacts.py:302-327``) with no way
to re-derive history; this source is the lake-native, restartable
replacement.
"""

from __future__ import annotations

import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

_CHANGES_DIR = "_changes"


def _version_of(path: str) -> int:
    vf = os.path.join(path, "_VERSION")
    try:
        with open(vf) as fh:
            v = int(fh.read().strip())
    except (OSError, ValueError):
        v = -1
    # honor a crashed writer's durable marker the same way
    # ParquetUpsertTable.current_version does (the data is complete
    # once the marker exists; the pointer swap is roll-forward work
    # the next table op performs — the SOURCE must not read ahead of
    # the pointer though, or it could emit a version whose directory
    # rename hasn't happened yet), so: pointer only.
    return v


def _change_files(path: str, version: int) -> list[str]:
    d = os.path.join(path, f"v{version}", _CHANGES_DIR)
    try:
        return sorted(os.path.join(d, n) for n in os.listdir(d)
                      if n.endswith(".parquet"))
    except OSError:
        return []


def _require_recordings(path: str, start: int, end: int) -> dict:
    """files per version for ``(start, end]``; loud failure for gaps."""
    out = {}
    for v in range(start + 1, end + 1):
        vdir = os.path.join(path, f"v{v}")
        files = _change_files(path, v)
        if files:
            out[v] = files
        elif not os.path.isdir(vdir):
            raise ValueError(
                f"table_changes: version {v} of {path} was vacuumed "
                "before this stream read it — history is gone; resync "
                "from a snapshot (ChangeFeedFollower.bootstrap) and "
                "restart the stream from a fresh checkpoint")
        else:
            raise ValueError(
                f"table_changes: version {v} of {path} has no "
                "commit-time change recording (pre-r11 history or an "
                "import_snapshot restore) — start the stream from a "
                "later version (option startingVersion) or catch up "
                "with ChangeFeedFollower first")
    return out


def _arrow_type_ddl(t) -> str | None:
    """Spark DDL for an arrow type, or None when unmapped (the
    caller raises with the column name). Lists recurse — an
    includeValues stream over an embedding table needs
    ``array<double>`` value columns."""
    import pyarrow as pa
    m = {pa.int8(): "tinyint", pa.int16(): "smallint",
         pa.int32(): "int", pa.int64(): "bigint",
         pa.float32(): "float", pa.float64(): "double",
         pa.string(): "string", pa.large_string(): "string",
         pa.binary(): "binary", pa.large_binary(): "binary",
         pa.bool_(): "boolean", pa.date32(): "date"}
    if t in m:
        return m[t]
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        inner = _arrow_type_ddl(t.value_type)
        return None if inner is None else f"array<{inner}>"
    return None


def _arrow_to_ddl(field) -> str:
    ddl = _arrow_type_ddl(field.type)
    if ddl is None:
        raise ValueError(
            f"table_changes: column {field.name!r} has arrow type "
            f"{field.type} — pass an explicit .schema(...) for this "
            "table")
    return f"{field.name} {ddl}"


class ChangeVersionPartition(InputPartition):
    """One table version's recorded change files. ``value_fields`` is
    a list of pickled-through ``pyarrow.Field``s for includeValues
    streams — recordings from delete-only versions (or keys-only
    tables) may lack value columns, and the executor must still emit
    the DECLARED schema (missing columns null-filled with the right
    arrow type)."""

    def __init__(self, files: list[str], version: int,
                 key_cols: list[str], value_fields=None):
        self.files = files
        self.version = version
        self.key_cols = key_cols
        self.value_fields = value_fields or []


def _read_version_partition(p: ChangeVersionPartition) -> Iterator:
    import pyarrow as pa
    import pyarrow.parquet as pq
    names = (list(p.key_cols)
             + [f.name for f in p.value_fields] + ["change_type"])
    for f in p.files:
        pf = pq.ParquetFile(f)
        present = [c for c in names if c in pf.schema_arrow.names]
        tb = pf.read(columns=present)
        arrays, fields = [], []
        want = {fd.name: fd for fd in p.value_fields}
        for c in names:
            if c in present:
                col = tb.column(c)
                fd = want.get(c)
                if fd is not None and col.type != fd.type:
                    col = col.cast(fd.type)  # schema-evolved recording
                arrays.append(col)
                fields.append(pa.field(c, col.type))
            else:
                fd = want[c]  # only value columns can be absent
                arrays.append(pa.nulls(len(tb), fd.type))
                fields.append(pa.field(c, fd.type))
        arrays.append(pa.array([p.version] * len(tb), pa.int64()))
        fields.append(pa.field("version", pa.int64()))
        out = pa.table(arrays, schema=pa.schema(fields))
        yield from out.to_batches()


def _opts_path(options: dict) -> str:
    path = options.get("path")
    if not path:
        raise ValueError("table_changes requires .option('path', "
                         "<table root>) or .load(<table root>)")
    return path


def _opts_key_cols(options: dict) -> list[str]:
    kc = options.get("keycols") or options.get("keyCols")
    if not kc:
        raise ValueError(
            "table_changes requires .option('keyCols', 'a,b') — the "
            "table's key columns, in order")
    return [c.strip() for c in kc.split(",") if c.strip()]


def _opts_include_values(options: dict) -> bool:
    v = options.get("includevalues") or options.get("includeValues")
    return str(v).lower() == "true" or _opts_include_images(options)


def _opts_include_images(options: dict) -> bool:
    v = options.get("includeimages") or options.get("includeImages")
    return str(v).lower() == "true"


def _data_probe_file(path: str, version: int) -> str | None:
    """One data parquet file of ``version`` (for schema probing)."""
    vdir = os.path.join(path, f"v{version}")
    for root, dirs, names in os.walk(vdir):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for n in sorted(names):
            if n.endswith(".parquet"):
                return os.path.join(root, n)
    return None


def _value_fields(path: str, key_cols: list[str],
                  images: bool = False):
    """The table's non-key columns as arrow fields, probed from the
    current version's data — the value half of an includeValues
    stream's schema, fixed at stream start (standard Spark source
    behavior under evolution). With ``images`` the pre-image twins
    (``_pre_<col>``, same types) follow the post columns — the
    retraction feed for incremental aggregate maintenance; recordings
    from all-insert versions lack them on disk and null-fill (an
    insert has no pre-image by definition).

    Probed with a pyarrow DATASET over the version dir, not a single
    file: a hive-partitioned table's partition column lives in the
    directory names, absent from every file footer — a file probe
    would silently drop it from the stream schema (null groups in a
    downstream aggregate). Hidden dirs (``_changes``, stats shards)
    are skipped by pyarrow's default ignore prefixes; the recordings
    store the partition value as a REGULAR column (they are written
    from the staged read, where Spark materializes it), so executors
    find it in the files they actually read."""
    import pyarrow as pa
    import pyarrow.dataset as ds
    v = _version_of(path)
    if v < 0 or _data_probe_file(path, v) is None:
        raise ValueError(
            f"table_changes: no data file at version v{v} of {path} "
            "to derive value columns from — pass .schema(...)")
    sch = ds.dataset(os.path.join(path, f"v{v}"), format="parquet",
                     partitioning="hive").schema
    posts = [sch.field(i) for i in range(len(sch))
             if sch.field(i).name not in set(key_cols)]
    if not images:
        return posts
    return posts + [pa.field(f"_pre_{f.name}", f.type) for f in posts]


class TableChangesStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self._path = _opts_path(options)
        self._key_cols = _opts_key_cols(options)
        self._value_fields = (
            _value_fields(self._path, self._key_cols,
                          images=_opts_include_images(options))
            if _opts_include_values(options) else [])
        sv = options.get("startingversion") or \
            options.get("startingVersion")
        self._starting = None if sv is None else int(sv)
        mvt = options.get("maxversionspertrigger") or \
            options.get("maxVersionsPerTrigger")
        self._max_versions = int(mvt) if mvt else None
        #: high-water mark of planned ends — latestOffset must never
        #: step behind a version the engine already planned. With an
        #: explicit startingVersion the floor is known at construction,
        #: so even the FIRST micro-batch honors maxVersionsPerTrigger;
        #: in tail mode (or restart-from-checkpoint, whose position
        #: lives in Spark's checkpoint, invisible here) the first batch
        #: is uncapped — the same protocol-imposed limitation
        #: kafka_py documents (no ReadLimit in the Python DataSource
        #: API; the planned end is learned in partitions()).
        self._floor = (self._starting - 1 if self._starting is not None
                       else None)

    def initialOffset(self) -> dict:
        # default = tail: only versions committed AFTER attach flow
        start = (_version_of(self._path) if self._starting is None
                 else self._starting - 1)
        return {"version": start}

    def latestOffset(self) -> dict:
        v = _version_of(self._path)
        if self._max_versions is not None and self._floor is not None:
            v = min(v, self._floor + self._max_versions)
        if self._floor is not None:
            v = max(v, self._floor)
        return {"version": v}

    def partitions(self, start: dict, end: dict):
        s, e = start["version"], end["version"]
        prev = self._floor if self._floor is not None else -(1 << 62)
        self._floor = max(prev, s, e)
        per_version = _require_recordings(self._path, s, e)
        return [ChangeVersionPartition(files, v, self._key_cols,
                                       self._value_fields)
                for v, files in sorted(per_version.items())]

    def read(self, partition: ChangeVersionPartition):
        return _read_version_partition(partition)

    def commit(self, end: dict) -> None:
        pass  # the cursor lives in Spark's checkpoint

    def stop(self) -> None:
        pass


class TableChangesBatchReader(DataSourceReader):
    """Batch form: the whole retained feed from ``startingVersion``
    (default 0) to the current version — ``change_feed`` as a scan."""

    def __init__(self, options: dict) -> None:
        self._path = _opts_path(options)
        self._key_cols = _opts_key_cols(options)
        self._value_fields = (
            _value_fields(self._path, self._key_cols,
                          images=_opts_include_images(options))
            if _opts_include_values(options) else [])
        sv = options.get("startingversion") or \
            options.get("startingVersion")
        self._starting = int(sv) if sv is not None else 0

    def partitions(self):
        current = _version_of(self._path)
        per_version = _require_recordings(
            self._path, self._starting - 1, current)
        return [ChangeVersionPartition(files, v, self._key_cols,
                                       self._value_fields)
                for v, files in sorted(per_version.items())]

    def read(self, partition: ChangeVersionPartition):
        return _read_version_partition(partition)


class TableChangesDataSource(DataSource):
    """``spark.readStream.format("table_changes")`` (and batch
    ``spark.read``) after
    ``spark.dataSource.register(TableChangesDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "table_changes"

    def schema(self) -> str:
        import pyarrow.parquet as pq
        options = dict(self.options)
        path = _opts_path(options)
        key_cols = _opts_key_cols(options)
        v = _version_of(path)
        if v < 0:
            raise ValueError(
                f"table_changes: no committed version at {path} yet — "
                "pass an explicit .schema(...) to attach to an empty "
                "table")
        # the recording (if any) and the data files agree on key
        # column types; probe whichever exists
        probe = _change_files(path, v)
        if not probe:
            for root, dirs, names in os.walk(os.path.join(path, f"v{v}")):
                dirs[:] = [d for d in dirs
                           if not d.startswith(("_", "."))]
                probe = [os.path.join(root, n) for n in names
                         if n.endswith(".parquet")]
                if probe:
                    break
        if not probe:
            raise ValueError(
                f"table_changes: version v{v} of {path} holds no "
                "parquet to derive a schema from — pass .schema(...)")
        arrow = pq.ParquetFile(probe[0]).schema_arrow
        fields = {f.name: f for f in arrow}
        missing = [c for c in key_cols if c not in fields]
        if missing:
            raise ValueError(
                f"table_changes: key columns {missing} not present in "
                f"{probe[0]} — wrong keyCols for this table?")
        ddl = ", ".join(_arrow_to_ddl(fields[c]) for c in key_cols)
        if _opts_include_values(options):
            vals = _value_fields(path, key_cols,
                                 images=_opts_include_images(options))
            if vals:
                ddl += ", " + ", ".join(_arrow_to_ddl(f) for f in vals)
        return f"{ddl}, change_type string, version bigint"

    def reader(self, schema) -> TableChangesBatchReader:
        return TableChangesBatchReader(dict(self.options))

    def streamReader(self, schema) -> TableChangesStreamReader:
        return TableChangesStreamReader(dict(self.options))


def register_table_changes(spark) -> None:
    """Idempotent registration of the table_changes format."""
    spark.dataSource.register(TableChangesDataSource)
