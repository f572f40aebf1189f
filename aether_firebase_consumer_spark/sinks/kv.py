"""RTDB-style KV point store (reference O13).

The reference reads/writes arbitrary JSON values at tree paths
(``read_rtdb``/``write_rtdb``, ``firebase/app/helpers.py:72-88``); its
unit tests round-trip scalars, lists, and maps
(``firebase/tests/test_unit.py:53-60``).

Here: a tiny keyed table (path → value_json) on the parquet-swap MERGE
store. Values are JSON strings so any JSON value round-trips exactly.
Point reads filter on the path key — with a partitioned/bucketed store
this is a partition-prune, not a scan.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from aether_firebase_consumer_spark.sinks.upsert import ParquetUpsertTable


class KVStore:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.table = ParquetUpsertTable(spark, path, ["path"])

    def set(self, path: str, value: Any) -> None:
        df = self.spark.createDataFrame(
            [(path, json.dumps(value))], "path string, value_json string")
        self.table.merge(df)

    def get(self, path: str) -> Any:
        """Point read; None if absent (reference returns None via
        ``.get()`` semantics)."""
        t = self.table.read()
        if t is None:
            return None
        rows = t.filter(F.col("path") == path).select("value_json").take(1)
        if not rows:
            return None
        return json.loads(rows[0][0])

    def delete(self, path: str) -> None:
        keys = self.spark.createDataFrame([(path,)], "path string")
        self.table.delete_keys(keys)
