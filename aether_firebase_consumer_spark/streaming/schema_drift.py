"""Schema-change detection (reference O14).

The reference compares each message's Avro schema to a per-topic cache,
logging on change and caching the new one — downstream is schemaless so
no rewrite happens (``firebase/app/artifacts.py:313-320,378-380``).

Spark streams have a fixed schema per query, so drift here means: the
*fingerprint* of the (JSON-decoded) batch schema changed between
micro-batches. On change we log and record; a production deployment
would stop the query, merge schemas (``mergeSchema``), and restart —
the detect→stop→evolve→restart choreography the reference hand-waves.
"""

from __future__ import annotations

import hashlib
from typing import Callable

from pyspark.sql import DataFrame


class SchemaDriftDetector:
    def __init__(self, on_change: Callable[[str, str], None] | None = None):
        self._fingerprints: dict[str, str] = {}
        self.changes: list[tuple[str, str, str]] = []
        self.on_change = on_change

    @staticmethod
    def fingerprint(df: DataFrame) -> str:
        """Stable hash of the schema JSON — mirrors utils.hash applied
        to the schema (``firebase/app/utils.py:29-33``)."""
        return hashlib.md5(df.schema.json().encode()).hexdigest()[:16]

    def observe(self, df: DataFrame, topic: str = "_default") -> bool:
        """Record the batch schema; returns True if it drifted."""
        fp = self.fingerprint(df)
        prev = self._fingerprints.get(topic)
        self._fingerprints[topic] = fp
        if prev is not None and prev != fp:
            self.changes.append((topic, prev, fp))
            if self.on_change:
                self.on_change(topic, fp)
            return True
        return False


def evolved_pass(spark, src_dir: str, checkpoint: str, out_dir: str,
                 detector: SchemaDriftDetector | None = None) -> str:
    """One availableNow pass of the detect→stop→merge→restart
    choreography (the part the reference hand-waves,
    ``artifacts.py:378-380``).

    Each invocation re-derives the stream schema as the mergeSchema
    union of everything in ``src_dir`` — so files that arrived with new
    columns since the last pass widen the schema on this restart, while
    the checkpoint's file-source offsets guarantee already-processed
    files are not re-emitted. The parquet sink accumulates mixed-schema
    files; readers union them with mergeSchema. Returns the schema
    fingerprint used for the pass (drift = fingerprint changed between
    invocations, which the caller or ``detector`` tracks)."""
    merged = (spark.read.option("mergeSchema", "true")
              .option("recursiveFileLookup", "true").parquet(src_dir))
    if detector is not None:
        detector.observe(merged, src_dir)
    stream = (spark.readStream.schema(merged.schema)
              .option("recursiveFileLookup", "true").parquet(src_dir))
    q = (stream.writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", checkpoint)
         .outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return SchemaDriftDetector.fingerprint(merged)
