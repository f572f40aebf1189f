"""The reference's ACTUAL data path, end to end and jar-free:

Kafka-shaped frames (binary Avro value + topic) → pure-Python Avro
decode (`decode_avro_docs_py`) with masking classifications read off
the `@aether_masking` schema annotations → filter → mask → route →
hash-gated MERGE upsert — i.e. `firebase/app/artifacts.py:302-327`
as one Spark pipeline, fed the same wire format the reference
consumes (Avro-with-attached-schema, `artifacts.py:310-321`).
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from aether_firebase_consumer_spark.operators.filtering import FilterConfig
from aether_firebase_consumer_spark.operators.masking import MaskConfig
from aether_firebase_consumer_spark.operators.routing import Subscription
from aether_firebase_consumer_spark.sinks.upsert import (
    HashStateTable,
    ParquetUpsertTable,
)
from aether_firebase_consumer_spark.sources.avro_codec import (
    decode_avro_docs_py,
    encode_record,
)
from aether_firebase_consumer_spark.streaming.pipeline import (
    PipelineConfig,
    StreamingUpsertJob,
    transform,
)

# An Aether-annotated survey schema (shape of the reference's test
# schema, firebase/tests/__init__.py:257-1160)
AVSC = {
    "type": "record", "name": "Visit",
    "fields": [
        {"name": "id", "type": "string"},
        {"name": "topic", "type": "string"},
        {"name": "patient_name", "type": "string",
         "@aether_masking": "private"},
        {"name": "ward", "type": "string", "@aether_masking": "public"},
        {"name": "visited_at", "type": "string",
         "@aether_extended_type": "dateTime"},
    ],
}


def _frames(spark, n=20):
    recs = [
        {"id": f"d{i}", "topic": f"t1.{'surveys' if i % 2 else 'admin'}",
         "patient_name": f"name-{i}", "ward": f"w{i % 3}",
         "visited_at": f"2024-02-0{1 + i % 9}T10:00:00"}
        for i in range(n)
    ]
    rows = [(r["topic"].encode(), encode_record(AVSC, r)) for r in recs]
    return recs, spark.createDataFrame(rows, "key binary, value binary")


def test_avro_frames_through_reference_pipeline(spark, tmp_path):
    recs, frames = _frames(spark)
    docs = decode_avro_docs_py(frames, json.dumps(AVSC))

    # masking classifications come FROM the schema annotations the
    # decoder preserved — no hand-written config
    classifications = {
        f.name: f.metadata["masking"]
        for f in docs.schema.fields if f.metadata.get("masking")}
    assert classifications == {"patient_name": "private", "ward": "public"}

    cfg = PipelineConfig(
        tenant="t1",
        filter_config=FilterConfig("topic", ["t1.surveys"]),
        mask_config=MaskConfig(["public", "private"], "public"),
        classifications=classifications,
        subscriptions=[Subscription(id="s1", topic_pattern="*")],
        sync_mode="sync",
    )
    out = transform(docs, cfg)
    rows = out.collect()
    # filter: only the odd-i (surveys) records survive
    assert len(rows) == 10
    # mask: private column dropped, public kept, dateTime cast applied
    assert "patient_name" not in out.columns
    assert "ward" in out.columns
    assert out.schema["visited_at"].dataType.simpleString() == "timestamp"
    # route: templated target path
    assert {r["target_path"] for r in rows} == {"_aether/entities/surveys"}

    # hash-gated MERGE: second delivery of identical frames writes nothing
    doc_table = ParquetUpsertTable(spark, str(tmp_path / "docs"), ["id"])
    hash_table = HashStateTable(spark, str(tmp_path / "hashes"))
    job = StreamingUpsertJob(cfg, doc_table, hash_table)
    # the writer() wrapper applies transform() upstream of foreachBatch;
    # mirror that contract here
    job.process_batch(transform(docs, cfg), epoch_id=0)
    v1 = doc_table.table.current_version() if hasattr(doc_table, "table") \
        else doc_table.current_version()
    n1 = doc_table.read().count()
    assert n1 == 10
    job.process_batch(transform(docs, cfg), epoch_id=1)  # redelivery
    assert doc_table.read().count() == n1
    assert doc_table.current_version() == v1  # no new version written
