"""Streaming incremental dedup: DedupIngestJob rejects near-dups
within a batch and against the accumulated corpus, with an audit log.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from aether_firebase_consumer_spark.sinks.upsert import ParquetUpsertTable
from aether_firebase_consumer_spark.streaming.dedup_ingest import DedupIngestJob

D1 = ("the quick brown fox jumps over the lazy dog near the old river "
      "bank today")
D1_NEAR = ("the quick brown fox jumps over the lazy dog near the old "
           "river bank tonight")
D2 = ("spark structured streaming maintains state across micro batches "
      "with checkpointed offsets and watermarks")
D2_NEAR = ("spark structured streaming maintains state across micro "
           "batches with checkpointed offsets and watermark")
D5 = ("an entirely unrelated document describing minhash banding and "
      "jaccard verification for corpus hygiene")


def _feed(spark, src, name, rows):
    spark.createDataFrame(rows, "doc_id bigint, text string") \
        .coalesce(1).write.parquet(str(src / name))


def test_dedup_ingest_in_batch_and_cross_batch(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    corpus = ParquetUpsertTable(spark, str(tmp_path / "corpus"), ["doc_id"])
    rejects = ParquetUpsertTable(spark, str(tmp_path / "rejects"), ["doc_id"])
    job = DedupIngestJob(spark, corpus, rejects)

    def run():
        stream = (spark.readStream.schema("doc_id bigint, text string")
                  .parquet(str(src) + "/*"))
        q = job.writer(stream, str(tmp_path / "ckpt")).start()
        q.processAllAvailable()
        q.stop()

    # batch 1: d3 is a near-dup of d1 within the batch → rejected,
    # keep-smallest-id
    _feed(spark, src, "b1", [(1, D1), (2, D2), (3, D1_NEAR)])
    run()
    assert {r.doc_id for r in corpus.read().collect()} == {1, 2}
    assert {r.doc_id: r.dup_of for r in rejects.read().collect()} == {3: 1}

    # batch 2: d4 near-dups d2 from the CORPUS → rejected with audit;
    # d5 is new → accepted
    _feed(spark, src, "b2", [(4, D2_NEAR), (5, D5)])
    run()
    assert {r.doc_id for r in corpus.read().collect()} == {1, 2, 5}
    rej = {r.doc_id: r.dup_of for r in rejects.read().collect()}
    assert rej == {3: 1, 4: 2}
    jac = {r.doc_id: r.jaccard for r in rejects.read().collect()}
    assert 0.5 <= jac[4] <= 1.0

    # batch 3: re-delivering a known doc id is an UPDATE (bypasses the
    # near-dup gate — it would only match its own prior version); a
    # near-dup of d5 arriving in the same batch is caught IN-BATCH
    # against the re-delivery and logged with dup_of = 5
    _feed(spark, src, "b3", [(5, D5), (6, D5 + " extra")])
    run()
    assert {r.doc_id for r in corpus.read().collect()} == {1, 2, 5}
    rej3 = {r.doc_id: r.dup_of for r in rejects.read().collect()}
    assert rej3 == {3: 1, 4: 2, 6: 5}
    # counters: 7 docs in (3+2+2), 4 accepted (1,2,5,5-update), 3 rejected
    assert job.stats == {"batches": 3, "accepted": 4, "rejected": 3}


def test_dedup_ingest_from_kafka_stream(spark, tmp_path):
    """Full composition: documents arrive as JSON over the wire Kafka
    source; DedupIngestJob grows the corpus with near-dup rejection
    across triggers."""
    from aether_firebase_consumer_spark.sources.kafka_wire import (
        KafkaWireClient,
        MiniKafkaBroker,
    )
    from aether_firebase_consumer_spark.sources.kafka_pysource import (
        register_kafka_py,
    )
    import json

    register_kafka_py(spark)
    corpus = ParquetUpsertTable(spark, str(tmp_path / "corpus"), ["doc_id"])
    job = DedupIngestJob(spark, corpus)

    with MiniKafkaBroker() as broker:
        def produce(rows):
            with KafkaWireClient(broker.host, broker.port) as c:
                c.produce("docs.in", 0, [
                    (str(i).encode(),
                     json.dumps({"doc_id": i, "text": t}).encode())
                    for i, t in rows])

        stream = (spark.readStream.format("kafka_py")
                  .option("bootstrap", broker.bootstrap)
                  .option("subscribe", "docs.in").load())
        docs = (stream
                .select(F.from_json(F.col("value").cast("string"),
                                    "doc_id bigint, text string").alias("d"))
                .select("d.doc_id", "d.text"))
        q = job.writer(docs, str(tmp_path / "ckpt")).start()
        try:
            produce([(1, D1), (2, D2)])
            q.processAllAvailable()
            assert {r.doc_id for r in corpus.read().collect()} == {1, 2}
            produce([(3, D1_NEAR), (4, D5)])   # 3 near-dups corpus doc 1
            q.processAllAvailable()
            assert {r.doc_id for r in corpus.read().collect()} == {1, 2, 4}
        finally:
            q.stop()
