"""StreamingQueryListener metrics recorder (control-plane
observability)."""

from __future__ import annotations

import shutil
import time

from pyspark.sql import functions as F

from aether_firebase_consumer_spark.control.metrics import MetricsRecorder
from aether_firebase_consumer_spark.tables import normalize_event_ts

SF = "/root/testdata/sf0.001"


def test_metrics_recorder_captures_progress(spark, tmp_path):
    rec = MetricsRecorder(history=10)
    spark.streams.addListener(rec)
    try:
        src = tmp_path / "src"
        src.mkdir()
        shutil.copy(f"{SF}/events.parquet", src / "p0.parquet")
        schema = spark.read.parquet(str(src)).schema
        stream = normalize_event_ts(
            spark.readStream.schema(schema).parquet(str(src)))
        agg = (stream.withWatermark("ts", "1 hour")
               .groupBy(F.window("ts", "1 hour"))
               .agg(F.count("*").alias("n")))
        q = (agg.writeStream.outputMode("append")
             .option("checkpointLocation", str(tmp_path / "ck"))
             .format("memory").queryName("metrics_out").start())
        q.processAllAvailable()
        qid = q.id
        q.stop()
        # listener delivery is async — allow the bus to drain
        deadline = time.time() + 20
        while time.time() < deadline and not rec.batches(qid):
            time.sleep(0.2)

        ms = rec.batches(qid)
        assert ms, "no progress events recorded"
        assert sum(m.num_input_rows for m in ms) == 1000  # fixture rows
        # the windowed agg holds state
        assert any(m.state_rows > 0 for m in ms)

        s = rec.summary(qid)
        assert s["batches"] == len(ms)
        assert s["total_input_rows"] == 1000
        assert s["avg_batch_duration_ms"] > 0
        assert isinstance(s["falling_behind"], bool)
    finally:
        spark.streams.removeListener(rec)


def test_metrics_summary_empty_query():
    rec = MetricsRecorder()
    assert rec.summary("nope") == {"query_id": "nope", "batches": 0}
