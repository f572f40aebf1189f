"""Kafka-path queries: the jar-free ``kafka_py`` source under the
driver's oracle gate.

The builder stands up an in-process :class:`MiniKafkaBroker` (pure
Python, real TCP), produces a deterministic subset of the orders table
into a 4-partition topic as JSON values, and reads it back through the
``kafka_py`` DataSource — so the correctness gate covers the whole
produce → wire → fetch → parse path, not just the transformations
behind it. The oracle is the same subset straight from parquet: if the
round trip drops, duplicates, or corrupts one message, the value hash
breaks.

Brokers are cached per (process, sf_dir) and their daemon threads die
with the process; the produced subset is bounded (~5% of orders), so
the resident log is a few hundred KB.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aether_firebase_consumer_spark.plans import register
from aether_firebase_consumer_spark.tables import load_table

_BROKERS: dict[str, tuple] = {}


def _orders_broker(spark: SparkSession, sf_dir: str):
    """Start (once per process and sf_dir) a broker holding the orders
    subset as JSON messages; returns (bootstrap, topic)."""
    cached = _BROKERS.get(sf_dir)
    if cached:
        return cached
    from aether_firebase_consumer_spark.sources.kafka_wire import (
        KafkaWireClient,
        MiniKafkaBroker,
    )

    rows = (load_table(spark, sf_dir, "orders")
            .filter(F.col("o_orderkey") % 20 == 0)
            .select("o_orderkey", "o_custkey", "o_orderstatus",
                    "o_totalprice")
            .collect())
    broker = MiniKafkaBroker().start()
    topic = "bench.orders"
    broker.create_topic(topic, partitions=5)
    with KafkaWireClient(broker.host, broker.port) as c:
        for i in range(0, len(rows), 500):
            chunk = rows[i:i + 500]
            by_part: dict[int, list] = {}
            for r in chunk:
                # json.dumps floats use repr (shortest round trip), so
                # Spark's JSON parser recovers the identical double
                payload = json.dumps({
                    "o_orderkey": r.o_orderkey,
                    "o_custkey": r.o_custkey,
                    "o_orderstatus": r.o_orderstatus,
                    "o_totalprice": r.o_totalprice,
                }).encode()
                by_part.setdefault(r.o_orderkey % 5, []).append(
                    (str(r.o_orderkey).encode(), payload))
            for part, msgs in by_part.items():
                c.produce(topic, part, msgs)
    _BROKERS[sf_dir] = (broker.bootstrap, topic)
    return _BROKERS[sf_dir]


@register(
    "kafka_roundtrip_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_orderkey % 20 = 0
    """,
)
def kafka_roundtrip_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders subset produced to a real (in-process) Kafka-wire broker
    and read back via the jar-free ``kafka_py`` batch source — O1 under
    the oracle gate. Scale shape: one Spark task per Kafka partition,
    each fetching only its own offset range over its own socket; JSON
    decode is Catalyst ``from_json`` (JVM, codegen), not Python."""
    from aether_firebase_consumer_spark.sources.kafka_pysource import (
        register_kafka_py,
    )

    register_kafka_py(spark)
    bootstrap, topic = _orders_broker(spark, sf_dir)
    raw = (spark.read.format("kafka_py")
           .option("bootstrap", bootstrap)
           .option("subscribe", topic)
           .load())
    parsed = raw.select(F.from_json(
        F.col("value").cast("string"),
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double").alias("o"))
    return parsed.select("o.o_orderkey", "o.o_custkey",
                         "o.o_orderstatus", "o.o_totalprice")


_CODEC_BROKERS: dict[str, tuple] = {}


def _orders_codec_broker(spark: SparkSession, sf_dir: str):
    """Broker holding the SAME orders subset as
    :func:`_orders_broker`, but shipped as COMPRESSED magic-2 record
    batches — one codec per partition: gzip, pure-Python Snappy,
    pure-Python LZ4 frame, pure-Python zstd frame, and uncompressed
    as the control — with
    deterministic CreateTime timestamps (o_orderkey ms)."""
    cached = _CODEC_BROKERS.get(sf_dir)
    if cached:
        return cached
    from aether_firebase_consumer_spark.sources.kafka_wire import (
        KafkaWireClient,
        MiniKafkaBroker,
    )

    rows = (load_table(spark, sf_dir, "orders")
            .filter(F.col("o_orderkey") % 20 == 0)
            .select("o_orderkey", "o_custkey", "o_orderstatus",
                    "o_totalprice")
            .collect())
    broker = MiniKafkaBroker().start()
    topic = "bench.orders.compressed"
    broker.create_topic(topic, partitions=5)
    with KafkaWireClient(broker.host, broker.port) as c:
        by_part: dict[int, list] = {}
        for r in rows:
            payload = json.dumps({
                "o_orderkey": r.o_orderkey,
                "o_custkey": r.o_custkey,
                "o_orderstatus": r.o_orderstatus,
                "o_totalprice": r.o_totalprice,
            }).encode()
            by_part.setdefault(r.o_orderkey % 5, []).append(
                (str(r.o_orderkey).encode(), payload,
                 int(r.o_orderkey)))
        codecs = ("gzip", "snappy", "lz4", "zstd", None)
        for part, msgs in by_part.items():
            for i in range(0, len(msgs), 500):
                c.produce_records(topic, part, msgs[i:i + 500],
                                  codec=codecs[part])
    _CODEC_BROKERS[sf_dir] = (broker.bootstrap, topic)
    return _CODEC_BROKERS[sf_dir]


@register(
    "kafka_roundtrip_orders_compressed",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           o_orderkey AS ts_ms
    FROM orders
    WHERE o_orderkey % 20 = 0
    """,
)
def kafka_roundtrip_orders_compressed(spark: SparkSession,
                                      sf_dir: str) -> DataFrame:
    """The compressed-batch wire path under the oracle gate (round 7
    — the gzip/Snappy codecs landed in round 6 pytest-only; LZ4 and
    zstd landed this round): the orders subset ships as magic-2
    record batches with one codec per partition — gzip, pure-Python
    Snappy, pure-Python LZ4 frame, pure-Python zstd frame
    (RFC 8878), uncompressed control — with CreateTime
    timestamps, read back through ``kafka_py``'s fetch → decompress →
    record-batch decode. The oracle adds the produced timestamp
    (o_orderkey ms) so the per-record CreateTime survives compression
    bit-exactly too — one hash over payloads AND timestamps across
    all four codecs."""
    from aether_firebase_consumer_spark.sources.kafka_pysource import (
        register_kafka_py,
    )

    register_kafka_py(spark)
    bootstrap, topic = _orders_codec_broker(spark, sf_dir)
    raw = (spark.read.format("kafka_py")
           .option("bootstrap", bootstrap)
           .option("subscribe", topic)
           .load())
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"),
                    "o_orderkey bigint, o_custkey bigint, "
                    "o_orderstatus string, o_totalprice double")
        .alias("o"),
        (F.unix_micros(F.col("timestamp")) / 1000).cast("bigint")
        .alias("ts_ms"))
    return parsed.select("o.o_orderkey", "o.o_custkey",
                         "o.o_orderstatus", "o.o_totalprice", "ts_ms")


_AVRO_BROKERS: dict[str, tuple] = {}

_CUSTOMER_AVSC = {
    "type": "record",
    "name": "Customer",
    "fields": [
        {"name": "c_custkey", "type": "long"},
        {"name": "c_name", "type": ["null", "string"], "default": None},
        {"name": "c_nationkey", "type": "int"},
        {"name": "c_acctbal", "type": "double"},
        {"name": "c_mktsegment", "type": ["null", "string"],
         "default": None},
    ],
}


def _customer_avro_broker(spark: SparkSession, sf_dir: str):
    """Broker holding a customer subset as AVRO-BINARY messages (the
    reference's actual value encoding) — started once per process."""
    cached = _AVRO_BROKERS.get(sf_dir)
    if cached:
        return cached
    from aether_firebase_consumer_spark.sources.avro_codec import (
        encode_record,
    )
    from aether_firebase_consumer_spark.sources.kafka_wire import (
        KafkaWireClient,
        MiniKafkaBroker,
    )

    rows = (load_table(spark, sf_dir, "customer")
            .filter(F.col("c_custkey") % 10 == 0)
            .collect())
    broker = MiniKafkaBroker().start()
    topic = "bench.customer.avro"
    broker.create_topic(topic, partitions=5)
    with KafkaWireClient(broker.host, broker.port) as c:
        by_part: dict[int, list] = {}
        for r in rows:
            payload = encode_record(_CUSTOMER_AVSC, {
                "c_custkey": r.c_custkey,
                "c_name": r.c_name,
                "c_nationkey": r.c_nationkey,
                "c_acctbal": r.c_acctbal,
                "c_mktsegment": r.c_mktsegment,
            })
            by_part.setdefault(r.c_custkey % 4, []).append(
                (str(r.c_custkey).encode(), payload))
        for part, msgs in by_part.items():
            for i in range(0, len(msgs), 500):
                c.produce(topic, part, msgs[i:i + 500])
    _AVRO_BROKERS[sf_dir] = (broker.bootstrap, topic)
    return _AVRO_BROKERS[sf_dir]


@register(
    "kafka_avro_roundtrip_customer",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer
    WHERE c_custkey % 10 = 0
    """,
)
def kafka_avro_roundtrip_customer(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """The reference's actual input encoding end-to-end: a customer
    subset Avro-binary-encoded (pure-Python spec codec) into a wire
    broker, read back via the ``kafka_py`` source, decoded with the
    jar-free ``decode_avro_docs_py`` Arrow kernel — one oracle gate
    over wire transport AND Avro codec together. The decode is the
    documented no-jar escape hatch (per-row Python inside Arrow
    batches); at cluster scale the spark-avro ``from_avro`` path wins
    (``readers.read_avro``), so this query is a correctness gate, not
    a bench headliner."""
    import json as _json

    from aether_firebase_consumer_spark.sources.avro_codec import (
        decode_avro_docs_py,
    )
    from aether_firebase_consumer_spark.sources.kafka_pysource import (
        register_kafka_py,
    )

    register_kafka_py(spark)
    bootstrap, topic = _customer_avro_broker(spark, sf_dir)
    raw = (spark.read.format("kafka_py")
           .option("bootstrap", bootstrap)
           .option("subscribe", topic)
           .load())
    return decode_avro_docs_py(raw.select("value"),
                               _json.dumps(_CUSTOMER_AVSC))


_PIPELINE_CACHE: dict[str, str] = {}


def _run_stream_pipeline(spark: SparkSession, sf_dir: str) -> str:
    """Run the full streaming reference path once per (process,
    sf_dir): wire broker → kafka_py stream → JSON decode → filter →
    mask → route → hash-gated MERGE upsert; returns the doc-table
    path. Cached so the driver's query run and oracle comparison share
    one execution."""
    cached = _PIPELINE_CACHE.get(sf_dir)
    if cached:
        return cached
    import json as _json
    import tempfile

    from aether_firebase_consumer_spark.operators.filtering import (
        FilterConfig,
    )
    from aether_firebase_consumer_spark.operators.masking import MaskConfig
    from aether_firebase_consumer_spark.operators.routing import Subscription
    from aether_firebase_consumer_spark.sinks.upsert import (
        HashStateTable,
        ParquetUpsertTable,
    )
    from aether_firebase_consumer_spark.sources.kafka_pysource import (
        register_kafka_py,
    )
    from aether_firebase_consumer_spark.sources.kafka_wire import (
        KafkaWireClient,
        MiniKafkaBroker,
    )
    from aether_firebase_consumer_spark.streaming.pipeline import (
        PipelineConfig,
        StreamingUpsertJob,
    )

    register_kafka_py(spark)
    rows = (load_table(spark, sf_dir, "events")
            .filter(F.col("event_id") % 20 == 0)
            .select("event_id", "event_type", "user_id", "value", "props")
            .collect())
    broker = MiniKafkaBroker().start()
    topic = "tenant1.events"
    broker.create_topic(topic, partitions=2)
    with KafkaWireClient(broker.host, broker.port) as c:
        for i in range(0, len(rows), 500):
            chunk = rows[i:i + 500]
            by_part: dict[int, list] = {}
            for r in chunk:
                doc = {"id": str(r.event_id),
                       "topic": "tenant1." + r.event_type,
                       "user_id": r.user_id, "value": r.value,
                       "props": r.props}
                by_part.setdefault(r.event_id % 2, []).append(
                    (doc["id"].encode(), _json.dumps(doc).encode()))
            for part, msgs in by_part.items():
                c.produce(topic, part, msgs)

    workdir = tempfile.mkdtemp(prefix="kafka_pipeline_q_")
    stream = (spark.readStream.format("kafka_py")
              .option("bootstrap", broker.bootstrap)
              .option("subscribe", topic).load())
    docs = (stream.select(F.from_json(
        F.col("value").cast("string"),
        "id string, topic string, user_id bigint, value double, "
        "props string").alias("d")).select("d.*"))
    cfg = PipelineConfig(
        tenant="tenant1",
        filter_config=FilterConfig(
            "topic", ["tenant1.click", "tenant1.view"]),
        mask_config=MaskConfig(["public", "private"], "public"),
        classifications={"props": "private"},
        subscriptions=[Subscription(id="s1", topic_pattern="*")],
        sync_mode="forward",
    )
    doc_table = ParquetUpsertTable(spark, f"{workdir}/docs", ["id"])
    hash_table = HashStateTable(spark, f"{workdir}/hashes")
    job = StreamingUpsertJob(cfg, doc_table, hash_table)
    q = job.writer(docs, f"{workdir}/ckpt").start()
    q.processAllAvailable()
    q.stop()
    broker.stop()
    _PIPELINE_CACHE[sf_dir] = f"{workdir}/docs"
    return _PIPELINE_CACHE[sf_dir]


@register(
    "kafka_stream_pipeline",
    oracle="""
    SELECT CAST(event_id AS VARCHAR) AS id,
           'tenant1.' || event_type AS topic,
           '_aether/entities/' || event_type AS target_path,
           CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value_dec
    FROM events
    WHERE event_id % 20 = 0 AND event_type IN ('click', 'view')
    """,
)
def kafka_stream_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's E1 consumer loop as a REAL Structured Streaming
    run under the value-hash gate: an events subset produced as JSON
    messages to a wire broker, consumed by the ``kafka_py`` stream,
    filtered (O3) / masked (O4: ``props`` dropped) / routed (O5-O7)
    and MERGE-upserted (O12) through ``StreamingUpsertJob`` — the
    query returns the landed doc table projected to its deterministic
    columns, so any loss, duplication, or mis-route anywhere in the
    streaming path breaks the hash. The run executes once per process
    (cached) and drains with ``processAllAvailable``."""
    from aether_firebase_consumer_spark.sinks.upsert import (
        ParquetUpsertTable,
    )

    path = _run_stream_pipeline(spark, sf_dir)
    table = ParquetUpsertTable(spark, path, ["id"])
    return (table.read()
            .select("id", "topic", "target_path",
                    F.col("value").cast("decimal(18,2)").cast("double")
                    .alias("value_dec")))


_AVRO_DIRS: dict[str, str] = {}


@register(
    "avro_py_roundtrip_supplier",
    oracle="SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier",
)
def avro_py_roundtrip_supplier(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """The ``avro_py`` DataSource under the oracle gate: supplier
    written as Avro container files through ``df.write.format`` (4
    files, per-file atomic tmp+rename), read back through
    ``spark.read.format`` (one task per file, schema from the first
    container header) — if the container framing, zigzag varints, or
    type mapping corrupt one value, the hash breaks. Write happens once
    per (process, sf_dir); the read is what each call plans."""
    import tempfile

    from aether_firebase_consumer_spark.sources.avro_pysource import (
        register_avro_py,
    )

    register_avro_py(spark)
    d = _AVRO_DIRS.get(sf_dir)
    if d is None:
        d = tempfile.mkdtemp(prefix="avro_py_q_")
        (load_table(spark, sf_dir, "supplier")
         .repartition(4).write.format("avro_py")
         .option("path", d).mode("append").save())
        _AVRO_DIRS[sf_dir] = d
    return spark.read.format("avro_py").load(d)


_TXN_BROKERS: dict[str, tuple] = {}


def _orders_txn_broker(spark: SparkSession, sf_dir: str):
    """Broker where the orders subset arrives through KIP-98
    TRANSACTIONS: committed transactions carry the real rows, and
    interleaved ABORTED transactions carry poisoned decoys (same keys,
    totalprice shifted by 1e9). A read_committed scan must surface
    exactly the committed rows — one leaked decoy or one lost commit
    breaks the value hash. Markers leave offset gaps the reader has to
    tolerate, same as compaction."""
    cached = _TXN_BROKERS.get(sf_dir)
    if cached:
        return cached
    from aether_firebase_consumer_spark.sources.kafka_wire import (
        KafkaWireClient,
        MiniKafkaBroker,
        TransactionalProducer,
    )

    rows = (load_table(spark, sf_dir, "orders")
            .filter(F.col("o_orderkey") % 20 == 0)
            .select("o_orderkey", "o_custkey", "o_orderstatus",
                    "o_totalprice")
            .collect())
    broker = MiniKafkaBroker().start()
    topic = "bench.orders.txn"
    broker.create_topic(topic, partitions=3)
    with KafkaWireClient(broker.host, broker.port) as c:
        producer = TransactionalProducer(c, "orders-txn-loader")
        for i in range(0, len(rows), 400):
            chunk = rows[i:i + 400]
            good: dict[int, list] = {}
            bad: dict[int, list] = {}
            for r in chunk:
                part = r.o_orderkey % 3
                good.setdefault(part, []).append(
                    (str(r.o_orderkey).encode(), json.dumps({
                        "o_orderkey": r.o_orderkey,
                        "o_custkey": r.o_custkey,
                        "o_orderstatus": r.o_orderstatus,
                        "o_totalprice": r.o_totalprice,
                    }).encode(), int(r.o_orderkey)))
                bad.setdefault(part, []).append(
                    (str(r.o_orderkey).encode(), json.dumps({
                        "o_orderkey": r.o_orderkey,
                        "o_custkey": r.o_custkey,
                        "o_orderstatus": r.o_orderstatus,
                        "o_totalprice": r.o_totalprice + 1.0e9,
                    }).encode(), int(r.o_orderkey)))
            # aborted decoys FIRST, then the committed truth — the
            # committed reader must skip the leading aborted span of
            # every partition (the LSO fast-forward path)
            producer.begin_transaction()
            for part, msgs in bad.items():
                producer.send(topic, part, msgs)
            producer.abort_transaction()
            producer.begin_transaction()
            for part, msgs in good.items():
                producer.send(topic, part, msgs)
            producer.commit_transaction()
    _TXN_BROKERS[sf_dir] = (broker.bootstrap, topic)
    return _TXN_BROKERS[sf_dir]


@register(
    "kafka_txn_roundtrip_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_orderkey % 20 = 0
    """,
)
def kafka_txn_roundtrip_orders(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Exactly-once visibility under the oracle gate (round 8): the
    orders subset is produced through KIP-98 transactions — committed
    transactions carry the truth, interleaved aborted transactions
    carry poisoned decoys — and read back via ``kafka_py`` with
    ``isolation=read_committed``. The reference's consumer was
    at-least-once with no transactional story at all
    (/root/reference/firebase/conf/consumer/kafka.json:5); this is the
    upgrade a Kafka→Kafka exactly-once pipeline needs. The oracle is
    the committed subset straight from parquet: a leaked aborted
    record or a lost committed one breaks the value hash."""
    from aether_firebase_consumer_spark.sources.kafka_pysource import (
        register_kafka_py,
    )

    register_kafka_py(spark)
    bootstrap, topic = _orders_txn_broker(spark, sf_dir)
    raw = (spark.read.format("kafka_py")
           .option("bootstrap", bootstrap)
           .option("subscribe", topic)
           .option("isolation", "read_committed")
           .load())
    parsed = raw.select(F.from_json(
        F.col("value").cast("string"),
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double").alias("o"))
    return parsed.select("o.o_orderkey", "o.o_custkey",
                         "o.o_orderstatus", "o.o_totalprice")


_HDR_BROKERS: dict[str, tuple] = {}


def _orders_header_broker(spark: SparkSession, sf_dir: str):
    """Broker where each message carries its payload split across the
    VALUE and a KIP-82 HEADER: the order status rides a record header
    (plus a null-valued marker header), so the gate can catch a header
    that is dropped, reordered, or corrupted anywhere in
    encode → store → fetch re-encode → decode → Spark."""
    cached = _HDR_BROKERS.get(sf_dir)
    if cached:
        return cached
    from aether_firebase_consumer_spark.sources.kafka_wire import (
        KafkaWireClient,
        MiniKafkaBroker,
    )

    rows = (load_table(spark, sf_dir, "orders")
            .filter(F.col("o_orderkey") % 20 == 0)
            .select("o_orderkey", "o_custkey", "o_orderstatus")
            .collect())
    broker = MiniKafkaBroker().start()
    topic = "bench.orders.hdr"
    broker.create_topic(topic, partitions=3)
    with KafkaWireClient(broker.host, broker.port) as c:
        by_part: dict[int, list] = {}
        for r in rows:
            by_part.setdefault(r.o_orderkey % 3, []).append((
                str(r.o_orderkey).encode(),
                str(r.o_custkey).encode(),
                int(r.o_orderkey),
                (("status", r.o_orderstatus.encode()),
                 ("marker", None)),
            ))
        for part, msgs in by_part.items():
            for i in range(0, len(msgs), 500):
                c.produce_records(topic, part, msgs[i:i + 500])
    _HDR_BROKERS[sf_dir] = (broker.bootstrap, topic)
    return _HDR_BROKERS[sf_dir]


@register(
    "kafka_headers_roundtrip_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus
    FROM orders
    WHERE o_orderkey % 20 = 0
    """,
)
def kafka_headers_roundtrip_orders(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """KIP-82 record headers under the oracle gate (round 8): the
    order key rides the message key, the customer key the value, and
    the order STATUS a record header — reassembled in Spark from the
    ``includeHeaders`` column. The header extraction is pure Catalyst
    (filter + element_at over the struct array, JVM codegen); a
    dropped, reordered, or corrupted header anywhere on the wire path
    breaks the value hash against parquet."""
    from aether_firebase_consumer_spark.sources.kafka_pysource import (
        register_kafka_py,
    )

    register_kafka_py(spark)
    bootstrap, topic = _orders_header_broker(spark, sf_dir)
    raw = (spark.read.format("kafka_py")
           .option("bootstrap", bootstrap)
           .option("subscribe", topic)
           .option("includeHeaders", "true")
           .load())
    status = F.filter(F.col("headers"),
                      lambda h: h["key"] == F.lit("status"))
    return raw.select(
        F.col("key").cast("string").cast("bigint").alias("o_orderkey"),
        F.col("value").cast("string").cast("bigint").alias("o_custkey"),
        F.element_at(status, 1)["value"].cast("string")
        .alias("o_orderstatus"))


_AVRO_DATASETS: dict[str, str] = {}


def _orders_avro_dataset(spark: SparkSession, sf_dir: str) -> str:
    """Write (once per process and sf_dir) a deterministic orders
    subset as 8 Avro container files; returns the dataset dir. The
    same per-process setup convention as the broker caches above: the
    dataset is the PERSISTED input a production scan would read, so
    repeated builder calls measure the scan, not the write."""
    cached = _AVRO_DATASETS.get(sf_dir)
    if cached:
        return cached
    import tempfile

    from aether_firebase_consumer_spark.sources.avro_codec import (
        write_avro_dataset,
    )

    tmp = tempfile.mkdtemp(prefix="avro_container_scan_")
    src = (load_table(spark, sf_dir, "orders")
           .filter(F.col("o_orderkey") % 3 == 0)
           .select("o_orderkey", "o_custkey", "o_orderstatus",
                   "o_totalprice", "o_orderdate")
           .repartition(8))
    write_avro_dataset(src, tmp, codec="null")
    _AVRO_DATASETS[sf_dir] = tmp
    return tmp


@register(
    "avro_container_scan",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           o_orderdate
    FROM orders
    WHERE o_orderkey % 3 = 0
    """,
)
def avro_container_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The jar-free ``.avro`` container scan as a REGISTERED query
    (r15, VERDICT r14 #9): the bench-only ``avro_container`` entry sat
    outside the registry, so the bench differential could never
    adjudicate its drift — this twin runs the identical
    ``read_avro_container_py`` path (binaryFile listing → mapInPandas
    container decode) over a deterministic orders subset, under the
    full DuckDB value-hash gate (a dropped block, a mis-decoded codec
    frame, or a type-mapping drift breaks the hash against parquet).
    The legacy bench entry stays untouched for round-over-round
    comparability; this one is rerunnable by the differential like
    every other headliner."""
    from aether_firebase_consumer_spark.sources.avro_codec import (
        read_avro_container_py,
    )

    return read_avro_container_py(spark,
                                  _orders_avro_dataset(spark, sf_dir))
