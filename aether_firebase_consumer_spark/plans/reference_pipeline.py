"""Reference-surface queries: the E1 filter→mask→route→hash pipeline and
one oracle-checked query per reference operator (SURVEY.md §2.1).

The fixture mapping: ``events`` stands in for the Kafka document stream
(``event_type`` is the logical topic name, tenant ``tenant1``), and
``documents`` for the annotated survey table. Every query is a pure
Catalyst plan (no UDFs) so filters/projections push into the parquet
scan — the 100 TB posture for this surface is "the scan does the work".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aether_firebase_consumer_spark.operators.filtering import FilterConfig, apply_filter
from aether_firebase_consumer_spark.operators.masking import MaskConfig, apply_mask
from aether_firebase_consumer_spark.operators.routing import (
    Subscription,
    add_tenant,
    path_for_topic,
    route_topics,
    strip_tenant,
)
from aether_firebase_consumer_spark.plans import register
from aether_firebase_consumer_spark.tables import load_table

TENANT = "tenant1"

# The subscription fixture (mirrors firebase/app/fixtures/examples.py:36-50):
# filter on a select1 field with one pass value, mask to public, route to
# the default template.
EVENT_FILTER = FilterConfig("event_type", ["click", "view", "purchase"])
EVENT_MASK = MaskConfig(mask_levels=["public", "private"], emit_level="public")
# props carries free-form payload → classified private in the fixture.
EVENT_CLASSIFICATIONS = {"props": "private", "user_id": "private"}


# ------------------------------------------------------------------ flagship

@register(
    "flagship_filter_mask_route",
    oracle="""
    SELECT event_id,
           'tenant1.' || event_type AS topic,
           event_type AS logical_name,
           '_aether/entities/' || event_type AS target_path,
           substr(md5('{"event_id": ' || CAST(event_id AS VARCHAR)
                      || ', "event_type": "' || event_type || '"}'), 1, 16)
               AS doc_hash,
           CAST(ts AS DATE) AS event_date,
           CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value_dec
    FROM events
    WHERE event_type IN ('click', 'view', 'purchase')
    """,
)
def flagship_filter_mask_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 end-to-end data path (``firebase/app/artifacts.py:302-327,382-406``):
    Kafka doc → predicate filter (O3) → classification mask (O4) → tenant
    strip (O5) → path template (O7) → content hash (O9) — as ONE declarative
    plan. The filter + projection reach the parquet scan via Catalyst.
    """
    ev = load_table(spark, sf_dir, "events")
    ev = apply_filter(ev, EVENT_FILTER)
    ev = apply_mask(ev, EVENT_MASK, EVENT_CLASSIFICATIONS)  # drops props,user_id
    ev = ev.withColumn("topic", add_tenant("event_type", TENANT))
    # Canonical-form content hash over the doc's key fields; string built
    # identically to json.dumps(sort_keys=True) for this 2-field doc.
    canonical = F.concat(
        F.lit('{"event_id": '), F.col("event_id").cast("string"),
        F.lit(', "event_type": "'), F.col("event_type"), F.lit('"}'),
    )
    return ev.select(
        "event_id",
        "topic",
        strip_tenant("topic", TENANT).alias("logical_name"),
        path_for_topic(strip_tenant("topic", TENANT)).alias("target_path"),
        F.substring(F.md5(canonical), 1, 16).alias("doc_hash"),
        F.col("ts").cast("date").alias("event_date"),
        # DECIMAL(18,2) for half-up rounding parity, then DOUBLE at the
        # surface: decimal output types hash differently per engine in the
        # driver's canonicalizer (round-1 red row), doubles do not.
        F.col("value").cast("decimal(18,2)").cast("double").alias("value_dec"),
    )


# ------------------------------------------------------------------ O3

@register(
    "predicate_filter",
    oracle="""
    SELECT event_id, event_type, user_id
    FROM events
    WHERE event_type IN ('click', 'purchase')
    """,
)
def predicate_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 predicate filter (``firebase/app/artifacts.py:346-358``): value at
    field path ∈ pass list. Pushed into the scan by Catalyst."""
    ev = load_table(spark, sf_dir, "events")
    cfg = FilterConfig("event_type", ["click", "purchase"])
    return apply_filter(ev, cfg).select("event_id", "event_type", "user_id")


@register(
    "predicate_filter_json",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 90
    """,
)
def predicate_filter_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 on an *untyped* JSON payload (the reference's docs are schemaless
    dicts): JSONPath evaluated JVM-side via get_json_object — no Python."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.select("event_id", k.alias("k")).filter(F.col("k") >= 90)


# ------------------------------------------------------------------ O4

@register(
    "masking_project",
    oracle="SELECT doc_id, text, lang FROM documents",
)
def masking_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 classification masking (``firebase/app/artifacts.py:359-370``):
    with levels [public, private] emitting public, private-classified
    columns are projected away — Catalyst never reads them from parquet."""
    docs = load_table(spark, sf_dir, "documents")
    cfg = MaskConfig(mask_levels=["public", "private"], emit_level="public")
    return apply_mask(docs, cfg, {"source": "private", "n_chars": "private"})


@register(
    "masking_emit_private",
    oracle="SELECT doc_id, text, lang, source, n_chars FROM documents",
)
def masking_emit_private(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 with emit_level = highest level: nothing is masked."""
    docs = load_table(spark, sf_dir, "documents")
    cfg = MaskConfig(mask_levels=["public", "private"], emit_level="private")
    return apply_mask(docs, cfg, {"source": "private", "n_chars": "private"})


# ------------------------------------------------------------------ O5 / O7

@register(
    "tenant_strip_route",
    oracle="""
    SELECT DISTINCT
           'tenant1.' || event_type AS topic,
           event_type AS logical_name,
           '_aether/entities/' || event_type AS target_path
    FROM events
    """,
)
def tenant_strip_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5 anchored tenant strip (fixing the lstrip charset bug at
    ``firebase/app/artifacts.py:375-376``) + O7 path templating
    (``firebase/app/artifacts.py:180-186``)."""
    ev = load_table(spark, sf_dir, "events")
    topics = ev.select(add_tenant("event_type", TENANT).alias("topic")).distinct()
    return topics.select(
        "topic",
        strip_tenant("topic", TENANT).alias("logical_name"),
        path_for_topic(strip_tenant("topic", TENANT)).alias("target_path"),
    )


# ------------------------------------------------------------------ O6

@register(
    "subscription_routing",
    oracle="""
    SELECT event_id,
           'tenant1.' || event_type AS topic,
           CASE
             WHEN event_type = 'purchase'
               THEN 'commerce/purchases/' || event_type
             WHEN event_type LIKE 'c%'
               THEN 'clicky/events/' || event_type
             ELSE '_aether/entities/' || event_type
           END AS target_path
    FROM events
    """,
)
def subscription_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6 first-match-by-sorted-id routing (``firebase/app/artifacts.py:250-256``)
    compiled to a constant-folded when-chain — broadcast-free at any scale."""
    subs = [
        Subscription(id="sub-1", topic_pattern="purchase",
                     target_path="commerce/purchases/{topic}"),
        Subscription(id="sub-2", topic_pattern="c*",
                     target_path="clicky/events/{topic}"),
        Subscription(id="sub-3", topic_pattern="*"),
    ]
    ev = load_table(spark, sf_dir, "events")
    ev = ev.withColumn("topic", add_tenant("event_type", TENANT))
    return route_topics(ev, "topic", subs, TENANT).select(
        "event_id", "topic", "target_path")


# ------------------------------------------------------------------ O8

@register(
    "sync_mode_gate",
    oracle="""
    SELECT event_id, event_type,
           CASE event_type
             WHEN 'purchase' THEN 'sync'
             WHEN 'click' THEN 'forward'
             WHEN 'view' THEN 'forward'
             ELSE 'consume'
           END AS sync_mode
    FROM events
    WHERE CASE event_type
            WHEN 'purchase' THEN 'sync'
            WHEN 'click' THEN 'forward'
            WHEN 'view' THEN 'forward'
            ELSE 'consume'
          END <> 'consume'
    """,
)
def sync_mode_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O8 sync-mode dispatch (``firebase/app/helpers.py:42-46``,
    ``firebase/app/artifacts.py:390-406``): CONSUME/NONE rows never reach
    the sink; SYNC rows are hash-gated (see ``change_detection``), FORWARD
    rows are written unconditionally."""
    ev = load_table(spark, sf_dir, "events")
    mode = (
        F.when(F.col("event_type") == "purchase", F.lit("sync"))
        .when(F.col("event_type").isin("click", "view"), F.lit("forward"))
        .otherwise(F.lit("consume"))
    )
    return (ev.withColumn("sync_mode", mode)
              .filter(F.col("sync_mode") != "consume")
              .select("event_id", "event_type", "sync_mode"))


# ------------------------------------------------------------------ O9

@register(
    "content_hash",
    oracle="""
    SELECT event_id,
           substr(md5('{"event_id": ' || CAST(event_id AS VARCHAR)
                      || ', "user_id": ' || CAST(user_id AS VARCHAR) || '}'),
                  1, 16) AS doc_hash
    FROM events
    """,
)
def content_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O9 content hash (``firebase/app/utils.py:29-33``): canonical
    sorted-key JSON → md5 → first 16 hex chars, as a pure JVM expression
    (whole-stage codegen; the pandas-UDF byte-parity variant is
    functions/hashing.canonical_json_hash)."""
    ev = load_table(spark, sf_dir, "events")
    canonical = F.concat(
        F.lit('{"event_id": '), F.col("event_id").cast("string"),
        F.lit(', "user_id": '), F.col("user_id").cast("string"), F.lit("}"),
    )
    return ev.select(
        "event_id", F.substring(F.md5(canonical), 1, 16).alias("doc_hash"))


# ------------------------------------------------------------------ O10

_STORED_HASH_SQL = """
    SELECT event_id AS id,
           substr(md5(CAST(event_id AS VARCHAR) || ':' ||
                      CAST(CASE WHEN event_id % 10 = 0
                                THEN user_id + 1 ELSE user_id END AS VARCHAR)),
                  1, 16) AS hash
    FROM events
    WHERE event_id % 2 = 0
"""


@register(
    "change_detection",
    oracle=f"""
    WITH incoming AS (
      SELECT event_id AS id,
             substr(md5(CAST(event_id AS VARCHAR) || ':' ||
                        CAST(user_id AS VARCHAR)), 1, 16) AS hash
      FROM events
    ),
    stored AS ({_STORED_HASH_SQL})
    SELECT i.id, i.hash
    FROM incoming i
    WHERE NOT EXISTS (
      SELECT 1 FROM stored s WHERE s.id = i.id AND s.hash = i.hash
    )
    """,
)
def change_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O10 hash-based change detection (``firebase/app/helpers.py:51-67``,
    state path ``firebase/app/config.py:37``) as a relational anti-join:
    needs-update ⇔ no stored (id, hash) pair. Implements the *documented*
    semantics — update on hash mismatch — fixing the reference's falsy
    fall-through (missing ``return True`` in ``remote_msg_needs_update``,
    ``firebase/app/helpers.py:61-67``).

    The stored-hash table is simulated deterministically from events:
    even ids are "stored", ids % 10 == 0 with a perturbed payload
    ("changed upstream"). Result = odd ids (new) + %10 ids (changed).
    Scale posture: anti-join on (id, hash) shuffles both sides by id —
    exactly the partitioning the MERGE sink needs next, so the exchange
    is reused.
    """
    ev = load_table(spark, sf_dir, "events")
    incoming = ev.select(
        F.col("event_id").alias("id"),
        F.substring(
            F.md5(F.concat(F.col("event_id").cast("string"), F.lit(":"),
                           F.col("user_id").cast("string"))), 1, 16
        ).alias("hash"),
    )
    stored_user = F.when(F.col("event_id") % 10 == 0, F.col("user_id") + 1) \
                   .otherwise(F.col("user_id"))
    stored = ev.filter(F.col("event_id") % 2 == 0).select(
        F.col("event_id").alias("id"),
        F.substring(
            F.md5(F.concat(F.col("event_id").cast("string"), F.lit(":"),
                           stored_user.cast("string"))), 1, 16
        ).alias("hash"),
    )
    return incoming.join(stored, ["id", "hash"], "left_anti")
