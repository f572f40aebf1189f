"""Physical-plan regression tests: assert the *scale* properties, not
just results. These lock in the 100 TB posture — predicate pushdown to
the parquet scan, column pruning, broadcast joins for bounded
dimensions, no nested-loop/cartesian fallbacks on keyed joins, map-side
partial aggregation, top-k as TakeOrdered, and no row-at-a-time Python
in any hot path (Arrow-batched plans only where Python is required).

A refactor that silently breaks one of these still passes the value
oracle at sf0.01 but would fall over at 1000x — so it must fail here.
"""

from __future__ import annotations

import pytest

SF_SMOKE = "/root/testdata/sf0.001"


def plan(spark, name: str) -> str:
    from aether_firebase_consumer_spark.plans import REGISTRY, _load_all
    _load_all()
    df = REGISTRY[name].builder(spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def explain_formatted(spark, name: str) -> str:
    from aether_firebase_consumer_spark.plans import REGISTRY, _load_all
    _load_all()
    df = REGISTRY[name].builder(spark, SF_SMOKE)
    return spark.sparkContext._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


# ------------------------------------------------------- pushdown / pruning

def test_q6_filters_push_to_scan(spark):
    """All three Q6 predicates must reach the parquet reader."""
    p = explain_formatted(spark, "q6_forecast_revenue")
    assert "PushedFilters:" in p
    pushed = [ln for ln in p.splitlines() if "PushedFilters:" in ln][0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed: {pushed}"


def test_q6_column_pruning(spark):
    """Q6 touches 4 columns; the scan must not read the rest."""
    p = explain_formatted(spark, "q6_forecast_revenue")
    schema_lines = [ln for ln in p.splitlines() if "ReadSchema:" in ln]
    assert schema_lines, p
    rs = schema_lines[0]
    for col in ("l_shipdate", "l_discount", "l_quantity", "l_extendedprice"):
        assert col in rs
    for col in ("l_returnflag", "l_partkey", "l_suppkey", "l_tax"):
        assert col not in rs, f"unpruned column {col}: {rs}"


def test_flagship_filter_pushdown(spark):
    """The reference's O3 predicate filter must reach the events scan
    (the reference hand-rolled this inside its SDK consumer; Catalyst
    gives it to us for free — confirm it stays free)."""
    p = explain_formatted(spark, "flagship_filter_mask_route")
    assert "PushedFilters:" in p


# ------------------------------------------------------------- join strategy

def test_dim_joins_are_broadcast(spark):
    """Bounded dimensions must broadcast — the fact side never shuffles
    for the join."""
    for name in ("join_broadcast_dim", "q5_local_supplier_volume",
                 "q14_promo_effect", "q10_returned_items"):
        p = plan(spark, name)
        assert "BroadcastHashJoin" in p, f"{name}: no broadcast join\n{p}"


def test_keyed_joins_never_nested_loop(spark):
    """Joins with an equi component must plan as hash/sort-merge joins —
    BroadcastNestedLoopJoin or CartesianProduct here would be O(n*m)."""
    for name in ("join_fact_fact", "join_theta_range", "range_join_events",
                 "q18_large_volume_customer", "q7_volume_shipping",
                 "dedup_minhash_lsh", "dedup_ngram_jaccard",
                 "similarity_embedding_neardup"):
        p = plan(spark, name)
        assert "CartesianProduct" not in p, f"{name} planned cartesian"
        assert "BroadcastNestedLoopJoin" not in p, f"{name} planned BNLJ"


def test_semi_anti_physical(spark):
    """EXISTS / NOT EXISTS must stay semi/anti (no full join + filter)."""
    assert "LeftSemi" in plan(spark, "join_semi")
    assert "LeftAnti" in plan(spark, "join_anti")


# ---------------------------------------------------------------- aggregates

def test_aggs_have_partial_phase(spark):
    """Group-bys must do map-side combine: two HashAggregate nodes
    (partial + final) around the exchange."""
    for name in ("q1_pricing_summary", "agg_stats"):
        p = plan(spark, name)
        assert p.count("HashAggregate") >= 2, f"{name}: no partial agg\n{p}"


def test_topk_is_take_ordered(spark):
    """ORDER BY + LIMIT must compile to TakeOrdered — a global sort
    materialization at 100 TB is a different (wrong) algorithm."""
    for name in ("q3_shipping_priority", "q10_returned_items",
                 "similarity_topk_cosine"):
        p = plan(spark, name)
        assert "TakeOrderedAndProject" in p, f"{name}: global sort\n{p}"


# ------------------------------------------------------------- Python usage

@pytest.mark.parametrize("name", [
    "flagship_filter_mask_route", "q1_pricing_summary", "dedup_minhash_lsh",
    "dedup_simhash", "text_quality_score", "text_lang_id",
    "similarity_topk_cosine", "similarity_ann_lsh", "content_hash",
    "change_detection", "asof_join_events", "text_tfidf_topk",
])
def test_no_row_python_in_hot_paths(spark, name):
    """Everything except the multimodal decode kernel must stay JVM-side:
    no row-at-a-time Python UDF (BatchEvalPython) anywhere, and these
    queries shouldn't need Arrow-batched Python either."""
    p = plan(spark, name)
    assert "BatchEvalPython" not in p, f"{name} uses row Python UDF"
    assert "ArrowEvalPython" not in p, f"{name} uses a pandas UDF"
    assert "MapInPandas" not in p, f"{name} uses mapInPandas"


def test_multimodal_uses_arrow_not_row_python(spark):
    """The one permitted Python stage must be Arrow-batched."""
    p = plan(spark, "multimodal_feature_extract")
    assert "MapInPandas" in p
    assert "BatchEvalPython" not in p


# ------------------------------------------------------------- codegen spans

def test_scan_agg_pipelines_are_codegened(spark):
    """Scan→filter→project→partial-agg must fuse into WholeStageCodegen.
    AQE only finalizes (and codegens) the plan at execution, so run the
    query first and inspect the final adaptive plan."""
    from aether_firebase_consumer_spark.plans import REGISTRY, _load_all
    _load_all()
    for name in ("q1_pricing_summary", "q6_forecast_revenue", "agg_stats"):
        df = REGISTRY[name].builder(spark, SF_SMOKE)
        df.collect()
        p = df._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in p, f"{name}: AQE did not finalize\n{p}"
        # codegen stages print as "*(N) Operator" in the final plan
        assert "*(1)" in p, f"{name}: no codegen stage\n{p}"
        assert any(ln.strip().startswith("+- *(") and "HashAggregate" in ln
                   for ln in p.splitlines()), f"{name}: agg not codegened\n{p}"


# ----------------------------------------------- partsupp-derived Q2/Q11/Q20

def test_q2_window_is_partitioned_and_dims_broadcast(spark):
    """Q2's correlated-min rewrite must be a window PARTITIONED by
    ps_partkey (a global window would single-partition the derived
    partsupp relation) and every dimension join must broadcast."""
    p = plan(spark, "q2_min_cost_supplier")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    win_lines = [ln for ln in p.splitlines() if "Window" in ln]
    assert win_lines and all("ps_partkey" in ln for ln in win_lines), \
        f"window not keyed by ps_partkey:\n{p}"


def test_q11_threshold_has_no_global_window(spark):
    """Q11's group-total threshold must be a 1-row aggregate broadcast
    back onto the per-part rows — a Window over an empty partition spec
    funnels every per-part row through one task at scale."""
    p = plan(spark, "q11_important_stock")
    assert "Window" not in p, f"global window sneaked back in:\n{p}"
    assert p.count("HashAggregate") >= 2  # partial + final on the ps build


def test_q20_semi_join_and_no_second_fact_shuffle_strategy(spark):
    """Q20's IN-subquery must stay a left-semi join, and no keyed join
    may degrade to nested-loop/cartesian."""
    p = plan(spark, "q20_drawn_down_suppliers")
    assert "LeftSemi" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_latest_per_user_is_rank_limited(spark):
    """Latest-state compaction must compile to WindowGroupLimit (rank
    pushed into the sort) — a full per-partition sort + filter would
    sort 100 TB to keep one row per key."""
    p = plan(spark, "events_latest_per_user")
    assert "WindowGroupLimit" in p, p
    assert p.count("Exchange") == 1, p  # one shuffle on user_id


def test_sessionize_single_shuffle(spark):
    """Sessionization windows on user_id and rolls up on (user_id,
    session_seq): HashPartitioning(user_id) satisfies both, so the
    whole query must plan exactly ONE exchange."""
    p = plan(spark, "events_sessionize")
    assert p.count("Exchange") == 1, p
    assert "CartesianProduct" not in p


# ------------------------------------------------- round-4 additions (corpus)

def test_rebalance_broadcasts_lang_counts(spark):
    """corpus_rebalance_sample joins per-language counts back onto the
    scan: the counts side is tiny and MUST broadcast — shuffling the
    100 TB document side on lang would invert the cost model."""
    p = plan(spark, "corpus_rebalance_sample")
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p


def test_bigram_topk_is_take_ordered_with_partial_agg(spark):
    """Top-100 bigrams: partial+final count around one exchange, then
    TakeOrdered — never a global sort of the bigram distribution."""
    p = plan(spark, "text_bigram_topk")
    assert "TakeOrderedAndProject" in p, p
    assert p.count("HashAggregate") >= 2, p


def test_chunk_and_redact_are_shuffle_free(spark):
    """Per-row corpus passes (chunking, PII redaction) must plan ZERO
    exchanges — their throughput is scan throughput."""
    for name in ("chunk_fixed_windows", "text_pii_redact"):
        p = plan(spark, name)
        assert "Exchange" not in p, f"{name} shuffles:\n{p}"
        assert "BatchEvalPython" not in p, f"{name} uses row Python"


def test_scd2_single_shuffle(spark):
    """SCD-2 compaction windows, aggregates, and leads all on user_id:
    HashPartitioning(user_id) satisfies every stage — exactly ONE
    exchange."""
    p = plan(spark, "events_scd2_intervals")
    assert p.count("Exchange") == 1, p


def test_centroids_shuffle_carries_dims_not_vectors(spark):
    """embedding_centroids must partial-aggregate after posexplode so
    the exchange moves (label, pos) partials, and the final reassembly
    groups on label — two exchanges, both bounded by labels x dim."""
    p = plan(spark, "embedding_centroids")
    assert p.count("HashAggregate") >= 4, p  # partial+final at both levels
    assert "CartesianProduct" not in p


def test_anomaly_stats_join_is_broadcast(spark):
    """events_anomaly_zscore joins 5 rows of per-type stats onto the
    events scan: the stats side must broadcast; the fact side must not
    shuffle for the join."""
    p = plan(spark, "events_anomaly_zscore")
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p


def test_dup_rate_never_shuffles_text(spark):
    """corpus_dup_rate_by_source must fingerprint BEFORE the exchange:
    the shuffled row is (source, md5), never the document text."""
    p = plan(spark, "corpus_dup_rate_by_source")
    assert p.count("HashAggregate") >= 2, p
    # text is consumed by md5() inside the scan-side project; it must
    # not appear in any Exchange output schema
    import re
    for m in re.finditer(r"Exchange [^\n]*", p):
        assert "text" not in m.group(0), m.group(0)


def test_registry_wide_anti_pattern_sweep(spark):
    """EVERY registered query must be free of the two never-acceptable
    physical operators: CartesianProduct (unpruned pair blowup) and
    BatchEvalPython (row-at-a-time Python). Arrow-batched Python
    (MapInPandas) is permitted only in the multimodal decode kernels
    and the jar-free Avro decode (``kafka_avro_roundtrip_customer`` —
    explicitly a correctness gate, never a bench headliner). One named
    exception to the BatchEvalPython ban: ``udtf_word_ngrams`` exists
    precisely to pin the Python UDTF mechanism (UDTFs ARE row-Python
    by construction) and bounds itself to a deterministic 2% document
    slice. A Window with an EMPTY partition spec (``WindowExec: No
    Partition Defined``) moves the whole input through one task, so it
    is equally banned. A new query that regresses any of this fails
    here without needing its own targeted test."""
    import re

    from aether_firebase_consumer_spark.plans import REGISTRY, _load_all
    _load_all()
    # avro_container_scan (r15): the registered, oracle-gated twin of
    # the bench-only avro_container entry — it IS the jar-free Avro
    # container decode path (binaryFile → Arrow-batched container
    # parse), so MapInPandas is its whole point, same as the
    # correctness-gate roundtrip next to it.
    ARROW_PYTHON_OK = {"kafka_avro_roundtrip_customer",
                       "avro_container_scan"}
    ROW_PYTHON_OK = {"udtf_word_ngrams"}
    # the two-phase distributed prefix scan (operators/prefix.py) ends
    # with a window over BUCKET TOTALS — #buckets rows, not the input;
    # that bounded carry step is the fix for whole-input global
    # windows, not an instance of them
    BOUNDED_CARRY_WINDOW_OK = {"events_running_global_sum"}
    offenders = []
    for name in sorted(REGISTRY):
        p = plan(spark, name)
        if "CartesianProduct" in p:
            offenders.append((name, "CartesianProduct"))
        if "BatchEvalPython" in p and name not in ROW_PYTHON_OK:
            offenders.append((name, "BatchEvalPython"))
        if "MapInPandas" in p and not name.startswith("multimodal") \
                and name not in ARROW_PYTHON_OK:
            offenders.append((name, "MapInPandas"))
        for ln in p.splitlines():
            # a Window node prints "[functions], [partition], [order]",
            # omitting empty groups: 3 groups = partitioned+ordered;
            # 2 groups is partition-only (fine) unless the last group is
            # an order spec (ASC/DESC) — then the partition spec is
            # empty and the whole input funnels through one task
            if not re.search(r"(?:^|[\s)])Window \[", ln):
                continue
            groups = ln.split("], [")
            if len(groups) >= 3:
                continue
            last = groups[-1]
            if len(groups) < 2 or " ASC" in last or " DESC" in last:
                if name in BOUNDED_CARRY_WINDOW_OK and "_total" in ln:
                    continue  # the bounded carry window (see above)
                offenders.append(
                    (name, f"unpartitioned Window: {ln.strip()[:120]}"))
    assert not offenders, offenders
