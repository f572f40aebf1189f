"""Benchmark runner (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Queries execute end-to-end via the "noop" sink — full plan execution
(scan→shuffle→agg) without driver-side collect, which is the honest
throughput measure at scale.

Protocol (pinned after round-2's phantom 1.47x "regression" turned out
to be machine noise): best-of-3 per query with a fixed shuffle-partition
count, plus a per-query "vs_prev" ratio against the latest BENCH_r*.json
in the repo root so environment swings are visible in the output itself.

DIFFERENTIAL PASS (round 12, after round 11's 1.11x drift proved
unadjudicable): any query whose vs_prev ratio crosses 1.25 is re-timed
IMMEDIATELY AFTER two flat CONTROL queries are re-timed in the same
process — the controls' own drift against their recorded baselines is
the box's live noise bar. A suspect whose best ratio (first pass vs
rerun) stays over the threshold even after dividing out the noise bar
is stamped "confirmed"; otherwise "noise". stdout carries only the
compact outcome ("confirmed_regressions" names + "noise_bar");
BENCH_DETAIL.json carries every suspect's first/rerun/adjusted/verdict
record, with a "sub_resolution" flag on queries whose absolute wall
time is below what this box can adjudicate (< 0.5 s).
"""

from __future__ import annotations

import glob
import json
import os
import re
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aether_firebase_consumer_spark.plans import REGISTRY, _load_all
from aether_firebase_consumer_spark.session import get_spark

HEADLINE = [
    "flagship_filter_mask_route",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q18_large_volume_customer",
    "join_fact_fact",
    "asof_join_events",
    "change_detection",
    "agg_stats",
]


def _tail_queries(tail: str) -> dict[str, float]:
    """Per-query timings regex-extracted from a TRUNCATED bench stdout
    tail. Round 8's single output line outgrew the driver's ~2 KB
    capture window, so its artifact recorded ``parsed: null`` — but the
    per-query map survives in ``tail``; anchoring to it instead of
    silently falling back to an older round keeps vs_prev meaning
    "vs LAST round" (VERDICT r9 item 1). Pairs after '"sf":' belong to
    the vs_prev ratio maps, not the timings. A name cut mid-token by
    the truncation cannot regex-match (the cut cannot fabricate the
    opening quote), so partial leading pairs drop out on their own."""
    seg = tail.split('"sf":')[0]
    pairs = [(m.group(1), float(m.group(2))) for m in
             re.finditer(r'"([A-Za-z0-9_]+)"\s*:\s*([0-9.]+)', seg)]
    return {k: v for k, v in pairs if k != "value"}


def _prev_bench(sf) -> tuple[int, dict[str, float]]:
    """(round, per-query timings) from the newest BENCH_r{N}.json
    beside this script (the driver's per-round record, bench output
    under "parsed"; truncated rounds recovered from "tail"), or
    (-1, {}) when none exists. Only rounds at the SAME sf are
    comparable — a different scale factor would make every ratio
    meaningless."""
    here = os.path.dirname(os.path.abspath(__file__))
    best_n, prev = -1, {}
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, json.JSONDecodeError):
            continue
        if isinstance(data.get("parsed"), dict):
            queries = data["parsed"].get("queries")
            sf_val = data.get("sf", data["parsed"].get("sf"))
        elif "tail" in data:  # driver artifact, stdout line truncated
            queries = _tail_queries(data.get("tail") or "")
            sf_val = data.get("sf")
        else:  # a bare bench.py output line saved as-is
            queries = data.get("queries")
            sf_val = data.get("sf")
        if sf_val != sf or not queries:
            continue
        if int(m.group(1)) > best_n:
            best_n, prev = int(m.group(1)), queries
    return best_n, prev


def _bench_avro_container(spark, sf_dir: str) -> float:
    """Time the jar-free .avro container scan (read_avro_container_py).

    Setup is untimed: 50k orders rows are written once as 8 Avro
    container files. The timed body is the distributed decode →
    noop sink, so a regression in the per-row Python decode path
    shows up here directly (VERDICT r4 item 7). Best of 3, like
    every other entry."""
    from aether_firebase_consumer_spark.sources.avro_codec import (
        read_avro_container_py,
        write_avro_dataset,
    )

    tmp = tempfile.mkdtemp(prefix="bench_avro_")
    try:
        src = (spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
               .select("o_orderkey", "o_custkey", "o_orderstatus",
                       "o_totalprice", "o_orderdate")
               .limit(50_000).repartition(8))
        write_avro_dataset(src, tmp, codec="null")
        best = None
        for _ in range(3):
            t0 = time.time()
            df = read_avro_container_py(spark, tmp)
            df.write.mode("overwrite").format("noop").save()
            elapsed = time.time() - t0
            best = elapsed if best is None else min(best, elapsed)
        return best
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# extension headliners are added as they land.
# CONVENTION: every new headline query joins this tuple in the SAME
# commit that registers it — round-over-round regression detection
# only covers what is benched here. tools/plan_audit.py imports
# headline_names() so PLANS.md always documents the full bench set.
EXTRA = ("dedup_minhash_lsh", "dedup_minhash_lsh_fast",
         "dedup_incremental_lsh",
         "dedup_incremental_lsh_pruned",
         "dedup_ngram_jaccard", "dedup_ngram_containment",
         "similarity_topk_cosine",
         "similarity_ann_ivf", "similarity_ann_pq",
         "similarity_ann_pq_trained", "similarity_ann_ivfadc",
         "text_quality_score",
         "docs_quality_filter", "embedding_kmeans",
         "kafka_roundtrip_orders",
         "similarity_embedding_neardup_hi",
         # r7 headliners
         "dedup_semantic_semdedup", "corpus_bpe_tokenize",
         "text_centroid_lang_classifier",
         "multimodal_flac_stats", "multimodal_webp_stats",
         "kafka_roundtrip_orders_compressed",
         # r8 headliners
         "kafka_txn_roundtrip_orders",
         "dedup_semantic_semdedup_trained",
         "kafka_headers_roundtrip_orders",
         # r9 headliners
         "similarity_ann_ivfadc_pruned",
         "quality_linear_probe_trained",
         # r10 headliners
         "multimodal_mp3_sideinfo_stats",
         "multimodal_id3_tags",
         "multimodal_vorbis_comment_stats",
         "docs_stats_skipped_scan",
         "docs_point_lookup_bloom",
         # r11 headliners
         "docs_change_feed_recorded",
         "docs_table_changes_source",
         "docs_metadata_rowcounts",
         "docs_incremental_agg",
         "dedup_editdist",
         "docs_incremental_agg_holistic",
         "docs_join_view",
         "docs_view_chain",
         # r12 headliners
         "docs_incremental_topk",
         "dedup_editdist_full",
         "docs_incremental_agg_hll",
         # r13 headliners
         "docs_view_chain_topk",
         "docs_hll_sketch_merge")


def headline_names() -> list[str]:
    """Every registry query bench.py times, in bench order.

    (The avro_container entry is not listed: it is a source-path
    micro-bench with untimed setup, not a registered query.)"""
    _load_all()
    return [n for n in (*HEADLINE, *EXTRA) if n in REGISTRY]


#: differential-pass knobs: the regression threshold, the two flat
#: CONTROL queries re-timed alongside every suspect (cheap, stable,
#: untouched for many rounds), and the headroom a suspect must keep
#: over the live noise bar to be called real
DIFF_THRESHOLD = 1.25
DIFF_CONTROLS = ("flagship_filter_mask_route", "join_fact_fact")
DIFF_HEADROOM = 1.15


def _time_query(spark, name: str, sf_dir: str) -> float:
    """Best-of-3 wall time of one registered query through the noop
    sink — the same measurement the main loop takes."""
    builder = REGISTRY[name].builder
    best = None
    for _ in range(3):
        t0 = time.time()
        df = builder(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        elapsed = time.time() - t0
        best = elapsed if best is None else min(best, elapsed)
    return best


def _differential(spark, sf_dir: str, vs_prev: dict[str, float],
                  prev: dict[str, float]) -> dict | None:
    """Adjudicate flagged regressions against live machine drift:
    re-time the controls (their drift vs recorded baseline = the
    box's CURRENT noise bar), then re-time each suspect; a suspect is
    "confirmed" only if its best ratio survives the threshold after
    dividing out the noise bar. Returns the full differential record
    for BENCH_DETAIL, or None when nothing was flagged."""
    suspects = [n for n, r in vs_prev.items()
                if r >= DIFF_THRESHOLD and n not in DIFF_CONTROLS
                and n in REGISTRY]
    if not suspects:
        return None
    controls = {}
    for c in DIFF_CONTROLS:
        if prev.get(c) and c in REGISTRY:
            controls[c] = round(
                _time_query(spark, c, sf_dir) / prev[c], 3)
    noise_bar = max(list(controls.values()) or [1.0])
    # when the CONTROLS themselves regressed past the threshold, the
    # box (or a shared code path every query rides) moved — dividing
    # suspects by that bar would silently absolve a genuinely global
    # regression as noise (round-12 ADVICE). Stamp the whole pass
    # inconclusive instead; the round review re-runs on an idle box.
    controls_regressed = noise_bar >= DIFF_THRESHOLD
    record = {"controls": controls,
              "noise_bar": round(noise_bar, 3),
              "controls_regressed": controls_regressed,
              "suspects": {}}
    for n in suspects:
        rerun_t = _time_query(spark, n, sf_dir)
        rerun = round(rerun_t / prev[n], 3)
        best = min(vs_prev[n], rerun)
        adjusted = round(best / max(noise_bar, 1.0), 3)
        verdict = ("confirmed"
                   if best >= DIFF_THRESHOLD
                   and adjusted >= DIFF_HEADROOM else "noise")
        entry = {"first": vs_prev[n], "rerun": rerun,
                 "adjusted": adjusted, "verdict": verdict}
        if max(rerun_t, prev[n]) < 0.5:
            # a 50 ms absolute delta on a 150 ms query reads as a
            # 1.33x ratio; this box's scheduler jitter alone is that
            # big. Below the machine's resolving power there is no
            # adjudication to be had — demote to noise outright
            # (round 12 reported docs_view_chain at 0.14 s absolute
            # as "confirmed", polluting the round-over-round signal).
            entry["sub_resolution"] = True
            entry["verdict"] = "noise"
        elif controls_regressed:
            entry["verdict"] = "inconclusive"
        record["suspects"][n] = entry
    return record


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # fixed shuffle-partition count: bench numbers must not drift with
    # the machine's core count
    spark = get_spark("bench", shuffle_partitions=32)

    names = headline_names()

    timings: dict[str, float] = {}
    for name in names:
        # best of 3: the first run pays JVM/codegen warmup that a
        # long-lived cluster never sees per-query; min() reports the
        # steady-state cost while still charging all real work.
        # 2-decimal stdout precision: 54 queries at 3 decimals pushed
        # the ONE output line past the driver's ~2 KB tail window;
        # BENCH_DETAIL.json keeps the 3-decimal record.
        timings[name] = round(_time_query(spark, name, sf_dir), 3)
    stdout_timings = {n: round(t, 2) for n, t in timings.items()}

    # source-path headliner: jar-free Avro container decode (setup untimed)
    timings["avro_container"] = round(_bench_avro_container(spark, sf_dir), 3)

    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    prev_round, prev = _prev_bench(sf_val)
    vs_prev = {n: round(t / prev[n], 2) for n, t in timings.items()
               if prev.get(n)}
    total = round(sum(timings.values()), 3)
    stdout_timings["avro_container"] = round(timings["avro_container"], 2)
    out = {
        "metric": "headline_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": stdout_timings,
        "sf": sf_val,
    }
    detail = dict(out)
    detail["queries"] = timings  # full 3-decimal record
    if vs_prev:
        # stamp WHICH round the ratios anchor to — r9's 0.81 silently
        # compared against r7 because r8's line was unparseable
        out["vs_prev_round"] = detail["vs_prev_round"] = prev_round
        # <1 faster than last round, >1 slower. The full per-query map
        # goes to BENCH_DETAIL.json only: round 8's single stdout line
        # (36 queries + a 27-entry vs_prev map) outgrew the driver's
        # ~2 KB tail-capture window and came back parsed:null
        # (VERDICT r8 item 1). stdout stays ONE compact line.
        detail["vs_prev"] = vs_prev
        prev_total = sum(prev[n] for n in timings if prev.get(n))
        out["vs_prev_total"] = detail["vs_prev_total"] = round(
            sum(timings[n] for n in timings if prev.get(n)) / prev_total, 2)
        # bounded: a contended run can push half the pool past 1.2x,
        # and an unbounded map blows the driver's ~2KB tail window —
        # keep the worst 5 (the full map is in BENCH_DETAIL.json)
        # top-3 (was 5): round 12's extra stdout keys (noise_bar,
        # confirmed_regressions) plus 3 new headliners left no room —
        # the full vs_prev map is in BENCH_DETAIL.json
        regressions = {n: r for n, r in sorted(
            vs_prev.items(), key=lambda kv: -kv[1])[:3] if r >= 1.2}
        diff = _differential(spark, sf_dir, vs_prev, prev)
        if diff is not None:
            detail["differential"] = diff
            out["noise_bar"] = diff["noise_bar"]
            # stdout stays under the driver's ~2 KB tail window: only
            # the CONFIRMED names ride the line (usually an empty
            # list); every suspect's first/rerun/adjusted/verdict
            # record is in BENCH_DETAIL.json. Suspects the pass
            # ADJUDICATED leave the raw ratio map (round 13: both maps
            # together pushed the line to 2039 B), but the
            # 1.2–1.25 band was never adjudicated — those entries
            # still ride, or previous rounds' visibility regresses.
            out["confirmed_regressions"] = sorted(
                n for n, d in diff["suspects"].items()
                if d["verdict"] == "confirmed")[:3]
            if diff.get("controls_regressed"):
                # the pass could not adjudicate: the controls moved
                out["controls_regressed"] = True
            regressions = {n: r for n, r in regressions.items()
                           if n not in diff["suspects"]}
        if regressions:
            out["regressions"] = regressions
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_DETAIL.json"), "w") as fh:
        json.dump(detail, fh, indent=1)
    print(_compact_line(out))


#: the driver captures ~2 KB of stdout tail; the gate enforces
#: < 2000 B. Leave headroom for the next few rounds' new headliners.
_LINE_BUDGET = 1950

#: optional keys dropped IN ORDER if the line still overflows (the
#: full record is always in BENCH_DETAIL.json). confirmed_regressions
#: drops LAST: it is the one alarm the protocol exists to surface —
#: inert context keys go first.
_DROP_ORDER = ("regressions", "vs_prev_round", "noise_bar",
               "confirmed_regressions")


def _compact_line(out: dict) -> str:
    """ONE stdout line under the driver's tail window, whatever this
    round's optional keys came to: drop optional keys worst-first
    until it fits. The mandatory contract keys (metric/value/unit/
    queries/sf) are never dropped — if the queries map ALONE outgrows
    the window some round, the driver's `_tail_queries` recovery
    still reconstructs it from the truncated tail."""
    line = json.dumps(out, separators=(",", ":"))
    for key in _DROP_ORDER:
        if len(line) < _LINE_BUDGET:
            break
        if key in out:
            out = {k: v for k, v in out.items() if k != key}
            line = json.dumps(out, separators=(",", ":"))
    return line


if __name__ == "__main__":
    main()
