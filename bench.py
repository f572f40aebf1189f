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
time is below what this box can adjudicate.

ROUND-14 HARDENING (after the r13 driver run stamped three phantom
"confirmed" regressions a same-tree idle rerun contradicted):

1. WARM-UP PASS. The whole headline list runs once UNTIMED before the
   timed loop. Measured cause: a fresh JVM pays a 3-13x first-run
   penalty that decays over MANY iterations, not 3 (dedup_minhash_lsh
   on an idle box: 12.2 -> 3.7 -> 3.6 -> 3.1 -> 2.7 -> ~2.8 steady;
   corpus_bpe_tokenize 5.0 -> 0.8), so best-of-3 lands at a
   position-in-run-dependent warmth, and the r13 driver run's
   late-pass controls read 0.50x/0.74x of their own early-loop
   baselines — a ~1.3-2x thermal gradient across one run. The
   warm-up puts every timed measurement in the same deep-warm state,
   which is both the honest long-lived-cluster number and the only
   state two rounds can compare across.
2. CALIBRATION PROBE. A fixed pure-JVM job (bit_xor of xxhash64 over
   a 2B-row range, no I/O) is timed best-of-3 after warm-up and
   recorded on the stdout line ("calib"); the ratio vs the previous
   round's probe joins the controls in the noise bar, so a
   box-speed shift has a named, query-independent witness.
3. SUB-RESOLUTION bar raised 0.5 s -> 1.0 s: sub-second swings on
   this box (corpus_bpe_tokenize 0.40-0.84 s across same-session
   runs) are scheduler jitter, not signal.
4. 2-OF-3 FOR SUB-2 s SUSPECTS. A suspect whose absolute time is
   1-2 s gets a SECOND rerun in a separate interleaved sweep; at
   least 2 of the 3 ratio observations (first pass + both reruns)
   must independently cross the threshold — and the minimum
   observation must still clear the headroom-adjusted bar — before
   "confirmed".
5. CLOSING CONTROL SWEEP. The controls are re-timed again AFTER the
   suspect reruns and the larger reading joins the noise bar: the
   rerun passes execute at the very end of a process that has built
   hundreds of plans, where driver GC pressure inflates everything
   (measured: a query's in-tail reruns at 1.4-2.9x while a fresh
   same-tree process sat at 1.1x). A bar measured mid-run cannot
   adjudicate tail-of-run suspects; if the closing controls drifted
   past the threshold the pass is inconclusive, not confirmed.
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


def _tail_calib(tail: str) -> float | None:
    """The calibration-probe seconds from a truncated stdout tail.
    "calib" sits AFTER "sf" on the line, so `_tail_queries` never
    sees it; a tail cut before the key simply yields None."""
    m = re.search(r'"calib"\s*:\s*([0-9.]+)', tail)
    return float(m.group(1)) if m else None


def _prev_bench(sf) -> tuple[int, dict[str, float], float | None]:
    """(round, per-query timings, calibration seconds) from the newest
    BENCH_r{N}.json beside this script (the driver's per-round record,
    bench output under "parsed"; truncated rounds recovered from
    "tail"), or (-1, {}, None) when none exists. Only rounds at the
    SAME sf are comparable — a different scale factor would make every
    ratio meaningless. calib is None for rounds before the probe
    existed (pre-r14)."""
    here = os.path.dirname(os.path.abspath(__file__))
    best_n, prev, prev_calib = -1, {}, None
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
            calib = data["parsed"].get("calib")
        elif "tail" in data:  # driver artifact, stdout line truncated
            queries = _tail_queries(data.get("tail") or "")
            sf_val = data.get("sf")
            calib = _tail_calib(data.get("tail") or "")
        else:  # a bare bench.py output line saved as-is
            queries = data.get("queries")
            sf_val = data.get("sf")
            calib = data.get("calib")
        if sf_val != sf or not queries:
            continue
        if int(m.group(1)) > best_n:
            best_n, prev, prev_calib = int(m.group(1)), queries, calib
    return best_n, prev, prev_calib


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
         "docs_hll_sketch_merge",
         # r14 headliners
         "docs_quantile_sketch",
         # r15 headliners: the adjudicable twin of the bench-only
         # avro_container entry (VERDICT r14 #9) — the differential
         # can rerun THIS one; the legacy entry stays for continuity
         "avro_container_scan")


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
#: below this absolute wall time the box cannot adjudicate at all —
#: raised from 0.5 s after r13 stamped sub-second scheduler jitter
#: (corpus_bpe_tokenize 0.40-0.84 s same-session swings) "confirmed"
SUB_RESOLUTION_SEC = 1.0
#: suspects between the resolution floor and this bar get a SECOND
#: interleaved rerun and a 2-of-3 vote before "confirmed"
TWO_OF_THREE_BELOW_SEC = 2.0
#: calibration probe size: ~0.9 s steady-state on the 32-thread dev
#: box — pure codegen over range(), no I/O, no Python workers
CALIB_ROWS = 2_000_000_000


def _warmup(spark, sf_dir: str, names: list[str]) -> float:
    """One UNTIMED pass of every headline query. JVM JIT tiers, the
    codegen cache, Python worker pools, and the page cache all warm
    over MANY iterations (measured: dedup_minhash_lsh 12.2 s on its
    first-ever run in a fresh JVM, ~2.8 s deep-warm; the decay takes
    ~5 iterations of itself), so without this pass each query's
    best-of-3 lands at a warmth set by its POSITION in the run — the
    r13 driver-box "regressions" were exactly that gradient. Returns
    elapsed seconds (recorded in BENCH_DETAIL, never in the total)."""
    t0 = time.time()
    for name in names:
        df = REGISTRY[name].builder(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
    return time.time() - t0


def _calibrate(spark) -> float:
    """Best-of-3 of a fixed pure-JVM probe (bit_xor of xxhash64 over a
    CALIB_ROWS range: whole-stage codegen, zero I/O, zero Python).
    Its round-over-round ratio is a query-independent witness of box
    speed: if the probe moved, the box moved, and the differential
    pass folds that into the noise bar. One untimed run first — the
    probe pays its own codegen warmup like any query."""
    from pyspark.sql import functions as F

    def probe() -> None:
        (spark.range(0, CALIB_ROWS, 1, 32)
         .select(F.bit_xor(F.xxhash64("id", F.shiftright("id", 7)))
                 .alias("h"))
         .write.mode("overwrite").format("noop").save())

    probe()
    best = None
    for _ in range(3):
        t0 = time.time()
        probe()
        elapsed = time.time() - t0
        best = elapsed if best is None else min(best, elapsed)
    return best


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
                  prev: dict[str, float],
                  calib_ratio: float | None = None) -> dict | None:
    """Adjudicate flagged regressions against live machine drift:
    re-time the controls (their drift vs recorded baseline — joined
    by the calibration-probe ratio when the previous round recorded
    one — is the box's CURRENT noise bar), then re-time each suspect;
    a suspect is "confirmed" only if its ratio observations survive
    the threshold after dividing out the noise bar. Suspects whose
    absolute time sits in the 1-2 s band get a SECOND rerun in a
    separate interleaved sweep and must win a 2-of-3 vote. Returns
    the full differential record for BENCH_DETAIL, or None when
    nothing was flagged."""
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
    bar_candidates = list(controls.values())
    if calib_ratio is not None:
        bar_candidates.append(calib_ratio)
    noise_bar = max(bar_candidates or [1.0])
    # when the CONTROLS themselves (or the pure-JVM probe) regressed
    # past the threshold, the box — or a shared code path every query
    # rides — moved; dividing suspects by that bar would silently
    # absolve a genuinely global regression as noise (round-12
    # ADVICE). Stamp the whole pass inconclusive instead; the round
    # review re-runs on an idle box.
    controls_regressed = noise_bar >= DIFF_THRESHOLD
    record = {"controls": controls,
              "noise_bar": round(noise_bar, 3),
              "controls_regressed": controls_regressed,
              "suspects": {}}
    if calib_ratio is not None:
        record["calib_ratio"] = round(calib_ratio, 3)
    # pass A: one rerun per suspect
    rerun_t = {n: _time_query(spark, n, sf_dir) for n in suspects}
    # pass B: a second rerun for every suspect whose BASELINE
    # magnitude is sub-2 s (a spiked rerun must not promote a small
    # query out of the band), swept SEPARATELY so one query's two
    # reruns never run back-to-back — a transient load spike can't
    # hit both. Sub-resolution suspects are excluded: they are
    # demoted to noise unconditionally below.
    second = [n for n in suspects
              if prev[n] < TWO_OF_THREE_BELOW_SEC
              and max(rerun_t[n], prev[n]) >= SUB_RESOLUTION_SEC]
    rerun2_t = {n: _time_query(spark, n, sf_dir) for n in second}
    # pass C (round 14, closing sweep): the controls are re-timed a
    # SECOND time AFTER the rerun sweeps and the larger reading joins
    # the bar. The opening bar is measured mid-run; by the time the
    # reruns execute, the bench process is at its oldest and most
    # plan-polluted (hundreds of accumulated query plans -> driver GC
    # pressure), and a bar measured earlier understates the live
    # noise. Observed on this tree: docs_stats_skipped_scan reruns
    # read 1.42x/2.46x/2.87x INSIDE the bench tail while a fresh
    # process measured 0.58 s (1.1x) — a phantom "confirmed" the
    # opening-only bar could not catch. If the closing controls have
    # drifted past the threshold, the process itself moved and the
    # pass stamps inconclusive, same rule as the opening controls.
    controls_close = {}
    for c in DIFF_CONTROLS:
        if prev.get(c) and c in REGISTRY:
            controls_close[c] = round(
                _time_query(spark, c, sf_dir) / prev[c], 3)
    if controls_close:
        record["controls_close"] = controls_close
        noise_bar = max([noise_bar] + list(controls_close.values()))
        record["noise_bar"] = round(noise_bar, 3)
        controls_regressed = noise_bar >= DIFF_THRESHOLD
        record["controls_regressed"] = controls_regressed
    for n in suspects:
        rerun = round(rerun_t[n] / prev[n], 3)
        obs = [vs_prev[n], rerun]
        entry = {"first": vs_prev[n], "rerun": rerun}
        if n in rerun2_t:
            rerun2 = round(rerun2_t[n] / prev[n], 3)
            obs.append(rerun2)
            entry["rerun2"] = rerun2
            entry["hits"] = sum(o >= DIFF_THRESHOLD for o in obs)
        best = min(obs)
        adjusted = round(best / max(noise_bar, 1.0), 3)
        entry["adjusted"] = adjusted
        if n in rerun2_t:
            # 2-of-3 vote: at least two independent observations over
            # the threshold, and even the BEST observation must clear
            # the headroom-adjusted bar
            confirmed = (entry["hits"] >= 2
                         and adjusted >= DIFF_HEADROOM)
        else:
            confirmed = (best >= DIFF_THRESHOLD
                         and adjusted >= DIFF_HEADROOM)
        entry["verdict"] = "confirmed" if confirmed else "noise"
        if max(rerun_t[n], prev[n]) < SUB_RESOLUTION_SEC:
            # a 150 ms absolute delta on a 500 ms query reads as a
            # 1.3x ratio; this box's scheduler jitter alone is that
            # big (measured 0.40-0.84 s same-session swings on
            # corpus_bpe_tokenize). Below the machine's resolving
            # power there is no adjudication to be had — demote to
            # noise outright.
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

    # untimed deep-warm pass + box-speed probe (round-14 protocol —
    # see the module docstring); both recorded in BENCH_DETAIL
    warmup_sec = _warmup(spark, sf_dir, names)
    calib_sec = _calibrate(spark)

    timings: dict[str, float] = {}
    for name in names:
        # best of 3 from a deep-warm state: min() reports the
        # steady-state cost a long-lived cluster sees while still
        # charging all real work.
        # 2-decimal stdout precision: 54 queries at 3 decimals pushed
        # the ONE output line past the driver's ~2 KB tail window;
        # BENCH_DETAIL.json keeps the 3-decimal record.
        timings[name] = round(_time_query(spark, name, sf_dir), 3)
    stdout_timings = {n: round(t, 2) for n, t in timings.items()}

    # source-path headliner: jar-free Avro container decode (setup untimed)
    timings["avro_container"] = round(_bench_avro_container(spark, sf_dir), 3)

    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    prev_round, prev, prev_calib = _prev_bench(sf_val)
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
        # AFTER "sf" on purpose: _tail_queries splits the truncated
        # tail at "sf" — calib must never leak into the timings map
        "calib": round(calib_sec, 2),
    }
    detail = dict(out)
    detail["queries"] = timings  # full 3-decimal record
    detail["calib_sec"] = round(calib_sec, 3)
    detail["warmup_sec"] = round(warmup_sec, 3)
    calib_ratio = (round(calib_sec / prev_calib, 3)
                   if prev_calib else None)
    if calib_ratio is not None:
        detail["calib_ratio"] = calib_ratio
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
        diff = _differential(spark, sf_dir, vs_prev, prev,
                             calib_ratio=calib_ratio)
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
_DROP_ORDER = ("regressions", "vs_prev_round", "noise_bar", "calib",
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
