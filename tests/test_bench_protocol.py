"""Differential-pass adjudication rules in bench.py (rounds 13-14).

Pins the protocol fixes from the round-12 and round-13 reviews:

1. sub_resolution demotion — a suspect whose absolute wall time is
   below the box's resolving power can NEVER be stamped "confirmed";
   round 12 reported docs_view_chain at 0.14 s as a confirmed
   regression, polluting the round-over-round signal. Round 14 raised
   the bar 0.5 s -> 1.0 s after r13 stamped sub-second scheduler
   jitter (corpus_bpe_tokenize 0.40-0.84 s swings) "confirmed".
2. controls_regressed — when the CONTROL queries themselves drift
   past DIFF_THRESHOLD, the box (or a shared path) moved; dividing
   suspects by that bar would absolve a global regression as noise.
   The pass stamps itself inconclusive instead (round-12 ADVICE).
3. 2-of-3 vote (round 14) — suspects in the 1-2 s band get a SECOND
   interleaved rerun; at least 2 of the 3 ratio observations must
   independently cross the threshold before "confirmed".
4. calibration ratio (round 14) — the pure-JVM probe's
   round-over-round ratio joins the controls in the noise bar, so a
   box-speed shift has a query-independent witness.

Pure-Python: _time_query is monkeypatched, no SparkSession.
"""

from __future__ import annotations

import bench


def _run_diff(monkeypatch, *, times: dict, vs_prev: dict[str, float],
              prev: dict[str, float], calib_ratio=None):
    """times values may be floats (every timing identical) or lists
    (consumed in call order; the last value repeats), so the rerun
    sweeps can observe different wall times per pass."""
    state = {n: list(v) if isinstance(v, list) else [v]
             for n, v in times.items()}

    def fake_time(spark, name, sf_dir):
        vals = state[name]
        return vals.pop(0) if len(vals) > 1 else vals[0]

    monkeypatch.setattr(bench, "REGISTRY",
                        {n: object() for n in {*times, *vs_prev, *prev}})
    monkeypatch.setattr(bench, "_time_query", fake_time)
    return bench._differential(None, "sf_dir", vs_prev, prev,
                               calib_ratio=calib_ratio)


def test_confirmed_when_controls_flat(monkeypatch):
    c1, c2 = bench.DIFF_CONTROLS
    rec = _run_diff(
        monkeypatch,
        times={c1: 1.0, c2: 1.0, "slow_q": 3.0},
        vs_prev={"slow_q": 1.5},
        prev={c1: 1.0, c2: 1.0, "slow_q": 2.0})
    assert rec["controls_regressed"] is False
    entry = rec["suspects"]["slow_q"]
    assert entry["verdict"] == "confirmed"
    assert "sub_resolution" not in entry


def test_sub_resolution_always_noise(monkeypatch):
    """Even a huge ratio on a tiny query is noise: 0.1 s -> 0.2 s is
    a 2.0x ratio but a 100 ms absolute delta, below scheduler
    jitter."""
    c1, c2 = bench.DIFF_CONTROLS
    rec = _run_diff(
        monkeypatch,
        times={c1: 1.0, c2: 1.0, "tiny_q": 0.2},
        vs_prev={"tiny_q": 2.0},
        prev={c1: 1.0, c2: 1.0, "tiny_q": 0.1})
    entry = rec["suspects"]["tiny_q"]
    assert entry["sub_resolution"] is True
    assert entry["verdict"] == "noise"


def test_controls_regressed_makes_pass_inconclusive(monkeypatch):
    """Controls drifting past DIFF_THRESHOLD mark the record and turn
    every would-be verdict (except sub_resolution noise) into
    "inconclusive" — never "noise" via the inflated bar."""
    c1, c2 = bench.DIFF_CONTROLS
    rec = _run_diff(
        monkeypatch,
        times={c1: 1.4, c2: 1.3, "slow_q": 2.6},
        vs_prev={"slow_q": 1.3},
        prev={c1: 1.0, c2: 1.0, "slow_q": 2.0})
    assert rec["controls_regressed"] is True
    assert rec["noise_bar"] >= bench.DIFF_THRESHOLD
    assert rec["suspects"]["slow_q"]["verdict"] == "inconclusive"


def test_compact_line_drops_optional_keys_to_fit():
    """The stdout line must stay under the driver's ~2 KB tail window
    (gate: < 2000 B) whatever optional keys a loaded round produces —
    round 13's gate caught a 2039 B line with both the raw ratio map
    and the differential keys aboard. Optional keys drop worst-first;
    the mandatory contract keys never do."""
    import json

    out = {"metric": "headline_query_wall_seconds", "value": 60.0,
           "unit": "sec",
           "queries": {f"query_name_{i:03d}": 1.23 for i in range(52)},
           "sf": 0.1,
           "vs_prev_round": 12, "vs_prev_total": 1.0,
           "regressions": {f"long_regressed_query_{i}": 1.83
                           for i in range(3)},
           "noise_bar": 0.775,
           "confirmed_regressions": [f"long_confirmed_query_{i}"
                                     for i in range(3)]}
    line = bench._compact_line(dict(out))
    assert len(line) < 2000
    parsed = json.loads(line)
    assert {"metric", "value", "queries", "sf"} <= set(parsed)
    assert len(parsed["queries"]) == 52
    # small dicts pass through untouched
    small = {"metric": "m", "value": 1, "unit": "sec",
             "queries": {"q": 1.0}, "sf": 0.1, "noise_bar": 1.0}
    assert json.loads(bench._compact_line(dict(small))) == small


def test_noise_when_rerun_clears(monkeypatch):
    """A suspect whose rerun lands back under the threshold is noise
    (best-of ratio logic unchanged by the round-13 edits)."""
    c1, c2 = bench.DIFF_CONTROLS
    rec = _run_diff(
        monkeypatch,
        times={c1: 1.0, c2: 1.0, "was_loaded": 2.1},
        vs_prev={"was_loaded": 1.5},
        prev={c1: 1.0, c2: 1.0, "was_loaded": 2.0})
    assert rec["suspects"]["was_loaded"]["verdict"] == "noise"


def test_sub_resolution_bar_is_one_second(monkeypatch):
    """Round 14: a 0.6 s -> 0.84 s swing (ratio 1.4) is scheduler
    jitter on this box — under the old 0.5 s bar it would have been
    adjudicated; under the 1.0 s bar it is demoted outright."""
    c1, c2 = bench.DIFF_CONTROLS
    rec = _run_diff(
        monkeypatch,
        times={c1: 1.0, c2: 1.0, "bpe_like": 0.84},
        vs_prev={"bpe_like": 1.4},
        prev={c1: 1.0, c2: 1.0, "bpe_like": 0.6})
    entry = rec["suspects"]["bpe_like"]
    assert entry["sub_resolution"] is True
    assert entry["verdict"] == "noise"


def test_two_of_three_single_spike_is_noise(monkeypatch):
    """A 1-2 s suspect gets a second interleaved rerun; one clean
    observation caps the minimum below the headroom bar, so a
    first-pass spike plus ONE elevated rerun cannot confirm — the
    exact shape of r13's phantom driver-box regressions."""
    c1, c2 = bench.DIFF_CONTROLS
    # prev 1.5 s; reruns 2.1 s (1.4x) then 1.65 s (1.1x)
    rec = _run_diff(
        monkeypatch,
        times={c1: 1.0, c2: 1.0, "sub2s_q": [2.1, 1.65]},
        vs_prev={"sub2s_q": 1.4},
        prev={c1: 1.0, c2: 1.0, "sub2s_q": 1.5})
    entry = rec["suspects"]["sub2s_q"]
    assert entry["rerun2"] == 1.1
    assert entry["hits"] == 2  # first + rerun1 over threshold...
    # ...but the clean rerun2 drags min(obs) under DIFF_HEADROOM
    assert entry["adjusted"] == 1.1
    assert entry["verdict"] == "noise"


def test_two_of_three_consistent_elevation_confirms(monkeypatch):
    """All three observations elevated -> a genuine sub-2 s
    regression still confirms under the stricter vote."""
    c1, c2 = bench.DIFF_CONTROLS
    # prev 1.5 s; reruns 2.03 s (1.353x) and 1.95 s (1.3x)
    rec = _run_diff(
        monkeypatch,
        times={c1: 1.0, c2: 1.0, "sub2s_q": [2.03, 1.95]},
        vs_prev={"sub2s_q": 1.4},
        prev={c1: 1.0, c2: 1.0, "sub2s_q": 1.5})
    entry = rec["suspects"]["sub2s_q"]
    assert entry["hits"] == 3
    assert entry["verdict"] == "confirmed"


def test_over_two_seconds_keeps_single_rerun_rule(monkeypatch):
    """Suspects at >= 2 s absolute stay on the round-12 rule: no
    second rerun is taken (no "rerun2"/"hits" keys) and min(first,
    rerun) over the threshold confirms."""
    c1, c2 = bench.DIFF_CONTROLS
    rec = _run_diff(
        monkeypatch,
        times={c1: 1.0, c2: 1.0, "big_q": 4.2},
        vs_prev={"big_q": 1.5},
        prev={c1: 1.0, c2: 1.0, "big_q": 3.0})
    entry = rec["suspects"]["big_q"]
    assert "rerun2" not in entry and "hits" not in entry
    assert entry["verdict"] == "confirmed"


def test_calib_ratio_raises_noise_bar(monkeypatch):
    """A slower box shows up in the pure-JVM probe; its ratio joins
    the controls in the noise bar and absolves a matching query
    drift even when the controls happen to read flat."""
    c1, c2 = bench.DIFF_CONTROLS
    rec = _run_diff(
        monkeypatch,
        times={c1: 1.0, c2: 1.0, "big_q": 4.05},
        vs_prev={"big_q": 1.35},
        prev={c1: 1.0, c2: 1.0, "big_q": 3.0},
        calib_ratio=1.2)
    assert rec["calib_ratio"] == 1.2
    assert rec["noise_bar"] == 1.2
    entry = rec["suspects"]["big_q"]
    # min obs 1.35 / bar 1.2 = 1.125 < DIFF_HEADROOM -> noise
    assert entry["verdict"] == "noise"


def test_calib_regression_makes_pass_inconclusive(monkeypatch):
    """The probe drifting past DIFF_THRESHOLD means the box itself
    moved — same inconclusive stamp as regressed controls."""
    c1, c2 = bench.DIFF_CONTROLS
    rec = _run_diff(
        monkeypatch,
        times={c1: 1.0, c2: 1.0, "big_q": 4.2},
        vs_prev={"big_q": 1.5},
        prev={c1: 1.0, c2: 1.0, "big_q": 3.0},
        calib_ratio=1.3)
    assert rec["controls_regressed"] is True
    assert rec["suspects"]["big_q"]["verdict"] == "inconclusive"


def test_tail_calib_extraction():
    """calib sits after "sf" on the stdout line: _tail_queries must
    never absorb it into the timings map, and _tail_calib must
    recover it from a truncated tail."""
    tail = ('{"metric":"headline_query_wall_seconds","value":60.0,'
            '"unit":"sec","queries":{"q1":1.23,"q2":0.5},"sf":0.1,'
            '"calib":0.87,"vs_prev_round":13}')
    assert bench._tail_queries(tail) == {"q1": 1.23, "q2": 0.5}
    assert bench._tail_calib(tail) == 0.87
    assert bench._tail_calib(tail[:tail.index("calib") - 1]) is None


def test_closing_control_sweep_catches_tail_degradation(monkeypatch):
    """Round-14 rule 5: the controls are re-timed AFTER the suspect
    reruns; a process that degrades late (plan-accumulation GC
    pressure) shows flat controls at the opening sweep but elevated
    ones at the close — the pass must then stamp inconclusive, not
    promote the tail-inflated reruns to "confirmed". (Observed live:
    docs_stats_skipped_scan reruns at 1.42x/2.46x/2.87x inside the
    bench tail, 1.1x in a fresh same-tree process.)"""
    c1, c2 = bench.DIFF_CONTROLS
    rec = _run_diff(
        monkeypatch,
        # call order per control: opening sweep then closing sweep
        times={c1: [1.0, 1.6], c2: [1.0, 1.5], "slow_q": [3.2, 3.4]},
        vs_prev={"slow_q": 1.55},
        prev={c1: 1.0, c2: 1.0, "slow_q": 2.0})
    assert rec["controls"] == {c1: 1.0, c2: 1.0}
    assert rec["controls_close"] == {c1: 1.6, c2: 1.5}
    assert rec["controls_regressed"] is True
    assert rec["noise_bar"] >= bench.DIFF_THRESHOLD
    assert rec["suspects"]["slow_q"]["verdict"] == "inconclusive"


def test_closing_control_sweep_flat_keeps_confirmed(monkeypatch):
    """A genuinely regressed suspect with FLAT controls at both
    sweeps still confirms — the closing sweep only raises the bar
    when the process itself moved."""
    c1, c2 = bench.DIFF_CONTROLS
    rec = _run_diff(
        monkeypatch,
        times={c1: 1.0, c2: 1.0, "slow_q": 3.0},
        vs_prev={"slow_q": 1.5},
        prev={c1: 1.0, c2: 1.0, "slow_q": 2.0})
    assert rec["controls_close"] == {c1: 1.0, c2: 1.0}
    assert rec["controls_regressed"] is False
    assert rec["suspects"]["slow_q"]["verdict"] == "confirmed"
