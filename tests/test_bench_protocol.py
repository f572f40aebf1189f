"""Differential-pass adjudication rules in bench.py (round 13).

Pins the two protocol fixes from the round-12 review:

1. sub_resolution demotion — a suspect whose absolute wall time is
   below the box's resolving power (< 0.5 s) can NEVER be stamped
   "confirmed"; round 12 reported docs_view_chain at 0.14 s as a
   confirmed regression, polluting the round-over-round signal.
2. controls_regressed — when the CONTROL queries themselves drift
   past DIFF_THRESHOLD, the box (or a shared path) moved; dividing
   suspects by that bar would absolve a global regression as noise.
   The pass stamps itself inconclusive instead (round-12 ADVICE).

Pure-Python: _time_query is monkeypatched, no SparkSession.
"""

from __future__ import annotations

import bench


def _run_diff(monkeypatch, *, times: dict[str, float],
              vs_prev: dict[str, float], prev: dict[str, float]):
    monkeypatch.setattr(bench, "REGISTRY",
                        {n: object() for n in {*times, *vs_prev, *prev}})
    monkeypatch.setattr(bench, "_time_query",
                        lambda spark, name, sf_dir: times[name])
    return bench._differential(None, "sf_dir", vs_prev, prev)


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
