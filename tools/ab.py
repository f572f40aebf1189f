"""Interleaved A/B timing of DataFrame variants in ONE Spark session.

Variants run round-robin (A, B, A, B, ...) after a joint warm-up, so
JIT/page-cache drift hits both sides equally — the only measurement
protocol that survived round-14's noise analysis (sequential best-of-3
flipped verdicts between runs; interleaved medians were stable).

Usage (from a driver script):

    from tools.ab import ab
    ab(spark, {"base": lambda: build_a(), "opt": lambda: build_b()},
       rounds=5)
"""

from __future__ import annotations

import statistics
import time


def _run(build) -> float:
    """Time BUILD + EXECUTE, like bench.py/qtime.py: the builder runs
    INSIDE the timed region. (The round-14 first version timed only the
    noop write — a variant containing an eager action (localCheckpoint,
    collect) moved its work into the untimed build and measured as a
    phantom 2-4x win that the real bench then contradicted.)"""
    t0 = time.time()
    build().write.mode("overwrite").format("noop").save()
    return time.time() - t0


def ab(spark, variants: "dict[str, callable]", rounds: int = 5,
       warmup: int = 2) -> "dict[str, list[float]]":
    names = list(variants)
    for _ in range(warmup):
        for n in names:
            _run(variants[n])
    times: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(rounds):
        for n in names:
            times[n].append(_run(variants[n]))
    for n in names:
        t = times[n]
        print(f"AB {n}: med={statistics.median(t):.3f} "
              f"min={min(t):.3f} runs=" + ",".join(f"{x:.3f}" for x in t))
    return times
