"""Render a scale-probe JSON line into SCALE.md — the measured
100×-readiness artifact: per-query wall time at sf0.001/0.01/0.1 and
the fitted top-decade growth exponent, sorted worst-first.

Usage:
    PYTHONPATH=/root/repo python tools/scale_probe.py <queries...> \
        | tail -1 > /tmp/probe.json
    python tools/scale_report.py /tmp/probe.json
"""

from __future__ import annotations

import json
import os
import sys


def main(path: str) -> None:
    with open(path) as fh:
        lines = [ln for ln in fh.read().splitlines() if ln.strip()]
    data = json.loads(lines[-1])["queries"]
    rows = sorted(data.items(),
                  key=lambda kv: -(kv[1].get("slope_top_decade") or 0))
    out = [
        "# SCALE — measured growth exponents (full registry)",
        "",
        f"Generated from `tools/scale_probe.py` over **{len(rows)} "
        "registered queries** at sf0.001 / 0.01 / 0.1 (100× data "
        "across the range; best-of-2 per point). `slope` is the "
        "log-log exponent over the TOP decade (sf0.01→0.1), where "
        "fixed overhead matters least: ~1.0 = linear scaling, "
        "**>1.5 flags a hidden quadratic**, ~0 = overhead-dominated "
        "at these sizes (the fixture is too small to stress the "
        "query). Sorted worst-first so regressions surface at the "
        "top.",
        "",
        "| query | sf0.001 s | sf0.01 s | sf0.1 s | slope |",
        "|---|---|---|---|---|",
    ]
    flagged = []
    for name, d in rows:
        sec = d["sec"]
        slope = d.get("slope_top_decade")
        mark = " ⚠" if slope is not None and slope > 1.5 else ""
        if mark:
            flagged.append(name)
        out.append(f"| `{name}`{mark} | {sec.get('0.001', '')} "
                   f"| {sec.get('0.01', '')} | {sec.get('0.1', '')} "
                   f"| {slope} |")
    out.insert(4, "")
    out.insert(5, f"**Queries over the 1.5 threshold: "
               f"{len(flagged)}**" + (f" — {flagged}" if flagged else
                                      " — none."))
    dest = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALE.md")
    with open(dest, "w") as fh:
        fh.write("\n".join(out) + "\n")
    print(f"wrote SCALE.md ({len(rows)} queries, {len(flagged)} flagged)")


if __name__ == "__main__":
    main(sys.argv[1])
