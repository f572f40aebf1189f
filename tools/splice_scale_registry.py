"""Splice a fresh full-registry scale-probe JSON into SCALE.md's
'Full registry at the driver decades' section, preserving everything
above it (the sf1 deep-dive narrative that scale_report.py would
destroy — see the round-9 note in the memory checklist).

Usage: PYTHONPATH=/root/repo python tools/splice_scale_registry.py \
           /tmp/scale_full.json "round 10"
The JSON is tools/scale_probe.py's output line:
{"queries": {name: {"sec": {"0.001": s, ...}, "slope_top_decade": x}}}.
"""

from __future__ import annotations

import json
import os
import sys

HEADER = "## Full registry at the driver decades"


def main() -> None:
    path, round_tag = sys.argv[1], sys.argv[2]
    with open(path) as fh:
        raw = json.load(fh)["queries"]
    data = {q: {**v["sec"], "slope": v["slope_top_decade"]}
            for q, v in raw.items()}
    scale_md = os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "SCALE.md")
    with open(scale_md) as fh:
        head = fh.read().split(HEADER)[0]

    rows = sorted(data.items(), key=lambda kv: -kv[1]["slope"])
    over = [q for q, v in rows if v["slope"] > 1.5]
    worst_q, worst = rows[0]
    lines = [
        HEADER, "",
        f"Re-probed in ONE {round_tag} session over the complete "
        f"current registry ({len(rows)} queries, best-of-2 per point, "
        "sf0.001/0.01/0.1 — the sf1 sections above are the "
        "heavy-family deep dives). **Queries over the 1.5 threshold: "
        f"{len(over)}** — "
        + (", ".join(over) if over else "none")
        + f"; worst slope {worst['slope']} (`{worst_q}`).", "",
        "| query | sf0.001 s | sf0.01 s | sf0.1 s | slope |",
        "|---|---|---|---|---|",
    ]
    for q, v in rows:
        lines.append(f"| `{q}` | {v['0.001']} | {v['0.01']} | "
                     f"{v['0.1']} | {v['slope']} |")
    lines += [
        "",
        "(The persisted-index probe queries' absolute times include "
        "building their scratch index tables once per process — a "
        "harness cost; the streaming jobs maintain the tables "
        "incrementally. Fixed-overhead-dominated queries show slopes "
        "near 0 — visible and honest.)",
        "",
    ]
    with open(scale_md, "w") as fh:
        fh.write(head + "\n".join(lines))
    print(f"spliced {len(rows)} rows into SCALE.md "
          f"({len(over)} over threshold)")


if __name__ == "__main__":
    main()
