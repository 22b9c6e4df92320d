"""Bench drift vs. regression triage (VERDICT r06 #3, second half).

Compares the CURRENT BENCH_DETAIL.json (which stores every raw run per
query, not just the min) against the rolling per-query minimum across
all recorded driver rounds (BENCH_r*.json). A query is flagged as a
REGRESSION candidate only when BOTH hold:

- its current min exceeds 1.5x the rolling min across rounds, AND
- its current run SPREAD does not straddle the rolling min's
  neighborhood — i.e. even the best of its runs is far off. A query
  whose runs straddle the old min (min close, max high) is classified
  NOISE: one run ate a GC pause / codegen compile, the plan is fine.

This machine-separates "null_arithmetic drifted +0.9 s" (noise: a
trivial scan whose absolute delta is JVM jitter) from "a plan changed"
— the r06 judge had to adjudicate that by hand.

Usage: python tools/bench_compare.py  → one JSON line + exit 1 on any
flagged regression.
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
THRESHOLD = 1.5


def rolling_mins() -> dict[str, float]:
    """Per-query minimum across every recorded driver bench round."""
    mins: dict[str, float] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        try:
            with open(path) as fh:
                parsed = json.load(fh).get("parsed") or {}
        except (OSError, json.JSONDecodeError):
            continue
        for q, sec in (parsed.get("queries") or {}).items():
            if isinstance(sec, (int, float)) and sec > 0:
                mins[q] = min(mins.get(q, float("inf")), float(sec))
    return mins


def main() -> None:
    detail_path = os.path.join(REPO, "BENCH_DETAIL.json")
    if not os.path.exists(detail_path):
        sys.exit("no BENCH_DETAIL.json — run bench.py first")
    with open(detail_path) as fh:
        detail = json.load(fh)
    current = detail.get("queries") or {}
    history = rolling_mins()

    regressions: dict[str, dict] = {}
    noise: dict[str, dict] = {}
    for q, entry in current.items():
        if isinstance(entry, (int, float)):  # pre-r07 detail format
            cur_min, runs = float(entry), [float(entry)]
        else:
            cur_min, runs = float(entry["min"]), [float(r) for r in entry["runs"]]
        base = history.get(q)
        if base is None or cur_min <= THRESHOLD * base:
            continue
        row = {
            "rolling_min": base,
            "current_min": cur_min,
            "ratio": round(cur_min / base, 2),
            "runs": runs,
        }
        # spread context: if ANY run landed within threshold of the
        # rolling min, the plan still achieves the old cost — noise
        if min(runs) <= THRESHOLD * base:
            noise[q] = row
        else:
            regressions[q] = row

    out = {
        "threshold": THRESHOLD,
        "n_compared": len([q for q in current if q in history]),
        "regressions": regressions,
        "noise": noise,
    }
    print(json.dumps(out, sort_keys=True))
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
