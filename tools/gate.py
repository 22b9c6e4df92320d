"""One-shot CI-style gate: the in-repo proof that ALL queries are green
on the CURRENT code, regardless of which 50 the driver's rotating
correctness window can see this round (VERDICT r05 #4).

Runs, in order:

1. **pytest** — the full unit/property/plan-shape suite, including the
   codebase-wide plan lint (tests/test_plan_lint.py: no
   CartesianProduct, no row-at-a-time Python UDF, non-vacuous results).
2. **oracle parity** — tools/check_oracle.py over every registered
   query at the given sf dir (default sf0.01): Spark vs DuckDB exact
   values + driver-faithful pandas stringification.

Emits ONE JSON verdict line to stdout and writes the same object (plus
per-step detail tails) to GATE.json at the repo root. Exit 0 iff every
step passed.

Usage:
    python tools/gate.py                     # sf0.01, full pytest
    python tools/gate.py --sf /root/testdata/sf0.001
    python tools/gate.py --skip-pytest      # oracle-only quick gate
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd: list[str], timeout: int) -> tuple[int, str]:
    proc = subprocess.run(
        cmd,
        cwd=REPO,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        timeout=timeout,
    )
    return proc.returncode, proc.stdout


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--skip-pytest", action="store_true")
    ap.add_argument("--pytest-timeout", type=int, default=3600)
    ap.add_argument("--oracle-timeout", type=int, default=3600)
    args = ap.parse_args()

    verdict: dict = {"gate": "spark-graft", "sf": args.sf, "steps": {}}
    ok = True
    t_start = time.time()

    if not args.skip_pytest:
        t0 = time.time()
        rc, out = _run(
            [sys.executable, "-m", "pytest", "tests/", "-q", "--tb=line"],
            args.pytest_timeout,
        )
        m = re.search(
            r"(\d+) passed(?:, (\d+) skipped)?(?:, \d+ warnings?)?"
            r"(?:, (\d+) failed)?",
            out,
        ) or re.search(r"(\d+) failed", out)
        tail = "\n".join(out.strip().splitlines()[-15:])
        verdict["steps"]["pytest"] = {
            "rc": rc,
            "sec": round(time.time() - t0, 1),
            "summary": m.group(0) if m else tail[-200:],
            "tail": tail,
        }
        ok = ok and rc == 0

    t0 = time.time()
    rc, out = _run(
        [sys.executable, "tools/check_oracle.py", args.sf],
        args.oracle_timeout,
    )
    m = re.search(r"(\d+) passed, (\d+) failed, (\d+) rows-only", out)
    failures = [ln for ln in out.splitlines() if ln.startswith("✗")]
    verdict["steps"]["oracle"] = {
        "rc": rc,
        "sec": round(time.time() - t0, 1),
        "summary": m.group(0) if m else out.strip().splitlines()[-1:],
        "failures": [f[:300] for f in failures[:20]],
    }
    ok = ok and rc == 0

    verdict["ok"] = ok
    verdict["total_sec"] = round(time.time() - t_start, 1)
    with open(os.path.join(REPO, "GATE.json"), "w") as fh:
        json.dump(verdict, fh, indent=1, sort_keys=True)
    line = dict(verdict)
    for step in line["steps"].values():
        step.pop("tail", None)
    print(json.dumps(line, separators=(",", ":")))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
