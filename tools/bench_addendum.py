"""Clean-window re-measure of a query subset, appended to BENCH/BASELINE.md.

The main baseline table is written whole by tools/bench_scaling.py inside a
gated window; queries added AFTER that sweep need baseline rows without
throwing away the banked gated frontier numbers. This harness hunts for a
clean window with the same two calibration probes (CPU spin + memory
stream, both within 25% of best-known capacity, before AND after the
measured run), runs ``bench.py`` on just the named queries at local[32],
and APPENDS an addendum section — it never rewrites the banked table.

Usage:
    python tools/bench_addendum.py q1 q2 ...        # hunt then append
    SPARK_GRAFT_ADD_BUDGET_S=1800 python tools/bench_addendum.py ...

Exit 0 = addendum appended; 1 = no clean window inside the budget
(BASELINE.md untouched).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_scaling import REPO, calibrate, load_cal_best, save_cal_best


def main() -> int:
    queries = [a for a in sys.argv[1:] if not a.startswith("-")]
    if not queries:
        print("usage: bench_addendum.py QUERY [QUERY ...]", file=sys.stderr)
        return 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    budget = float(os.environ.get("SPARK_GRAFT_ADD_BUDGET_S", "2400"))
    deadline = time.monotonic() + budget
    cpu_best, mem_best = load_cal_best()

    def clean(c: float, m: float) -> bool:
        nonlocal cpu_best, mem_best
        cpu_best, mem_best = min(cpu_best, c), min(mem_best, m)
        save_cal_best(cpu_best, mem_best)
        return c <= cpu_best * 1.25 and m <= mem_best * 1.25

    while time.monotonic() < deadline:
        c0, m0 = calibrate()
        if not clean(c0, m0):
            print(
                f"congested (cpu {c0:.2f}/{cpu_best:.2f}s,"
                f" mem {m0:.2f}/{mem_best:.2f}s); waiting",
                file=sys.stderr,
            )
            time.sleep(30)
            continue
        env = dict(
            os.environ,
            SPARK_GRAFT_CPUS="32",
            SPARK_GRAFT_SF_DIR=sf_dir,
            SPARK_GRAFT_QUERIES=",".join(queries),
            SPARK_GRAFT_NO_FRONTIER="1",
        )
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, cwd=REPO,
        )
        line = [ln for ln in out.stdout.splitlines() if '"metric"' in ln]
        c1, m1 = calibrate()
        if not clean(c1, m1):
            print("window poisoned mid-run; discarding", file=sys.stderr)
            continue
        if out.returncode != 0 or not line:
            print(out.stderr[-2000:], file=sys.stderr)
            return 2
        rec = json.loads(line[-1])
        now = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
        md = os.path.join(REPO, "BENCH", "BASELINE.md")
        with open(md, "a") as fh:
            fh.write(
                f"\n## Addendum — measured {now} (gated clean window, "
                f"local[32], {sf_dir})\n\n"
                "Queries added after the banked sweep above; probes clean "
                f"before and after (cpu ≤{cpu_best * 1.25:.2f}s, "
                f"mem ≤{mem_best * 1.25:.2f}s).\n\n"
                "| query | sec |\n|---|---|\n"
                + "".join(
                    f"| {q} | {rec['queries'][q]} |\n"
                    for q in queries if q in rec["queries"]
                )
            )
        print(json.dumps(rec["queries"]))
        return 0
    print("no clean window inside budget; BASELINE.md untouched",
          file=sys.stderr)
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
