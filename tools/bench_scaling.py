"""Two-cluster-size scaling evidence (BASELINE.json north rule).

The rule requires throughput scaling efficiency ≥ 0.8 from N to 4N
executors; this sandbox has one machine, so ``local[8]`` vs ``local[32]``
stands in (same input, same seed list, fresh JVM per level via subprocess).
Writes BENCH/BASELINE.md with both throughputs, the efficiency, and the
cross-parallelism determinism checksums.

Usage: python tools/bench_scaling.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cpus: int, sf_dir: str, frontier_only: bool = False,
              mult: int = 1) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_FRONTIER_MULT=str(mult))
    if frontier_only:
        env["SPARK_GRAFT_FRONTIER_ONLY"] = "1"
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True, cwd=REPO,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    lo, hi = 8, 32
    # Scaling pair: frontier-only, 10× candidates so the measured region is
    # compute-bound rather than fixed-overhead-bound.
    r_lo = run_level(lo, sf_dir, frontier_only=True, mult=10)
    r_hi = run_level(hi, sf_dir, frontier_only=True, mult=10)
    # Full headline suite once, at the high level.
    r_full = run_level(hi, sf_dir)
    t_lo = r_lo["frontier"]["urls_per_sec"]
    t_hi = r_hi["frontier"]["urls_per_sec"]
    eff = (t_hi / t_lo) / (hi / lo)
    deterministic = (
        r_lo["frontier"]["checksum"] == r_hi["frontier"]["checksum"]
        and r_lo["frontier"]["admitted"] == r_hi["frontier"]["admitted"]
    )

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    now = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    with open(md, "w") as fh:
        fh.write(f"""# BENCH/BASELINE — measured {now}

Frontier pipeline (canonicalize → xxhash64 → intra-batch window dedup →
exact anti-join vs seen set → salted per-host politeness admission) over
{r_lo['frontier']['urls']:,} URLs from {sf_dir} — same input + seed order at
both parallelism levels; `local[{lo}]` vs `local[{hi}]` stands in for N vs 4N
executors (single-machine sandbox; see tools/bench_scaling.py).

| metric | local[{lo}] | local[{hi}] |
|---|---|---|
| frontier throughput (URLs scheduled+deduped/sec) | {t_lo:,.1f} | {t_hi:,.1f} |
| wall sec | {r_lo['frontier']['sec']} | {r_hi['frontier']['sec']} |
| admitted rows | {r_lo['frontier']['admitted']:,} | {r_hi['frontier']['admitted']:,} |
| admitted-set checksum (order-indep.) | {r_lo['frontier']['checksum']} | {r_hi['frontier']['checksum']} |

- **Scaling efficiency (T{hi}/T{lo})/{hi // lo} = {eff:.3f}** (target ≥ 0.8)
- **Determinism across parallelism: {'IDENTICAL' if deterministic else 'MISMATCH'}**
  (admitted set + checksum equal at both levels)

## Headline query timings (local[{hi}], sf={r_full['sf']})

| query | sec |
|---|---|
""")
        for name, sec in sorted(r_full["queries"].items(), key=lambda kv: -kv[1]):
            fh.write(f"| {name} | {sec} |\n")
        fh.write(f"""
End-to-end mock-web crawl (dedup+politeness+parse+checkpoint, fetch mocked):
{r_full['crawl']['fetched']} fetches / {r_full['crawl']['docs']} docs in
{r_full['crawl']['batches']} micro-batches, {r_full['crawl']['sec']} s.

Raw JSON:

```json
{json.dumps(r_lo)}
{json.dumps(r_hi)}
{json.dumps(r_full)}
```
""")
    print(json.dumps({
        "t_lo": t_lo, "t_hi": t_hi, "efficiency": round(eff, 3),
        "deterministic": deterministic, "md": md,
    }))
    return 0 if (eff >= 0.8 and deterministic) else 1


if __name__ == "__main__":
    raise SystemExit(main())
