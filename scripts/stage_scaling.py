"""Per-stage scaling harness: run stage_probe stages at local[8] and
local[32] (taskset-pinned, separate processes), print one JSON line per
(stage, level) and a final per-stage efficiency table.

Usage: python scripts/stage_scaling.py [N_ROWS] [stage ...]
Appends raw results to BENCH/stage_runs.jsonl.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEVELS = (8, 32)
DEFAULT_STAGES = ["scan", "arrow", "parseids", "winscore3", "e2e2"]


def run(stage: str, cores: int, n_rows: int, runs: int = 3) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores))
    cmd = ["taskset", "-c", f"0-{cores - 1}", sys.executable,
           os.path.join(REPO, "scripts", "stage_probe.py"),
           stage, str(n_rows), str(runs)]
    out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                         check=True)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    stages = sys.argv[2:] or DEFAULT_STAGES
    results: dict[str, dict[int, dict]] = {}
    hist = open(os.path.join(REPO, "BENCH", "stage_runs.jsonl"), "a")
    # interleave levels per stage (same drift defense as bench_scaling)
    for stage in stages:
        results[stage] = {}
        for lvl in LEVELS:
            res = run(stage, lvl, n_rows)
            results[stage][lvl] = res
            hist.write(json.dumps(res) + "\n")
            hist.flush()
            print(json.dumps(res))
    print("\n| stage | local[8] rows/s | local[32] rows/s | efficiency |")
    print("|---|---|---|---|")
    for stage in stages:
        lo = results[stage][LEVELS[0]]["rows_per_s"]
        hi = results[stage][LEVELS[1]]["rows_per_s"]
        eff = (hi / lo) / (LEVELS[1] / LEVELS[0])
        print(f"| {stage} | {lo:,.0f} | {hi:,.0f} | {eff:.3f} |")


if __name__ == "__main__":
    main()
