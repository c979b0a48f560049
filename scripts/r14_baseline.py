#!/usr/bin/env python
"""Round-14 baseline campaign: N fresh-process bench.py runs of the
current tree, each with the /proc/stat steal delta recorded, written as
raw per-run JSON (ADVICE r13: commit the raw campaign data, report
medians alongside minima)."""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("R14_RUNS", "3"))
OUT = os.environ.get("R14_OUT", "/tmp/r14_baseline.json")
TREE = os.environ.get("R14_TREE", REPO)


def steal_ticks() -> int:
    return int(open("/proc/stat").readline().split()[8])


def run_bench() -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=SF01)
    s0, t0 = steal_ticks(), time.time()
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=TREE, env=env, capture_output=True, text=True, timeout=2400,
    )
    wall = time.time() - t0
    steal = (steal_ticks() - s0) / 100.0  # CPU-seconds stolen
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if out.returncode != 0 or not lines:
        raise RuntimeError(
            f"bench.py failed (rc={out.returncode}); stderr tail: {out.stderr[-2000:]}"
        )
    rec = json.loads(lines[-1])
    rec["_wall_sec"] = round(wall, 1)
    rec["_steal_cpu_sec"] = round(steal, 1)
    rec["_steal_cores_avg"] = round(steal / wall, 3)
    return rec


def main() -> None:
    runs = []
    for i in range(N):
        r = run_bench()
        runs.append(r)
        print(
            f"run {i + 1}/{N}: total {r['value']} s  wall {r['_wall_sec']} s  "
            f"steal {r['_steal_cores_avg']} cores avg",
            flush=True,
        )
    per_query = {}
    for q in runs[0]["queries"]:
        vals = [r["queries"][q] for r in runs]
        per_query[q] = {
            "min": min(vals),
            "median": round(statistics.median(vals), 4),
            "max": max(vals),
        }
    doc = {
        "tree": TREE,
        "sf_dir": SF01,
        "n_runs": N,
        "runs": runs,
        "per_query": per_query,
        "total_min": round(min(r["value"] for r in runs), 4),
        "total_median": round(statistics.median([r["value"] for r in runs]), 4),
    }
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=2)
    print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
