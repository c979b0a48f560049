#!/usr/bin/env python
"""Round-6 measurement campaign (VERDICT r5 items 3 + 4).

Runs, back-to-back on an otherwise-idle machine:
  1. N_PAIRS matched sf0.1 ↔ sf1 bench pairs (each pair = one sf0.1 run
     immediately followed by one sf1 run, so the pair shares machine
     conditions) — the variance-aware scale artifact.
  2. EXTRA_SF01 additional sf0.1 runs so the per-query min-of-5/median-of-5
     re-measure of the three r5 bench regressions has 5 samples.

Writes /tmp/bench_campaign.json with every raw run; the committed
artifacts (BENCH_sf1.json, SCALE.md note) are distilled from it.

Each bench.py invocation is a FRESH process (own JVM) — no warm-cache
carryover between runs; bench.py itself reports per-query medians of 3
in-process iterations after a warmup.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/dew_sf1"
N_PAIRS = 3
EXTRA_SF01 = 2


def run_bench(sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if out.returncode != 0 or not lines:
        raise RuntimeError(
            f"bench.py failed for {sf_dir} (rc={out.returncode}); "
            f"stderr tail: {out.stderr[-2000:]}"
        )
    return json.loads(lines[-1])


def main() -> None:
    if not os.path.exists(f"{SF1}/orders.parquet"):
        subprocess.run(
            [sys.executable, "scripts/gen_scaled_data.py"], cwd=REPO, check=True
        )
    runs: dict = {"pairs": [], "sf01_extra": []}
    for i in range(N_PAIRS):
        a = run_bench(SF01)
        b = run_bench(SF1)
        runs["pairs"].append({"sf0.1": a, "sf1": b})
        print(
            f"pair {i + 1}: sf0.1 {a['value']} s  sf1 {b['value']} s  "
            f"ratio {b['value'] / a['value']:.2f}",
            flush=True,
        )
    for i in range(EXTRA_SF01):
        a = run_bench(SF01)
        runs["sf01_extra"].append(a)
        print(f"extra sf0.1 run {i + 1}: {a['value']} s", flush=True)

    sf01_runs = [p["sf0.1"] for p in runs["pairs"]] + runs["sf01_extra"]
    summary = {}
    for q in sf01_runs[0]["queries"]:
        vals = [r["queries"][q] for r in sf01_runs]
        summary[q] = {
            "min": min(vals),
            "median": statistics.median(vals),
            "max": max(vals),
            "n": len(vals),
        }
    runs["sf01_per_query_5run"] = summary
    ratios = [p["sf1"]["value"] / p["sf0.1"]["value"] for p in runs["pairs"]]
    runs["pair_ratios"] = ratios
    with open("/tmp/bench_campaign.json", "w") as f:
        json.dump(runs, f, indent=2)
    print("ratios:", [round(r, 2) for r in ratios])
    print("wrote /tmp/bench_campaign.json")


if __name__ == "__main__":
    main()
