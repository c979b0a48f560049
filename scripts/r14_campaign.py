#!/usr/bin/env python
"""Round-14 interleaved before/after campaign: N fresh-process bench.py
runs of the pre-round tree and the current tree, alternated BABA/ABBA so
both sides share machine conditions, each run recording its /proc/stat
steal delta.  Raw per-run JSON is committed (ADVICE r13 #1); report
medians AND minima."""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEFORE = os.environ.get("R14_BEFORE_TREE", "/tmp/dew_r14_before")
SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_PER_SIDE = int(os.environ.get("R14_CAMPAIGN_N", "4"))
OUT = os.environ.get("R14_OUT", "/tmp/r14_campaign.json")


def steal_ticks() -> int:
    return int(open("/proc/stat").readline().split()[8])


def run_bench(tree: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=SF01)
    s0, t0 = steal_ticks(), time.time()
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=tree, env=env, capture_output=True, text=True, timeout=2400,
    )
    wall = time.time() - t0
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if out.returncode != 0 or not lines:
        raise RuntimeError(f"bench failed in {tree}: {out.stderr[-1500:]}")
    rec = json.loads(lines[-1])
    rec["_tree"] = tree
    rec["_wall_sec"] = round(wall, 1)
    rec["_steal_cores_avg"] = round((steal_ticks() - s0) / 100.0 / wall, 3)
    return rec


def main() -> None:
    order: list[str] = []
    for i in range(N_PER_SIDE):
        pair = [BEFORE, REPO]
        if i % 2:
            pair.reverse()
        order.extend(pair)
    runs = []
    for i, tree in enumerate(order):
        r = run_bench(tree)
        runs.append(r)
        side = "before" if tree == BEFORE else "after"
        print(
            f"run {i + 1}/{len(order)} [{side}]: total {r['value']} s "
            f"steal {r['_steal_cores_avg']}",
            flush=True,
        )
    doc: dict = {"before_tree": BEFORE, "after_tree": REPO, "runs": runs}
    for side, tree in (("before", BEFORE), ("after", REPO)):
        side_runs = [r for r in runs if r["_tree"] == tree]
        totals = [r["value"] for r in side_runs]
        pq = {}
        for q in side_runs[0]["queries"]:
            vals = [r["queries"][q] for r in side_runs]
            pq[q] = {"median": round(statistics.median(vals), 4), "min": min(vals)}
        doc[side] = {
            "total_median": round(statistics.median(totals), 4),
            "total_min": round(min(totals), 4),
            "per_query": pq,
        }
    doc["speedup_total_median"] = round(
        doc["before"]["total_median"] / doc["after"]["total_median"], 4
    )
    doc["speedup_total_min"] = round(
        doc["before"]["total_min"] / doc["after"]["total_min"], 4
    )
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=2)
    print(
        f"before med {doc['before']['total_median']} min {doc['before']['total_min']} | "
        f"after med {doc['after']['total_median']} min {doc['after']['total_min']} | "
        f"speedup med {doc['speedup_total_median']}x min {doc['speedup_total_min']}x"
    )
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
