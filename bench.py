#!/usr/bin/env python
"""Benchmark harness: time the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

`value` is the total wall-clock of one timed pass over the headline set
(bench=True queries in the registry) after a warm-up pass of the flagship
(JVM/codegen warm-up).  Per-query numbers are the median of N_RUNS timed
executions (count() action — full pipeline execution without driver
collect).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

N_RUNS = int(os.environ.get("DEW_BENCH_RUNS", "3"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from dataengineeringworkshop_spark.plans.registry import load_all
    from dataengineeringworkshop_spark.session import get_spark

    spark = get_spark(app_name="dew-bench")
    registry = load_all()
    bench_specs = {n: s for n, s in registry.items() if s.bench}

    # warm-up: one full pass over the headline set — JVM JIT + codegen
    # keep warming well past the first query, so timing without a full
    # warm pass measures JIT, not the queries (seen as a uniform ~1.5×
    # inflation on whichever queries run first alphabetically)
    for spec in bench_specs.values():
        spec.fn(spark, sf_dir).count()

    per_query: dict[str, float] = {}
    total = 0.0
    for name, spec in sorted(bench_specs.items()):
        times = []
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).count()
            times.append(time.perf_counter() - t0)
        times.sort()
        med = times[len(times) // 2]
        per_query[name] = round(med, 4)
        total += med

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_clock",
                "value": round(total, 4),
                "unit": "sec",
                "queries": per_query,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
