#!/usr/bin/env python
"""Micro-bench of named bench queries: one session, full warm pass of the
NAMED queries (artifact builds + JIT), then N timed .count() passes each;
prints per-query median/min and job counts.  For fast A/B iteration on a
single machine window — NOT the committed bench protocol (bench.py).

Usage: python scripts/r14_micro.py name [name...] [--n 5]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def steal() -> int:
    return int(open("/proc/stat").readline().split()[8])


def main() -> None:
    args = [a for a in sys.argv[1:]]
    n = 5
    if "--n" in args:
        i = args.index("--n")
        n = int(args[i + 1])
        del args[i : i + 2]
    names = args

    from dataengineeringworkshop_spark.plans.registry import load_all
    from dataengineeringworkshop_spark.session import get_spark

    spark = get_spark(app_name="dew-micro")
    registry = load_all()
    sc = spark.sparkContext

    for name in names:
        registry[name].fn(spark, SF_DIR).count()  # warm + artifacts

    out = {}
    for name in names:
        spec = registry[name]
        times = []
        j0 = sc._jsc.sc().dagScheduler().nextJobId()
        for _ in range(n):
            t0 = time.perf_counter()
            spec.fn(spark, SF_DIR).count()
            times.append(time.perf_counter() - t0)
        j1 = sc._jsc.sc().dagScheduler().nextJobId()
        times.sort()
        out[name] = {
            "median": round(times[len(times) // 2], 4),
            "min": round(times[0], 4),
            "max": round(times[-1], 4),
            "jobs_per_call": (j1 - j0) / n,
        }
        print(name, json.dumps(out[name]), flush=True)
    print("TOTAL_MEDIAN", round(sum(v["median"] for v in out.values()), 4))
    spark.stop()


if __name__ == "__main__":
    main()
