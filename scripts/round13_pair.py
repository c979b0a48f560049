#!/usr/bin/env python
"""Round-13 matched sf0.1 ↔ sf1 pair for this round's new/changed
surface (single-evaluation MOR DML staging, REORG APPLY (PURGE)
threshold row, byte-budgeted BPE gate, property-snapshot DML
resolution, fingerprinted session artifacts): one sf0.1 pass
immediately followed by one sf1 pass so the pair shares machine
conditions.  Each pass is a fresh SparkSession; per-query numbers are
min-of-3 in-process after one warmup run.

Writes /tmp/round13_pair.json; the committed artifact (BENCH_sf1.json
`round13_pair`) is distilled from it.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parents[1])
if REPO not in sys.path:
    sys.path.insert(0, REPO)

QUERIES = [
    "vt_update_mor",
    "vt_merge_mor",
    "vt_delete_mor",
    "vt_dv_sql_script",
    "vt_reorg_purge_threshold",
    "t_bpe_tokenize_pack",
    "tj_asof_sql_script",
]

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/dew_sf1"


def time_pass(sf_dir: str) -> dict[str, float]:
    from pyspark.sql import SparkSession

    from dataengineeringworkshop_spark.plans.registry import load_all

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .appName(f"round13_pair_{Path(sf_dir).name}")
        .getOrCreate()
    )
    reg = load_all()
    out: dict[str, float] = {}
    for name in QUERIES:
        fn = reg[name].fn
        fn(spark, sf_dir).count()  # warmup (artifact builds, JIT)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
        print(f"{Path(sf_dir).name} {name}: {out[name]:.3f}s", flush=True)
    spark.stop()
    return out


def main() -> None:
    t01 = time_pass(SF01)
    t1 = time_pass(SF1)
    pair = {
        name: {
            "sf0.1_sec": t01[name],
            "sf1_sec": t1[name],
            "ratio_10x_data": round(t1[name] / t01[name], 2)
            if t01[name] > 0
            else None,
        }
        for name in QUERIES
    }
    result = {
        "queries": pair,
        "sf0.1_total_sec": round(sum(t01.values()), 2),
        "sf1_total_sec": round(sum(t1.values()), 2),
        "total_ratio_10x_data": round(sum(t1.values()) / sum(t01.values()), 2),
    }
    Path("/tmp/round13_pair.json").write_text(json.dumps(result, indent=1))
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
