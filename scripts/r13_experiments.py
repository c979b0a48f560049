#!/usr/bin/env python
"""Round-13 optimization experiments (guide §1: measure before adopting).

Each experiment times median-of-N in ONE session, interleaved A/B to be
fair under this VM's bursty CPU steal.
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF = "/root/testdata/sf0.1"
N = 5


def med(fn, label, spark):
    times = []
    for _ in range(N):
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    times.sort()
    m = statistics.median(times)
    print(f"{label}: med={m:.3f}s  all={[round(t,2) for t in times]}", flush=True)
    return m


def main() -> None:
    from pyspark.sql import functions as F

    from dataengineeringworkshop_spark.operators.fanout import fan_out
    from dataengineeringworkshop_spark.plans.registry import load_all
    from dataengineeringworkshop_spark.plans.tables import load_table
    from dataengineeringworkshop_spark.session import get_spark

    spark = get_spark("r13-exp")
    reg = load_all()

    # warm everything once
    for name in ("e_session_topk_paths", "w2_topk_per_group",
                 "flagship_region_month_revenue", "tj_asof_click_view",
                 "a6_multi_col_group", "mv_incremental_join"):
        reg[name].fn(spark, SF).count()

    # E1: AQE minPartitionSize for post-shuffle parallelism on CPU-heavy
    # small-byte stages (events window family)
    def run(name):
        return lambda: reg[name].fn(spark, SF).count()

    for name in ("e_session_topk_paths", "tj_asof_click_view", "w2_topk_per_group"):
        spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1MB")
        base = med(run(name), f"{name}@min1MB", spark)
        spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64KB")
        small = med(run(name), f"{name}@min64KB", spark)
        spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1MB")
        print(f"E1 {name}: 64KB/1MB = {small/base:.2f}", flush=True)

    # E2: fan_out(lineitem) for the decimal-agg join family
    li = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders")
    c = load_table(spark, SF, "customer")

    def w2(lidf):
        from pyspark.sql import Window

        spend = (
            lidf.join(o, lidf.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .groupBy("c_nationkey", "c_custkey", "c_name")
            .agg(
                F.sum(
                    F.expr(
                        "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,14))"
                    )
                ).alias("d")
            )
        )
        return spend.count()

    med(lambda: w2(li), "w2ish@plain", spark)
    med(lambda: w2(fan_out(li.select("l_orderkey", "l_extendedprice", "l_discount"))),
        "w2ish@fanout", spark)
    spark.stop()


if __name__ == "__main__":
    main()
