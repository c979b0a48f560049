#!/usr/bin/env python
"""Behavioral-analytics walkthrough on this engine — executable
documentation for the round-6 analytics surface: ordered funnel,
weekly retention cohorts, session path mining, the trailing-window
revenue view, and incremental materialized-view maintenance (apply a
delta batch, apply a retraction batch, verify both against full
recomputes) — all over the driver's ``events``/``orders`` testdata.

Run: ``python examples/analytics_demo.py`` (defaults to sf0.001).
The test suite executes ``main()`` and asserts the invariants
(tests/test_analytics_example.py), so this file stays honest.
"""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = "/root/testdata/sf0.001"


def main(sf_dir: str = SF_DIR) -> dict:
    from dataengineeringworkshop_spark.plans.registry import load_all
    from dataengineeringworkshop_spark.plans.tables import load_table
    from dataengineeringworkshop_spark.session import get_spark

    spark = get_spark(app_name="analytics-demo")
    reg = load_all()
    out: dict = {}

    # 1. ordered funnel: view -> click -> purchase, strictly time-ordered
    funnel = {
        r.stage_name: r.n_users
        for r in reg["e_funnel_conversion"].fn(spark, sf_dir).collect()
    }
    out["funnel"] = funnel

    # 2. weekly retention cohorts (epoch-week arithmetic, engine-portable)
    retention = reg["e_retention_cohorts"].fn(spark, sf_dir)
    out["n_cohort_cells"] = retention.count()
    out["week0_users"] = (
        retention.filter(F.col("week_offset") == 0)
        .agg(F.sum("n_active"))
        .first()[0]
    )

    # 3. the most common full session paths
    out["top_paths"] = [
        (r.path, r.n_sessions)
        for r in reg["e_session_topk_paths"].fn(spark, sf_dir).limit(5).collect()
    ]

    # 4. trailing 7-day revenue per customer (RANGE interval frame)
    w6 = reg["w6_time_range_window"].fn(spark, sf_dir)
    out["max_trailing_7d_revenue"] = w6.agg(F.max("revenue_7d")).first()[0]

    # 5. incremental MV maintenance: merge a delta batch / subtract a
    #    retraction batch; both hash-verified against full recomputes by
    #    the registry oracles — here we assert the group totals line up
    mv_inc = {
        r.o_orderstatus: (r.n_orders, r.revenue)
        for r in reg["mv_incremental_agg"].fn(spark, sf_dir).collect()
    }
    full = {
        r.o_orderstatus: (r.n_orders, r.revenue)
        for r in load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)"
            ).alias("revenue"),
        )
        .collect()
    }
    out["mv_merge_equals_recompute"] = mv_inc == full
    return out


if __name__ == "__main__":
    for k, v in main().items():
        print(f"{k}: {v}")
