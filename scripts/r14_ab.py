#!/usr/bin/env python
"""In-session A/B of query variants: builds both DataFrame forms, then
alternates .count() actions ABBA-style N times each and reports medians.
Noise-robust: both variants share every machine condition."""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("AB_N", "7"))


def run_ab(spark, name, build_a, build_b):
    # warm both
    build_a().count()
    build_b().count()
    ta, tb = [], []
    for i in range(N):
        order = [("A", build_a, ta), ("B", build_b, tb)]
        if i % 2:
            order.reverse()
        for _label, build, acc in order:
            t0 = time.perf_counter()
            build().count()
            acc.append(time.perf_counter() - t0)
    ma, mb = statistics.median(ta), statistics.median(tb)
    print(
        f"{name}: A(old) med {ma:.3f}s  B(new) med {mb:.3f}s  "
        f"B/A {mb / ma:.3f}  (min A {min(ta):.3f} B {min(tb):.3f})",
        flush=True,
    )


def main() -> None:
    from pyspark.sql import functions as F

    from dataengineeringworkshop_spark.plans.registry import load_all
    from dataengineeringworkshop_spark.plans.tables import load_table
    from dataengineeringworkshop_spark.session import get_spark

    spark = get_spark(app_name="dew-ab")
    reg = load_all()

    # --- flagship: old (countDistinct post-join) vs new (pre-agg) -----
    def flagship_old():
        li = load_table(spark, SF_DIR, "lineitem")
        o = load_table(spark, SF_DIR, "orders")
        c = load_table(spark, SF_DIR, "customer")
        n = load_table(spark, SF_DIR, "nation")
        r = load_table(spark, SF_DIR, "region")
        return (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy("r_name", F.date_format("o_orderdate", "yyyy-MM").alias("order_month"))
            .agg(
                F.expr("CAST(SUM(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(18,4))) AS DOUBLE)").alias("revenue"),
                F.countDistinct("o_orderkey").alias("n_orders"),
            )
        )

    def w2_old():
        li = load_table(spark, SF_DIR, "lineitem")
        o = load_table(spark, SF_DIR, "orders")
        c = load_table(spark, SF_DIR, "customer")
        from pyspark.sql import Window

        spend = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .groupBy("c_nationkey", "c_custkey", "c_name")
            .agg(
                F.expr(
                    "CAST(SUM(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(18,4))) AS DOUBLE)"
                ).alias("total_spend")
            )
        )
        w = Window.partitionBy("c_nationkey").orderBy(
            F.col("total_spend").desc(), F.col("c_custkey").asc()
        )
        return spend.withColumn("customer_rank", F.rank().over(w)).filter(
            F.col("customer_rank") <= 3
        )

    def ws_old():
        from dataengineeringworkshop_spark.operators.dedup import dedup_latest

        orders = load_table(spark, SF_DIR, "orders")
        lines = load_table(spark, SF_DIR, "lineitem")
        silver_orders = dedup_latest(
            orders,
            keys=["o_orderkey"],
            order_by=[F.col("o_orderdate").desc(), F.col("o_orderkey").desc()],
        ).select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
        )
        silver_lines = lines.filter(F.col("l_quantity") > 0).select(
            "l_orderkey",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        )
        return (
            silver_lines.join(
                silver_orders, silver_lines.l_orderkey == silver_orders.o_orderkey
            )
            .groupBy("order_month", "o_orderstatus")
            .agg(
                F.countDistinct("o_orderkey").alias("number_of_sales"),
                F.expr("CAST(SUM(CAST((net_price) AS DECIMAL(18,4))) AS DOUBLE)").alias("total_sales"),
            )
        )

    run_ab(spark, "flagship", flagship_old,
           lambda: reg["flagship_region_month_revenue"].fn(spark, SF_DIR))
    run_ab(spark, "w2_topk", w2_old,
           lambda: reg["w2_topk_per_group"].fn(spark, SF_DIR))
    run_ab(spark, "ws_medallion", ws_old,
           lambda: reg["ws_medallion_gold"].fn(spark, SF_DIR))
    spark.stop()


if __name__ == "__main__":
    main()
