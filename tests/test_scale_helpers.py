"""Scale helpers: bucketed co-located joins (no exchange) and salted
skew joins (identical results, salted shuffle key)."""

from __future__ import annotations

import contextlib
import io
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@contextlib.contextmanager
def _conf(spark, key, value):
    old = spark.conf.get(key, None)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def test_bucketed_join_has_no_exchange(spark):
    from dataengineeringworkshop_spark.plans.tables import load_table
    from dataengineeringworkshop_spark.sources.bucketing import (
        bucketed_join,
        write_bucketed,
    )

    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_extendedprice")
    write_bucketed(o, "bkt_orders", ["o_orderkey"], n_buckets=8, sort_cols=["o_orderkey"])
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "bkt_lineitem",
        ["o_orderkey"],
        n_buckets=8,
        sort_cols=["o_orderkey"],
    )
    try:
        # force the sort-merge path (broadcast would hide the bucketing)
        with _conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
            j = bucketed_join(spark, "bkt_orders", "bkt_lineitem", ["o_orderkey"])
            plan = _plan(j)
            ops = Counter(re.findall(r"\(\d+\) ([A-Za-z]+)", plan))
            assert ops["SortMergeJoin"] == 1, ops
            # the whole point: bucketing removes BOTH shuffle exchanges
            assert ops["Exchange"] == 0, (ops, plan[:600])
            # (Sort may remain: Spark only trusts sortBy order with exactly
            # one file per bucket — the Exchange elimination is the win)
            # and the result is the plain join's result
            expected = o.join(
                li.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
            ).count()
            assert j.count() == expected
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_orders")
        spark.sql("DROP TABLE IF EXISTS bkt_lineitem")


def test_salted_join_matches_plain_join(spark):
    from dataengineeringworkshop_spark.operators.skew import salted_join
    from dataengineeringworkshop_spark.plans.tables import load_table

    e = load_table(spark, SF_SMOKE, "events")
    # make user 0 pathologically hot
    skewed = e.withColumn(
        "user_id", F.when(F.col("event_id") % 2 == 0, 0).otherwise(F.col("user_id"))
    ).select("event_id", "user_id", "value")
    dim = (
        e.select("user_id").distinct().withColumn("user_tier", F.col("user_id") % 3)
    )
    plain = skewed.join(dim, "user_id")
    salted = salted_join(skewed, dim, "user_id", n_salts=4)
    assert salted.count() == plain.count()
    a = sorted(map(tuple, plain.select("event_id", "user_id", "user_tier").collect()))
    b = sorted(map(tuple, salted.select("event_id", "user_id", "user_tier").collect()))
    assert a == b
    # the salt is part of the join keys (shuffle spreads the hot key)
    with _conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
        plan = _plan(salted_join(skewed, dim, "user_id", n_salts=4))
        m = re.search(r"Left keys \[\d+\]: \[([^\]]*)\]", plan)
        assert m and "__salt" in m.group(1), plan[:800]


def test_salted_left_join_keeps_unmatched(spark):
    from dataengineeringworkshop_spark.operators.skew import salted_join

    left = spark.createDataFrame([(1, "a"), (2, "b"), (99, "zz")], "k INT, lv STRING")
    right = spark.createDataFrame([(1, "x"), (2, "y")], "k INT, rv STRING")
    out = salted_join(left, right, "k", n_salts=4, how="left")
    got = {r.lv: r.rv for r in out.collect()}
    assert got == {"a": "x", "b": "y", "zz": None}
