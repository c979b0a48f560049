"""Keep examples/analytics_demo.py honest: run it and pin its
invariants (funnel monotonicity, cohort coverage, deterministic paths,
MV merge == recompute)."""

from __future__ import annotations


def test_analytics_demo_invariants(spark):
    import examples.analytics_demo as demo

    out = demo.main()
    f = out["funnel"]
    # funnel stages are monotone non-increasing and non-trivial
    assert f["view"] >= f["click"] >= f["purchase"]
    assert f["view"] > 0
    # every active user appears in their own cohort's week 0
    assert out["week0_users"] > 0
    assert out["n_cohort_cells"] > 0
    # paths come ranked, deterministic tiebreaks
    counts = [n for _, n in out["top_paths"]]
    assert counts == sorted(counts, reverse=True)
    assert all(p for p, _ in out["top_paths"])
    assert out["max_trailing_7d_revenue"] > 0
    # incremental merge is indistinguishable from a recompute
    assert out["mv_merge_equals_recompute"] is True


def test_minmax_repair_handles_tied_extremes(spark):
    """The conservative repair rule must recompute a group whose deleted
    value TIES the stored extreme — and the recompute must return the
    surviving tie, not drop it."""
    from pyspark.sql import functions as F

    # group 'a': min 1.0 held by TWO rows, one of them deleted -> repair
    #            must keep min 1.0 from the survivor
    # group 'b': unique min deleted -> repaired min is the next value
    # group 'c': no extreme deleted -> stored partials pass through
    from dataengineeringworkshop_spark.operators.incremental import (
        minmax_delete_repair,
    )

    rows = [
        (10, "a", 1.0), (11, "a", 1.0), (12, "a", 5.0),
        (20, "b", 2.0), (21, "b", 7.0), (22, "b", 9.0),
        (30, "c", 3.0), (31, "c", 4.0), (32, "c", 8.0),
    ]
    deleted = {11, 20, 31}  # 31 deletes a MIDDLE value of c (no repair)
    df = spark.createDataFrame(rows, "k long, g string, v double")
    dels = df.filter(F.col("k").isin(*deleted))
    out = minmax_delete_repair(df, dels, group_cols="g", val_col="v", key_col="k")
    got = {r.g: (r.n, r.mn, r.mx) for r in out.collect()}
    surv = df.filter(~F.col("k").isin(*deleted))
    want = {r.g: (r.n, r.mn, r.mx) for r in surv.groupBy("g").agg(
        F.count("*").cast("long").alias("n"),
        F.min("v").alias("mn"), F.max("v").alias("mx"),
    ).collect()}
    assert got == want
    assert got["a"] == (2, 1.0, 5.0)   # surviving tie kept
    assert got["b"] == (2, 7.0, 9.0)   # unique min repaired away
    assert got["c"] == (2, 3.0, 8.0)   # untouched partials correct


def test_minmax_repair_matches_recompute_random(spark):
    """Property (seeded sweep): for random tables and random delete
    sets — including full-group deletions and all-tied groups — the
    repair rule equals the full recompute over survivors."""
    import random

    from pyspark.sql import functions as F

    from dataengineeringworkshop_spark.operators.incremental import (
        minmax_delete_repair,
    )

    rng = random.Random(7)
    for trial in range(6):
        rows = [
            (k, rng.choice("abcd"), float(rng.choice([1, 1, 2, 5, 9])))
            for k in range(40)
        ]
        deleted = set(rng.sample(range(40), rng.randrange(0, 40)))
        df = spark.createDataFrame(rows, "k long, g string, v double")
        dels = df.filter(F.col("k").isin(*deleted)) if deleted else df.filter("k < 0")
        got = {
            r.g: (r.n, r.mn, r.mx)
            for r in minmax_delete_repair(
                df, dels, group_cols="g", val_col="v", key_col="k"
            ).collect()
        }
        surv = df.filter(~F.col("k").isin(*deleted)) if deleted else df
        want = {
            r.g: (r.n, r.mn, r.mx)
            for r in surv.groupBy("g")
            .agg(
                F.count("*").cast("long").alias("n"),
                F.min("v").alias("mn"),
                F.max("v").alias("mx"),
            )
            .collect()
        }
        assert got == want, (trial, deleted, got, want)
