"""Property-based tests for the wave-4 operators against independent
references: pandas ffill (forward fill), a Python systematic-sampling
reference (weighted sample), a pure-Python bit-interleave (Morton
layout), and numpy median/MAD (robust outliers).

These pin the SEMANTICS with generated edge cases — all-null series,
equal timestamps, single-doc strata, zero-weight rows, degenerate
one-point dimensions — that the fixed testdata cannot cover.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

BASE = dt.datetime(2024, 1, 1)

_series = st.lists(
    st.tuples(
        st.integers(0, 2),               # key
        st.integers(0, 300),             # seconds offset (dup ts likely)
        st.one_of(st.none(), st.integers(-50, 50)),  # value or gap
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=_series)
def test_forward_fill_matches_pandas_ffill(spark, rows):
    """last(ignorenulls) over a ROWS window == pandas groupby().ffill()
    when both order by (ts, rid) — including leading-null runs."""
    data = [
        (k, BASE + dt.timedelta(seconds=s), i, float(v) if v is not None else None)
        for i, (k, s, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "k INT, ts TIMESTAMP_NTZ, rid INT, v DOUBLE")
    w = (
        Window.partitionBy("k")
        .orderBy("ts", "rid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    got = {
        r.rid: r.filled
        for r in df.select(
            "rid", F.last("v", ignorenulls=True).over(w).alias("filled")
        ).collect()
    }

    pdf = pd.DataFrame(data, columns=["k", "ts", "rid", "v"]).sort_values(
        ["k", "ts", "rid"]
    )
    pdf["filled"] = pdf.groupby("k")["v"].ffill()
    for rid, want in zip(pdf["rid"], pdf["filled"]):
        w_ = None if pd.isna(want) else float(want)
        assert got[rid] == w_, (rid, got[rid], w_)


_weights = st.lists(
    st.tuples(st.integers(0, 1), st.integers(1, 40)),  # (stratum, weight)
    min_size=1,
    max_size=25,
)


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=_weights)
def test_weighted_systematic_sample_invariants(spark, rows):
    """The PPS systematic sampler (cp_weighted_sample's expression) must:
    select ≤ k per stratum; ALWAYS select any row whose weight strictly
    exceeds total/k (the classic certainty-inclusion guarantee); and the
    per-stratum slot-jump total must be exactly k (thresholds partition
    the cumulative axis)."""
    k = 5
    data = [(src, i, wt) for i, (src, wt) in enumerate(rows)]
    df = spark.createDataFrame(data, "source INT, doc_id INT, w INT")
    df.createOrReplaceTempView("pps_docs")
    sel = spark.sql(
        f"""
        WITH c AS (
            SELECT source, doc_id, w,
                   SUM(w) OVER (PARTITION BY source ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum,
                   SUM(w) OVER (PARTITION BY source) AS total
            FROM pps_docs
        )
        SELECT source, doc_id, w, total,
               (cum * {k}) div total - ((cum - w) * {k}) div total AS jump
        FROM c
        """
    ).collect()

    by_src: dict[int, list] = {}
    for r in sel:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        total = rs[0].total
        selected = [r for r in rs if r.jump >= 1]
        assert len(selected) <= k
        assert sum(r.jump for r in rs) == k
        for r in rs:
            if r.w * k > total:  # weight > total/k → certainty inclusion
                assert r.jump >= 1, (src, r.doc_id, r.w, total)


def _spread4(x: int) -> int:
    return (x & 1) | ((x & 2) << 1) | ((x & 4) << 2) | ((x & 8) << 3)


def test_morton_sql_matches_python_interleave(spark):
    """The shared SQL bit-spread fragment equals the reference Python
    interleave for EVERY 16×16 cell, and cutting 16 files of 16 codes
    partitions the grid (each file = exactly 16 distinct cells)."""
    from dataengineeringworkshop_spark.plans.scaleq import _SPREAD4

    cells = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(cells, "bx INT, by INT")
    sx = _SPREAD4.format(x="bx")
    sy = _SPREAD4.format(x="by")
    got = {
        (r.bx, r.by): r.code
        for r in df.selectExpr(
            "bx", "by", f"({sx}) + 2 * ({sy}) AS code"
        ).collect()
    }
    codes = set()
    for x, y in cells:
        want = _spread4(x) | (_spread4(y) << 1)
        assert got[(x, y)] == want, (x, y, got[(x, y)], want)
        codes.add(want)
    assert codes == set(range(256))  # bijective on the grid
    # 16-code file cuts: every file covers a 4x4 quad (both dims span 4)
    files: dict[int, list] = {}
    for (x, y), c in got.items():
        files.setdefault(c // 16, []).append((x, y))
    for fid, members in files.items():
        xs = [x for x, _ in members]
        ys = [y for _, y in members]
        assert len(members) == 16
        assert max(xs) - min(xs) == 3 and max(ys) - min(ys) == 3, (fid, members)


_vals = st.lists(st.integers(-1000, 1000), min_size=3, max_size=40)


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(vals=_vals, outlier=st.integers(10**6, 10**7))
def test_mad_is_robust_where_zscore_is_not(spark, vals, outlier):
    """percentile-based median/MAD (e_mad_outliers' estimator) against
    numpy on generated integers, and the breakdown property: injecting
    one huge outlier moves the median by at most one order statistic
    while the mean moves unboundedly."""
    df = spark.createDataFrame([(v,) for v in vals], "v LONG")
    # two-phase like the query: median, then MAD of deviations
    med = df.selectExpr("percentile(v, 0.5) AS m").collect()[0].m
    mad = (
        df.selectExpr(f"abs(v - {med!r}) AS d")
        .selectExpr("percentile(d, 0.5) AS m")
        .collect()[0]
        .m
    )
    assert med == float(np.median(vals))
    assert mad == float(np.median(np.abs(np.array(vals) - np.median(vals))))

    poisoned = vals + [outlier]
    med2 = (
        spark.createDataFrame([(v,) for v in poisoned], "v LONG")
        .selectExpr("percentile(v, 0.5) AS m")
        .collect()[0]
        .m
    )
    # robustness: poisoned median stays within the original value range
    assert min(vals) <= med2 <= max(vals) + 1
    # while the mean breaks away from it
    assert abs(np.mean(poisoned) - np.mean(vals)) > (max(vals) - min(vals))


_median_ints = st.lists(st.integers(-10_000, 10_000), min_size=1, max_size=60)


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(vals=_median_ints, nbins=st.sampled_from([1, 2, 7, 1024]))
def test_twopass_median_matches_numpy(spark, vals, nbins):
    """exact_median_twopass == numpy median for generated integers at
    pathological bin counts too (nbins=1 → pass 2 re-ranks everything;
    heavy duplicates → one bin owns the median)."""
    from dataengineeringworkshop_spark.operators.median import exact_median_twopass

    df = spark.createDataFrame([(v,) for v in vals], "c LONG")
    row = exact_median_twopass(df, "c", nbins=nbins).collect()[0]
    assert row.n_events == len(vals)
    assert row.median_cents == float(np.median(vals)), (vals, nbins)


def test_twopass_median_empty_input(spark):
    from dataengineeringworkshop_spark.operators.median import exact_median_twopass

    df = spark.createDataFrame([], "c LONG")
    row = exact_median_twopass(df, "c").collect()[0]
    assert row.n_events == 0 and row.median_cents is None


def test_twopass_median_wide_range_no_overflow(spark):
    """Values spanning nearly the full int64 domain: the old
    (c - mn) * nbins binning wrapped at width > 2^63/nbins and walked a
    scrambled histogram (wrong median, no error).  The step-division
    form must return the exact median."""
    from dataengineeringworkshop_spark.operators.median import exact_median_twopass

    vals = [-(1 << 61), -(1 << 40), 0, 7, (1 << 41), (1 << 61), (1 << 61) + 5]
    df = spark.createDataFrame([(v,) for v in vals], "c LONG")
    row = exact_median_twopass(df, "c").collect()[0]
    assert row.n_events == 7 and row.median_cents == 7.0

    # even median: interpolates between two huge order statistics
    df2 = spark.createDataFrame([(v,) for v in vals[:6]], "c LONG")
    row2 = exact_median_twopass(df2, "c").collect()[0]
    assert row2.median_cents == (0 + 7) / 2


def test_twopass_median_ignores_nulls(spark):
    """NULLs are excluded like percentile/quantile_cont do — they must
    affect neither the count nor the order statistics (regression: a
    NULL once produced a None bin key and a TypeError)."""
    from dataengineeringworkshop_spark.operators.median import exact_median_twopass

    df = spark.createDataFrame(
        [(1,), (None,), (3,), (None,), (2,)], "c LONG"
    )
    row = exact_median_twopass(df, "c").collect()[0]
    assert row.n_events == 3 and row.median_cents == 2.0
