"""Exact order statistics without a global sort: the two-pass
bin-and-refine median.

``percentile()`` sorts every group member — fine per group, ruinous for
one multi-billion-row group.  This operator histograms the integer
domain into ``nbins`` (one partial-agg pass), locates the bin(s)
holding the middle order statistics from the ≤nbins-row histogram
(bounded driver metadata, the k-means-centroid collect pattern), then
re-scans filtering to just those bins (~n/nbins rows) and ranks only
that sliver.  Worst case — a single value owning a whole bin — the
subset is that value's duplicates and the rank lookup still works,
because ties at the median make every tie-order equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_median_twopass(df: DataFrame, col: str, nbins: int = 1024) -> DataFrame:
    """1-row DataFrame ``(n_events BIGINT, median_cents DOUBLE)`` with the
    exact interpolated median of integer column ``col``.  Two scans of
    ``df`` + one ≤nbins-row collect; never a full sort."""
    # NULLs are excluded up front (quantile_cont/percentile semantics);
    # counting them would also shift the k1/k2 order statistics that
    # pass 2 ranks among non-null rows only
    e = df.select(F.col(col).cast("long").alias("c")).where(F.col("c").isNotNull())
    n, mn, mx = e.agg(F.count("*"), F.min("c"), F.max("c")).first()
    if not n:
        return e.sparkSession.createDataFrame(
            [(0, None)], "n_events LONG, median_cents DOUBLE"
        )
    width = max(mx - mn + 1, 1)  # exact Python int — no 64-bit wrap here
    if width > (1 << 63) - 1:
        # (c - mn) itself would wrap in 64-bit Spark arithmetic — no
        # binning expression can be monotone past that, so fail loudly
        # instead of walking a scrambled histogram
        raise ValueError(
            f"exact_median_twopass: value range {width} exceeds int64 — "
            "rescale the column (e.g. to coarser units) first"
        )
    # bin = (c - mn) / step with step sized so the quotient, not the
    # product, is bounded: the old (c - mn) * nbins form silently wrapped
    # (non-ANSI) once width > 2^63/nbins, breaking bin-order monotonicity
    # and returning a WRONG median.  Double division by a positive
    # constant + trunc-cast is monotone non-decreasing (IEEE division is
    # correctly rounded), and pass 2 reuses the identical expression, so
    # edge rounding cannot desynchronize the two passes.
    step = max((width + nbins - 1) // nbins, 1)
    bin_expr = ((F.col("c") - F.lit(mn)) / F.lit(step)).cast("long")
    hist = {
        r.bin: r.cnt
        for r in e.groupBy(bin_expr.alias("bin")).agg(F.count("*").alias("cnt")).collect()
    }
    k1, k2 = (n + 1) // 2, (n + 2) // 2  # 1-based middle order statistics
    cum = 0
    b1 = b2 = below = None
    for b in sorted(hist):
        if b1 is None and cum + hist[b] >= k1:
            b1, below = b, cum
        if cum + hist[b] >= k2:
            b2 = b
            break
        cum += hist[b]
    # pass 2 filters on the SAME bin expression pass 1 grouped by, so
    # the subset is exactly bins b1..b2 and subset rank = global rank
    # minus `below`, whatever the float binning did at bin edges
    subset = e.where(bin_expr.between(b1, b2))
    ranked = subset.withColumn("rn", F.row_number().over(Window.orderBy("c")))
    return (
        ranked.where(F.col("rn").isin(k1 - below, k2 - below))
        .agg(F.avg(F.col("c").cast("double")).alias("median_cents"))
        .select(F.lit(n).cast("long").alias("n_events"), "median_cents")
    )
