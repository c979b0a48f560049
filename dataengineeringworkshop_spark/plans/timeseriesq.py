"""Time-series hygiene queries (round 6, wave 4): forward fill, date-spine
gap-fill, fixed-width histograms, and robust (median/MAD) outlier stats.

These are the operations every metrics/feature pipeline runs between the
raw event log and a model: carry the last known reading forward across
gaps, densify a sparse series so downstream windows see every bucket,
bin a measure for distribution monitoring, and flag outliers with
median-based statistics that a single corrupt reading cannot drag around
(unlike the mean/stddev z-score in ``e_user_zscore_outliers``).

Scale shapes:
- Forward fill: ONE window partitioned by user_id — per-partition state
  is a single "last seen non-null" value, the streaming-friendly shape;
  the result is reduced per-user so the output stays bounded.
- Date spine: the spine is generated from two scalar bounds (min/max
  hour — a 1-row aggregate), so the dense axis is |hours| × |types|
  rows regardless of event volume; the heavy side is a plain grouped
  count that joins the spine AFTER reduction.  Never explode raw rows
  against a calendar.
- Histogram: bin id is a map-side integer expression; the aggregate has
  |bins| × |types| groups — partial aggregation collapses each task's
  rows to ≤ that many partials before the (tiny) shuffle.
- Median/MAD: exact per-group medians are sort-based — fine for
  bounded-cardinality group keys (event types here); the mergeable
  100 TB path is approx_percentile (``a_sketch_bounds``).  Values are
  scaled to integer cents so the cross-engine interpolation at the
  median is dyadic-exact (the a11_exact_quantiles determinism rule).

Determinism: window order keys always carry a unique tiebreaker
(ts, event_id); the ROWS frame (not RANGE) keeps equal-timestamp peers
out of the fill; sums accumulate in DECIMAL (registry.dsum rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dataengineeringworkshop_spark.plans.registry import dsum, query
from dataengineeringworkshop_spark.plans.tables import load_table, register_views


@query(
    "ts_forward_fill",
    # sensor reading = value when the event is a well-formed reading
    # ('view'/'click'/'purchase'), NULL on 'error' rows — forward-fill
    # carries the last good reading across error gaps per user.
    oracle=f"""
        WITH readings AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN event_type = 'error' THEN NULL ELSE value END
                       AS reading
            FROM events
        ),
        filled AS (
            SELECT user_id, reading,
                   last_value(reading IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS filled_reading
            FROM readings
        )
        SELECT user_id,
               COUNT(*) AS n_rows,
               COUNT(*) - COUNT(reading) AS n_gaps,
               COUNT(*) - COUNT(filled_reading) AS n_unfillable,
               {dsum("filled_reading", "filled_total")}
        FROM filled
        GROUP BY user_id
    """,
    tags=("ext-analytics", "timeseries"),
)
def ts_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill (last-observation-carried-forward) per user:
    ``last(reading, ignorenulls=True)`` over a ROWS window ordered by
    (ts, event_id).  ROWS — not the default RANGE — so an equal-timestamp
    peer can never leak its value backwards into the fill; the unique
    event_id tiebreak makes the fill order engine-independent.  Rows
    before a user's first good reading stay NULL (``n_unfillable``).
    The per-user reduction keeps output at |users| rows and its DECIMAL
    sum hash-proves every filled cell, not just counts."""
    e = load_table(spark, sf_dir, "events")
    reading = F.when(F.col("event_type") == "error", F.lit(None).cast("double")).otherwise(
        F.col("value")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = e.select(
        "user_id",
        reading.alias("reading"),
        F.last(reading, ignorenulls=True).over(w).alias("filled_reading"),
    )
    return filled.groupBy("user_id").agg(
        F.count("*").alias("n_rows"),
        (F.count("*") - F.count("reading")).alias("n_gaps"),
        (F.count("*") - F.count("filled_reading")).alias("n_unfillable"),
        F.expr(
            "CAST(SUM(CAST((filled_reading) AS DECIMAL(18,4))) AS DOUBLE)"
        ).alias("filled_total"),
    )


@query(
    "ts_spine_gapfill",
    # dense hourly spine per event_type, zero-filled where the type has
    # no events that hour.  Hour ids are epoch-hour integers; the spine
    # timestamp is rebuilt with make_timestamp(µs) to stay NAIVE (the
    # w9_sliding tz rule).
    oracle="""
        WITH hourly AS (
            SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_id,
                   event_type,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST((value) AS DECIMAL(18,4))) AS DOUBLE)
                       AS total_value
            FROM events GROUP BY hour_id, event_type
        ),
        bounds AS (
            SELECT MIN(hour_id) AS mn, MAX(hour_id) AS mx FROM hourly
        ),
        spine AS (
            SELECT unnest(range(mn, mx + 1)) AS hour_id FROM bounds
        ),
        types AS (SELECT DISTINCT event_type FROM events)
        SELECT make_timestamp(s.hour_id * 3600 * 1000000) AS event_hour,
               t.event_type,
               COALESCE(h.n_events, 0) AS n_events,
               COALESCE(h.total_value, CAST(0.0 AS DOUBLE)) AS total_value
        FROM spine s
        CROSS JOIN types t
        LEFT JOIN hourly h
          ON h.hour_id = s.hour_id AND h.event_type = t.event_type
    """,
    tags=("ext-analytics", "timeseries"),
)
def ts_spine_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-spine densification: generate the COMPLETE hourly axis
    between the corpus' min and max hour (``sequence()`` over two scalar
    bounds), cross it with the observed event types, and left-join the
    hourly rollup — missing (hour, type) cells come back as explicit
    zeros, which is what gap-aware moving averages and chart axes need.
    The spine derives from a 1-row bounds aggregate, so generation cost
    is |hours| × |types| no matter how many raw events exist; the raw
    scan happens exactly once, in the (reduced) hourly rollup that the
    spine then outer-joins.  AQE broadcasts whichever reduced side is
    small at runtime."""
    register_views(spark, sf_dir, "events")
    return spark.sql(
        """
        WITH hourly AS (
            SELECT CAST(floor(unix_timestamp(CAST(ts AS TIMESTAMP)) / 3600)
                        AS BIGINT) AS hour_id,
                   event_type,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST((value) AS DECIMAL(18,4))) AS DOUBLE)
                       AS total_value
            FROM dew_events GROUP BY hour_id, event_type
        ),
        bounds AS (
            SELECT MIN(hour_id) AS mn, MAX(hour_id) AS mx FROM hourly
        ),
        spine AS (
            SELECT explode(sequence(mn, mx)) AS hour_id FROM bounds
        ),
        types AS (SELECT DISTINCT event_type FROM dew_events)
        SELECT CAST(timestamp_micros(s.hour_id * 3600 * 1000000)
                    AS TIMESTAMP_NTZ) AS event_hour,
               t.event_type,
               COALESCE(h.n_events, 0) AS n_events,
               COALESCE(h.total_value, CAST(0.0 AS DOUBLE)) AS total_value
        FROM spine s
        CROSS JOIN types t
        LEFT JOIN hourly h
          ON h.hour_id = s.hour_id AND h.event_type = t.event_type
        """
    )


@query(
    "a15_value_histogram",
    oracle=f"""
        SELECT event_type,
               CAST(floor(value / 10.0) AS INT) AS bin_id,
               COUNT(*) AS n_events,
               {dsum("value", "bin_total")}
        FROM events
        GROUP BY event_type, bin_id
    """,
    tags=("ext-analytics", "A5"),
)
def a15_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of the event value per type (bin width 10)
    — the distribution-monitoring primitive behind drift dashboards.
    The bin id is one map-side integer expression (a single division —
    bit-identical across engines); the aggregate's key space is
    |types| × |bins|, so map-side partial aggregation collapses each
    task's input to a handful of partials before the shuffle — the
    histogram of 100 TB costs one scan plus a tiny exchange."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(
        "event_type",
        F.floor(F.col("value") / F.lit(10.0)).cast("int").alias("bin_id"),
    ).agg(
        F.count("*").alias("n_events"),
        F.expr("CAST(SUM(CAST((value) AS DECIMAL(18,4))) AS DOUBLE)").alias(
            "bin_total"
        ),
    )


@query(
    "e_mad_outliers",
    # integer-cents scaling makes both engines' median interpolation
    # dyadic-exact (the a11_exact_quantiles rule); every later step is
    # integer/half-integer arithmetic, so the hash is engine-independent.
    oracle="""
        WITH cents AS (
            SELECT event_type,
                   CAST(round(value * 100, 0) AS BIGINT) AS v_cents
            FROM events
        ),
        med AS (
            SELECT event_type,
                   quantile_cont(v_cents, 0.5) AS med_cents
            FROM cents GROUP BY event_type
        ),
        dev AS (
            SELECT c.event_type, c.v_cents, m.med_cents,
                   abs(c.v_cents - m.med_cents) AS abs_dev
            FROM cents c JOIN med m ON c.event_type = m.event_type
        ),
        mad AS (
            SELECT event_type,
                   MIN(med_cents) AS med_cents,
                   quantile_cont(abs_dev, 0.5) AS mad_cents
            FROM dev GROUP BY event_type
        )
        SELECT d.event_type,
               m.med_cents,
               m.mad_cents,
               COUNT(*) AS n_events,
               COUNT(*) FILTER (WHERE d.abs_dev > 3 * m.mad_cents)
                   AS n_outliers
        FROM dev d JOIN mad m ON d.event_type = m.event_type
        GROUP BY d.event_type, m.med_cents, m.mad_cents
    """,
    tags=("ext-analytics", "robust-stats"),
)
def e_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection: per event type, flag readings more than
    3 median-absolute-deviations from the median — the estimator a
    single corrupt reading cannot drag, unlike the mean/stddev z-score
    (``e_user_zscore_outliers`` is the classical twin).  Two exact
    per-group medians (values, then absolute deviations) with the
    group-key cardinality bounded by |event types|; each median result
    is a tiny aggregate that broadcasts back onto the scan.  Values are
    scaled to integer cents so the median interpolation is dyadic-exact
    in both engines.  At 100 TB the same shape runs with
    approx_percentile (``a_sketch_bounds`` pins its error bounds)."""
    register_views(spark, sf_dir, "events")
    return spark.sql(
        """
        WITH cents AS (
            SELECT event_type,
                   CAST(round(value * 100, 0) AS BIGINT) AS v_cents
            FROM dew_events
        ),
        med AS (
            SELECT event_type,
                   percentile(v_cents, 0.5) AS med_cents
            FROM cents GROUP BY event_type
        ),
        dev AS (
            SELECT c.event_type, c.v_cents, m.med_cents,
                   abs(c.v_cents - m.med_cents) AS abs_dev
            FROM cents c JOIN med m ON c.event_type = m.event_type
        ),
        mad AS (
            SELECT event_type,
                   MIN(med_cents) AS med_cents,
                   percentile(abs_dev, 0.5) AS mad_cents
            FROM dev GROUP BY event_type
        )
        SELECT d.event_type,
               m.med_cents,
               m.mad_cents,
               COUNT(*) AS n_events,
               COUNT(*) FILTER (WHERE d.abs_dev > 3 * m.mad_cents)
                   AS n_outliers
        FROM dev d JOIN mad m ON d.event_type = m.event_type
        GROUP BY d.event_type, m.med_cents, m.mad_cents
        """
    )
