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
    approx_percentile (``a_sketch_bounds`` pins its error bounds).

    Pass structure (round-9 scan audit): exact MAD is inherently
    multi-pass (median of deviations needs the median first), but the
    single-statement CTE form re-ran the shared ``dev`` intermediate
    per consumer (Spark inlines CTEs) for FOUR event scans.  The two
    |event-types|-row stages (median, then MAD) are ``materialize()``d
    — each build is one pruned scan joined to the previous tiny
    artifact — and the final outlier count is a third scan against the
    broadcast stats: 3 scans, the exact-two-stage-median minimum."""
    from dataengineeringworkshop_spark.operators.materialize import materialize

    register_views(spark, sf_dir, "events")
    med = materialize(
        spark.sql(
            """
            SELECT event_type,
                   percentile(CAST(round(value * 100, 0) AS BIGINT), 0.5)
                       AS med_cents
            FROM dew_events GROUP BY event_type
            """
        ),
        label="mad_med",
        cache_key=f"mad_med:{sf_dir}",
    )
    med.createOrReplaceTempView("dew_mad_med")
    mad = materialize(
        spark.sql(
            """
            SELECT e.event_type,
                   MIN(m.med_cents) AS med_cents,
                   percentile(
                       abs(CAST(round(e.value * 100, 0) AS BIGINT)
                           - m.med_cents), 0.5) AS mad_cents
            FROM dew_events e
            JOIN dew_mad_med m ON e.event_type = m.event_type
            GROUP BY e.event_type
            """
        ),
        label="mad_stats",
        cache_key=f"mad_stats:{sf_dir}",
    )
    mad.createOrReplaceTempView("dew_mad_stats")
    return spark.sql(
        """
        SELECT e.event_type,
               m.med_cents,
               m.mad_cents,
               COUNT(*) AS n_events,
               COUNT(*) FILTER (
                   WHERE abs(CAST(round(e.value * 100, 0) AS BIGINT)
                             - m.med_cents) > 3 * m.mad_cents
               ) AS n_outliers
        FROM dew_events e
        JOIN dew_mad_stats m ON e.event_type = m.event_type
        GROUP BY e.event_type, m.med_cents, m.mad_cents
        """
    )


# ---------------------------------------------------------------------------
# Round-6 wave 7: hierarchical rollups, OHLC bars, dyadic EWMA
# ---------------------------------------------------------------------------

@query(
    "ts_rollup_cascade",
    # oracle recomputes the DAILY grain directly from raw events — the
    # whole claim of a rollup cascade is that re-aggregating hourly
    # partials is indistinguishable from aggregating the raw stream
    oracle="""
        SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_id,
               event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
               MIN(CAST(round(value * 100, 0) AS BIGINT)) AS min_cents,
               MAX(CAST(round(value * 100, 0) AS BIGINT)) AS max_cents,
               COUNT(DISTINCT CAST(floor(epoch(ts) / 3600) AS BIGINT))
                   AS n_active_hours
        FROM events
        GROUP BY day_id, event_type
    """,
    bench=True,
    tags=("ext-analytics", "timeseries", "incremental"),
)
def ts_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup cascade (the hypertable continuous-aggregate
    pattern): the DAILY grain is computed FROM the hourly partials, not
    from raw events — count, DECIMAL sum, min, max are all mergeable,
    so re-aggregating partials is exact, and ``n_active_hours`` falls
    out as a free COUNT(*) over the hourly rows (a distinct-count on
    raw data, a plain count on partials).  The driver hash-checks the
    cascade against a direct raw→daily recompute.  At 100 TB this is
    the only affordable shape: each coarser grain reads the previous
    grain's |groups| rows, and the raw stream is scanned exactly once.
    The decimal partial stays DECIMAL through the cascade — the cast to
    double happens once, at the final grain (mv_incremental_agg rule)."""
    register_views(spark, sf_dir, "events")
    return spark.sql(
        """
        WITH hourly AS (
            SELECT CAST(floor(unix_timestamp(CAST(ts AS TIMESTAMP)) / 3600)
                        AS BIGINT) AS hour_id,
                   event_type,
                   COUNT(*) AS pn,
                   SUM(CAST(value AS DECIMAL(18,4))) AS psum,
                   MIN(CAST(round(value * 100, 0) AS BIGINT)) AS pmin,
                   MAX(CAST(round(value * 100, 0) AS BIGINT)) AS pmax
            FROM dew_events
            GROUP BY hour_id, event_type
        )
        SELECT CAST(floor(hour_id / 24) AS BIGINT) AS day_id,
               event_type,
               CAST(SUM(pn) AS BIGINT) AS n_events,
               CAST(SUM(psum) AS DOUBLE) AS total_value,
               MIN(pmin) AS min_cents,
               MAX(pmax) AS max_cents,
               COUNT(*) AS n_active_hours
        FROM hourly
        GROUP BY day_id, event_type
        """
    )


# OHLC first/last determinism: both engines pick the open/close row by a
# row_number over (ts, event_id) — the unique event_id tiebreak makes the
# endpoints engine-independent even under equal timestamps; the bar then
# folds them in with conditional MAX (one grouped agg, no self-join).
_OHLC_BODY = """
WITH cents AS (
    SELECT CAST(floor({epoch_sec} / 86400) AS BIGINT) AS day_id,
           event_type,
           CAST(round(value * 100, 0) AS BIGINT) AS v_cents,
           row_number() OVER (
               PARTITION BY CAST(floor({epoch_sec} / 86400) AS BIGINT),
                            event_type
               ORDER BY ts ASC, event_id ASC) AS rn_asc,
           row_number() OVER (
               PARTITION BY CAST(floor({epoch_sec} / 86400) AS BIGINT),
                            event_type
               ORDER BY ts DESC, event_id DESC) AS rn_desc
    FROM {events}
)
SELECT day_id, event_type,
       MAX(CASE WHEN rn_asc = 1 THEN v_cents END) AS open_cents,
       MAX(v_cents) AS high_cents,
       MIN(v_cents) AS low_cents,
       MAX(CASE WHEN rn_desc = 1 THEN v_cents END) AS close_cents,
       COUNT(*) AS n_ticks
FROM cents
GROUP BY day_id, event_type
"""


@query(
    "ts_ohlc_bars",
    oracle=_OHLC_BODY.format(epoch_sec="epoch(ts)", events="events"),
    tags=("ext-analytics", "timeseries"),
)
def ts_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC (open/high/low/close) bars per event type — the
    downsampling shape every metrics store renders.  Open and close are
    selected by row_number over (ts, event_id) — first/last-value with a
    unique tiebreak, folded into the bar with conditional MAX so the
    whole bar is ONE grouped aggregate over the windowed scan (no
    self-join back to the endpoints).  High/low compare integer cents
    (exact selection).  Scale shape: the two windows share one
    (day, type) hash partitioning with opposite sort orders, then the
    groupBy lands on the same keys — a single exchange footprint; bar
    count is |days| × |types| regardless of tick volume."""
    register_views(spark, sf_dir, "events")
    return spark.sql(
        _OHLC_BODY.format(
            epoch_sec="unix_timestamp(CAST(ts AS TIMESTAMP))",
            events="dew_events",
        )
    )


def _ewma_terms(n: int) -> str:
    """SUM of the trailing-``n`` dyadic decay terms: v_{k} · 2^{-(k+1)}
    for lag k = 0..n-1.  Every weight is a power of two and every input
    an integer cent count, so each term — and the sum — is EXACT in
    double no matter the evaluation order (all terms are multiples of
    2^{-n} cents, far inside the 53-bit mantissa).  The identical
    fragment runs on Spark and DuckDB."""
    return " + ".join(
        f"COALESCE(CAST(lag(v_cents, {k}) OVER w AS DOUBLE), 0.0) / {2 ** (k + 1)}.0"
        for k in range(n)
    )


_EWMA_BODY = f"""
WITH cents AS (
    SELECT user_id, ts, event_id,
           CAST(round(value * 100, 0) AS BIGINT) AS v_cents
    FROM {{events}}
),
decayed AS (
    SELECT user_id, ts, event_id, v_cents,
           {_ewma_terms(16)} AS ewma_cents,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn_last,
           COUNT(*) OVER (PARTITION BY user_id) AS n_events
    FROM cents
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
)
SELECT user_id, v_cents AS last_cents, ewma_cents, n_events
FROM decayed WHERE rn_last = 1
"""


@query(
    "ts_ewma_dyadic",
    oracle=_EWMA_BODY.format(events="events"),
    tags=("ext-analytics", "timeseries"),
)
def ts_ewma_dyadic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-decayed reading per user (EWMA, α = 1/2) over the
    trailing 16 events, reported at each user's LAST event.  Float EWMA
    is normally hash-hostile (a recursive product of doubles); this one
    is bit-exact by construction — integer cents × power-of-two weights
    means every term is a dyadic rational well inside the double
    mantissa, so Spark and DuckDB agree to the last bit without any
    rounding step.  One user_id window computes the decay (16 lags over
    ONE shared sort — state is the trailing buffer, the streaming
    shape); the per-user event count rides the SAME window partition
    (round-9 scan audit: a correlated COUNT subquery here re-scanned
    events a second time), so the whole query is one scan + one
    exchange, and the per-user reduction keeps output at |users|
    rows."""
    register_views(spark, sf_dir, "events")
    return spark.sql(_EWMA_BODY.format(events="dew_events"))


# seasonal-naive backtest body: hourly counts per type; forecast(h) =
# count(h - 24); evaluate only hours where both sides exist (gap-robust
# join on hour_id - 24, not a row lag).  Integer counts -> exact abs
# errors; the MAE is one exact-decimal division rounded at the end.
_SEASONAL_BODY = """
    WITH hourly AS (
        SELECT CAST(floor({epoch_sec} / 3600) AS BIGINT) AS hour_id,
               event_type,
               COUNT(*) AS n
        FROM {events}
        GROUP BY 1, 2
    ),
    eval AS (
        SELECT a.event_type,
               ABS(a.n - f.n) AS abs_err
        FROM hourly a
        JOIN hourly f
          ON f.event_type = a.event_type AND f.hour_id = a.hour_id - 24
    )
    SELECT event_type,
           COUNT(*) AS n_eval_hours,
           CAST(SUM(abs_err) AS BIGINT) AS total_abs_err,
           ROUND(CAST(CAST(SUM(abs_err) AS DECIMAL(18,4)) AS DOUBLE)
                 / COUNT(*), 6) AS mae
    FROM eval
    GROUP BY event_type
"""


@query(
    "ts_seasonal_naive_forecast",
    oracle=_SEASONAL_BODY.format(epoch_sec="epoch(ts)", events="events"),
    tags=("ext-analytics", "timeseries"),
)
def ts_seasonal_naive_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each hour's per-type
    event count with the count 24 hours earlier and score MAE per type
    — the baseline every capacity-planning / anomaly model must beat,
    and the cheapest possible one (zero parameters).  Gap-robust: the
    forecast joins on hour_id - 24 rather than lagging rows, so missing
    hours drop out of the eval set instead of silently pairing
    misaligned hours.  The hourly count table feeds BOTH sides of that
    self-join, and Spark inlines CTEs — so the raw-events partial-agg
    would run twice (round-8 scan audit); it is built once and
    ``materialize()``d (the standing hourly-rollup table a monitoring
    pipeline maintains anyway), making the backtest one corpus scan
    plus a self-join over |hours × types| rows.  Hour ids are integer
    epoch division, counts are integers, so the only float op is the
    final exact-decimal MAE division, rounded to 6 per the contract."""
    from dataengineeringworkshop_spark.operators.materialize import materialize

    register_views(spark, sf_dir, "events")
    hourly = materialize(
        spark.sql(
            """
            SELECT CAST(floor(unix_timestamp(CAST(ts AS TIMESTAMP)) / 3600)
                        AS BIGINT) AS hour_id,
                   event_type,
                   COUNT(*) AS n
            FROM dew_events
            GROUP BY 1, 2
            """
        ),
        "seasonal_hourly",
        cache_key=f"seasonal_hourly:{sf_dir}",
    )
    hourly.createOrReplaceTempView("dew_seasonal_hourly")
    return spark.sql(
        """
        WITH eval AS (
            SELECT a.event_type,
                   ABS(a.n - f.n) AS abs_err
            FROM dew_seasonal_hourly a
            JOIN dew_seasonal_hourly f
              ON f.event_type = a.event_type AND f.hour_id = a.hour_id - 24
        )
        SELECT event_type,
               COUNT(*) AS n_eval_hours,
               CAST(SUM(abs_err) AS BIGINT) AS total_abs_err,
               ROUND(CAST(CAST(SUM(abs_err) AS DECIMAL(18,4)) AS DOUBLE)
                     / COUNT(*), 6) AS mae
        FROM eval
        GROUP BY event_type
        """
    )


# M4 downsampling body (Jugel et al., "M4: A Visualization-Oriented Time
# Series Data Aggregation", VLDB 2014 — the public result that first/last/
# min/max per pixel-bucket reproduces a line rendering exactly): four
# rank windows sharing one (series, bucket) partitioning; value is a
# passthrough double (no arithmetic), tiebreaks unique via event_id.
_M4_BODY = """
    WITH pts AS (
        -- integer MICROSECONDS on both sides: DuckDB's epoch() returns
        -- FRACTIONAL seconds (a BIGINT cast would round, Spark's
        -- unix_timestamp truncates — off-by-one at .5+) and the
        -- first/last orderings must compare identical instants
        SELECT event_type,
               CAST(floor(CAST({epoch_us} AS DOUBLE) / 3600000000) AS BIGINT)
                   AS bkt,
               {epoch_us} AS t_us, event_id, value
        FROM {events}
        -- NULL readings are not renderable points; filtering them also
        -- closes a latent cross-engine divergence (Spark orders ASC
        -- NULLS FIRST, DuckDB NULLS LAST, so an unguarded rn_min would
        -- pick different rows)
        WHERE value IS NOT NULL
    ),
    r AS (
        SELECT event_type, bkt, t_us, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY event_type, bkt
                                  ORDER BY t_us, event_id) AS rn_first,
               ROW_NUMBER() OVER (PARTITION BY event_type, bkt
                                  ORDER BY t_us DESC, event_id DESC) AS rn_last,
               ROW_NUMBER() OVER (PARTITION BY event_type, bkt
                                  ORDER BY value ASC, t_us, event_id) AS rn_min,
               ROW_NUMBER() OVER (PARTITION BY event_type, bkt
                                  ORDER BY value DESC, t_us, event_id) AS rn_max
        FROM pts
    )
    SELECT event_type, bkt, CAST(t_us AS BIGINT) AS t_us, event_id, value,
           rn_first = 1 AS is_first,
           rn_last = 1 AS is_last,
           rn_min = 1 AS is_min,
           rn_max = 1 AS is_max
    FROM r
    WHERE rn_first = 1 OR rn_last = 1 OR rn_min = 1 OR rn_max = 1
"""


@query(
    "ts_m4_downsample",
    oracle=_M4_BODY.format(epoch_us="epoch_us(ts)", events="events"),
    tags=("ext-analytics", "timeseries"),
)
def ts_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 visualization downsampling (Jugel et al., VLDB 2014): keep at
    most the first, last, min, and max point of every (series,
    hour-bucket) — the published minimal point set that renders the
    SAME line as the raw data at one bucket per pixel column.  A
    billion-point series downsamples to <= 4 × buckets rows in one
    pass: all four rank windows share a single (event_type, bkt) hash
    partitioning (one exchange, four in-partition sorts), values pass
    through untouched (no float arithmetic anywhere), and the
    (t, event_id) tiebreaks make every selected point — and therefore
    the driver hash — deterministic."""
    register_views(spark, sf_dir, "events")
    return spark.sql(
        _M4_BODY.format(
            epoch_us="unix_micros(CAST(ts AS TIMESTAMP))",
            events="dew_events",
        )
    )
