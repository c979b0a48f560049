"""Events-table queries: time/JSON scalar functions (SURVEY.md §2.8
F2-F7, F14-F16) and event-log-style aggregations.

The events table mirrors the reference's semi-structured surfaces: a JSON
``props`` column (like `SaleItems` / `_rescued_data` / the DLT event log's
``details``) and an event-time column.

Oracle-dialect mapping used throughout:
  Spark ``from_unixtime(x)``            ↔ DuckDB ``strftime(to_timestamp(x), '%Y-%m-%d %H:%M:%S')``
  Spark ``unix_timestamp(ts)``          ↔ DuckDB ``floor(epoch(ts))::BIGINT``
  Spark ``get_json_object(p,'$.k')``    ↔ DuckDB ``json_extract_string(p,'$.k')``
  Spark ``from_json(p,'k INT').k``      ↔ DuckDB ``json_extract_string(p,'$.k')::INTEGER``
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataengineeringworkshop_spark.plans.registry import dsum, query
from dataengineeringworkshop_spark.plans.tables import load_table


@query(
    "f2_from_unixtime",
    oracle="""
        SELECT event_id,
               strftime(to_timestamp(CAST(floor(epoch(ts)) AS BIGINT)), '%Y-%m-%d %H:%M:%S') AS ts_str
        FROM events
    """,
    tags=("F2", "F4", "F5"),
)
def f2_from_unixtime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_unixtime(epoch) → 'yyyy-MM-dd HH:mm:ss' string (N2:339) — the
    silver layer's string-typed ts; unix_timestamp truncates sub-seconds."""
    e = load_table(spark, sf_dir, "events")
    return e.select("event_id", F.from_unixtime(F.unix_timestamp("ts")).alias("ts_str"))


@query(
    "f3_from_unixtime_fmt",
    oracle="""
        SELECT event_id,
               strftime(to_timestamp(CAST(floor(epoch(ts)) AS BIGINT)), '%Y-%m-%d') AS event_day
        FROM events
    """,
    tags=("F3",),
)
def f3_from_unixtime_fmt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_unixtime(ts, 'yyyy-MM-dd') (`Utils/Define-Functions.py:27`)."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id", F.from_unixtime(F.unix_timestamp("ts"), "yyyy-MM-dd").alias("event_day")
    )


@query(
    "f5_unix_timestamp_parse",
    oracle="""
        SELECT o_orderkey,
               CAST(floor(epoch(strptime(CAST(o_orderdate AS VARCHAR), '%Y-%m-%d %H:%M:%S'))) AS BIGINT) AS epoch_s
        FROM orders
    """,
    tags=("F5", "F9"),
)
def f5_unix_timestamp_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unix_timestamp(string) parse (N2:516) — string → epoch seconds."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.unix_timestamp(F.col("o_orderdate").cast("string")).alias("epoch_s"),
    )


@query(
    "f16_get_json_object",
    oracle="SELECT event_id, json_extract_string(props, '$.k') AS k_str FROM events",
    tags=("F16",),
)
def f16_get_json_object(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object — the OSS stand-in for Databricks `col:path`
    extraction (N2:516, N3:147-151)."""
    e = load_table(spark, sf_dir, "events")
    return e.select("event_id", F.get_json_object("props", "$.k").alias("k_str"))


@query(
    "f7_current_timestamp_bound",
    oracle="SELECT DISTINCT TRUE AS ts_sane FROM events",
    tags=("F7", "F4"),
)
def f7_current_timestamp_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """current_timestamp()/unix_timestamp() (N2:268, DF:42): their values
    are nondeterministic, so the oracle pins a sanity predicate — the
    wall clock is after 2024 and both functions agree to within a day."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        (
            (F.current_timestamp() > F.lit("2024-01-01").cast("timestamp"))
            & (F.abs(F.unix_timestamp() - F.unix_timestamp(F.current_timestamp())) < 86400)
        ).alias("ts_sane")
    ).distinct()


@query(
    "f15_schema_of_json",
    oracle="""
        SELECT DISTINCT 'STRUCT<k: BIGINT>' AS props_schema
        FROM events WHERE props IS NOT NULL
    """,
    tags=("F15",),
)
def f15_schema_of_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """schema_of_json (N3:149): infer the DDL schema of the events
    ``props`` JSON.  The oracle pins the expected inference result — a
    literal parity check on Spark's inference output."""
    e = load_table(spark, sf_dir, "events")
    return e.filter(F.col("props").isNotNull()).select(
        F.schema_of_json(F.lit('{"k": 69}')).alias("props_schema")
    ).distinct()


@query(
    "f14_from_json_field",
    oracle="SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val FROM events",
    tags=("F14", "F18"),
)
def f14_from_json_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json with DDL schema + struct field access (N2:387-390)."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id", F.from_json("props", "k INT").getField("k").alias("k_val")
    )


@query(
    "e_hourly_type_stats",
    oracle=f"""
        SELECT date_trunc('hour', ts) AS event_hour, event_type,
               COUNT(*) AS n_events, {dsum("value", "total_value")}
        FROM events GROUP BY event_hour, event_type
    """,
    bench=True,
    tags=("A5", "A2"),
)
def e_hourly_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-log rollup: per-hour per-type counts + value sum (the
    `flow_progress` metrics-rollup shape, N3:156-168)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(
        F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz").alias("event_hour"),
        "event_type",
    ).agg(
        F.count("*").alias("n_events"),
        F.expr("CAST(SUM(CAST((value) AS DECIMAL(18,4))) AS DOUBLE)").alias("total_value"),
    )


@query(
    "e_json_value_stats",
    oracle="""
        SELECT event_type,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS k_total,
               COUNT(*) AS n
        FROM events GROUP BY event_type
    """,
    tags=("F16", "A3"),
)
def e_json_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over a JSON-extracted field — the event-log audit query
    shape (N3:134-151)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("int")).cast("long").alias("k_total"),
        F.count("*").alias("n"),
    )


@query(
    "pp_partition_pruned_events",
    oracle=f"""
        SELECT strftime(ts, '%Y-%m-%d') AS event_date, event_type,
               COUNT(*) AS n_events, {dsum("value", "total_value")}
        FROM events
        WHERE strftime(ts, '%Y-%m-%d') BETWEEN '2024-01-10' AND '2024-01-12'
        GROUP BY event_date, event_type
    """,
    tags=("ext-layout",),
)
def pp_partition_pruned_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-partitioned table layout + partition pruning: the events
    table is (re)written hive-partitioned on ``event_date`` once per
    session (the artifact a production pipeline maintains as its
    canonical layout), and a 3-day window query then touches only 3 of
    ~30 date directories — the filter shows up as ``PartitionFilters``
    in the scan, not as row-level filtering.  At 100 TB a date-keyed
    layout like this is the difference between scanning 3 days and
    scanning 3 years; see also ``sources/bucketing.py`` for the
    join-key analog."""
    from dataengineeringworkshop_spark.operators.materialize import materialize

    e = load_table(spark, sf_dir, "events")
    part = materialize(
        e.withColumn("event_date", F.date_format("ts", "yyyy-MM-dd")),
        label="events_by_date",
        cache_key=f"events_by_date:{sf_dir}",
        partition_by=("event_date",),
    )
    # partition-type inference reads the directory values back as DATE;
    # filter on that raw column (so the predicate stays a PartitionFilter)
    # and re-format to string only in the output projection.
    return (
        part.filter(
            F.col("event_date").between(
                F.lit("2024-01-10").cast("date"), F.lit("2024-01-12").cast("date")
            )
        )
        .groupBy(
            F.date_format("event_date", "yyyy-MM-dd").alias("event_date"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.expr("CAST(SUM(CAST((value) AS DECIMAL(18,4))) AS DOUBLE)").alias("total_value"),
        )
    )


_ZSCORE_SQL = """
    WITH stats AS (
        SELECT user_id,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(28,14))) AS DOUBLE) AS s,
               CAST(SUM(CAST(value * value AS DECIMAL(28,14))) AS DOUBLE) AS ss
        FROM {table}
        GROUP BY user_id
    ),
    mo AS (
        SELECT user_id, n,
               (s / n) AS mean,
               sqrt((ss / n) - ((s / n) * (s / n))) AS std
        FROM stats
        WHERE n >= 10
    )
    SELECT e.event_id, e.user_id, e.value,
           ROUND((e.value - mo.mean) / mo.std, 6) AS z
    FROM {table} e JOIN mo ON e.user_id = mo.user_id
    WHERE mo.std > 0
      AND ((e.value - mo.mean) / mo.std > 2 OR (e.value - mo.mean) / mo.std < -2)
"""


@query(
    "e_user_zscore_outliers",
    oracle=_ZSCORE_SQL.format(table="events"),
    tags=("ext-text", "A3"),
)
def e_user_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity anomaly detection: events whose value is >2 population
    standard deviations from their user's mean (users with ≥10 events).
    One partial-agg pass builds per-user moments (count / Σv / Σv² as
    exact decimals), broadcast back into a second scan — the classic
    two-pass z-score at corpus scale, no window over the full table.
    Identical SQL text runs on both engines → bit-identical z."""
    from dataengineeringworkshop_spark.plans.tables import register_views

    register_views(spark, sf_dir, "events")
    return spark.sql(_ZSCORE_SQL.format(table="dew_events"))


_CORR_SQL = """
    WITH m AS (
        SELECT event_type,
               COUNT(*) AS n,
               -- moments stay DECIMAL (exact): value is 2-decimal data so
               -- DECIMAL(18,4) captures it exactly; user_id needs a
               -- 19-digit factor so DuckDB multiplies in int128 (width 18
               -- multiplies in int64 and overflows on ~1e10-scale ids)
               SUM(CAST(value AS DECIMAL(18,4))) AS sx,
               SUM(CAST(user_id AS DECIMAL(19,0))) AS sy,
               SUM(CAST(value AS DECIMAL(18,4))
                   * CAST(value AS DECIMAL(18,4))) AS sxx,
               SUM(CAST(user_id AS DECIMAL(19,0))
                   * CAST(user_id AS DECIMAL(19,0))) AS syy,
               SUM(CAST(value AS DECIMAL(18,4))
                   * CAST(user_id AS DECIMAL(19,0))) AS sxy
        FROM {table}
        GROUP BY event_type
    ),
    d AS (
        -- the cancellation-prone combinations (n*Sxy - Sx*Sy etc.) are
        -- formed EXACTLY in decimal and only the small results cross to
        -- double: doing the subtraction in double amplifies the two
        -- engines' independent 1-ulp decimal->double roundings by the
        -- ~1e12/1e2 condition number (caught by the sf1 sweep, where
        -- covar_pop diverged in the 4th decimal).  The down-casts pin
        -- widths so every product stays inside DECIMAL(38) exactly;
        -- headroom: n < 1e9 rows/group, |Sx| < 1e12, |Sy| < 1e18.
        -- Beyond that the failure must stay LOUD on both engines:
        -- DuckDB decimal arithmetic always errors on overflow, but the
        -- default Spark session is non-ANSI (decimal overflow silently
        -- yields NULL), so the Spark side injects an assert_true WHERE
        -- guard on exactly these bounds via {guard} (empty in the
        -- oracle; a guard COLUMN would be pruned as dead, a filter
        -- cannot be).
        -- every product keeps one factor at width >= 19: DuckDB
        -- multiplies two <=18-width decimals in int64 (overflows on
        -- these magnitudes); a 19+-width factor forces int128
        SELECT event_type, n,
               CAST(CAST(n AS DECIMAL(9,0)) * CAST(sxy AS DECIMAL(25,4))
                    - CAST(sx AS DECIMAL(16,4)) * CAST(sy AS DECIMAL(19,0))
                    AS DOUBLE) AS cnum,
               CAST(CAST(n AS DECIMAL(9,0)) * CAST(sxx AS DECIMAL(20,8))
                    - CAST(sx AS DECIMAL(19,4)) * CAST(sx AS DECIMAL(16,4))
                    AS DOUBLE) AS vx,
               CAST(CAST(n AS DECIMAL(9,0)) * CAST(syy AS DECIMAL(27,0))
                    - CAST(sy AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0))
                    AS DOUBLE) AS vy
        FROM m {guard}
    )
    SELECT event_type, n,
           ROUND(cnum / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS covar_pop,
           ROUND(cnum / sqrt(vx * vy), 6) AS corr
    FROM d
"""


# loud overflow guard for the Spark side of _CORR_SQL (see the headroom
# comment there): the default session is non-ANSI, where a decimal
# overflow would silently NULL the moments — assert the documented
# bounds instead.  Costs one predicate over the ≤|groups| aggregated
# rows.  (The oracle side formats guard="" — DuckDB decimal arithmetic
# always errors on overflow on its own.)
_CORR_GUARD = (
    "WHERE COALESCE(assert_true("
    "n < 1000000000 AND abs(sx) < 1e12 AND abs(sy) < 1e18, "
    "'a12_corr_covar: moment headroom exceeded (n<1e9, |Sx|<1e12, "
    "|Sy|<1e18) — widen the decimal moment widths'), TRUE)"
)


@query(
    "a12_corr_covar",
    oracle=_CORR_SQL.format(table="events", guard=""),
    tags=("extra", "A3"),
)
def a12_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population covariance + Pearson correlation per group, computed
    from exact decimal moment sums (n, Σx, Σy, Σx², Σy², Σxy) instead of
    the engines' corr/covar built-ins — one partial-agg pass, and the
    derived doubles are bit-identical across engines because every
    division/sqrt runs on identical operands.  The mergeable-moments
    formulation is also exactly what a 100 TB profile computes per
    partition and combines."""
    from dataengineeringworkshop_spark.plans.tables import register_views

    register_views(spark, sf_dir, "events")
    return spark.sql(_CORR_SQL.format(table="dew_events", guard=_CORR_GUARD))


@query(
    "w9_sliding_event_windows",
    # each event belongs to the 4 overlapping [start, start+1h) windows
    # whose starts are the 15-min marks in (ts-1h, ts]; the oracle
    # materializes exactly those via a 0..3 offset unnest
    oracle="""
        WITH slid AS (
            SELECT e.event_type, e.value,
                   -- make_timestamp(µs) keeps the window start a NAIVE
                   -- timestamp (to_timestamp would yield TIMESTAMPTZ and
                   -- mismatch Spark's ntz output in the driver's hasher)
                   make_timestamp(
                       ((CAST(floor(epoch(e.ts) / 900) AS BIGINT) - k.k) * 900)
                       * 1000000
                   ) AS window_start
            FROM events e
            CROSS JOIN (SELECT unnest(range(0, 4)) AS k) k
        )
        SELECT window_start, event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        FROM slid
        GROUP BY window_start, event_type
    """,
    tags=("ext-streaming", "ST-window", "ext-analytics"),
)
def w9_sliding_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLIDING event-time windows (1-hour length, 15-minute slide) via
    ``F.window(ts, '1 hour', '15 minutes')`` — Spark's native sliding
    window explodes each event into its length/slide = 4 overlapping
    windows, the semantics a monitoring dashboard's moving counters
    use.  The oracle recomputes the same 4-window membership from epoch
    arithmetic, pinning Spark's window-start alignment rule (windows
    align to the epoch, start-inclusive end-exclusive).  Batch mode
    here; the identical expression runs under readStream with a
    watermark (st_windowed_event_counts is the tumbling twin)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window(F.col("ts").cast("timestamp"), "1 hour", "15 minutes").alias("w"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.expr("CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)").alias(
                "total_value"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
