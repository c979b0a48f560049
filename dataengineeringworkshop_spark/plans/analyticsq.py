"""Behavioral-analytics and incremental-maintenance queries (round 6).

Product-analytics surface every warehouse user expects on an events
table — funnel conversion, cohort retention, path mining, moving
time-range windows, FILTER-clause aggregates — plus the incremental
materialized-view maintenance pattern that makes 100 TB aggregates
affordable: aggregate ONLY the delta batch and merge it with the stored
partials (count/decimal-sum form a commutative monoid, so partial-merge
equals full recompute — which is exactly what the DuckDB oracle
asserts by recomputing from scratch).

Scale shapes:
- Funnel: three per-user scalar aggregates chained by (user_id)
  equi-joins — every stage shuffles on the same key, so AQE coalesces
  them onto one exchange footprint; no window over the raw stream.
- Retention: one groupBy(user) for cohorts + one join back on user_id +
  one grouped count-distinct; week arithmetic is integer epoch-division
  (no calendar functions in the hot path).
- Path bigrams: a single lag() window partitioned by user — state is
  one row per partition, the streaming-friendly shape.
- Moving revenue: RANGE interval frame partitioned by customer; Spark
  evaluates it with a bounded sliding frame per partition, never a
  global sort.
- MV maintenance: the delta aggregate touches only `delta` rows; the
  merge is a groupBy over |groups| partial rows, independent of base
  table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dataengineeringworkshop_spark.plans.registry import kbucket, query
from dataengineeringworkshop_spark.plans.tables import register_views

# Spark SQL and DuckDB share this ANSI funnel text verbatim (dialect-free):
# stage N's population = users whose stage-N event strictly follows their
# earliest stage-(N-1) event — the standard ordered-funnel semantics.
_FUNNEL_BODY = """
WITH v AS (
    SELECT user_id, MIN(ts) AS t_view
    FROM {events} WHERE event_type = 'view' GROUP BY user_id
),
c AS (
    SELECT e.user_id, MIN(e.ts) AS t_click
    FROM {events} e JOIN v ON e.user_id = v.user_id
    WHERE e.event_type = 'click' AND e.ts > v.t_view
    GROUP BY e.user_id
),
p AS (
    SELECT e.user_id, MIN(e.ts) AS t_purchase
    FROM {events} e JOIN c ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase' AND e.ts > c.t_click
    GROUP BY e.user_id
)
SELECT 1 AS stage, 'view' AS stage_name,
       (SELECT COUNT(*) FROM v) AS n_users
UNION ALL
SELECT 2, 'click', (SELECT COUNT(*) FROM c)
UNION ALL
SELECT 3, 'purchase', (SELECT COUNT(*) FROM p)
"""


@query(
    "e_funnel_conversion",
    oracle=_FUNNEL_BODY.format(events="events"),
    bench=True,
    tags=("ext-analytics",),
)
def e_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → click → purchase): how many users reach
    each stage, where a stage only counts if it happens STRICTLY AFTER
    the user's earliest previous-stage event.  Three per-user MIN
    aggregates chained by user_id equi-joins — no self-join on the raw
    stream, no window; each stage's input shrinks monotonically."""
    register_views(spark, sf_dir, "events")
    return spark.sql(_FUNNEL_BODY.format(events="dew_events"))


_RETENTION_BODY = """
WITH f AS (
    SELECT user_id, MIN(ts) AS t0 FROM {events} GROUP BY user_id
)
SELECT CAST(FLOOR({epoch_t0} / 604800) AS BIGINT) AS cohort_week,
       CAST(FLOOR({epoch_ts} / 604800) - FLOOR({epoch_t0} / 604800) AS BIGINT)
           AS week_offset,
       COUNT(DISTINCT e.user_id) AS n_active
FROM {events} e JOIN f ON e.user_id = f.user_id
GROUP BY 1, 2
"""


@query(
    "e_retention_cohorts",
    oracle=_RETENTION_BODY.format(
        events="events",
        epoch_t0="epoch(f.t0)",
        epoch_ts="epoch(e.ts)",
    ),
    tags=("ext-analytics",),
)
def e_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users bucketed by first-seen
    epoch-week, activity counted per (cohort_week, week_offset).  Week
    arithmetic is integer epoch division — engine-portable and free of
    calendar/timezone functions (session TZ pinned UTC either way).
    One groupBy(user) + one user_id join + one grouped distinct."""
    register_views(spark, sf_dir, "events")
    return spark.sql(
        _RETENTION_BODY.format(
            events="dew_events",
            epoch_t0="unix_timestamp(f.t0)",
            epoch_ts="unix_timestamp(e.ts)",
        )
    )


_PATH_BODY = """
WITH seq AS (
    SELECT user_id, event_type,
           LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS prev_type
    FROM {events}
)
SELECT prev_type, event_type AS next_type, COUNT(*) AS n_transitions
FROM seq WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
"""


@query(
    "e_user_path_bigrams",
    oracle=_PATH_BODY.format(events="events"),
    tags=("ext-analytics",),
)
def e_user_path_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-path mining: the user-journey transition matrix
    (prev_type → next_type counts) via one lag() window per user.
    ORDER BY (ts, event_id) — the unique event_id tiebreaker makes the
    sequence, and therefore every transition count, deterministic."""
    register_views(spark, sf_dir, "events")
    return spark.sql(_PATH_BODY.format(events="dew_events"))


@query(
    "w6_time_range_window",
    oracle="""
        SELECT o_orderkey, o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate
                   RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS revenue_7d
        FROM orders
    """,
    tags=("ext-analytics", "W2"),
)
def w6_time_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving 7-day revenue per customer: a RANGE interval frame over
    event time — the time-windowed aggregation RANGE frames exist for
    (ROWS frames can't express "trailing week").  Peers at the same
    timestamp are in-frame in both engines (RANGE includes ties), and
    the frame sum folds through DECIMAL so accumulation order can't
    perturb the double."""
    register_views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate
                   RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS revenue_7d
        FROM dew_orders
        """
    )


_FILTERED_AGG_BODY = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
            FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS finished_revenue
FROM {orders}
GROUP BY o_orderpriority
"""


@query(
    "a13_filtered_agg",
    oracle=_FILTERED_AGG_BODY.format(orders="orders"),
    tags=("ext-analytics", "A1"),
)
def a13_filtered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI FILTER-clause aggregates — per-group conditional counts and
    sums in ONE scan/shuffle instead of N filtered self-aggregations
    (the conditional-aggregation idiom every reporting query uses).
    Identical SQL text runs on both engines."""
    register_views(spark, sf_dir, "orders")
    return spark.sql(_FILTERED_AGG_BODY.format(orders="dew_orders"))


@query(
    "mv_incremental_agg",
    # the oracle is the FULL recompute — the whole claim of incremental
    # MV maintenance is that merging delta partials into stored partials
    # is indistinguishable from recomputing over base ∪ delta
    oracle="""
        SELECT o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM orders GROUP BY o_orderstatus
    """,
    tags=("ext-analytics", "incremental"),
)
def mv_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the standing MV holds
    per-group partials (count + exact DECIMAL sum) over the base rows
    (o_orderkey % 10 != 0); a delta batch (% 10 = 0) is aggregated
    ALONE and merged by summing partials.  count and decimal-sum are a
    commutative monoid, so the merge is exact — the driver hash-checks
    it against a full recompute.  At 100 TB the delta aggregate reads
    only the new files and the merge touches |groups| rows, never the
    base table."""
    from pyspark.sql import functions as F

    from dataengineeringworkshop_spark.plans.tables import load_table

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )

    def partials(df: DataFrame) -> DataFrame:
        # keep the sum in DECIMAL: partial-merge must be exact, the
        # cast to double happens once, after the final merge
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("psum"),
        )

    mv = partials(o.filter(F.col("o_orderkey") % 10 != 0))  # the stored MV
    delta = partials(o.filter(F.col("o_orderkey") % 10 == 0))  # the new batch
    return (
        mv.unionByName(delta)
        .groupBy("o_orderstatus")
        .agg(
            F.sum("pn").cast("long").alias("n_orders"),
            F.sum("psum").cast("double").alias("revenue"),
        )
    )


_SESSION_PATHS_SPARK = """
WITH flagged AS (
    SELECT user_id, ts, event_id, event_type,
           CASE WHEN lag(ts) OVER w IS NULL
                     OR unix_micros(cast(ts AS timestamp))
                        - unix_micros(cast(lag(ts) OVER w AS timestamp))
                        > 1800000000
                THEN 1 ELSE 0 END AS new_sess
    FROM dew_events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
    SELECT user_id, ts, event_id, event_type,
           SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
    FROM flagged
),
paths AS (
    SELECT user_id, session_id,
           array_join(
               transform(
                   array_sort(collect_list(struct(ts, event_id, event_type))),
                   s -> s.event_type
               ), '>'
           ) AS path
    FROM sess GROUP BY user_id, session_id
)
SELECT path, COUNT(*) AS n_sessions
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path ASC
LIMIT 20
"""

_SESSION_PATHS_DUCK = """
WITH flagged AS (
    SELECT user_id, ts, event_id, event_type,
           CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                THEN 1 ELSE 0 END AS new_sess
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
    SELECT user_id, ts, event_id, event_type,
           SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
    FROM flagged
),
paths AS (
    SELECT user_id, session_id,
           string_agg(event_type, '>' ORDER BY ts, event_id) AS path
    FROM sess GROUP BY user_id, session_id
)
SELECT path, COUNT(*) AS n_sessions
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path ASC
LIMIT 20
"""


@query(
    "e_session_topk_paths",
    oracle=_SESSION_PATHS_DUCK,
    bench=True,
    tags=("ext-analytics", "session"),
)
def e_session_topk_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 full session paths: 30-min-gap sessionization, the
    within-session event-type sequence joined into a path string, and
    the most common paths ranked (count DESC, path ASC — the unique
    path is the tiebreaker, so the top-20 cut is deterministic).
    In-session order is pinned by (ts, event_id): Spark sorts each
    session's (ts, event_id, type) structs with array_sort (collect_list
    alone has no order contract) — DuckDB's ORDER BY inside string_agg
    is the same contract.  This is the path-mining step beyond
    e_user_path_bigrams: exact sequence frequencies, not transitions.

    Scale shape: sessionize = one user_id window (shared by lag +
    cumsum); per-session paths = one grouped agg whose state is the
    session's own events; the global top-20 compiles to
    TakeOrderedAndProject, never a single-partition sort."""
    register_views(spark, sf_dir, "events")
    return spark.sql(_SESSION_PATHS_SPARK)


@query(
    "mv_incremental_delete",
    # oracle: full recompute over the rows that REMAIN after the delete
    oracle="""
        SELECT o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM orders WHERE o_orderkey % 10 != 0
        GROUP BY o_orderstatus
    """,
    tags=("ext-analytics", "incremental"),
)
def mv_incremental_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MV maintenance under DELETES (retractions): the
    standing MV holds partials over ALL orders; a delete batch
    (o_orderkey % 10 = 0) is aggregated alone and SUBTRACTED —
    count/decimal-sum form a group (not just a monoid), so retraction
    is exact, and groups whose count reaches zero drop out entirely
    (the HAVING), matching a recompute that never saw them.  The GDPR /
    TTL-expiry shape: at 100 TB the delete batch aggregate reads only
    the retracted rows; the base table is never rescanned."""
    from pyspark.sql import functions as F

    from dataengineeringworkshop_spark.plans.tables import load_table

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )

    def partials(df: DataFrame, sign: int) -> DataFrame:
        return df.groupBy("o_orderstatus").agg(
            (F.count(F.lit(1)) * sign).alias("pn"),
            (F.sum(F.col("o_totalprice").cast("decimal(18,4)")) * sign).alias("psum"),
        )

    mv = partials(o, 1)  # the standing MV (over everything)
    retract = partials(o.filter(F.col("o_orderkey") % 10 == 0), -1)
    return (
        mv.unionByName(retract)
        .groupBy("o_orderstatus")
        .agg(
            F.sum("pn").cast("long").alias("n_orders"),
            F.sum("psum").cast("double").alias("revenue"),
        )
        .filter(F.col("n_orders") > 0)
    )


@query(
    "mv_incremental_join",
    # oracle: FULL recompute of the join view over base ∪ delta on both
    # sides — the delta-join algebra must be indistinguishable from it
    oracle="""
        SELECT c.c_nationkey,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                   AS revenue
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_nationkey
    """,
    bench=True,
    tags=("ext-analytics", "incremental"),
)
def mv_incremental_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view (the bilinear delta rule):
    for V = γ(O ⋈ C), an insert batch on BOTH sides maintains V with

        ΔV = γ(ΔO ⋈ C_old) ⊎ γ(O_old ⋈ ΔC) ⊎ γ(ΔO ⋈ ΔC)

    merged into the standing partials — the three delta terms are
    exactly the cross terms of (O_old ∪ ΔO) ⋈ (C_old ∪ ΔC), and
    count/decimal-sum partials form a commutative monoid, so the merge
    is exact (the driver hash-checks it against a full recompute).
    Base = orders with o_orderkey % 10 != 0 ⋈ customers with
    c_custkey % 7 != 0; the batch is everything else.  At 100 TB the
    two O-side delta joins probe only |ΔO| rows and the C-side delta
    join only |ΔC| — ΔO ⋈ C_old and O_old ⋈ ΔC broadcast their delta
    side under AQE — and the merge touches |groups| partials; the base
    join is never re-executed."""
    from pyspark.sql import functions as F

    from dataengineeringworkshop_spark.plans.tables import load_table

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o_old, o_new = (
        o.filter(F.col("o_orderkey") % 10 != 0),
        o.filter(F.col("o_orderkey") % 10 == 0),
    )
    c_old, c_new = (
        c.filter(F.col("c_custkey") % 7 != 0),
        c.filter(F.col("c_custkey") % 7 == 0),
    )

    def partials(orders: DataFrame, cust: DataFrame) -> DataFrame:
        return (
            orders.join(cust, orders.o_custkey == cust.c_custkey)
            .groupBy("c_nationkey")
            .agg(
                F.count(F.lit(1)).alias("pn"),
                F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("psum"),
            )
        )

    mv = partials(o_old, c_old)  # the standing view's stored partials
    delta = (
        partials(o_new, c_old)
        .unionByName(partials(o_old, c_new))
        .unionByName(partials(o_new, c_new))
    )
    return (
        mv.unionByName(delta)
        .groupBy("c_nationkey")
        .agg(
            F.sum("pn").cast("long").alias("n_orders"),
            F.sum("psum").cast("double").alias("revenue"),
        )
    )


# Identical statistic text for both engines: per-cell chi-square term
# with integer O/R/C/N and ONE division — (N·O − R·C)² / (N·R·C) is
# algebraically (O−E)²/E with E = R·C/N, kept rational until a single
# cast-to-double division (the t_tfidf rational-score rule).  The total
# then sums the per-cell terms through ROUND+DECIMAL (the dsum rule).
_CHI2_BODY = """
WITH cells AS (
    SELECT event_type, {bucket} AS user_bucket, COUNT(*) AS o
    FROM {events} GROUP BY event_type, user_bucket
),
rows_t AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS r
           FROM cells GROUP BY event_type),
cols_t AS (SELECT user_bucket, CAST(SUM(o) AS BIGINT) AS c
           FROM cells GROUP BY user_bucket),
n_t AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
terms AS (
    SELECT cells.event_type, cells.user_bucket, cells.o,
           rows_t.r, cols_t.c, n_t.n,
           ROUND(CAST((n_t.n * cells.o - rows_t.r * cols_t.c)
                      * (n_t.n * cells.o - rows_t.r * cols_t.c) AS DOUBLE)
                 / (CAST(n_t.n AS DOUBLE) * rows_t.r * cols_t.c), 6)
               AS chi2_term
    FROM cells
    JOIN rows_t ON cells.event_type = rows_t.event_type
    JOIN cols_t ON cells.user_bucket = cols_t.user_bucket
    CROSS JOIN n_t
)
SELECT event_type, user_bucket, o, r, c, n, chi2_term,
       CAST(SUM(CAST(chi2_term AS DECIMAL(18,6))) OVER () AS DOUBLE)
           AS chi2_total
FROM terms
"""


@query(
    "e_chi_square_independence",
    oracle=_CHI2_BODY.format(bucket=kbucket("user_id", 4), events="events"),
    tags=("ext-analytics", "robust-stats"),
)
def e_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between event type and a
    4-way user-hash cohort — the A/B-test / drift-monitor statistic:
    is behavior distributed identically across cohorts?  Emits the full
    contingency table (observed, row/column/grand totals) plus each
    cell's chi-square contribution and the grand statistic.

    Determinism: E = R·C/N never materializes as a float — the cell
    term is computed as (N·O − R·C)²/(N·R·C), integer-exact until ONE
    double division, then ROUND(6) + DECIMAL summation makes the total
    order-independent.  (The integer products bound: N·O fits BIGINT up
    to ~3·10⁹ events per cell-row pair; beyond that the same text runs
    with DECIMAL(38) operands.)  Scale shape: one grouped count over
    the raw scan (partial-agg collapses each task to ≤|types|×4 rows);
    everything after operates on the ≤20-row cell table — the totals
    joins and the window are driver-trivial broadcasts."""
    register_views(spark, sf_dir, "events")
    return spark.sql(
        _CHI2_BODY.format(bucket=kbucket("user_id", 4), events="dew_events")
    )


# two-proportion z-test body — IDENTICAL arithmetic text in both engines:
# integer counts in, one float expression chain out, rounded to 6 (every
# intermediate is an IEEE op on identical doubles in identical order, so
# the rounding is belt-and-braces, per the derived-float-chain contract)
_ZTEST_BODY = """
    WITH u AS (
        SELECT user_id,
               CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                                  THEN 1 ELSE 0 END) >= 14
                    THEN 1 ELSE 0 END AS converted
        FROM {events}
        GROUP BY user_id
    ),
    a AS (
        SELECT CAST({arm} AS INT) AS arm, converted FROM u
    ),
    s AS (
        SELECT arm, COUNT(*) AS n, CAST(SUM(converted) AS BIGINT) AS conv
        FROM a GROUP BY arm
    ),
    w AS (
        SELECT MAX(CASE WHEN arm = 0 THEN n END) AS n1,
               MAX(CASE WHEN arm = 1 THEN n END) AS n2,
               MAX(CASE WHEN arm = 0 THEN conv END) AS c1,
               MAX(CASE WHEN arm = 1 THEN conv END) AS c2
        FROM s
    )
    SELECT n1, n2, c1, c2,
           ROUND(CAST(c1 AS DOUBLE) / n1, 6) AS p1,
           ROUND(CAST(c2 AS DOUBLE) / n2, 6) AS p2,
           ROUND(
               (CAST(c1 AS DOUBLE) / n1 - CAST(c2 AS DOUBLE) / n2)
               / NULLIF(sqrt(
                   (CAST(c1 + c2 AS DOUBLE) / (n1 + n2))
                   * (CAST(1 AS DOUBLE) - CAST(c1 + c2 AS DOUBLE) / (n1 + n2))
                   * (CAST(1 AS DOUBLE) / n1 + CAST(1 AS DOUBLE) / n2)
               ), CAST(0 AS DOUBLE)), 6) AS z_score
    FROM w
"""


@query(
    "e_two_proportion_ztest",
    oracle=_ZTEST_BODY.format(
        events="events", arm="((user_id % 1000000007) * 2654435761) % 2"
    ),
    tags=("ext-analytics", "stats"),
)
def e_two_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users split into two arms by the
    engine's ONE deterministic hash (kbucket), conversion = "heavy
    purchaser" (>= 14 purchase events — a median-straddling cut at every
    test SF, so neither arm degenerates; "ever purchased" is true for
    100% of synthetic users and collapses the pooled variance to 0),
    and the pooled two-proportion z statistic — the other
    half of the significance toolbox next to e_chi_square_independence
    (z² equals the 2×2 chi-square on the same table; this form is what
    experimentation platforms report, with sign and direction).  One
    per-user aggregate, one 2-row arm aggregate, one scalar row out —
    the whole test is two partial-agg shuffles regardless of event
    volume.  sqrt/divisions are IEEE-identical on identical inputs in
    both engines; output rounded to 6 per the contract."""
    register_views(spark, sf_dir, "events")
    return spark.sql(_ZTEST_BODY.format(events="dew_events", arm=kbucket("user_id", 2)))


@query(
    "mv_incremental_minmax",
    # oracle: full recompute over the rows that remain — the targeted
    # group repair must be indistinguishable from it
    oracle="""
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               MIN(o_totalprice) AS min_price,
               MAX(o_totalprice) AS max_price
        FROM orders WHERE o_orderkey % 10 != 0
        GROUP BY o_orderpriority
    """,
    tags=("ext-analytics", "incremental"),
)
def mv_incremental_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MV maintenance for NON-invertible aggregates: MIN and
    MAX form a monoid but not a group — a deleted row cannot be
    "subtracted" the way mv_incremental_delete retracts counts/sums.
    The repair rule: aggregate the delete batch per group, and a group
    needs recomputation ONLY if a deleted value EQUALS the stored
    extreme (a tie elsewhere in the group makes the recompute return
    the same value — still correct, never wrong); counts stay
    group-retractable.  Repaired groups rescan the surviving rows for
    JUST those groups (broadcast semi join on the bounded repair list);
    untouched groups keep their stored partials.  At 100 TB: delete
    batch aggregate reads only retracted rows, repair cost is
    proportional to groups-with-deleted-extremes, not table size."""
    from pyspark.sql import functions as F

    from dataengineeringworkshop_spark.operators.incremental import (
        minmax_delete_repair,
    )
    from dataengineeringworkshop_spark.plans.tables import load_table

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    dels = o.filter(F.col("o_orderkey") % 10 == 0)
    out = minmax_delete_repair(
        o, dels, group_cols="o_orderpriority", val_col="o_totalprice",
        key_col="o_orderkey",
    )
    return out.select(
        "o_orderpriority",
        F.col("n").alias("n_orders"),
        F.col("mn").alias("min_price"),
        F.col("mx").alias("max_price"),
    )


# rolling z-score body — IDENTICAL text in both engines.  The trailing
# frame EXCLUDES the current row (1 PRECEDING), readings are 2-decimal
# doubles so sum/sumsq accumulate EXACTLY in DECIMAL (order-free); the
# variance/sqrt/z chain is IEEE-identical on identical inputs and the
# output is rounded to 6 per the contract.
_ROLLZ_BODY = """
    WITH w AS (
        SELECT user_id, event_id, value,
               COUNT(value) OVER f AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER f AS DOUBLE) AS s,
               CAST(SUM(CAST(value AS DECIMAL(18,2))
                        * CAST(value AS DECIMAL(18,2))) OVER f AS DOUBLE)
                   AS ss
        FROM {events}
        WINDOW f AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id,
           ROUND((value - s / n)
                 / sqrt((ss - s * s / n) / (n - 1)), 6) AS z_score
    FROM w
    WHERE n >= 8
      AND (ss - s * s / n) / (n - 1) > 0.0001
      AND ABS((value - s / n)
              / sqrt((ss - s * s / n) / (n - 1))) > 2.5
"""


@query(
    "e_rolling_zscore_anomaly",
    oracle=_ROLLZ_BODY.format(events="events"),
    tags=("ext-analytics", "stats"),
)
def e_rolling_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly detection: each reading scored against
    the mean/std of the user's PREVIOUS <= 20 readings (the current row
    is excluded from its own baseline — the classic leak the 1
    PRECEDING bound closes), flagging |z| > 2.5 with >= 8 samples and a
    variance floor (a flat baseline makes z meaningless, not
    infinite).  One window partitioning carries count/sum/sumsq
    together; readings are 2-decimal doubles so both running moments
    accumulate exactly in DECIMAL and the only float arithmetic is the
    final variance/sqrt/z chain, identical text in both engines,
    rounded to 6.  The STREAMING twin is streaming/rollingz.py
    (applyInPandasWithState, fixed 20-slot ring buffer per user; pytest
    proves batch-window equality and checkpoint-restart survival)."""
    register_views(spark, sf_dir, "events")
    return spark.sql(_ROLLZ_BODY.format(events="dew_events"))


# deterministic per-group MODE body (count desc, value asc tiebreak) —
# identical text both engines, integers/strings only
_MODE_BODY = """
    WITH vc AS (
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
        FROM {orders}
        GROUP BY o_orderpriority, o_orderstatus
    ),
    r AS (
        SELECT o_orderpriority, o_orderstatus, n,
               ROW_NUMBER() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY n DESC, o_orderstatus ASC
               ) AS rn
        FROM vc
    )
    SELECT o_orderpriority,
           o_orderstatus AS mode_status,
           CAST(n AS BIGINT) AS mode_n
    FROM r WHERE rn = 1
"""


@query(
    "a19_exact_mode",
    oracle=_MODE_BODY.format(orders="orders"),
    tags=("ext-analytics", "A1"),
)
def a19_exact_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group MODE (most frequent value) with a deterministic
    tiebreak — the aggregate SQL's MODE()/any_value make
    engine-dependent: count per (group, value) + one rank window over
    the value-count table, ordered (count DESC, value ASC) so ties
    resolve identically everywhere.  The window runs over |groups| ×
    |distinct values| rows (here 5×3), NOT the raw table — at 100 TB
    the partial-agg shuffles once and the rank is near-free.  The
    approximate/mergeable sibling is a18_count_min_sketch."""
    register_views(spark, sf_dir, "orders")
    return spark.sql(_MODE_BODY.format(orders="dew_orders"))


_HLL_BOUNDS_BODY = """
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_exact,
           CAST(ABS(CAST({approx} AS DOUBLE) - COUNT(DISTINCT user_id))
                <= 0.1 * COUNT(DISTINCT user_id) AS BOOLEAN) AS sketch_within_10pct
    FROM {events}
    GROUP BY event_type
"""


@query(
    "a20_hll_distinct_bounds",
    oracle=_HLL_BOUNDS_BODY.format(
        events="events", approx="approx_count_distinct(user_id)"
    ),
    tags=("ext-analytics", "A4", "sketch"),
)
def a20_hll_distinct_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count CONTRACT row: per event_type, the
    exact distinct count plus each engine's own assertion that ITS
    HLL sketch (Spark HLL++ at rsd 0.02, DuckDB's fixed-precision HLL)
    lands within 10% of ITS exact count.  The sketch values themselves
    are deliberately not emitted — two different HLL implementations
    never agree bit-for-bit; what IS cross-engine checkable is the
    exact count and the accuracy contract both engines promise, which
    is also exactly what a user of approx_count_distinct relies on.
    The companion mergeable-sketch rows are a18_count_min_sketch (CMS)
    and a_sketch_bounds.  Scale: one partial-aggregated shuffle; the
    sketch makes the distinct count mergeable, which is the entire
    reason to accept approximation at 100 TB."""
    register_views(spark, sf_dir, "events")
    return spark.sql(
        _HLL_BOUNDS_BODY.format(
            events="dew_events", approx="approx_count_distinct(user_id, 0.02)"
        )
    )


_WMEDIAN_BODY = """
    WITH t AS (
        SELECT l_returnflag,
               CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS price_c,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
        FROM {lineitem}
        GROUP BY l_returnflag, CAST(round(l_extendedprice * 100, 0) AS BIGINT)
    ),
    c AS (
        SELECT l_returnflag, price_c, w,
               SUM(w) OVER (PARTITION BY l_returnflag ORDER BY price_c
                            ROWS UNBOUNDED PRECEDING) AS cum_w,
               SUM(w) OVER (PARTITION BY l_returnflag) AS tot_w
        FROM t
    )
    SELECT l_returnflag,
           CAST(MIN(price_c) AS BIGINT) AS wmedian_cents,
           CAST(MAX(tot_w) AS BIGINT) AS total_weight
    FROM c
    WHERE 2 * cum_w >= tot_w
    GROUP BY l_returnflag
"""


@query(
    "a21_weighted_median",
    oracle=_WMEDIAN_BODY.format(lineitem="lineitem"),
    tags=("ext-analytics", "A1", "robust-stats"),
)
def a21_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact WEIGHTED median (lower rule) per group — the quantity-
    weighted price midpoint a curation pipeline uses to set value-aware
    thresholds (e.g. token-weighted doc-quality cutoffs).  Entirely
    integer arithmetic: prices become exact cents, weights are integer
    quantities, the answer is the smallest price whose cumulative
    weight reaches half the total (2*cum >= tot avoids division), so
    both engines agree bit-for-bit with no interpolation.  Scale shape:
    one partial-agg shuffle collapses the raw table to |group, price|
    rows; the cumulative window runs over that collapsed table only —
    the same collapse that makes a19's mode window near-free."""
    register_views(spark, sf_dir, "lineitem")
    return spark.sql(_WMEDIAN_BODY.format(lineitem="dew_lineitem"))


@query(
    "a22_listagg_distinct",
    oracle="""
        SELECT o_orderstatus,
               string_agg(DISTINCT o_orderpriority, '|' ORDER BY o_orderpriority)
                   AS prios_asc,
               string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority DESC)
                   AS prios_desc,
               COUNT(DISTINCT o_orderpriority) AS n_prios
        FROM orders
        WHERE o_orderpriority IS NOT NULL
        GROUP BY o_orderstatus
    """,
    tags=("ext-analytics", "A4", "listagg"),
)
def a22_listagg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:2023 ``listagg`` (new in Spark 4.0) with the two modifiers
    users actually combine: DISTINCT collapse plus a deterministic
    ``WITHIN GROUP (ORDER BY …)`` — ascending with one delimiter,
    descending with another — against DuckDB's equivalent
    ``string_agg(DISTINCT … ORDER BY …)``.  Determinism contract:
    string aggregation is only order-stable with an explicit WITHIN
    GROUP order on the DISTINCT expression itself, which both engines
    enforce; NULL priorities are excluded with the same WHERE guard on
    both sides, so even a group whose priorities are ALL NULL behaves
    identically (dropped) in both engines.  Planner-bug workaround,
    pinned in tests/test_listagg_shapes.py: TWO ``listagg(DISTINCT …)``
    aggregates with DIFFERENT WITHIN GROUP orders in one Aggregate trip
    a Spark 4.1 ClassCastException (AttributeReference → SortOrder in
    RewriteDistinctAggregates), so the asc leg runs as a plain listagg
    over a pre-collapsed DISTINCT CTE and only the desc leg uses the
    DISTINCT form — same semantics, one Aggregate, no double scan.
    Scale note: listagg over an UNBOUNDED group is an anti-pattern at
    100 TB (one string cell absorbs the group); this row aggregates a
    low-cardinality DISTINCT domain (5 priorities), the shape that
    stays safe — the DISTINCT collapse runs partial before the
    shuffle."""
    register_views(spark, sf_dir, "orders")
    return spark.sql(
        """
        WITH d AS (SELECT DISTINCT o_orderstatus, o_orderpriority
                   FROM dew_orders
                   WHERE o_orderpriority IS NOT NULL)
        SELECT o_orderstatus,
               listagg(o_orderpriority, '|')
                   WITHIN GROUP (ORDER BY o_orderpriority) AS prios_asc,
               listagg(DISTINCT o_orderpriority, ',')
                   WITHIN GROUP (ORDER BY o_orderpriority DESC) AS prios_desc,
               COUNT(*) AS n_prios
        FROM d
        GROUP BY o_orderstatus
        """
    )
