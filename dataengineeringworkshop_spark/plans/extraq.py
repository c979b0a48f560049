"""Breadth beyond the reference's operator list (SURVEY.md §2.7 notes
"no UNION/INTERSECT/EXCEPT anywhere"; §2.5 "only ranking functions") —
the adjacent relational surface any engine user reaches for next:
set operations, multi-level aggregation (ROLLUP/CUBE), pivot, analytic
windows (lead/lag/running totals), and sketch aggregates with
error-bound oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataengineeringworkshop_spark.plans.registry import dsum, query
from dataengineeringworkshop_spark.plans.tables import load_table, register_views


def _sql(spark: SparkSession, sf_dir: str, tables: tuple[str, ...], sql: str) -> DataFrame:
    register_views(spark, sf_dir, *tables)
    return spark.sql(sql)


@query(
    "c3_union_except_intersect",
    oracle="""
        SELECT 'union' AS op, COUNT(*) AS n FROM (
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
            UNION SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
        UNION ALL
        SELECT 'intersect', COUNT(*) FROM (
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
            INTERSECT SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
        UNION ALL
        SELECT 'except', COUNT(*) FROM (
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
            EXCEPT SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
    """,
    tags=("extra", "setops"),
)
def c3_union_except_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT distinct-set semantics."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_totalprice") > 200000).select("o_custkey")
    rows = [
        ("union", a.union(b).distinct().count()),
        ("intersect", a.intersect(b).count()),
        ("except", a.subtract(b).count()),
    ]
    return spark.createDataFrame(rows, "op STRING, n BIGINT")


@query(
    "a8_rollup",
    oracle="""
        SELECT n_name, o_orderstatus, COUNT(*) AS n_orders,
               GROUPING(n_name) AS g_nation, GROUPING(o_orderstatus) AS g_status
        FROM orders JOIN customer ON o_custkey = c_custkey
                    JOIN nation ON c_nationkey = n_nationkey
        WHERE n_regionkey = 1
        GROUP BY ROLLUP(n_name, o_orderstatus)
    """,
    tags=("extra", "rollup"),
)
def a8_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING() markers (subtotals + grand total)."""
    return _sql(
        spark, sf_dir, ("orders", "customer", "nation"),
        """
        SELECT n_name, o_orderstatus, COUNT(*) AS n_orders,
               CAST(GROUPING(n_name) AS INT) AS g_nation,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_status
        FROM dew_orders JOIN dew_customer ON o_custkey = c_custkey
                        JOIN dew_nation ON c_nationkey = n_nationkey
        WHERE n_regionkey = 1
        GROUP BY ROLLUP(n_name, o_orderstatus)
        """,
    )


@query(
    "a9_cube",
    oracle=f"""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n, {dsum("o_totalprice", "total")}
        FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    tags=("extra", "cube"),
)
def a9_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions with a deterministic double sum."""
    return _sql(
        spark, sf_dir, ("orders",),
        f"""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n, {dsum("o_totalprice", "total")}
        FROM dew_orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        """,
    )


@query(
    "b_pivot_event_types",
    oracle="""
        SELECT user_id,
               CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
               CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view,
               CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase
        FROM events GROUP BY user_id
    """,
    tags=("extra", "pivot"),
)
def b_pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (long→wide counts per user) — Spark's pivot() against the
    oracle's explicit CASE aggregation."""
    e = load_table(spark, sf_dir, "events")
    out = (
        e.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase"])
        .count()
        .na.fill(0, ["click", "view", "purchase"])
    )
    return out.select(
        "user_id",
        F.col("click").cast("long").alias("click"),
        F.col("view").cast("long").alias("view"),
        F.col("purchase").cast("long").alias("purchase"),
    )


@query(
    "w3_lead_lag_gap",
    oracle="""
        SELECT event_id, user_id,
               CAST(epoch_us(ts) - epoch_us(lag(ts) OVER w) AS BIGINT) AS gap_from_prev_us,
               CAST(epoch_us(lead(ts) OVER w) - epoch_us(ts) AS BIGINT) AS gap_to_next_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    """,
    tags=("extra", "analytic-window"),
)
def w3_lead_lag_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead/lag analytic windows: inter-event gaps per user."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_us = F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
    next_us = F.unix_micros(F.lead("ts").over(w).cast("timestamp"))
    return e.select(
        "event_id",
        "user_id",
        (us - prev_us).alias("gap_from_prev_us"),
        (next_us - us).alias("gap_to_next_us"),
    )


@query(
    "w4_running_total",
    oracle="""
        SELECT event_id, user_id,
               CAST(SUM(CAST(value AS DECIMAL(18,4)))
                    OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value
        FROM events
    """,
    tags=("extra", "analytic-window"),
)
def w4_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) sum over an explicit ROWS frame — exact
    decimal accumulation so every prefix matches the oracle."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,4)")).over(w).cast("double").alias("running_value"),
    )


@query(
    "a_sketch_bounds",
    oracle="SELECT TRUE AS distinct_ok, TRUE AS median_ok",
    tags=("extra", "sketch"),
)
def a_sketch_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates (HLL approx_count_distinct, approx median).
    Sketch values differ across engines by construction, so the oracle
    pins ERROR BOUNDS instead: approx within 5% of exact distinct;
    approx median within the exact p40–p60 band."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.approx_count_distinct("o_custkey", 0.01).alias("ad"),
        F.countDistinct("o_custkey").alias("ed"),
        F.percentile_approx("o_totalprice", 0.5).alias("am"),
        F.expr("percentile(o_totalprice, 0.4)").alias("p40"),
        F.expr("percentile(o_totalprice, 0.6)").alias("p60"),
    ).select(
        (F.abs(F.col("ad") - F.col("ed")) / F.col("ed") < 0.05).alias("distinct_ok"),
        ((F.col("p40") <= F.col("am")) & (F.col("am") <= F.col("p60"))).alias("median_ok"),
    )


@query(
    "a10_grouping_sets",
    oracle="""
        SELECT n_name, o_orderstatus,
               GROUPING(n_name) AS g_nation, GROUPING(o_orderstatus) AS g_status,
               COUNT(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY GROUPING SETS ((n_name, o_orderstatus), (n_name), ())
    """,
    tags=("extra", "A5"),
)
def a10_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with GROUPING() markers — the general form
    under ROLLUP/CUBE (a8/a9); one pass, Expand-based, no re-scan per
    set."""
    return _sql(
        spark, sf_dir, ("orders", "customer", "nation"),
        """
        SELECT n_name, o_orderstatus,
               CAST(grouping(n_name) AS INT) AS g_nation,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               COUNT(*) AS n_orders
        FROM dew_orders
        JOIN dew_customer ON o_custkey = c_custkey
        JOIN dew_nation ON c_nationkey = n_nationkey
        GROUP BY GROUPING SETS ((n_name, o_orderstatus), (n_name), ())
        """,
    )


@query(
    "w5_distribution_ranks",
    oracle="""
        SELECT c_custkey, n_name,
               ntile(4) OVER w AS spend_quartile,
               CAST(FLOOR(percent_rank() OVER w * 1000000 + 0.5) AS BIGINT)
                   AS pct_rank_ppm,
               CAST(FLOOR(cume_dist() OVER w * 1000000 + 0.5) AS BIGINT)
                   AS cume_ppm
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WINDOW w AS (PARTITION BY n_name ORDER BY c_acctbal ASC, c_custkey ASC)
    """,
    tags=("extra", "W2"),
)
def w5_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions — ntile quartiles, percent_rank,
    cume_dist per nation.  Unique (acctbal, custkey) ordering makes the
    rank rationals engine-independent; one exchange on the partition
    key serves all three functions.

    The ratios are emitted as EXACT ppm integers via
    ``FLOOR(x * 1e6 + 0.5)`` — pure IEEE arithmetic on doubles both
    engines compute bit-identically — NOT ``ROUND(x, 6)``: rank ratios
    are small-denominator rationals that can land exactly on a decimal
    rounding tie (sf0.1 hits 0.5203125), where Spark ROUND rounds the
    double's shortest decimal repr while DuckDB rounds the true binary
    value, flipping the 6th decimal (caught by the round-7 sf0.1 sweep;
    SCALE.md; tests/test_determinism_edges.py pins the mechanism)."""
    return _sql(
        spark, sf_dir, ("customer", "nation"),
        """
        SELECT c_custkey, n_name,
               ntile(4) OVER w AS spend_quartile,
               CAST(FLOOR(percent_rank() OVER w * 1000000 + 0.5) AS BIGINT)
                   AS pct_rank_ppm,
               CAST(FLOOR(cume_dist() OVER w * 1000000 + 0.5) AS BIGINT)
                   AS cume_ppm
        FROM dew_customer JOIN dew_nation ON c_nationkey = n_nationkey
        WINDOW w AS (PARTITION BY n_name ORDER BY c_acctbal ASC, c_custkey ASC)
        """,
    )


@query(
    "a11_exact_quantiles",
    oracle="""
        SELECT l_returnflag,
               quantile_cont(l_quantity, 0.25) AS q25,
               quantile_cont(l_quantity, 0.5) AS median,
               quantile_cont(l_quantity, 0.75) AS q75,
               COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag
    """,
    tags=("extra", "A1"),
)
def a11_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated quantiles per group (Spark
    ``percentile`` ≡ DuckDB ``quantile_cont``).  l_quantity is
    integer-valued and the quantile fractions are dyadic, so the
    interpolation arithmetic is exact in both engines — bit-identical
    without rounding.  The approximate/mergeable path for 100 TB is
    ``a_sketch_bounds`` (approx_percentile); this is the exact
    small-group complement."""
    return _sql(
        spark, sf_dir, ("lineitem",),
        """
        SELECT l_returnflag,
               percentile(l_quantity, 0.25) AS q25,
               percentile(l_quantity, 0.5) AS median,
               percentile(l_quantity, 0.75) AS q75,
               COUNT(*) AS n
        FROM dew_lineitem GROUP BY l_returnflag
        """,
    )


@query(
    "j5_outer_semi_anti",
    oracle="""
        SELECT 'left_outer' AS join_type, COUNT(*) AS n,
               COUNT(o_orderkey) AS n_matched
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        UNION ALL
        SELECT 'full_outer', COUNT(*), COUNT(o_orderkey)
        FROM customer FULL JOIN orders ON c_custkey = o_custkey
        UNION ALL
        SELECT 'semi', COUNT(*), COUNT(*)
        FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
        UNION ALL
        SELECT 'anti', COUNT(*), 0
        FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
    tags=("extra", "J1"),
)
def j5_outer_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The join types the reference never uses but any engine user
    expects: LEFT/FULL OUTER (null-extended counts) and LEFT SEMI/ANTI
    (existence joins — Catalyst executes these without materializing
    the probe side's payload)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    cond = c.c_custkey == o.o_custkey

    def counts(how: str) -> tuple[int, int]:
        # ONE pass per join type: total and matched come from the same
        # aggregate (COUNT(col) skips the null-extended rows), instead
        # of executing each join twice
        row = (
            c.join(o, cond, how)
            .agg(F.count(F.lit(1)).alias("n"), F.count("o_orderkey").alias("m"))
            .first()
        )
        return int(row.n), int(row.m)

    n_left, m_left = counts("left")
    n_full, m_full = counts("full")
    n_semi = c.join(o, cond, "left_semi").count()
    n_anti = c.join(o, cond, "left_anti").count()
    rows = [
        ("left_outer", n_left, m_left),
        ("full_outer", n_full, m_full),
        ("semi", n_semi, n_semi),
        ("anti", n_anti, 0),
    ]
    return spark.createDataFrame(rows, "join_type STRING, n BIGINT, n_matched BIGINT")


@query(
    "c4_correlated_scalar_subquery",
    oracle="""
        SELECT n_name, c_custkey, c_acctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE c_acctbal > (
            SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
            FROM customer c2
            WHERE c2.c_nationkey = customer.c_nationkey
        ) * 1.8
    """,
    tags=("extra", "C2"),
)
def c4_correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (customers well above their nation's
    mean balance) — Catalyst decorrelates it into an aggregate + join,
    the rewrite the reference never exercises.  The comparison keeps
    raw doubles out of the OUTPUT (only the filter uses the avg), and the
    threshold average itself is a decimal-fold (exact, order-free) so
    the filter boundary is bit-identical in both engines."""
    return _sql(
        spark, sf_dir, ("customer", "nation"),
        """
        SELECT n_name, c_custkey, c_acctbal
        FROM dew_customer JOIN dew_nation ON c_nationkey = n_nationkey
        WHERE c_acctbal > (
            SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
            FROM dew_customer c2
            WHERE c2.c_nationkey = dew_customer.c_nationkey
        ) * 1.8
        """,
    )


@query(
    "t_fuzzy_match_levenshtein",
    oracle="""
        WITH names AS (SELECT DISTINCT s_name AS nm FROM supplier)
        SELECT a.nm AS nm1, b.nm AS nm2, levenshtein(a.nm, b.nm) AS dist
        FROM names a JOIN names b ON a.nm < b.nm
        WHERE levenshtein(a.nm, b.nm) <= 1
    """,
    tags=("extra", "ext-text"),
)
def t_fuzzy_match_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching (entity resolution's core primitive):
    near-duplicate supplier names at edit distance ≤ 1 — the typo-dedup
    self-match every entity-resolution pipeline starts with, yielding
    real pairs at every test scale (45 / 900 / 13.5k at sf0.001/0.01/
    0.1).

    Bucketed, never all-pairs: candidate generation is a **deletion
    neighborhood** (FastSS) equi-join.  Each name emits len+1 block keys
    — itself plus every single-character deletion — and two names at
    edit distance ≤ 1 PROVABLY share a key (substitution at position i →
    both deletions at i are equal; insertion/deletion → the shorter
    string IS one of the longer one's deletion keys).  So the join is a
    plain shuffle equi-join on the key (no BroadcastNestedLoopJoin, no
    O(n²) theta join); ``levenshtein`` then verifies only the bounded
    candidate set.  Key fan-out is O(avg name length) per name — at
    100 TB the candidate space is Σ bucket², bounded by key selectivity,
    not n².

    The deletion-key table is the FastSS INDEX — it feeds both sides of
    the candidate self-join, and Spark inlines CTEs, so the WITH form
    re-scanned supplier and re-exploded the neighborhood FOUR times
    (2 UNION branches × 2 join sides; round-9 scan audit).  It is built
    once and ``materialize()``d, exactly the persisted index an entity-
    resolution pipeline maintains."""
    from dataengineeringworkshop_spark.operators.materialize import materialize

    register_views(spark, sf_dir, "supplier")
    keys = materialize(
        spark.sql(
            """
            WITH names AS (SELECT DISTINCT s_name AS nm FROM dew_supplier)
            SELECT nm, nm AS k FROM names
            UNION ALL
            SELECT nm, concat(substr(nm, 1, i - 1), substr(nm, i + 1)) AS k
            FROM names LATERAL VIEW explode(sequence(1, length(nm))) AS i
            """
        ),
        label="fastss_keys",
        cache_key=f"fastss_keys:{sf_dir}",
    )
    keys.createOrReplaceTempView("dew_fastss_keys")
    return spark.sql(
        """
        WITH cand AS (
            SELECT DISTINCT a.nm AS nm1, b.nm AS nm2
            FROM dew_fastss_keys a JOIN dew_fastss_keys b
              ON a.k = b.k AND a.nm < b.nm
        )
        SELECT nm1, nm2, levenshtein(nm1, nm2) AS dist
        FROM cand
        WHERE levenshtein(nm1, nm2) <= 1
        """
    )


_PROFILE_SQL = """
    SELECT 'l_orderkey' AS column_name, COUNT(*) AS n,
           COUNT(*) - COUNT(l_orderkey) AS n_null,
           COUNT(DISTINCT l_orderkey) AS n_distinct,
           CAST(MIN(l_orderkey) AS DOUBLE) AS min_num,
           CAST(MAX(l_orderkey) AS DOUBLE) AS max_num,
           CAST(NULL AS STRING) AS min_str, CAST(NULL AS STRING) AS max_str
    FROM {t}
    UNION ALL
    SELECT 'l_quantity', COUNT(*), COUNT(*) - COUNT(l_quantity),
           COUNT(DISTINCT l_quantity),
           MIN(l_quantity), MAX(l_quantity), NULL, NULL
    FROM {t}
    UNION ALL
    SELECT 'l_extendedprice', COUNT(*), COUNT(*) - COUNT(l_extendedprice),
           COUNT(DISTINCT l_extendedprice),
           MIN(l_extendedprice), MAX(l_extendedprice), NULL, NULL
    FROM {t}
    UNION ALL
    SELECT 'l_returnflag', COUNT(*), COUNT(*) - COUNT(l_returnflag),
           COUNT(DISTINCT l_returnflag),
           NULL, NULL, MIN(l_returnflag), MAX(l_returnflag)
    FROM {t}
    UNION ALL
    SELECT 'l_linestatus', COUNT(*), COUNT(*) - COUNT(l_linestatus),
           COUNT(DISTINCT l_linestatus),
           NULL, NULL, MIN(l_linestatus), MAX(l_linestatus)
    FROM {t}
"""


@query(
    "prof_column_stats",
    oracle=_PROFILE_SQL.replace("CAST(NULL AS STRING)", "CAST(NULL AS VARCHAR)").format(t="lineitem"),
    tags=("extra", "A1"),
)
def prof_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling (the ANALYZE / data-quality-report surface):
    per-column row count, null count, exact distinct count, and typed
    min/max in one long-format result.  The Spark plan computes EVERY
    column's stats in ONE aggregation over ONE scan (the multi-distinct
    Expand pipeline), then ``stack()`` pivots the wide stats row to the
    long report — the oracle keeps the naive per-column UNION ALL,
    which is 5 scans and exactly what this plan avoids (round-9 scan
    audit: the UNION ALL form re-scanned lineitem once per column).  At
    100 TB swap COUNT(DISTINCT) for approx_count_distinct (see
    a_sketch_bounds) and the same single pass profiles every column."""
    register_views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        WITH s AS (
            SELECT COUNT(*) AS n,
                   COUNT(l_orderkey) AS c1, COUNT(DISTINCT l_orderkey) AS d1,
                   MIN(l_orderkey) AS mn1, MAX(l_orderkey) AS mx1,
                   COUNT(l_quantity) AS c2, COUNT(DISTINCT l_quantity) AS d2,
                   MIN(l_quantity) AS mn2, MAX(l_quantity) AS mx2,
                   COUNT(l_extendedprice) AS c3,
                   COUNT(DISTINCT l_extendedprice) AS d3,
                   MIN(l_extendedprice) AS mn3, MAX(l_extendedprice) AS mx3,
                   COUNT(l_returnflag) AS c4, COUNT(DISTINCT l_returnflag) AS d4,
                   MIN(l_returnflag) AS mn4, MAX(l_returnflag) AS mx4,
                   COUNT(l_linestatus) AS c5, COUNT(DISTINCT l_linestatus) AS d5,
                   MIN(l_linestatus) AS mn5, MAX(l_linestatus) AS mx5
            FROM dew_lineitem
        )
        SELECT stack(5,
            'l_orderkey', n, n - c1, d1,
                CAST(mn1 AS DOUBLE), CAST(mx1 AS DOUBLE),
                CAST(NULL AS STRING), CAST(NULL AS STRING),
            'l_quantity', n, n - c2, d2,
                CAST(mn2 AS DOUBLE), CAST(mx2 AS DOUBLE),
                CAST(NULL AS STRING), CAST(NULL AS STRING),
            'l_extendedprice', n, n - c3, d3,
                CAST(mn3 AS DOUBLE), CAST(mx3 AS DOUBLE),
                CAST(NULL AS STRING), CAST(NULL AS STRING),
            'l_returnflag', n, n - c4, d4,
                CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), mn4, mx4,
            'l_linestatus', n, n - c5, d5,
                CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), mn5, mx5
        ) AS (column_name, n, n_null, n_distinct,
              min_num, max_num, min_str, max_str)
        FROM s
        """
    )


@query(
    "f19_date_arithmetic",
    oracle="""
        SELECT o_orderkey,
               strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_day,
               date_diff('day', CAST(o_orderdate AS DATE), DATE '2024-01-01') AS days_to_2024,
               strftime(CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE), '%Y-%m-%d') AS plus_3_months,
               strftime(CAST(date_trunc('month', o_orderdate) AS DATE), '%Y-%m-%d') AS month_start,
               strftime(CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE), '%Y-%m-%d') AS month_end,
               CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS INT) AS dow
        FROM orders
    """,
    tags=("extra", "F6"),
)
def f19_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic breadth — datediff, add_months, month trunc,
    last_day, day-of-week — the calendar toolkit every reporting layer
    needs (the reference only formats, F3/F6).  Spark DATEDIFF(end,
    start) ≡ DuckDB date_diff('day', start, end); Spark dayofweek is
    1-based (Sunday=1), DuckDB 0-based — the oracle adds 1.  Dates surface as formatted strings (the repo-wide
    convention: the driver hashes values, and string dates are
    unambiguous across engines)."""
    return _sql(
        spark, sf_dir, ("orders",),
        """
        SELECT o_orderkey,
               date_format(CAST(o_orderdate AS DATE), 'yyyy-MM-dd') AS order_day,
               DATEDIFF(DATE '2024-01-01', CAST(o_orderdate AS DATE)) AS days_to_2024,
               date_format(add_months(CAST(o_orderdate AS DATE), 3), 'yyyy-MM-dd') AS plus_3_months,
               date_format(date_trunc('month', o_orderdate), 'yyyy-MM-dd') AS month_start,
               date_format(last_day(CAST(o_orderdate AS DATE)), 'yyyy-MM-dd') AS month_end,
               dayofweek(CAST(o_orderdate AS DATE)) AS dow
        FROM dew_orders
        """,
    )


@query(
    "b_unpivot_event_stats",
    oracle="""
        WITH wide AS (
            SELECT user_id,
                   COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
                   COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view,
                   COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase
            FROM events GROUP BY user_id
        )
        SELECT user_id, 'click' AS event_type, CAST(click AS BIGINT) AS n FROM wide
        UNION ALL
        SELECT user_id, 'view', CAST(view AS BIGINT) FROM wide
        UNION ALL
        SELECT user_id, 'purchase', CAST(purchase AS BIGINT) FROM wide
    """,
    tags=("extra", "pivot"),
)
def b_unpivot_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide→long) via ``stack()`` — the inverse of
    b_pivot_event_types: pivot the per-user counts wide, then unpivot
    them back to (user_id, event_type, n) rows.  stack() is a generator
    (one input row → k output rows, map-side, no shuffle beyond the
    pivot's own aggregation); the oracle unions explicit projections."""
    wide = b_pivot_event_types(spark, sf_dir)
    return wide.select(
        "user_id",
        F.expr(
            "stack(3, 'click', click, 'view', view, 'purchase', purchase) "
            "AS (event_type, n)"
        ),
    ).select("user_id", "event_type", F.col("n").cast("long").alias("n"))


@query(
    "j7_null_safe_join",
    oracle="""
        WITH keyed AS (
            SELECT event_id,
                   CASE WHEN user_id % 10 = 0 THEN NULL ELSE user_id END AS k
            FROM events
        ),
        h1 AS (
            SELECT k, CAST(COUNT(*) AS BIGINT) AS n1
            FROM keyed WHERE event_id % 2 = 0 GROUP BY k
        ),
        h2 AS (
            SELECT k, CAST(COUNT(*) AS BIGINT) AS n2
            FROM keyed WHERE event_id % 2 = 1 GROUP BY k
        )
        SELECT 'plain_eq' AS join_type,
               CAST(COUNT(*) AS BIGINT) AS n_matched_keys,
               CAST(SUM(a.n1 * b.n2) AS BIGINT) AS n_row_pairs
        FROM h1 a JOIN h2 b ON a.k = b.k
        UNION ALL
        SELECT 'null_safe', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(a.n1 * b.n2) AS BIGINT)
        FROM h1 a JOIN h2 b ON a.k IS NOT DISTINCT FROM b.k
    """,
    tags=("extra", "J1"),
)
def j7_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (Spark ``<=>`` ↔ ANSI IS NOT DISTINCT
    FROM): a key column with planted NULLs (10% of rows), joined
    even-half against odd-half both ways — the plain equi join drops
    the NULL-key group entirely, the null-safe join matches NULL with
    NULL, and ``n_row_pairs`` reports the row-level pair count each
    join would produce (Σ n1·n2 over matched keys).  The gap between
    the two rows IS the semantic difference, hash-pinned.  Catalyst
    plans ``<=>`` as a hash join (null-safe keys are hashable) — not a
    nested loop.

    Scale lesson (round-9 sf1 sweep): the original form joined RAW
    event rows null-safely — NULL is the ultimate skew key, so the
    planted-NULL block alone produced (0.1·N)² join candidates (10¹⁰ at
    sf1, 343 s; unrunnable at 100 TB).  Reducing to per-key counts
    BEFORE the join bounds the join input at |keys| rows and carries
    the row-pair arithmetic through SUM(n1·n2) — identical semantics,
    linear cost."""
    e = load_table(spark, sf_dir, "events").selectExpr(
        "event_id",
        "CASE WHEN user_id % 10 = 0 THEN NULL ELSE user_id END AS k",
    )
    h1 = (
        e.filter(F.col("event_id") % 2 == 0)
        .groupBy("k").agg(F.count("*").cast("long").alias("n1"))
        .alias("a")
    )
    h2 = (
        e.filter(F.col("event_id") % 2 == 1)
        .groupBy("k").agg(F.count("*").cast("long").alias("n2"))
        .alias("b")
    )

    def side(cond, label):
        return (
            h1.join(h2, cond)
            .agg(
                F.count("*").cast("long").alias("n_matched_keys"),
                F.sum(F.col("a.n1") * F.col("b.n2")).cast("long").alias("n_row_pairs"),
            )
            .select(F.lit(label).alias("join_type"), "n_matched_keys", "n_row_pairs")
        )

    return side(F.col("a.k") == F.col("b.k"), "plain_eq").unionAll(
        side(F.col("a.k").eqNullSafe(F.col("b.k")), "null_safe")
    )


@query(
    "a14_bitwise_aggs",
    oracle="""
        SELECT event_type,
               CAST(bit_and(CAST(user_id AS BIGINT)) AS BIGINT) AS and_all,
               CAST(bit_or(CAST(user_id AS BIGINT)) AS BIGINT) AS or_all,
               CAST(bit_xor(CAST(user_id AS BIGINT)) AS BIGINT) AS xor_all
        FROM events GROUP BY event_type
    """,
    tags=("extra", "A1"),
)
def a14_bitwise_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregate functions (bit_and/bit_or/bit_xor) per group —
    commutative and associative, so partial aggregation merges exactly
    like sums do; xor-aggregation is also the classic set-difference
    checksum trick for reconciling two table snapshots."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.expr("bit_and(CAST(user_id AS BIGINT))").alias("and_all"),
        F.expr("bit_or(CAST(user_id AS BIGINT))").alias("or_all"),
        F.expr("bit_xor(CAST(user_id AS BIGINT))").alias("xor_all"),
    )


@query(
    "a16_freq_items_bound",
    # freqItems' candidate LIST depends on partition layout (Karp et al.
    # streaming counters merge per-partition), so the oracle pins the
    # algorithm's GUARANTEE instead: every key with frequency > support
    # must appear among the candidates — plus the exact heavy-hitter
    # count, recomputed independently.
    oracle="""
        WITH per_user AS (
            SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id
        ),
        tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM per_user)
        SELECT COUNT(*) AS n_true_heavy, TRUE AS contains_all
        FROM per_user CROSS JOIN tot
        WHERE cnt * 50 > n
    """,
    tags=("extra", "sketch"),
)
def a16_freq_items_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate heavy hitters (``df.stat.freqItems``, the
    Karp/Shenker/Papadimitriou one-pass counters — mergeable
    per-partition state, one scan, no shuffle of raw rows) checked
    against its guarantee: the candidate set must CONTAIN every key
    whose true frequency exceeds the support (2% here — cnt·50 > n in
    integer arithmetic).  The candidate list itself is layout-dependent
    (supersets are allowed by the algorithm), so the driver-hashed
    output is the exact heavy-hitter count plus the containment bit,
    both engine-independent.  The collect is the 1-row candidate list —
    bounded at 1/support = 50 entries by construction."""
    e = load_table(spark, sf_dir, "events")
    [row] = e.select("user_id").stat.freqItems(["user_id"], 0.02).collect()
    candidates = list(row["user_id_freqItems"])
    per_user = e.groupBy("user_id").agg(F.count("*").alias("cnt"))
    total = per_user.agg(F.sum("cnt").cast("long").alias("n"))
    heavy = per_user.crossJoin(F.broadcast(total)).where(
        F.col("cnt") * 50 > F.col("n")
    )
    return heavy.agg(
        F.count("*").alias("n_true_heavy"),
        F.coalesce(
            F.min(F.col("user_id").isin(candidates)), F.lit(True)
        ).alias("contains_all"),
    )


@query(
    "a17_exact_median_twopass",
    oracle="""
        WITH cents AS (
            SELECT CAST(round(value * 100, 0) AS BIGINT) AS c FROM events
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
               quantile_cont(c, 0.5) AS median_cents
        FROM cents
    """,
    tags=("extra", "A1", "robust-stats"),
)
def a17_exact_median_twopass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT median without a global sort — the two-pass bin-and-refine
    algorithm that makes exact order statistics affordable at 100 TB:
    pass 1 histograms the value range into 1024 bins (partial-agg, one
    tiny shuffle) and the driver locates which bin(s) hold the middle
    order statistics from the ≤1024-row histogram (bounded metadata,
    like the k-means centroid collects); pass 2 re-scans with a
    map-side filter selecting just those bins (~n/1024 rows) and ranks
    only that sliver.  ``percentile()`` (what a11_exact_quantiles uses) sorts
    every group member; this is the shape you run when a group has
    billions of rows.  Values are integer cents, so the final
    (a+b)/2 interpolation is dyadic-exact in both engines."""
    from dataengineeringworkshop_spark.operators.median import exact_median_twopass

    e = load_table(spark, sf_dir, "events").select(
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("c")
    )
    return exact_median_twopass(e, "c")


# four independent portable hash rows for the count-min sketch: the
# kbucket overflow guard with four distinct public odd multipliers
# (Knuth's 2654435761 + the xxhash32/64 prime constants)
# each fragment carries the kbucket overflow guard inline (the source
# scanner in tests/test_scale_paths.py rejects any bare multiplier)
_CM_HASHES = (
    "((({e}) % 1000000007) * 2654435761) % 256",
    "((({e}) % 1000000007) * 2246822519) % 256",
    "((({e}) % 1000000007) * 3266489917) % 256",
    "((({e}) % 1000000007) * 668265263) % 256",
)


def _cm_hash(expr: str, row: int) -> str:
    """Overflow-guarded multiplicative bucket (registry.kbucket form)
    for hash row ``row`` — identical fragment in both engines."""
    return _CM_HASHES[row].format(e=expr)


@query(
    "a18_count_min_sketch",
    # the sketch is RELATIONAL (portable hashes), so the oracle
    # recomputes the whole thing exactly — estimates included
    oracle=f"""
        WITH rows_ AS (
            {' UNION ALL '.join(
                f"SELECT {r} AS r, {_cm_hash('user_id', r)} AS bucket, user_id FROM events"
                for r in range(len(_CM_HASHES))
            )}
        ),
        sketch AS (
            SELECT r, bucket, COUNT(*) AS cnt FROM rows_ GROUP BY r, bucket
        ),
        probes AS (
            SELECT user_id, COUNT(*) AS true_cnt
            FROM events GROUP BY user_id
            ORDER BY true_cnt DESC, user_id ASC LIMIT 20
        )
        SELECT p.user_id, p.true_cnt,
               MIN(s.cnt) AS cm_estimate,
               MIN(s.cnt) >= p.true_cnt AS lower_bounded
        FROM probes p
        JOIN sketch s
          ON s.bucket = CASE s.r
              {' '.join(f"WHEN {r} THEN {_cm_hash('p.user_id', r)}" for r in range(len(_CM_HASHES)))}
             END
        GROUP BY p.user_id, p.true_cnt
    """,
    tags=("extra", "sketch"),
)
def a18_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch as RELATIONAL algebra: 4 overflow-guarded
    multiplicative hash rows × 256 buckets, built in ONE scan (the four
    hashes ride a posexplode of one projected array — no re-reads) with
    a 1024-cell partial aggregate; a key's frequency estimate is the MIN
    of its 4 bucket counts.  Because the hashes are the engine's
    portable kbucket family, the sketch is deterministic and the oracle
    recomputes estimate AND guarantee (estimate ≥ true count, here for
    the 20 hottest keys) exactly — unlike a_sketch_bounds/a16, nothing
    here is approximate-by-construction on the driver-hash path.  The
    mergeable 1024-cell state is what you'd keep per partition (or per
    hour) at 100 TB and fold with elementwise +."""
    e = load_table(spark, sf_dir, "events")
    hashes = ", ".join(_cm_hash("user_id", r) for r in range(len(_CM_HASHES)))
    exploded = e.selectExpr("user_id", f"posexplode(array({hashes})) AS (r, bucket)")
    sketch = exploded.groupBy("r", "bucket").agg(F.count("*").alias("cnt"))
    probes = (
        e.groupBy("user_id")
        .agg(F.count("*").alias("true_cnt"))
        .orderBy(F.col("true_cnt").desc(), F.col("user_id").asc())
        .limit(20)
    )
    probe_bucket = " ".join(
        f"WHEN {r} THEN {_cm_hash('user_id', r)}" for r in range(len(_CM_HASHES))
    )
    joined = probes.join(
        F.broadcast(sketch),
        F.expr(f"bucket = CASE r {probe_bucket} END"),
    )
    return joined.groupBy("user_id", "true_cnt").agg(
        F.min("cnt").alias("cm_estimate"),
        (F.min("cnt") >= F.col("true_cnt")).alias("lower_bounded"),
    )


# decimal-tree hierarchy: every customer key's parent is key div 10, so
# roots are the single-digit keys — a synthetic but fully deterministic
# parent/child table both engines derive identically.
_HIER_BODY = """
    WITH RECURSIVE walk(c_custkey, root, depth) AS (
        SELECT c_custkey, c_custkey AS root, 0 AS depth
        FROM {customer} WHERE c_custkey < 10
        UNION ALL
        SELECT c.c_custkey, w.root, w.depth + 1
        FROM {customer} c JOIN walk w ON (c.c_custkey {div} 10) = w.c_custkey
        WHERE c.c_custkey >= 10
    )
    SELECT root,
           COUNT(*) AS n_members,
           MAX(depth) AS max_depth,
           MIN(c_custkey) AS min_key,
           MAX(c_custkey) AS max_key
    FROM walk
    GROUP BY root
"""


@query(
    "c5_recursive_cte_hierarchy",
    oracle=_HIER_BODY.format(customer="customer", div="//"),
    tags=("extra", "C1", "iterative"),
)
def c5_recursive_cte_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE as LITERAL SQL — Spark 4's recursive CTE walking a
    parent/child hierarchy (parent key = key div 10) from the
    single-digit roots down, then rolling up subtree size and depth per
    root.  The one construct SURVEY.md §2.7 could not previously
    express as SQL text (the iterative DataFrame twin is
    ``d_dup_clusters``' connected components); DuckDB runs the
    IDENTICAL body, so the driver hash covers every recursion level.
    Spark executes each recursion step as one join against the
    previous frontier — iterations = hierarchy depth (≤ key width,
    here 4), frontier shrinks monotonically, and each step is an
    equi join Catalyst plans like any other.  The depth bound, not
    corpus size, fixes the iteration count at 100 TB."""
    return _sql(
        spark, sf_dir, ("customer",),
        _HIER_BODY.format(customer="dew_customer", div="div"),
    )


# dialect-free LATERAL body (Spark 4 and DuckDB parse it identically)
_LATERAL_BODY = """
    SELECT r.r_name, t.n_name, t.n_cust
    FROM {region} r,
    LATERAL (
        SELECT n.n_name, COUNT(c.c_custkey) AS n_cust
        FROM {nation} n JOIN {customer} c ON c.c_nationkey = n.n_nationkey
        WHERE n.n_regionkey = r.r_regionkey
        GROUP BY n.n_name
        ORDER BY n_cust DESC, n.n_name ASC
        LIMIT 2
    ) t
"""


@query(
    "j8_lateral_topk_per_region",
    oracle=_LATERAL_BODY.format(region="region", nation="nation", customer="customer"),
    tags=("extra", "J1", "O4"),
)
def j8_lateral_topk_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery with ORDER BY + LIMIT — "top 2
    nations by customer count per region" written the way an analyst
    writes it (the window-function formulation is ``w2_topk_per_group``;
    this is the SQL-standard lateral form, same body in both engines).
    Catalyst DECORRELATES the lateral: the aggregate runs once over the
    joined tables, the per-region top-2 becomes a rank filter — not a
    re-executed subquery per outer row, which is what makes the form
    safe when the outer side has a million rows instead of five."""
    return _sql(
        spark, sf_dir, ("region", "nation", "customer"),
        _LATERAL_BODY.format(
            region="dew_region", nation="dew_nation", customer="dew_customer"
        ),
    )


# shared OUTER-LATERAL body (Spark 4 and DuckDB parse it identically;
# only the day-to-string expression is dialect-formatted — a raw
# date/timestamp output canonicalizes differently in pandas).  The
# correlated subquery is EMPTY for ~20% of customers at every SF
# (per-customer order count is SF-invariant, so the urgent+price
# filter's per-customer hit rate is too) — the row set proves LEFT JOIN
# LATERAL's null-extension, not just the inner form j8 already covers.
_OUTER_LATERAL_BODY = """
    SELECT c.c_custkey, t.o_orderkey, t.order_day, t.price_cents
    FROM {customer} c
    LEFT JOIN LATERAL (
        SELECT o.o_orderkey,
               {dayexpr} AS order_day,
               CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
        FROM {orders} o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderpriority = '1-URGENT'
          AND o.o_totalprice >= 150000.0
        ORDER BY order_day DESC, o.o_orderkey ASC
        LIMIT 2
    ) t ON TRUE
"""
# ^ ORDER BY the SELECTED order_day alias, not raw o_orderdate: ordering
# a lateral subquery by a column absent from its SELECT list makes
# Catalyst keep a GLOBAL range sort and skip the WindowGroupLimit
# rewrite (measured: rangepartitioning exchange + full Window).  The
# ISO yyyy-MM-dd string orders identically to the date-granular
# timestamp (asserted data-wide: every o_orderdate is midnight), and
# tests/test_plan_quality.py pins the WindowGroupLimit plan.


@query(
    "j10_left_join_lateral",
    oracle=_OUTER_LATERAL_BODY.format(
        customer="customer",
        orders="orders",
        dayexpr="strftime(CAST(o.o_orderdate AS DATE), '%Y-%m-%d')",
    ),
    tags=("extra", "J1", "J5", "O4"),
)
def j10_left_join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER JOIN LATERAL — "each customer's 2 most recent big
    urgent orders, keeping customers with none" — the null-extending
    lateral form (j8_lateral_topk_per_region covers the inner form).
    Same body text in both engines; an order-less customer contributes
    one NULL-extended row, exactly SQL-standard outer-lateral
    semantics.

    Scale shape: Catalyst DECORRELATES the lateral — the per-customer
    top-2 becomes a WindowGroupLimit pair (Partial BEFORE the shuffle:
    each map task keeps ≤2 orders per customer, so the exchange carries
    the top-k candidates, not every urgent order) and the outer join is
    a plain LeftOuter equi-join on c_custkey, broadcast-able when the
    filtered side is small — never a re-executed subquery per customer.
    Determinism: (o_orderdate DESC, o_orderkey ASC) is a unique order;
    price emitted as FLOOR-cents (2-decimal doubles, IEEE-identical);
    the >= 150000.0 threshold compares exactly in both engines."""
    return _sql(
        spark, sf_dir, ("customer", "orders"),
        _OUTER_LATERAL_BODY.format(
            customer="dew_customer",
            orders="dew_orders",
            dayexpr="date_format(o.o_orderdate, 'yyyy-MM-dd')",
        ),
    )


@query(
    "w10_ignore_nulls_window_breadth",
    oracle="""
        WITH r AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN event_type = 'error' THEN NULL ELSE value END
                       AS reading
            FROM events
        )
        SELECT user_id, event_id,
               first_value(reading IGNORE NULLS) OVER w AS first_good,
               nth_value(reading, 2 IGNORE NULLS) OVER w AS second_good,
               last_value(reading IGNORE NULLS) OVER w AS latest_good
        FROM r
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    tags=("extra", "analytic-window"),
)
def w10_ignore_nulls_window_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IGNORE NULLS analytic-window family in one pass: first,
    second (nth_value), and latest non-null reading per user as of each
    event — the trio behind "first touch / second touch / current
    state" attribution views (ts_forward_fill is the aggregate
    consumer of the last_value form).  One window, one exchange; the
    ROWS frame plus (ts, event_id) unique order keeps equal-timestamp
    peers out, and the readings are 2-decimal doubles passed through
    untouched, so no float arithmetic happens at all."""
    register_views(spark, sf_dir, "events")
    return spark.sql(
        """
        WITH r AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN event_type = 'error' THEN NULL ELSE value END
                       AS reading
            FROM dew_events
        )
        SELECT user_id, event_id,
               first_value(reading) IGNORE NULLS OVER w AS first_good,
               nth_value(reading, 2) IGNORE NULLS OVER w AS second_good,
               last_value(reading) IGNORE NULLS OVER w AS latest_good
        FROM r
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """
    )


# shared running-distinct body: first-occurrence flag (row_number over
# (user, type)) feeding a running sum over the SAME unique (ts, event_id)
# order — dialect-free, integers only
_CUMDIST_BODY = """
    WITH f AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ROW_NUMBER() OVER (
                        PARTITION BY user_id, event_type
                        ORDER BY ts, event_id
                    ) = 1 THEN 1 ELSE 0 END AS is_first
        FROM {events}
    )
    SELECT user_id, event_id,
           CAST(SUM(is_first) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS distinct_types_so_far
    FROM f
"""


@query(
    "w11_cumulative_distinct",
    oracle=_CUMDIST_BODY.format(events="events"),
    tags=("extra", "analytic-window"),
)
def w11_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) over a window — the construct SQL
    forbids directly (DISTINCT is not frame-able) — via the standard
    two-window decomposition: flag each row that is the FIRST
    occurrence of its (user, event_type), then running-sum the flags
    in event order.  "How many distinct event types has this user
    touched so far?" — the breadth-of-engagement curve.  Two window
    passes over the same rows; the second reuses the first's
    (user_id) hash partitioning, so Catalyst plans one exchange plus
    an extra sort, never a per-row distinct scan.  Integers only —
    no float contract needed."""
    return _sql(
        spark, sf_dir, ("events",), _CUMDIST_BODY.format(events="dew_events")
    )


@query(
    "j9_bloom_prefilter_semi",
    # the oracle is the PLAIN semi join: the hash match proves the
    # bucket prefilter admits every true match (false positives are
    # removed by the exact join; false negatives are impossible — both
    # sides hash the key with the same function)
    oracle="""
        SELECT o.o_orderkey, o.o_orderpriority
        FROM orders o
        WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity = 50
        )
    """,
    tags=("extra", "J1", "scale"),
)
def j9_bloom_prefilter_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join behind a hand-built Bloom-style prefilter: the build
    side (orders containing a quantity-50 lineitem) reduces to its
    DISTINCT kbucket set (<= m = 8192 rows REGARDLESS of build-side
    cardinality), the probe side keeps only rows whose bucket is in
    the set via a BROADCAST semi join — a one-hash Bloom filter with
    m-bit occupancy, expressed as relational ops — and the surviving
    sliver goes through the exact semi join.  The pattern Spark's
    runtime bloom injection (tests/test_scale_paths.py pins the
    automatic variant) applies, built manually so it works on engines
    or plans where injection declines.  At 100 TB: the broadcast is
    bounded by m, non-candidate probe rows die before the shuffle,
    and the exact join sees only bucket-colliding rows."""
    from dataengineeringworkshop_spark.operators.joins import bloom_prefilter_semi

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    hot = li.filter(F.col("l_quantity") == 50).select("l_orderkey")
    return bloom_prefilter_semi(
        o, hot, probe_key="o_orderkey", build_key="l_orderkey", m=8192
    ).select("o_orderkey", "o_orderpriority")


_VALUE_RANGE_BODY = """
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           CAST(YEAR(o_orderdate) * 100 + MONTH(o_orderdate) AS BIGINT)
               AS order_month,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_nearby,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
               AS nearby_total
    FROM {orders}
    WHERE o_totalprice >= 250000
    WINDOW w AS (PARTITION BY o_orderstatus,
                              YEAR(o_orderdate) * 100 + MONTH(o_orderdate)
                 ORDER BY o_totalprice
                 RANGE BETWEEN 1000.0 PRECEDING AND 1000.0 FOLLOWING)
"""


@query(
    "w13_value_range_window",
    oracle=_VALUE_RANGE_BODY.format(orders="orders"),
    tags=("extra", "W2", "value-range"),
)
def w13_value_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUE-based RANGE frame (price ± 1000), the non-time sibling of
    w6's interval RANGE window: per order, how many orders of the same
    status in the same calendar month sit within 1000 of its price, and
    their exact decimal total.  The frame is defined by the ORDER-BY
    VALUE, not row position — ties share a frame by construction, so no
    tiebreaker is needed and both engines bound the frame with
    identical IEEE double comparisons; the in-frame sum accumulates in
    DECIMAL.  Scale: the window partitions on (status, order month) —
    cardinality grows with the table's timespan, so the exchange
    genuinely parallelizes and each per-partition sort is bounded by a
    month of one status (the round-8 version filtered to a single
    status AND partitioned on it, collapsing every row into one window
    partition — fixed per ADVICE r8) — never a per-row self-join, which
    is what a naive ±delta formulation would shuffle."""
    return _sql(spark, sf_dir, ("orders",),
                _VALUE_RANGE_BODY.format(orders="dew_orders"))


@query(
    "g3_stack_inline_breadth",
    oracle="""
        WITH base AS (SELECT doc_id, text FROM documents)
        SELECT 'chars' AS metric, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(LENGTH(text)) AS BIGINT) AS total FROM base
        UNION ALL
        SELECT 'words', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) FROM base
        UNION ALL
        SELECT 'caps', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(LENGTH(regexp_replace(text, '[^A-Z]', '', 'g'))) AS BIGINT)
        FROM base
        UNION ALL
        SELECT 'zip3', CAST(COUNT(*) AS BIGINT), CAST(SUM(pos) AS BIGINT)
        FROM (
            SELECT generate_subscripts(string_split(text, ' '), 1) AS pos,
                   unnest(string_split(text, ' ')) AS wd
            FROM base
        )
        WHERE LENGTH(wd) = 3
    """,
    tags=("extra", "G1", "G2", "generators"),
)
def g3_stack_inline_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator-function breadth beyond explode/posexplode: ``stack``
    pivots each document into per-metric rows (the columns-to-rows move
    DuckDB writes as UNION ALL — which is exactly what the oracle
    does), and ``inline`` over a ``transform``-built array<struct>
    flattens (word, position) pairs in one generator (the named-struct
    spelling of posexplode).  Each branch reduces to (metric, n, total)
    scalars.  Scale: both generators are row-local (no shuffle until
    the final 4-group aggregate); stack multiplies rows by a CONSTANT
    3, inline by words-per-doc — the same bounded expansion the
    explode family's plans already carry."""
    return _sql(
        spark, sf_dir, ("documents",),
        """
        WITH stacked AS (
            SELECT stack(3,
                       'chars', LENGTH(text),
                       'words', size(split(text, ' ')),
                       'caps',  LENGTH(regexp_replace(text, '[^A-Z]', ''))
                   ) AS (metric, v)
            FROM dew_documents
        ),
        zipped AS (
            SELECT inline(transform(split(text, ' '),
                                    (x, i) -> struct(x AS wd, i + 1 AS pos)))
            FROM dew_documents
        )
        SELECT metric, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(v) AS BIGINT) AS total
        FROM stacked GROUP BY metric
        UNION ALL
        SELECT 'zip3', CAST(COUNT(*) AS BIGINT), CAST(SUM(pos) AS BIGINT)
        FROM zipped WHERE LENGTH(wd) = 3
        """,
    )


@query(
    "g4_posexplode_outer_breadth",
    oracle="""
        WITH arr AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), w -> length(w) >= 7)
                       AS longs
            FROM documents
        ),
        ex AS (
            SELECT doc_id,
                   CAST(generate_subscripts(longs, 1) - 1 AS BIGINT) AS pos,
                   unnest(longs) AS wd
            FROM arr
        )
        SELECT a.doc_id, ex.pos, ex.wd, (ex.wd IS NULL) AS from_empty
        FROM arr a LEFT JOIN ex ON a.doc_id = ex.doc_id
    """,
    tags=("extra", "G1", "generators", "outer"),
)
def g4_posexplode_outer_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OUTER generator null preservation — the one explode variant a
    real ETL user hits weekly and the generator family never pinned:
    ``LATERAL VIEW OUTER posexplode`` keeps a parent row whose array is
    EMPTY (null pos/word, from_empty=true) where the inner form would
    silently drop it.  The long-word filter (length >= 7) makes ~1/5 of
    documents genuinely empty at every test SF, so the null-preserving
    rows are load-bearing in the hash.  DuckDB has no OUTER unnest —
    the oracle writes the relational definition (LEFT JOIN of parents
    onto the exploded rows).  Scale: the generator is row-local; the
    one scan carries a 2-column projection."""
    return _sql(
        spark, sf_dir, ("documents",),
        """
        WITH arr AS (
            SELECT doc_id, filter(split(text, ' '), w -> length(w) >= 7)
                       AS longs
            FROM dew_documents
        )
        SELECT doc_id, CAST(pos AS BIGINT) AS pos, wd,
               (wd IS NULL) AS from_empty
        FROM arr LATERAL VIEW OUTER posexplode(longs) AS pos, wd
        """,
    )


@query(
    "g5_explode_outer_map",
    oracle="""
        WITH base AS (
            SELECT doc_id, LENGTH(text) AS chars,
                   len(string_split(text, ' ')) AS words
            FROM documents
        ),
        r AS (
            SELECT doc_id, 'chars' AS k, CAST(chars AS BIGINT) AS v
            FROM base WHERE chars >= 400
            UNION ALL
            SELECT doc_id, 'words', CAST(words AS BIGINT)
            FROM base WHERE words >= 60
        )
        SELECT b.doc_id, r.k, r.v FROM base b LEFT JOIN r ON b.doc_id = r.doc_id
    """,
    tags=("extra", "G2", "generators", "outer"),
)
def g5_explode_outer_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OUTER explode over a MAP column: per-document size metrics that
    exceed their thresholds become (key, value) rows via ``map_filter``
    + ``LATERAL VIEW OUTER explode`` — a document exceeding neither
    keeps one all-null row instead of vanishing (the null-preservation
    contract, map flavor; g4 pins the array flavor).  Thresholds are
    chosen so all three outcomes (0, 1, 2 surviving entries) occur at
    every test SF.  The oracle is the relational definition: threshold
    UNION branches LEFT JOINed back onto the parent set.  Scale: one
    scan, map-side map_filter, row-local generator."""
    return _sql(
        spark, sf_dir, ("documents",),
        """
        WITH m AS (
            SELECT doc_id,
                   map_filter(
                       map('chars', CAST(LENGTH(text) AS BIGINT),
                           'words', CAST(size(split(text, ' ')) AS BIGINT)),
                       (k, v) -> v >= CASE WHEN k = 'chars' THEN 400
                                           ELSE 60 END) AS big
            FROM dew_documents
        )
        SELECT doc_id, k, v FROM m LATERAL VIEW OUTER explode(big) AS k, v
        """,
    )


@query(
    "b_unpivot_sql_clause",
    oracle="""
        WITH wide AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'click'
                            THEN CAST(round(value * 100, 0) AS BIGINT) END)
                       AS c_click,
                   MIN(CASE WHEN event_type = 'view'
                            THEN CAST(round(value * 100, 0) AS BIGINT) END)
                       AS c_view,
                   MIN(CASE WHEN event_type = 'purchase'
                            THEN CAST(round(value * 100, 0) AS BIGINT) END)
                       AS c_purchase
            FROM events GROUP BY user_id
        )
        SELECT user_id, 'c_click' AS metric, c_click AS min_cents FROM wide
        UNION ALL
        SELECT user_id, 'c_view', c_view FROM wide
        UNION ALL
        SELECT user_id, 'c_purchase', c_purchase FROM wide
    """,
    tags=("extra", "pivot", "outer"),
)
def b_unpivot_sql_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL ``UNPIVOT`` clause itself (b_unpivot_event_stats covers
    the ``stack()`` spelling) with ``INCLUDE NULLS`` — the variant that
    matters: per-user minimum cents per event type has real NULLs
    (users without that type), and default UNPIVOT would silently drop
    those rows where INCLUDE NULLS keeps the full user x metric grid.
    The oracle is the UNION ALL expansion with no null filter.  Scale:
    one grouped scan builds the wide row; UNPIVOT is a row-local
    generator (constant 3x fan-out, no shuffle)."""
    return _sql(
        spark, sf_dir, ("events",),
        """
        SELECT user_id, metric, min_cents
        FROM (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'click'
                            THEN CAST(round(value * 100, 0) AS BIGINT) END)
                       AS c_click,
                   MIN(CASE WHEN event_type = 'view'
                            THEN CAST(round(value * 100, 0) AS BIGINT) END)
                       AS c_view,
                   MIN(CASE WHEN event_type = 'purchase'
                            THEN CAST(round(value * 100, 0) AS BIGINT) END)
                       AS c_purchase
            FROM dew_events GROUP BY user_id
        )
        UNPIVOT INCLUDE NULLS (
            min_cents FOR metric IN (c_click, c_view, c_purchase)
        )
        """,
    )


@query(
    "o5_null_ordering_breadth",
    oracle="""
        WITH t AS (
            SELECT o_orderkey, o_orderstatus,
                   CASE WHEN o_orderkey % 7 = 0 THEN NULL
                        ELSE o_custkey END AS k
            FROM orders
        ),
        r AS (
            SELECT o_orderkey, o_orderstatus, k,
                   ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                       ORDER BY k ASC NULLS FIRST, o_orderkey) AS rn_anf,
                   ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                       ORDER BY k ASC NULLS LAST, o_orderkey) AS rn_anl,
                   ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                       ORDER BY k DESC NULLS FIRST, o_orderkey) AS rn_dnf,
                   ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                       ORDER BY k DESC NULLS LAST, o_orderkey) AS rn_dnl
            FROM t
        )
        SELECT o_orderkey, o_orderstatus, k,
               CAST(rn_anf AS BIGINT) AS rn_anf, CAST(rn_anl AS BIGINT) AS rn_anl,
               CAST(rn_dnf AS BIGINT) AS rn_dnf, CAST(rn_dnl AS BIGINT) AS rn_dnl
        FROM r
        WHERE least(rn_anf, rn_anl, rn_dnf, rn_dnl) <= 3
    """,
    tags=("extra", "O1", "W2", "null-ordering"),
)
def o5_null_ordering_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPLICIT null-ordering semantics pinned cross-engine — the
    hazard class the determinism contract flags: Spark defaults to
    NULLS FIRST on ASC where DuckDB defaults to NULLS LAST, so any
    ORDER BY on a nullable key inside a window rank silently diverges
    unless the NULLS clause is explicit.  All four (direction × nulls
    placement) combinations rank a derived nullable key (CASE-derived,
    identical expression both engines) per order-status partition; the
    output keeps only each ranking's top 3, so the row set is tiny and
    every combination's boundary (null block at the head vs tail) is in
    it.  Purpose-built semantics pin: windows partition by status, so
    no global single-partition sort."""
    return _sql(
        spark, sf_dir, ("orders",),
        """
        WITH t AS (
            SELECT o_orderkey, o_orderstatus,
                   CASE WHEN o_orderkey % 7 = 0 THEN NULL
                        ELSE o_custkey END AS k
            FROM dew_orders
        ),
        r AS (
            SELECT o_orderkey, o_orderstatus, k,
                   ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                       ORDER BY k ASC NULLS FIRST, o_orderkey) AS rn_anf,
                   ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                       ORDER BY k ASC NULLS LAST, o_orderkey) AS rn_anl,
                   ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                       ORDER BY k DESC NULLS FIRST, o_orderkey) AS rn_dnf,
                   ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                       ORDER BY k DESC NULLS LAST, o_orderkey) AS rn_dnl
            FROM t
        )
        SELECT o_orderkey, o_orderstatus, k,
               CAST(rn_anf AS BIGINT) AS rn_anf, CAST(rn_anl AS BIGINT) AS rn_anl,
               CAST(rn_dnf AS BIGINT) AS rn_dnf, CAST(rn_dnl AS BIGINT) AS rn_dnl
        FROM r
        WHERE least(rn_anf, rn_anl, rn_dnf, rn_dnl) <= 3
        """,
    )
