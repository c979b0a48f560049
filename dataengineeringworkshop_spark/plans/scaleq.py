"""Scale-technique queries: the write-time layout and skew devices the
100 TB design notes (SCALE.md) prescribe, exercised as oracle-paired
registry entries so the driver hash-checks that each technique is
RESULT-preserving — the whole point of a physical-layout optimization.

- Bucketed co-located join: both fact tables written ``bucketBy`` the
  join key once; every later equi join on that key plans with NO shuffle
  exchange on either side (pay the shuffle once at write time, amortize
  over every query).  The OSS analogue of the reference's OPTIMIZE
  layout story (`2 Medaillon architecture.py:449-458`) for join
  locality.
- Salted skew join: a handful of hot keys re-skew even AQE-split
  partitions; salting spreads the skewed side across n sub-keys and
  replicates only the small build side.  Semantics identical to the
  plain join — which is exactly what the DuckDB oracle asserts.
- ORC roundtrip: Spark-native columnar source beyond the reference's
  CSV/JSON surface (S1/S2) — same options-scan contract.
"""

from __future__ import annotations

import os
import re
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataengineeringworkshop_spark.plans.registry import kbucket, query
from dataengineeringworkshop_spark.plans.tables import load_table


def _slug(sf_dir: str) -> str:
    """Catalog-safe unique name component: a readable path tail PLUS a
    full-path digest, so two sf_dirs whose sanitized tails coincide
    (long tmp paths differing only in an earlier component) can never
    silently share one bucketed table."""
    import hashlib

    tail = re.sub(r"[^A-Za-z0-9]", "_", sf_dir).strip("_")[-16:]
    return f"{tail}_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"


@query(
    "pp_bucketed_join_agg",
    oracle="""
        SELECT o.o_orderstatus,
               COUNT(*) AS n_items,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                   AS revenue
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_orderstatus
    """,
    tags=("extra", "scale-layout"),
)
def pp_bucketed_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located fact⋈fact join over BUCKETED tables: orders and
    lineitem are persisted ``bucketBy(8, orderkey)`` catalog tables,
    and the join carries a ``merge`` hint so the bucketed sort-merge
    path is exercised (broadcast would hide the layout).  The plan has
    ZERO shuffle exchanges before the join — the single Exchange in the
    plan belongs to the final aggregate (asserted in
    tests/test_plan_quality.py).  The oracle proves the layout change
    is result-preserving: identical to the plain parquet join."""
    from dataengineeringworkshop_spark.sources.bucketing import write_bucketed

    slug = _slug(sf_dir)
    to, tl = f"dew_bkt_orders_{slug}", f"dew_bkt_lineitem_{slug}"
    # external tables at a FIXED per-sf temp path: the session catalog
    # is in-memory but the default warehouse DIRECTORY persists across
    # processes (a stale managed location would fail saveAsTable), and
    # a fixed deterministic location means repeated sessions / bench
    # iterations REUSE one directory per sf_dir instead of leaking a
    # fresh mkdtemp per process (mode=overwrite replaces stale files)
    base = os.path.join(tempfile.gettempdir(), "dew_bkt", slug)
    if not spark.catalog.tableExists(to):
        o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
        write_bucketed(
            o, to, ["o_orderkey"], n_buckets=8, sort_cols=["o_orderkey"],
            path=os.path.join(base, "orders"),
        )
    if not spark.catalog.tableExists(tl):
        li = load_table(spark, sf_dir, "lineitem").select(
            F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice"
        )
        write_bucketed(
            li, tl, ["o_orderkey"], n_buckets=8, sort_cols=["o_orderkey"],
            path=os.path.join(base, "lineitem"),
        )
    j = spark.table(to).hint("merge").join(spark.table(tl), "o_orderkey")
    return j.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_items"),
        F.expr(
            "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)"
        ).alias("revenue"),
    )


@query(
    "pp_salted_skew_agg",
    oracle="""
        WITH dim AS (
            SELECT user_id, MIN(event_type) AS first_type,
                   user_id % 7 AS cohort
            FROM events GROUP BY user_id
        )
        SELECT e.event_type, d.cohort,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        FROM events e JOIN dim d ON e.user_id = d.user_id
        GROUP BY e.event_type, d.cohort
    """,
    tags=("extra", "scale-skew"),
)
def pp_salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join, hash-proved result-preserving: the (skewed)
    events fact joins a small per-user dim through ``salted_join``
    (8 salts — the fact side shuffles on (user_id, salt), the dim is
    replicated 8×), then aggregates.  The salt participates only in
    partitioning, so the DuckDB oracle is the PLAIN join — any leak of
    the salt into the semantics breaks the hash.  The per-row salt
    values themselves are partition-order dependent (F.rand), which is
    exactly why only salt-insensitive results are deterministic — the
    aggregate here, or any plain join output."""
    from dataengineeringworkshop_spark.operators.skew import salted_join

    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "value")
    dim = (
        e.groupBy("user_id")
        .agg(F.min("event_type").alias("first_type"))
        .withColumn("cohort", F.col("user_id") % 7)
    )
    j = salted_join(e.select("user_id", "event_type", "value"), dim, on="user_id", n_salts=8)
    return j.groupBy("event_type", "cohort").agg(
        F.count("*").alias("n_events"),
        F.expr("CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)").alias(
            "total_value"
        ),
    )


@query(
    "s_orc_roundtrip",
    oracle="SELECT p_partkey, p_name, p_retailprice FROM part",
    tags=("extra", "source-formats"),
)
def s_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + scan roundtrip — the second Spark-native columnar
    format beyond the reference's CSV/JSON (S1/S2): part → ORC → read
    back with column pruning reaching the ORC scan."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_retailprice"
    )
    out = tempfile.mkdtemp(prefix="dew_orc_") + "/part_orc"
    p.write.mode("overwrite").orc(out)
    return spark.read.orc(out).select("p_partkey", "p_name", "p_retailprice")


@query(
    "pp_partition_skew_report",
    oracle=f"""
        WITH bucketed AS (
            SELECT user_id, {{kb}} AS bucket FROM events
        ),
        per_bucket AS (
            SELECT bucket, COUNT(*) AS n FROM bucketed GROUP BY bucket
        ),
        bstats AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
                   CAST(MIN(n) AS BIGINT) AS min_bucket_rows,
                   CAST(MAX(n) AS BIGINT) AS max_bucket_rows,
                   CAST(SUM(n) AS BIGINT) AS total_rows
            FROM per_bucket
        ),
        hot AS (
            SELECT user_id AS hottest_key, CAST(COUNT(*) AS BIGINT) AS hottest_rows
            FROM events GROUP BY user_id
            ORDER BY COUNT(*) DESC, user_id ASC LIMIT 1
        )
        SELECT b.n_buckets, b.min_bucket_rows, b.max_bucket_rows, b.total_rows,
               ROUND(CAST(b.max_bucket_rows AS DOUBLE)
                     / (CAST(b.total_rows AS DOUBLE) / b.n_buckets), 6)
                   AS bucket_skew_factor,
               h.hottest_key, h.hottest_rows,
               ROUND(CAST(h.hottest_rows AS DOUBLE) / b.total_rows, 6)
                   AS hottest_key_share
        FROM bstats b CROSS JOIN hot h
    """.format(kb=kbucket("user_id", 32)),
    tags=("extra", "scale-skew"),
)
def pp_partition_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew diagnostic that justifies (or vetoes) salting: simulate
    the shuffle's hash partitioning of events on user_id into 32
    buckets with the engine's portable multiplicative hash, report
    bucket-level imbalance (max/avg skew factor) plus the single
    hottest key and its share of all rows.  This is the measurement
    step before pp_salted_skew_agg's mitigation — at 100 TB you run
    exactly this (it's two partial-agg passes + two 1-row scalar
    joins) before deciding n_salts."""
    from dataengineeringworkshop_spark.plans.tables import register_views

    register_views(spark, sf_dir, "events")
    return spark.sql(
        f"""
        WITH bucketed AS (
            SELECT user_id, {kbucket('user_id', 32)} AS bucket FROM dew_events
        ),
        per_bucket AS (
            SELECT bucket, COUNT(*) AS n FROM bucketed GROUP BY bucket
        ),
        bstats AS (
            SELECT COUNT(*) AS n_buckets,
                   MIN(n) AS min_bucket_rows,
                   MAX(n) AS max_bucket_rows,
                   SUM(n) AS total_rows
            FROM per_bucket
        ),
        hot AS (
            SELECT user_id AS hottest_key, COUNT(*) AS hottest_rows
            FROM dew_events GROUP BY user_id
            ORDER BY COUNT(*) DESC, user_id ASC LIMIT 1
        )
        SELECT b.n_buckets, b.min_bucket_rows, b.max_bucket_rows, b.total_rows,
               ROUND(CAST(b.max_bucket_rows AS DOUBLE)
                     / (CAST(b.total_rows AS DOUBLE) / b.n_buckets), 6)
                   AS bucket_skew_factor,
               h.hottest_key, h.hottest_rows,
               ROUND(CAST(h.hottest_rows AS DOUBLE) / b.total_rows, 6)
                   AS hottest_key_share
        FROM bstats b CROSS JOIN hot h
        """
    )


# Bit-spread for a 4-bit value: bit i moves to bit 2i (multiplication by
# powers of two == shifts, identical in Spark SQL and DuckDB, so ONE
# fragment serves both engines).
_SPREAD4 = "(({x}) & 1) + (({x}) & 2) * 2 + (({x}) & 4) * 4 + (({x}) & 8) * 8"


def _morton_sql(custkey: str, day: str) -> str:
    """Shared Spark/DuckDB body computing a 16×16 Morton (Z-order) code
    over min-max-scaled (custkey, order-day) and the per-file min/max
    ranges when files are cut along the curve.  All-integer arithmetic
    (the float divisions are exact: operands < 2^53, floor applied)."""
    sx = _SPREAD4.format(x="bx")
    sy = _SPREAD4.format(x="by")
    return f"""
        WITH d AS (
            SELECT o_custkey, {day} AS o_day FROM {{orders}}
        ),
        b AS (
            SELECT MIN(o_custkey) AS mnc, MAX(o_custkey) AS mxc,
                   MIN(o_day) AS mnd, MAX(o_day) AS mxd
            FROM d
        ),
        scaled AS (
            SELECT d.o_custkey, d.o_day,
                   CAST(floor((d.o_custkey - b.mnc) * 16.0
                              / (b.mxc - b.mnc + 1)) AS BIGINT) AS bx,
                   CAST(floor((d.o_day - b.mnd) * 16.0
                              / (b.mxd - b.mnd + 1)) AS BIGINT) AS by
            FROM d CROSS JOIN b
        ),
        coded AS (
            SELECT o_custkey, o_day,
                   CAST(floor((({sx}) + 2 * ({sy})) / 16.0) AS BIGINT)
                       AS file_id
            FROM scaled
        )
        SELECT file_id,
               COUNT(*) AS n_rows,
               MIN(o_custkey) AS min_ck, MAX(o_custkey) AS max_ck,
               MIN(o_day) AS min_day, MAX(o_day) AS max_day
        FROM coded
        GROUP BY file_id
    """


@query(
    "pp_zorder_layout",
    oracle=_morton_sql(
        custkey="o_custkey",
        day="CAST(floor(epoch(CAST(o_orderdate AS TIMESTAMP)) / 86400) AS BIGINT)",
    ).format(orders="orders"),
    tags=("extra", "scale-layout"),
)
def pp_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-dimensional Z-order (Morton) clustering — the layout device
    behind OPTIMIZE ZORDER BY (vt_optimize_roundtrip exercises the
    single-column form through the table backend; this query exposes
    the 2-D bit-interleave itself, hash-checked).  Each order's
    (custkey, order-day) pair is min-max scaled to a 16×16 grid, the
    two 4-bit coordinates are bit-interleaved into an 8-bit Morton
    code, and 16 "files" are cut along the curve.  The per-file min/max
    report IS the point: along the Z-curve BOTH dimensions stay
    range-bounded per file (each file covers ~2 grid cells per axis),
    so min/max stats can skip files for predicates on EITHER column —
    a lexicographic sort bounds only its leading column.  The whole
    computation is one map-side integer expression over the scan (the
    bounds CTE is a 1-row broadcast) plus a 16-group aggregate; at
    100 TB the same code feeds repartitionByRange(file_id) at write
    time."""
    from dataengineeringworkshop_spark.plans.tables import register_views

    register_views(spark, sf_dir, "orders")
    return spark.sql(
        _morton_sql(
            custkey="o_custkey",
            day=(
                "CAST(floor(unix_timestamp(CAST(o_orderdate AS TIMESTAMP))"
                " / 86400) AS BIGINT)"
            ),
        ).format(orders="dew_orders")
    )
