"""Workshop-pipeline-shaped queries: data-quality expectation metrics
(§2.13) and a bronze→silver→gold medallion composition (§4.3) expressed
over the testdata — each with a DuckDB oracle where SQL-expressible.

Delta-like DML (MERGE / time travel / history / OPTIMIZE) lives in
``tables.versioned`` and registers rows-only queries (no DuckDB analogue)
— see plans registered at the bottom once that layer imports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataengineeringworkshop_spark.operators.expectations import Expectation, expectation_metrics
from dataengineeringworkshop_spark.plans.registry import dsum, query
from dataengineeringworkshop_spark.plans.tables import load_table, register_views


@query(
    "ws_expectation_metrics",
    oracle="""
        SELECT 'valid_totalprice' AS constraint_name,
               CAST(SUM(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END) AS BIGINT) AS passed_records,
               CAST(SUM(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END) AS BIGINT) AS failed_records
        FROM orders
        UNION ALL
        SELECT 'known_status',
               CAST(SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 0 ELSE 1 END) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'orderkey_present',
               CAST(SUM(CASE WHEN o_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN o_orderkey IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT)
        FROM orders
    """,
    tags=("E1", "E3"),
)
def ws_expectation_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DLT-style CONSTRAINT ... EXPECT metrics (N4:102-105 semantics,
    N3:138-151 event-log schema): per-constraint passed/failed counts in a
    single aggregate pass."""
    o = load_table(spark, sf_dir, "orders")
    return expectation_metrics(
        o,
        [
            Expectation("valid_totalprice", "o_totalprice > 0"),
            Expectation("known_status", "o_orderstatus IN ('O','F','P')"),
            Expectation("orderkey_present", "o_orderkey IS NOT NULL"),
        ],
    )


@query(
    "ws_expectation_drop",
    oracle="""
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > 0 AND o_orderstatus IN ('O','F','P')
    """,
    tags=("E2",),
)
def ws_expectation_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ON VIOLATION DROP ROW mode (N4:90-95): violating rows filtered."""
    from dataengineeringworkshop_spark.operators.expectations import apply_expectations

    o = load_table(spark, sf_dir, "orders")
    kept, _metrics = apply_expectations(
        o,
        [
            Expectation("valid_totalprice", "o_totalprice > 0", mode="drop"),
            Expectation("known_status", "o_orderstatus IN ('O','F','P')", mode="drop"),
        ],
    )
    return kept.select("o_orderkey", "o_totalprice")


@query(
    "ws_medallion_gold",
    oracle=f"""
        WITH silver_orders AS (
            SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                   strftime(o_orderdate, '%Y-%m') AS order_month
            FROM (
                SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                             ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
                FROM orders
            ) WHERE rn = 1
        ),
        silver_lines AS (
            SELECT l_orderkey, l_extendedprice * (1 - l_discount) AS net_price
            FROM lineitem WHERE l_quantity > 0
        )
        SELECT s.order_month, s.o_orderstatus,
               COUNT(DISTINCT s.o_orderkey) AS number_of_sales,
               {dsum("l.net_price", "total_sales")}
        FROM silver_lines l JOIN silver_orders s ON l.l_orderkey = s.o_orderkey
        GROUP BY s.order_month, s.o_orderstatus
    """,
    bench=True,
    tags=("pipeline", "W1", "J2", "A3"),
)
def ws_medallion_gold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full medallion composition in one plan (bronze scan → silver
    dedup+clean → gold join-agg), the `gold_country_sales` shape
    (N2:560-568) on testdata.  Each layer is a plain DataFrame — Catalyst
    fuses the whole DAG into one optimized plan."""
    from dataengineeringworkshop_spark.operators.dedup import dedup_latest

    orders = load_table(spark, sf_dir, "orders")
    lines = load_table(spark, sf_dir, "lineitem")

    silver_orders = dedup_latest(
        orders,
        keys=["o_orderkey"],
        order_by=[F.col("o_orderdate").desc(), F.col("o_orderkey").desc()],
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
    )
    # pre-aggregate net price per ORDER before the join (guide §2.3):
    # the join then matches |orders| rows instead of |lineitem| rows,
    # and COUNT(DISTINCT o_orderkey) collapses to COUNT(*) — after the
    # dedup both sides carry each orderkey at most once.  The decimal
    # sums re-associate exactly, so total_sales is bit-identical.
    line_agg = (
        lines.filter(F.col("l_quantity") > 0)
        .select(
            "l_orderkey",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        )
        .groupBy("l_orderkey")
        .agg(F.expr("SUM(CAST((net_price) AS DECIMAL(18,4)))").alias("__net"))
    )
    return (
        line_agg.join(silver_orders, line_agg.l_orderkey == silver_orders.o_orderkey)
        .groupBy("order_month", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("number_of_sales"),
            F.expr("CAST(SUM(__net) AS DOUBLE)").alias("total_sales"),
        )
    )


@query(
    "s3_direct_path_sql",
    oracle="SELECT r_regionkey, r_name FROM region",
    tags=("S3",),
)
def s3_direct_path_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Direct-path SQL scan — ``SELECT … FROM parquet.`/path/``` (N4:45,
    N3:130's `delta.`/path/`` idiom on our storage)."""
    return spark.sql(
        f"SELECT r_regionkey, r_name FROM parquet.`{sf_dir}/region.parquet`"
    )


@query(
    "s1_csv_roundtrip",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    tags=("S1", "S8"),
)
def s1_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + options-scan roundtrip (N1:86-93: header/delimiter/quote/
    inferSchema; DF:47-49 single-file write): nation → CSV → read back."""
    import tempfile

    from dataengineeringworkshop_spark.sources.batch import read_csv, write_single_file

    n = load_table(spark, sf_dir, "nation")
    out = tempfile.mkdtemp(prefix="dew_csv_") + "/nation_csv"
    write_single_file(n, out, fmt="csv", header=True)
    return read_csv(spark, out, header=True, infer_schema=True).select(
        "n_nationkey", "n_name", "n_regionkey"
    )


@query(
    "s2_json_roundtrip",
    oracle="SELECT s_suppkey, s_name, s_nationkey FROM supplier",
    tags=("S2", "S8"),
)
def s2_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON sink + scan roundtrip (N2:192-193, DF:64-66)."""
    import tempfile

    from dataengineeringworkshop_spark.sources.batch import read_json, write_single_file

    s = load_table(spark, sf_dir, "supplier")
    out = tempfile.mkdtemp(prefix="dew_json_") + "/supplier_json"
    write_single_file(s.select("s_suppkey", "s_name", "s_nationkey"), out, fmt="json")
    return read_json(spark, out).select("s_suppkey", "s_name", "s_nationkey")


@query(
    "ws_expectation_quarantine",
    oracle="""
        SELECT doc_id,
               concat_ws(',',
                   CASE WHEN NOT (LENGTH(text) >= 120) THEN 'min_chars' END,
                   CASE WHEN NOT (len(string_split(text, ' ')) >= 20) THEN 'min_words' END,
                   CASE WHEN NOT (lang IN ('en', 'de', 'fr')) THEN 'lang_allowed' END
               ) AS violated
        FROM documents
        WHERE NOT (LENGTH(text) >= 120)
           OR NOT (len(string_split(text, ' ')) >= 20)
           OR NOT (lang IN ('en', 'de', 'fr'))
    """,
    tags=("E1", "E2", "ext-corpus"),
)
def ws_expectation_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarantine pattern (the production alternative to ON VIOLATION
    DROP ROW, N4:90-95): violating rows are routed to a side table
    tagged with WHICH rules failed, instead of being silently dropped —
    auditable and repairable.  Returns the quarantine table for the
    documents quality rules."""
    from dataengineeringworkshop_spark.operators.expectations import (
        Expectation,
        quarantine_split,
    )
    from dataengineeringworkshop_spark.plans.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    rules = [
        Expectation("min_chars", "LENGTH(text) >= 120", mode="drop"),
        Expectation("min_words", "size(split(text, ' ')) >= 20", mode="drop"),
        Expectation("lang_allowed", "lang IN ('en', 'de', 'fr')", mode="drop"),
    ]
    _kept, quarantined = quarantine_split(d, rules)
    return quarantined.select("doc_id", "violated")
