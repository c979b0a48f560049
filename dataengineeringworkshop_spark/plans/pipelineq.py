"""Registry entry exercising the declarative pipeline runner (§4.3) inside
the driver's correctness gate: a bronze→silver→gold DAG over testdata
orders/lineitem, materialized through VersionedTables by Pipeline.run, with
the gold output oracle-checked against the equivalent relational SQL."""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession

from dataengineeringworkshop_spark.operators.expectations import Expectation
from dataengineeringworkshop_spark.pipeline.runner import Pipeline
from dataengineeringworkshop_spark.plans.registry import dsum, query
from dataengineeringworkshop_spark.plans.tables import load_table


@query(
    "pl_dag_gold",
    oracle=f"""
        WITH silver_orders AS (
            SELECT o_orderkey, o_orderstatus, strftime(o_orderdate, '%Y-%m') AS order_month
            FROM orders WHERE o_totalprice > 0
        ),
        silver_lines AS (
            SELECT l_orderkey, l_extendedprice * (1 - l_discount) AS net_price
            FROM lineitem WHERE l_quantity > 0
        )
        SELECT s.order_month, s.o_orderstatus,
               COUNT(*) AS n_lines, {dsum("l.net_price", "revenue")}
        FROM silver_lines l JOIN silver_orders s ON l.l_orderkey = s.o_orderkey
        GROUP BY s.order_month, s.o_orderstatus
    """,
    tags=("pipeline", "E1", "E2"),
)
def pl_dag_gold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative DAG: bronze views → silver tables (expectation-dropped)
    → gold aggregate, run by Pipeline.run with event-log + VersionedTable
    materialization; returns the gold table."""
    p = Pipeline("t2dag", tempfile.mkdtemp(prefix="dew_pl_"))
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("__pl_t2dag_src_orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("__pl_t2dag_src_lineitem")
    p.view("src_orders", "SELECT * FROM __pl_t2dag_src_orders")
    p.view("src_lineitem", "SELECT * FROM __pl_t2dag_src_lineitem")
    # the price filter is an ON VIOLATION DROP ROW expectation, not a WHERE
    p.table(
        "silver_orders",
        """
        SELECT o_orderkey, o_orderstatus, o_totalprice,
               date_format(o_orderdate, 'yyyy-MM') AS order_month
        FROM live.src_orders
        """,
        expectations=[Expectation("positive_price", "o_totalprice > 0", mode="drop")],
    )
    p.table(
        "silver_lines",
        """
        SELECT l_orderkey, l_extendedprice * (1 - l_discount) AS net_price, l_quantity
        FROM live.src_lineitem
        """,
        expectations=[Expectation("positive_qty", "l_quantity > 0", mode="drop")],
    )
    p.table(
        "gold_month_status",
        f"""
        SELECT s.order_month, s.o_orderstatus,
               COUNT(*) AS n_lines, {dsum("l.net_price", "revenue")}
        FROM live.silver_lines l JOIN live.silver_orders s ON l.l_orderkey = s.o_orderkey
        GROUP BY s.order_month, s.o_orderstatus
        """,
    )
    p.run(spark)
    return p.read_dataset(spark, "gold_month_status").select(
        "order_month", "o_orderstatus", "n_lines", "revenue"
    )
