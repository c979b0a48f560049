"""Testdata table loaders (TESTDATA.md tables).

All loads are plain parquet scans — Catalyst pushes filters/column pruning
into the scan, so callers should select/filter on the returned DataFrame
rather than materializing it.

``events`` needs special handling: the driver-generated parquet stores
``ts`` as INT64 TIMESTAMP(NANOS), which Spark's parquet reader rejects
outright.  With ``spark.sql.legacy.parquet.nanosAsLong=true`` the column
arrives as a raw nanosecond long; we truncate to microseconds with integer
division (matching DuckDB's ns→µs truncation exactly) and expose a
``timestamp_ntz`` — the same type the other testdata timestamps read as.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataengineeringworkshop_spark.session import ensure_session_defaults

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: temp-view prefix — avoids colliding with anything else living in the
#: driver's session catalog.
VIEW_PREFIX = "dew_"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_session_defaults(spark)
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    if name == "events":
        # raw nanos long -> µs (truncating, like DuckDB) -> naive timestamp
        df = df.withColumn(
            "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
        )
    return df


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register ``dew_<name>`` temp views for use from spark.sql queries."""
    for name in names or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(f"{VIEW_PREFIX}{name}")
