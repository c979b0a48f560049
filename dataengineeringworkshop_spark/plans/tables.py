"""Testdata table loaders (TESTDATA.md tables).

All loads are plain parquet scans — Catalyst pushes filters/column pruning
into the scan, so callers should select/filter on the returned DataFrame
rather than materializing it.

``events`` needs special handling: the driver-generated parquet stores
``ts`` as INT64 TIMESTAMP(NANOS).  Spark ≥4.1 reads that natively as a
µs-truncated ``timestamp_ntz`` (verified identical to DuckDB's ns→µs
truncation); older Sparks reject it unless
``spark.sql.legacy.parquet.nanosAsLong=true`` hands us a raw nanosecond
long, which we truncate to µs ourselves.  ``load_table`` inspects the
type it actually got so both paths expose the same ``timestamp_ntz``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

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
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # legacy nanosAsLong path (Spark <4.1): raw nanos long -> µs
        # (truncating, like DuckDB) -> naive timestamp
        df = df.withColumn(
            "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
        )
    return df


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register ``dew_<name>`` temp views for use from spark.sql queries."""
    for name in names or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(f"{VIEW_PREFIX}{name}")
