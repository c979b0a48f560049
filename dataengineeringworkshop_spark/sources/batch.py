"""Declarative batch sources and sinks (SURVEY.md §2.1 S1-S3, S5, S8).

Thin wrappers over DataFrameReader/Writer with the reference's option
surface made explicit:

- CSV with header/delimiter/quote/inferSchema (`1 Data ingestion.py:86-93`,
  `2 Medaillon architecture.py:116-120, 155-159`)
- JSON scan (`2 Medaillon architecture.py:192-193`)
- single-file sink via coalesce(1) (`Utils/Define-Functions.py:47-49, 64-66`)
  — partition-count control, only sane for small dim/exports; large tables
  keep their natural partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from dataengineeringworkshop_spark.session import ensure_session_defaults


def read_csv(
    spark: SparkSession,
    path: str,
    header: bool = True,
    delimiter: str = ",",
    quote: str = '"',
    infer_schema: bool = True,
    schema: StructType | str | None = None,
) -> DataFrame:
    ensure_session_defaults(spark)
    reader = (
        spark.read.option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("quote", quote)
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", str(infer_schema).lower())
    return reader.csv(path)


def read_json(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    ensure_session_defaults(spark)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    ensure_session_defaults(spark)
    return spark.read.parquet(path)


def write_single_file(
    df: DataFrame, path: str, fmt: str = "json", mode: str = "overwrite", header: bool = True
) -> None:
    """``df.coalesce(1).write`` — the reference's single-output-file sink."""
    writer = df.coalesce(1).write.mode(mode)
    if fmt == "csv":
        writer = writer.option("header", str(header).lower())
    getattr(writer, fmt)(path)
