"""Batch sources/sinks (SURVEY.md §2.1)."""

from dataengineeringworkshop_spark.sources.batch import (
    read_csv,
    read_json,
    read_parquet,
    write_single_file,
)

__all__ = ["read_csv", "read_json", "read_parquet", "write_single_file"]
