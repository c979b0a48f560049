"""Data-quality expectations (DLT parity — SURVEY.md §2.13, reference
`4  Delta Live Tables (SQL).sql:86-123`).

Modes (N4:86-95):
- ``warn`` (plain EXPECT): violating rows kept; metrics recorded.
- ``drop`` (ON VIOLATION DROP ROW): violating rows filtered out; counted.
- ``fail`` (ON VIOLATION FAIL UPDATE): any violation raises.

Metrics are computed with ``df.observe`` (aggregates piggyback on the
action that materializes the DataFrame — zero extra scans) when attached
to a write, or with a single agg pass in ``expectation_metrics``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    name: str
    predicate: str  # SQL boolean expression over the dataset's columns
    mode: str = "warn"  # warn | drop | fail


class ExpectationFailed(Exception):
    pass


def expectation_metrics(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """One row per expectation: (constraint_name, passed_records,
    failed_records) — the event-log schema of `3 Delta Live Tables
    Setup.py:138-151`.  Single aggregate pass over ``df``."""
    aggs = []
    for e in expectations:
        aggs.append(
            F.sum(F.when(F.expr(e.predicate), 1).otherwise(0)).cast("long").alias(f"__p_{e.name}")
        )
        aggs.append(
            F.sum(F.when(F.expr(e.predicate), 0).otherwise(1)).cast("long").alias(f"__f_{e.name}")
        )
    row = df.agg(*aggs)
    metrics = None
    for e in expectations:
        one = row.select(
            F.lit(e.name).alias("constraint_name"),
            F.col(f"__p_{e.name}").alias("passed_records"),
            F.col(f"__f_{e.name}").alias("failed_records"),
        )
        metrics = one if metrics is None else metrics.unionAll(one)
    return metrics


def apply_expectations(
    df: DataFrame, expectations: list[Expectation]
) -> tuple[DataFrame, DataFrame]:
    """Return (dataset, metrics).  ``drop`` expectations filter the dataset;
    ``fail`` expectations raise if any row violates; ``warn`` only record."""
    metrics = expectation_metrics(df, expectations)
    for e in expectations:
        if e.mode == "fail":
            failed = metrics.filter(
                (F.col("constraint_name") == e.name) & (F.col("failed_records") > 0)
            ).count()
            if failed:
                raise ExpectationFailed(f"expectation {e.name!r} violated")
    out = df
    for e in expectations:
        if e.mode == "drop":
            out = out.filter(F.expr(e.predicate))
    return out, metrics
