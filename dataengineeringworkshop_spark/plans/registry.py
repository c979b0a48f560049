"""Central registry of named queries + DuckDB oracle SQL.

Every implemented operator from SURVEY.md §2 (and the LLM-pipeline
extensions) registers here; ``__spark_entry__`` simply re-exports the
registry, and tests/bench iterate it.

Determinism contract (so the driver's order-insensitive value hash matches):

- **Float aggregation**: never hash a raw double SUM/AVG — accumulation
  order differs between engines.  Use :func:`dsum` /  :func:`davg`, which
  accumulate exactly in DECIMAL and cast the exact result back to double.
  The same SQL fragment is valid in Spark SQL and DuckDB.
- **Ranking/limits**: always order with a unique tiebreaker column before
  row_number()/LIMIT.
- **Column names**: alias every computed column identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None  # DuckDB SQL; None -> rows-only check
    bench: bool = False  # include in bench.py headline timing
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None = None,
    bench: bool = False,
    tags: tuple[str, ...] = (),
):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=oracle,
            bench=bench,
            tags=tags,
            doc=(fn.__doc__ or "").strip(),
        )
        return fn

    return deco


def dsum(expr: str, alias: str, scale: int = 4) -> str:
    """Deterministic double SUM — identical fragment for Spark SQL & DuckDB.

    Each input double is rounded to a DECIMAL(18, scale) (same nearest-value
    in both engines), summed exactly in decimal (order-independent), and the
    exact decimal result is cast to the (unique) nearest double.
    """
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(18,{scale}))) AS DOUBLE) AS {alias}"


def davg(expr: str, alias: str, scale: int = 4) -> str:
    """Deterministic double AVG: exact decimal sum / count, then to double."""
    return (
        f"CAST(CAST(SUM(CAST(({expr}) AS DECIMAL(18,{scale}))) AS DOUBLE)"
        f" / COUNT({expr}) AS DOUBLE) AS {alias}"
    )


def load_all() -> dict[str, QuerySpec]:
    """Import every plan module (side effect: fills REGISTRY) and return it."""
    import dataengineeringworkshop_spark.plans.relational  # noqa: F401
    import dataengineeringworkshop_spark.plans.eventsq  # noqa: F401
    import dataengineeringworkshop_spark.plans.textops  # noqa: F401
    import dataengineeringworkshop_spark.plans.simops  # noqa: F401
    import dataengineeringworkshop_spark.plans.workshop  # noqa: F401
    import dataengineeringworkshop_spark.plans.deltaops  # noqa: F401
    import dataengineeringworkshop_spark.plans.pipelineq  # noqa: F401
    import dataengineeringworkshop_spark.plans.llmq  # noqa: F401
    import dataengineeringworkshop_spark.plans.temporalq  # noqa: F401
    import dataengineeringworkshop_spark.plans.streamq  # noqa: F401
    import dataengineeringworkshop_spark.plans.corpusq  # noqa: F401
    import dataengineeringworkshop_spark.plans.extraq  # noqa: F401
    import dataengineeringworkshop_spark.plans.searchq  # noqa: F401

    return REGISTRY
