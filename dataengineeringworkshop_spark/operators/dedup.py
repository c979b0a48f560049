"""Deduplication operators.

``dedup_latest`` is the workshop's dedup-keep-latest idiom
(`2 Medaillon architecture.py:325-349`): row_number over the business key
ordered by recency, keep rank 1.  ``dedup_exact`` is plain exact dedup by
key columns keeping a deterministic representative.

Scale posture: both are a single hash-shuffle on the dedup key — the same
cost as any groupBy.  At 100 TB a skewed key would be handled by AQE skew
handling; no driver-side state.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedup_latest(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    rank_col: str = "latest_record",
) -> DataFrame:
    """Keep the first row per ``keys`` under ``order_by`` (desc = latest).

    Caller must make ``order_by`` a total order (add a unique tiebreaker)
    for deterministic results — mirrors
    ``row_number() over (partition by SaleID order by coalesce(exported_ts,0) desc)``
    (`2 Medaillon architecture.py:327-332` + filter `=1` at :348-349).
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) == 1)
        .drop(rank_col)
    )


def dedup_exact(df: DataFrame, keys: Sequence[str], keep_by: str) -> DataFrame:
    """Exact dedup on ``keys``: keep the row with the minimal ``keep_by``.

    One shuffle on ``keys``; used by the LLM-pipeline exact-dedup operator
    where ``keys=[hash(text)]``.
    """
    w = Window.partitionBy(*keys).orderBy(F.col(keep_by).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    )
