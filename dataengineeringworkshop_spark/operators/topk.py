"""Top-k-per-group (`2 Medaillon architecture.py:594-599`): rank() over a
partition ordered by the measure desc, filter rank <= k.

One shuffle on the group key; at scale this beats a global sort because
each partition ranks independently (no driver involvement, no global
ordering).  Pass a unique tiebreaker for deterministic output.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rnk",
    dense: bool = False,
) -> DataFrame:
    """rank (ties share a rank, like the reference) or dense_rank per group."""
    w = Window.partitionBy(*group_by).orderBy(*order_by)
    fn = F.dense_rank() if dense else F.rank()
    return df.withColumn(rank_col, fn.over(w)).filter(F.col(rank_col) <= k)
