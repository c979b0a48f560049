"""Bucketed tables — shuffle-free co-located joins.

The 100 TB answer to "the fact⋈fact join shuffles both sides every
query": write both tables bucketed (and sorted) by the join key once,
and every subsequent equi join on that key is planned as a sort-merge
join with NO Exchange on either side — the shuffle is paid once at
write time, amortized over every downstream query.  (The OSS analogue
of the reference's OPTIMIZE/ZORDER layout story, for join locality
instead of point-lookup skipping: `2 Medaillon architecture.py:449-458`.)

Requirements Spark enforces for the exchange-free plan: both sides
bucketed by the join key with the same bucket count, read via the
catalog (``spark.table``), and ``spark.sql.sources.bucketing.enabled``
(default true).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (+ optionally sorted) catalog table.

    ``n_buckets`` should be sized so one bucket of the LARGER table fits
    an executor core's working memory at target scale (e.g. 100 TB /
    4096 buckets ≈ 25 GB per bucket pre-compression — split further or
    combine with date partitioning in practice).

    ``path`` makes the table EXTERNAL at that location — use it when the
    session catalog is in-memory but the default warehouse directory
    persists across processes (a stale managed-table dir from a previous
    run otherwise fails saveAsTable with LOCATION_ALREADY_EXISTS)."""
    w = (
        df.write.mode("overwrite")
        .format(fmt)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
