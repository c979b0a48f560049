"""Eager materialization of a reused intermediate DataFrame.

``materialize(df)`` writes the frame to a session-scoped temp parquet dir
and reads it back.  Compared to ``.persist()``:

- no executor-memory pinning (repeated callers — a bench loop, a long
  pipeline — would otherwise accumulate pinned caches until GC pressure
  slows every later stage);
- the data is computed exactly ONCE even if the result feeds N branches
  (Spark recomputes unpersisted branches, and inlines SQL CTEs);
- it is precisely the "checkpointed intermediate table" a 100 TB pipeline
  would use between expensive stages (a shingle inverted index, a
  candidate set), with full pushdown/pruning on the re-read.

The temp dirs live under the JVM's temp root and are removed on process
exit (best-effort) — callers don't manage lifecycles.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame

_TMP_DIRS: list[str] = []

#: derived-artifact cache: cache_key -> materialized parquet path.  A
#: production pipeline MAINTAINS its derived indexes (shingle inverted
#: index, ANN coarse quantizer) as tables rather than rebuilding them per
#: query; this is the in-process equivalent.  Keys must encode every
#: input that determines the artifact (source path + parameters).
_CACHE: dict[str, str] = {}


def _cleanup() -> None:
    for d in _TMP_DIRS:
        shutil.rmtree(d, ignore_errors=True)


atexit.register(_cleanup)


def materialize(
    df: DataFrame,
    label: str = "intermediate",
    cache_key: str | None = None,
    partition_by: tuple[str, ...] | None = None,
) -> DataFrame:
    """Write ``df`` to temp parquet and return a fresh scan of it.

    With ``cache_key``, later calls under the same key skip the rebuild
    and re-scan the existing artifact (index-maintenance semantics — the
    key must capture source identity + build parameters).

    With ``partition_by``, the artifact is written hive-partitioned on
    those columns — subsequent filters on them become PartitionFilters
    (directory pruning: non-matching partitions are never listed, let
    alone scanned), the layout move that makes a date-keyed 100 TB table
    queryable."""
    if cache_key is not None and cache_key in _CACHE:
        return df.sparkSession.read.parquet(_CACHE[cache_key])
    path = tempfile.mkdtemp(prefix=f"dew_mat_{label}_")
    _TMP_DIRS.append(path)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    if cache_key is not None:
        _CACHE[cache_key] = path
    return df.sparkSession.read.parquet(path)
