"""Row-hash change detection (`2 Medaillon architecture.py:353, 411`):
``sha2(concat_ws('||', *cols), 256)``.

Used as the MERGE no-op-update guard (`… :537` — `target.row_hash <>
source.row_hash`).  concat_ws semantics: NULLs are skipped (not turned into
empty strings between separators) — identical in Spark and DuckDB.

All JVM-side built-ins — whole-stage-codegen'd, no Python in the loop.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_row_hash(
    df: DataFrame, cols: Sequence[str] | None = None, hash_col: str = "row_hash"
) -> DataFrame:
    """Append a sha256 hex row hash over ``cols`` (default: all columns, in
    schema order — the reference's ``concat_ws('||', *)`` star-expansion)."""
    use = list(cols) if cols is not None else list(df.columns)
    return df.withColumn(
        hash_col, F.sha2(F.concat_ws("||", *[F.col(c).cast("string") for c in use]), 256)
    )
