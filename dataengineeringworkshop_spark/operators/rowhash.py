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
    schema order — the reference's ``concat_ws('||', *)`` star-expansion).

    CAVEAT (reference-parity, kept verbatim for the MERGE no-op guard):
    concat_ws drops NULLs and does not escape the separator, so distinct
    rows can collide — ('p', NULL) vs (NULL, 'p') both concat to 'p', and
    ('a||b', 'c') vs ('a', 'b||c') concat identically.  Anywhere the hash
    DECIDES semantics (diff classification, SCD2 change detection) use
    :func:`with_struct_hash` instead."""
    use = list(cols) if cols is not None else list(df.columns)
    return df.withColumn(
        hash_col, F.sha2(F.concat_ws("||", *[F.col(c).cast("string") for c in use]), 256)
    )


def with_struct_hash(
    df: DataFrame, cols: Sequence[str] | None = None, hash_col: str = "row_hash"
) -> DataFrame:
    """Append a COLLISION-UNAMBIGUOUS sha256 row hash: sha2 over
    ``to_json(struct(*cols))``.  JSON quotes/escapes every value and
    tags it with its field name, so NULL-shifted rows (('p', NULL) vs
    (NULL, 'p')) and separator-straddling rows (('a||b','c') vs
    ('a','b||c')) hash differently — the failure modes concat_ws has.
    NULL fields are emitted explicitly (ignoreNullFields=false) so
    presence-of-NULL is part of the encoding.  Still all JVM built-ins,
    whole-stage-codegen'd."""
    use = list(cols) if cols is not None else list(df.columns)
    return df.withColumn(
        hash_col,
        F.sha2(
            F.to_json(
                F.struct(*[F.col(c).cast("string").alias(c) for c in use]),
                {"ignoreNullFields": "false"},
            ),
            256,
        ),
    )
