"""JSON shredding: parse a JSON-string column and explode array elements
with position (`2 Medaillon architecture.py:383-408`, `4  Delta Live
Tables (SQL).sql:139-147`):

    from_json(sale_items, 'array<struct<…>>') → posexplode → field access.

``from_json``/``posexplode`` are JVM built-ins; the whole shred is one
narrow map stage (no shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shred_json_array(
    df: DataFrame,
    json_col: str,
    element_schema_ddl: str,
    keep: list[str],
    pos_col: str = "pos",
    item_col: str = "item",
) -> DataFrame:
    """Parse ``json_col`` as ``array<struct<element_schema_ddl>>`` and
    posexplode it, keeping ``keep`` parent columns plus (pos, item)."""
    parsed = df.withColumn("__items", F.from_json(F.col(json_col), f"array<{element_schema_ddl}>"))
    return parsed.select(
        *keep, F.posexplode("__items").alias(pos_col, item_col)
    )
