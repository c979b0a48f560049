"""APPLY CHANGES INTO parity: streaming CDC upsert via foreachBatch.

DLT's ``APPLY CHANGES INTO`` (the reference stops at plain streaming
appends, `2 Medaillon architecture.py:270-274`; this is the upsert
counterpart DLT users reach for next) maintains a keyed table from a
change stream: per micro-batch, keep the latest row per key by a
sequence column, then MERGE into the target with an out-of-order guard
so a late-arriving older change can never overwrite a newer state.

This is the canonical production pattern — incremental source →
``foreachBatch`` → keyed MERGE — and it composes three things this
engine already has: the checkpointed file stream (exactly-once batches),
the window dedup-keep-latest idiom (W1), and VersionedTable.merge (D4).

Scale: each micro-batch shuffles only the BATCH on the key (dedup +
merge probe); the target-side join is the same merge plan as batch D4.
State is the checkpoint's file log only — no stream state store, because
the sequence guard makes the merge idempotent and order-tolerant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from dataengineeringworkshop_spark.tables.versioned import VersionedTable


def apply_changes(
    stream_df: DataFrame,
    target: VersionedTable,
    key: str,
    sequence_col: str,
    checkpoint: str,
) -> StreamingQuery:
    """Run a bounded (availableNow) APPLY CHANGES INTO ``target``.

    Per micro-batch: window-dedup to the latest row per ``key`` by
    ``sequence_col``, then MERGE keyed on ``key`` with the guard
    ``s.seq >= t.seq`` (stale rows are no-ops).  Returns the started
    StreamingQuery; callers ``awaitTermination()``."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    def upsert(batch_df: DataFrame, _batch_id: int) -> None:
        w = Window.partitionBy(key).orderBy(F.col(sequence_col).desc())
        latest = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        if target.exists():
            target.merge(
                latest,
                on=f"t.{key} = s.{key}",
                update_condition=f"s.{sequence_col} >= t.{sequence_col}",
            )
        else:
            target.write(latest)

    return (
        stream_df.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
