"""Event-time windowed streaming aggregation with watermarks.

The reference's streaming surface has no event-time windows (SURVEY.md
§2.11: autoloader ingestion only); these are the north-star streaming
extensions a telemetry/training pipeline needs:

- ``windowed_agg``: tumbling-window counts/sums over an event-time column
  with a late-data watermark — the canonical Structured Streaming stateful
  aggregation.  State per (window, key) lives in the state store; the
  watermark bounds it (windows older than watermark are finalized and
  evicted — without it, 100 TB of history would pin unbounded state).
- ``run_windowed_once``: bounded, deterministic execution
  (``trigger(availableNow=True)`` + memory sink) for tests/oracles.

At scale: the shuffle key is (window, group key) — time-uniform, so no
skew; state store is RocksDB-backed on a real cluster
(``spark.sql.streaming.stateStore.providerClass``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_agg(
    stream: DataFrame,
    ts_col: str,
    window_duration: str = "1 hour",
    watermark_delay: str = "1 hour",
    group_cols: tuple[str, ...] = (),
    value_col: str | None = None,
) -> DataFrame:
    """Tumbling-window count (+ exact-decimal value sum) per group."""
    aggs = [F.count("*").alias("n_events")]
    if value_col is not None:
        aggs.append(
            F.expr(
                f"CAST(SUM(CAST({value_col} AS DECIMAL(18,4))) AS DOUBLE)"
            ).alias("total_value")
        )
    return (
        stream.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(ts_col, window_duration).alias("win"), *group_cols)
        .agg(*aggs)
        .select(
            F.col("win.start").alias("window_start"),
            *group_cols,
            *[F.col(a) for a in (["n_events"] + (["total_value"] if value_col else []))],
        )
    )


def run_windowed_once(
    spark: SparkSession,
    source_dir: str,
    schema,
    windowed: "callable",
    checkpoint: str,
    query_name: str,
    fmt: str = "json",
    output_mode: str = "complete",
) -> DataFrame:
    """Run a windowed aggregation over a file stream to completion
    (availableNow) and return the result table (memory sink)."""
    reader = spark.readStream.schema(schema)
    stream = getattr(reader, fmt)(source_dir)
    out = windowed(stream)
    q = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
