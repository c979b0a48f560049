"""Streaming registry entries.

``st_windowed_event_counts`` runs a REAL Structured Streaming query
(file source → watermark → tumbling window agg → memory sink) bounded
with ``trigger(availableNow=True)``; on bounded input its result equals
the batch group-by, so it is oracle-paired like any relational query —
the strongest correctness check the driver offers for streaming.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql.types import LongType

from dataengineeringworkshop_spark.plans.registry import query
from dataengineeringworkshop_spark.plans.tables import load_table
from dataengineeringworkshop_spark.streaming.windows import windowed_agg


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File STREAM over the events table with ``ts`` normalized to
    TIMESTAMP (watermarks reject NTZ; session tz is pinned UTC so the
    instant semantics match the batch loader).

    The driver parquet stores ``ts`` as INT64 TIMESTAMP(NANOS): Spark
    ≥4.1 reads it natively as a µs-truncated ``timestamp_ntz``, older
    Sparks (under ``nanosAsLong``) as a raw nanosecond long — handle
    both, mirroring :func:`plans.tables.load_table`.
    """
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        # file stream sources require a DIRECTORY base path; glob-filter
        # down to the events table inside the sf dir
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if isinstance(raw_schema["ts"].dataType, LongType):
        return stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return stream.withColumn("ts", F.col("ts").cast("timestamp"))


@query(
    "st_windowed_event_counts",
    oracle="""
        SELECT date_trunc('hour', ts) AS window_start,
               event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY 1, 2
    """,
    tags=("ext-streaming", "ST-window"),
)
def st_windowed_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows with a 1-hour watermark over a
    parquet file STREAM of events, run to completion with availableNow.
    Bounded-input result ≡ batch group-by → DuckDB-oracle-matched."""
    stream = _events_stream(spark, sf_dir)
    out = windowed_agg(
        stream,
        ts_col="ts",
        window_duration="1 hour",
        watermark_delay="1 hour",
        group_cols=("event_type",),
        value_col="value",
    )
    name = f"st_win_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="dew_st_win_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@query(
    "st_session_window_stats",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        sess AS (
            SELECT user_id, ts,
                   SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS session_id
            FROM flagged
        )
        SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
        FROM sess GROUP BY user_id, session_id
    """,
    tags=("ext-streaming", "ext-temporal", "ST-window"),
)
def st_session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming SESSION windows (``F.session_window``, 30-min
    gap) per user, bounded availableNow run.  The oracle recomputes the
    same sessions with the batch lag/cumsum construction — two
    independent algorithms for gap sessionization.  (Boundary semantics:
    an event exactly gap seconds after the previous one merges in both
    formulations only when timestamps are microsecond-distinct — true of
    the testdata at every sf.)"""
    stream = _events_stream(spark, sf_dir)
    out = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            "n_events",
        )
    )
    name = f"st_sess_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="dew_st_sess_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@query(
    "st_stateful_user_totals",
    oracle="""
        SELECT user_id,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
               MAX(event_id) AS last_event_id
        FROM events GROUP BY user_id
    """,
    tags=("ext-streaming", "ST-state"),
)
def st_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState running per-user totals over the event
    stream (bounded run).  On bounded input each user's FINAL state row
    equals the batch per-user aggregate, and the accumulator keeps exact
    integer cents (values are 2-decimal), so the emitted total_value is
    bit-identical to the DECIMAL(18,2) batch sum however the stream is
    micro-batched — a full DuckDB hash oracle for a custom stateful
    operator.  Pytest additionally proves state survives checkpointed
    restarts (test_streaming_ext)."""
    from dataengineeringworkshop_spark.streaming.stateful import running_user_totals

    stream = _events_stream(spark, sf_dir)
    out = running_user_totals(stream)
    name = f"st_state_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="dew_st_state_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update-mode memory sink appends one row per (user, micro-batch);
    # keep each user's final row
    from pyspark.sql import Window

    t = spark.table(name)
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        t.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    )


@query(
    "st_stream_stream_join",
    oracle="""
        SELECT c.event_id AS click_id,
               p.event_id AS purchase_id,
               c.user_id AS user_id,
               CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS gap_us
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON c.user_id = p.user_id
         AND p.ts >= c.ts
         AND epoch_us(p.ts) - epoch_us(c.ts) <= 600000000
    """,
    tags=("ext-streaming", "ext-temporal", "ST-join"),
)
def st_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: click→purchase attribution within 10
    minutes, as TWO Structured Streaming sources inner-joined on user_id
    with an event-time range condition and 1-hour watermarks on both
    sides (the watermark + interval bound is what lets Spark evict join
    state — without it, both sides buffer forever).  Bounded
    availableNow run ≡ the batch range join → same DuckDB oracle as
    ``tj_range_click_purchase``.

    Scale: join state is (watermark + interval) × arrival-rate per side,
    keyed by user_id — bounded regardless of total stream length;
    RocksDB state store on a cluster."""
    def _stream():
        return _events_stream(spark, sf_dir)

    clicks = (
        _stream()
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        _stream()
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 10 MINUTES")),
        "inner",
    ).select(
        "click_id",
        "purchase_id",
        F.col("c_user").alias("user_id"),
        (
            F.unix_micros(F.col("p_ts").cast("timestamp"))
            - F.unix_micros(F.col("c_ts").cast("timestamp"))
        ).alias("gap_us"),
    )
    name = f"st_ssj_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="dew_st_ssj_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@query(
    "st_stream_stream_outer_join",
    # matched part = the inner interval join; NULL-extended clicks are
    # the ones the final watermark EVICTED from join state unmatched.
    # Eviction is µs-exact and empirically pinned (see docstring):
    # emit iff ceil((c_us + 10min)/1ms) < wm_ms, with wm_ms =
    # min(floor(max_click_us/1000), floor(max_purchase_us/1000)) - 1h.
    # Ceil via (x + 999) // 1000 (operands non-negative); an inclusive
    # or ms-floored rule would misclassify sub-ms boundary clicks —
    # tested at ±1 µs / ±1 ms around the boundary in
    # tests/test_streaming_ext.py.
    oracle="""
        WITH c AS (
            SELECT event_id, user_id, epoch_us(ts) AS t
            FROM events WHERE event_type = 'click' AND ts IS NOT NULL
        ),
        p AS (
            SELECT event_id, user_id, epoch_us(ts) AS t
            FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
        ),
        wm AS (
            SELECT LEAST((SELECT MAX(t) // 1000 FROM c),
                         (SELECT MAX(t) // 1000 FROM p)) - 3600000 AS wm_ms
        )
        SELECT c.event_id AS click_id, p.event_id AS purchase_id,
               c.user_id AS user_id,
               CAST(p.t - c.t AS BIGINT) AS gap_us
        FROM c JOIN p ON c.user_id = p.user_id
                     AND p.t >= c.t AND p.t - c.t <= 600000000
        UNION ALL
        SELECT c.event_id, CAST(NULL AS BIGINT), c.user_id,
               CAST(NULL AS BIGINT)
        FROM c, wm
        WHERE NOT EXISTS (SELECT 1 FROM p
                          WHERE p.user_id = c.user_id
                            AND p.t >= c.t AND p.t - c.t <= 600000000)
          AND (c.t + 600000999) // 1000 < wm.wm_ms
    """,
    tags=("ext-streaming", "ext-temporal", "ST-join"),
)
def st_stream_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join — click→purchase
    attribution that also EMITS the unconverted clicks (the semantics
    users get wrong: a left-outer stream join cannot emit a NULL row
    when the click arrives, only when the watermark PROVES no purchase
    can still match, i.e. at state eviction).  Same two watermarked
    sources and join condition as ``st_stream_stream_join``; the trailing
    no-data micro-batch advances the watermark to its final value and
    flushes every never-matched click whose match window closed.

    The oracle reproduces the eviction boundary exactly, calibrated by
    synthetic boundary probes (clicks planted at −1 ms/−1 µs/0/+1 µs/
    +999 µs/+1 ms around the threshold): a click is flushed iff
    ``ceil((c_us + 10 min)/1 ms) < wm_ms`` where each side's watermark
    is ``floor(max_event_us/1000) − 1 h`` and the global watermark is
    their MIN.  Clicks inside the final watermark horizon stay in state
    (correct streaming behavior — a purchase could still arrive) and
    are excluded by the same rule.

    Scale: identical state-bound story to the inner variant — join
    state is (watermark + interval) × per-side arrival rate keyed by
    user_id, evicted continuously; RocksDB-backed on a cluster.  The
    outer emission adds no state: unmatched rows flush from the same
    keyed store the join already maintains."""
    def _side(event_type: str, id_alias: str, user: str, ts: str):
        return (
            _events_stream(spark, sf_dir)
            .filter((F.col("event_type") == event_type) & F.col("ts").isNotNull())
            .select(
                F.col("event_id").alias(id_alias),
                F.col("user_id").alias(user),
                F.col("ts").alias(ts),
            )
            .withWatermark(ts, "1 hour")
        )

    clicks = _side("click", "click_id", "c_user", "c_ts")
    purchases = _side("purchase", "purchase_id", "p_user", "p_ts")
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 10 MINUTES")),
        "left_outer",
    ).select(
        "click_id",
        "purchase_id",
        F.col("c_user").alias("user_id"),
        (
            F.unix_micros(F.col("p_ts").cast("timestamp"))
            - F.unix_micros(F.col("c_ts").cast("timestamp"))
        ).alias("gap_us"),
    )
    name = f"st_ssoj_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="dew_st_ssoj_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@query(
    "st_apply_changes_latest",
    oracle="""
        SELECT user_id, event_id, event_type, value FROM (
            SELECT user_id, event_id, event_type, value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    tags=("ext-streaming", "ext-cdc", "ST-state"),
)
def st_apply_changes_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY CHANGES INTO: the event stream upserts a keyed
    latest-state-per-user table through foreachBatch + sequence-guarded
    MERGE (streaming/apply_changes.py).  Bounded availableNow run ≡ the
    batch window dedup → DuckDB-oracle-matched; out-of-order protection
    across batches is pytest-covered (test_streaming_ext)."""
    from dataengineeringworkshop_spark.streaming.apply_changes import apply_changes
    from dataengineeringworkshop_spark.tables.versioned import VersionedTable

    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .select("user_id", "event_id", "event_type", "value")
    )
    vt = VersionedTable(
        spark, tempfile.mkdtemp(prefix="dew_apc_") + "/user_state"
    )
    q = apply_changes(
        stream, vt, key="user_id", sequence_col="event_id",
        checkpoint=tempfile.mkdtemp(prefix="dew_apc_ck_"),
    )
    q.awaitTermination()
    return vt.read()


@query(
    "st_stream_dedup",
    oracle="""
        SELECT event_id, user_id, event_type, value FROM events
    """,
    tags=("ext-streaming", "ext-dedup", "ST-dedup"),
)
def st_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exactly-once dedup with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` on event_id over a stream that
    re-delivers 10% of events (the at-least-once reality of every
    ingest bus).  State holds only ids within the 1-hour watermark —
    the scale-correct form; plain ``dropDuplicates`` would pin every id
    ever seen.  Bounded availableNow run; full dedup on this input, so
    the output hash-matches the duplicate-free batch table exactly."""
    s = _events_stream(spark, sf_dir)
    redelivered = s.filter(F.col("event_id") % 10 == 0)
    deduped = (
        s.unionByName(redelivered)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id", "event_type", "value")
    )
    name = f"st_dedup_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="dew_st_dedup_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@query(
    "st_funnel_stages",
    oracle="""
        WITH v AS (
            SELECT user_id, MIN(ts) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ),
        c AS (
            SELECT e.user_id, MIN(e.ts) AS t2
            FROM events e JOIN v ON e.user_id = v.user_id
            WHERE e.event_type = 'click' AND e.ts > v.t1
            GROUP BY e.user_id
        ),
        p AS (
            SELECT e.user_id, MIN(e.ts) AS t3
            FROM events e JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND e.ts > c.t2
            GROUP BY e.user_id
        ),
        allu AS (SELECT DISTINCT user_id FROM events)
        SELECT a.user_id,
               CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
                         WHEN c.user_id IS NOT NULL THEN 2
                         WHEN v.user_id IS NOT NULL THEN 1
                         ELSE 0 END AS INT) AS stage,
               CASE WHEN p.user_id IS NOT NULL THEN 'purchase'
                    WHEN c.user_id IS NOT NULL THEN 'click'
                    WHEN v.user_id IS NOT NULL THEN 'view'
                    ELSE 'none' END AS stage_name,
               CAST(COALESCE(epoch_us(COALESCE(t3, t2, t1)), -1) AS BIGINT)
                   AS stage_ts_us
        FROM allu a
        LEFT JOIN v ON a.user_id = v.user_id
        LEFT JOIN c ON a.user_id = c.user_id
        LEFT JOIN p ON a.user_id = p.user_id
    """,
    tags=("ext-streaming", "ext-analytics", "ST-state"),
)
def st_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom stateful funnel tracker (streaming/funnel.py,
    applyInPandasWithState) over the bounded event stream: each user's
    final funnel stage + the event time it was reached.  On a bounded
    single-file source the whole table is one micro-batch, and the
    operator sorts each batch by (ts, event_id), so the greedy fold
    provably equals the batch MIN-chain funnel — which is exactly what
    the DuckDB oracle computes (earliest view, earliest strictly-later
    click, earliest strictly-later purchase).  The format("memory") sink
    below is EVIDENCE-HARNESS plumbing only — bounded sf0.01 run, driver
    collects the table anyway; the operator itself
    (streaming/funnel.py) is sink-agnostic and writes update-mode rows
    to any update-capable Structured Streaming sink — for append-only
    file sinks the foreachBatch-parquet pattern applies, which
    tests/test_streaming_ext.py::test_funnel_tracker_parquet_sink runs
    end-to-end with a disk read-back.  Pytest
    separately proves stage persistence across checkpointed restarts and
    the strictly-after / wrong-order rules on multi-batch streams."""
    from dataengineeringworkshop_spark.streaming.funnel import funnel_stage_tracker

    stream = _events_stream(spark, sf_dir)
    out = funnel_stage_tracker(stream)
    name = f"st_funnel_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="dew_st_funnel_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update-mode sink appends one row per (user, micro-batch); stage is
    # monotone, so keep each user's furthest-stage (then latest-ts) row
    from pyspark.sql import Window

    t = spark.table(name)
    w = Window.partitionBy("user_id").orderBy(
        F.col("stage").desc(), F.col("stage_ts_us").desc()
    )
    return (
        t.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    )


@query(
    "st_stream_static_join",
    # bounded availableNow run of stream⋈static == the batch join
    oracle="""
        WITH dim AS (
            SELECT c_custkey AS user_id, n_name AS nation
            FROM customer JOIN nation ON c_nationkey = n_nationkey
        )
        SELECT d.nation,
               e.event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE)
                   AS total_value
        FROM events e JOIN dim d ON e.user_id = d.user_id
        GROUP BY d.nation, e.event_type
    """,
    tags=("ext-streaming", "ST-join"),
)
def st_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STATIC enrichment join — the other join every streaming
    pipeline runs (st_stream_stream_join covers stream⋈stream): the
    event stream joins a static dimension (customer→nation) that Spark
    re-reads per micro-batch and broadcasts, with NO join state kept —
    static rows are not streamed, so no watermark is needed on either
    side.  The grouped rollup runs in COMPLETE mode (the sink below is
    outputMode("complete"): each trigger re-emits the full per-group
    snapshot, so the last snapshot IS the result — no per-key
    re-aggregation of the memory table needed); the bounded availableNow
    run's final snapshot equals the batch join, which is exactly what
    the oracle asserts."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    dim = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(F.col("c_custkey").alias("user_id"), F.col("n_name").alias("nation"))
    )
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.join(F.broadcast(dim), "user_id")
        .groupBy("nation", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.expr(
                "CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)"
            ).alias("total_value"),
        )
    )
    name = f"st_static_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="dew_st_static_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # complete-mode memory sink: the last emitted snapshot is the result
    return spark.table(name)


@query(
    "st_session_eviction",
    # the batch gap-sessionizer, minus sessions still OPEN at the final
    # watermark (max event time - delay): closed-by-gap sessions are
    # every sid below the user's max; the last session closes only if
    # the watermark STRICTLY passed end + gap at MILLISECOND precision —
    # Spark arms event-time timeouts in ms (floor) and fires them only
    # when timeout_ms < watermark_ms, so the oracle floors to ms and
    # compares strictly (an inclusive µs rule would count boundary
    # sessions the stream keeps open)
    oracle="""
        WITH e AS (
            SELECT user_id, event_id, epoch_us(ts) AS t
            FROM events WHERE ts IS NOT NULL
        ),
        m AS (SELECT MAX(t) AS mx FROM e),
        f AS (
            SELECT user_id, event_id, t,
                   CASE WHEN LAG(t) OVER w IS NULL
                             OR t - LAG(t) OVER w > 21600000000
                        THEN 1 ELSE 0 END AS new_s
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
        ),
        s AS (
            SELECT user_id, t,
                   SUM(new_s) OVER (PARTITION BY user_id ORDER BY t, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
            FROM f
        ),
        sess AS (
            SELECT user_id, sid, MIN(t) AS start_us, MAX(t) AS end_us,
                   COUNT(*) AS n
            FROM s GROUP BY user_id, sid
        ),
        last AS (SELECT user_id, MAX(sid) AS max_sid FROM sess GROUP BY user_id)
        SELECT se.user_id,
               CAST(se.start_us AS BIGINT) AS start_us,
               CAST(se.end_us AS BIGINT) AS end_us,
               CAST(se.n AS BIGINT) AS n_events
        FROM sess se JOIN last l ON se.user_id = l.user_id, m
        WHERE se.sid < l.max_sid
           OR (se.end_us + 21600000000) // 1000 < (m.mx // 1000) - 86400000
    """,
    tags=("ext-streaming", "ST-state"),
)
def st_session_eviction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EventTimeTimeout sessionizer (streaming/sessions.py) over the
    bounded event stream: every session CLOSED by the run — by an
    over-gap arrival inside the data batch, or by the watermark passing
    ``end + gap`` in the trailing no-data micro-batch, which fires the
    timeout callback and EVICTS the state (sf0.01: 5580 of 5725
    sessions close; the ~1-per-user tail within the 24 h watermark
    horizon stays open in state, exactly what the oracle's last-session
    rule excludes).  Gap 6 h, watermark delay 24 h.  On the single-file
    source the data batch folds each user in (ts, event_id) order, so
    emitted intervals provably equal the batch gap-sessionizer's
    (operators/temporal.py:sessionize — the oracle replays it as a LAG
    window + cumulative-sum fold).  The format("memory") sink is
    evidence-harness plumbing; the operator is sink-agnostic
    (append-mode rows) and its multi-batch / restart / eviction
    behavior is pinned in tests/test_streaming_ext.py."""
    from dataengineeringworkshop_spark.streaming.sessions import session_tracker

    stream = (
        _events_stream(spark, sf_dir)
        .filter(F.col("ts").isNotNull())
        .select("user_id", "event_id", "ts")
    )
    out = session_tracker(stream, gap_seconds=21600, watermark_delay="24 hours")
    name = f"st_sess_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="dew_st_sess_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
