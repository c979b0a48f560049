"""Streaming extensions: event-time windows + watermark late-data
semantics, and applyInPandasWithState state persistence across
checkpointed restarts."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("value", DoubleType()),
    ]
)


def _write_jsonl(path, rows):
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run_stream(spark, src, chk, build, name, mode):
    """One bounded run -> memory sink (no checkpoint recovery support —
    single-run tests only)."""
    stream = spark.readStream.schema(EVENT_SCHEMA).json(str(src))
    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", str(chk))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def _run_stream_resumable(spark, src, chk, build, mode, sink):
    """Bounded run through a RESUMABLE sink (foreachBatch collecting into
    ``sink``) so a second run recovers from the same checkpoint."""
    stream = spark.readStream.schema(EVENT_SCHEMA).json(str(src))

    def collect_batch(batch_df, batch_id):
        sink.extend(batch_df.collect())

    q = (
        build(stream)
        .writeStream.foreachBatch(collect_batch)
        .outputMode(mode)
        .option("checkpointLocation", str(chk))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sink


def test_watermark_drops_late_rows_in_append_mode(spark, tmp_path):
    """Append mode emits a window only once the watermark passes its end;
    rows later than the watermark are dropped, not re-aggregated."""
    from dataengineeringworkshop_spark.streaming.windows import windowed_agg

    src, chk = tmp_path / "src", tmp_path / "chk"

    def build(stream):
        return windowed_agg(
            stream, "ts", "10 minutes", "10 minutes", ("user_id",), "value"
        )

    # batch 1: events in windows 00:00 and 01:00; max ts 01:05
    _write_jsonl(
        src / "b1.json",
        [
            {"event_id": 1, "ts": "2024-01-01 00:01:00", "user_id": 1, "value": 1.0},
            {"event_id": 2, "ts": "2024-01-01 00:02:00", "user_id": 1, "value": 2.0},
            {"event_id": 3, "ts": "2024-01-01 01:05:00", "user_id": 1, "value": 4.0},
        ],
    )
    sink1 = _run_stream_resumable(spark, src, chk, build, "append", [])
    # watermark after b1 = 01:05 - 10min = 00:55 > 00:10 -> the 00:00
    # window is finalized and emitted; the 01:00 window is still open
    rows1 = {(r.window_start.isoformat(), r.n_events) for r in sink1}
    assert ("2024-01-01T00:00:00", 2) in rows1
    assert not any(w.startswith("2024-01-01T01:0") for w, _ in rows1)

    # batch 2: a LATE row for the finalized 00:00 window + a fresh row
    _write_jsonl(
        src / "b2.json",
        [
            {"event_id": 4, "ts": "2024-01-01 00:03:00", "user_id": 1, "value": 8.0},
            {"event_id": 5, "ts": "2024-01-01 02:00:00", "user_id": 1, "value": 16.0},
        ],
    )
    sink2 = _run_stream_resumable(spark, src, chk, build, "append", [])
    all_rows = {}
    for r in sink2:
        all_rows.setdefault(r.window_start.isoformat(), 0)
        all_rows[r.window_start.isoformat()] += r.n_events
    # the late event_id=4 must NOT create/extend the 00:00 window again
    assert all_rows.get("2024-01-01T00:00:00", 0) == 0
    # the 01:00 window (now past watermark 02:00-10min=01:50) is emitted
    assert all_rows.get("2024-01-01T01:00:00") == 1


def test_stateful_totals_survive_restart(spark, tmp_path):
    """applyInPandasWithState: the second availableNow run resumes from
    checkpointed state — totals accumulate across runs, exactly once."""
    from dataengineeringworkshop_spark.streaming.stateful import running_user_totals

    src, chk = tmp_path / "src", tmp_path / "chk"
    _write_jsonl(
        src / "b1.json",
        [
            {"event_id": 1, "ts": "2024-01-01 00:01:00", "user_id": 1, "value": 1.5},
            {"event_id": 2, "ts": "2024-01-01 00:02:00", "user_id": 1, "value": 2.25},
            {"event_id": 3, "ts": "2024-01-01 00:03:00", "user_id": 2, "value": 10.0},
        ],
    )
    sink1 = _run_stream_resumable(spark, src, chk, running_user_totals, "update", [])
    got1 = {r.user_id: (r.n_events, r.total_value, r.last_event_id) for r in sink1}
    assert got1 == {1: (2, 3.75, 2), 2: (1, 10.0, 3)}

    _write_jsonl(
        src / "b2.json",
        [
            {"event_id": 4, "ts": "2024-01-01 00:04:00", "user_id": 1, "value": 0.25},
            {"event_id": 5, "ts": "2024-01-01 00:05:00", "user_id": 3, "value": 7.0},
        ],
    )
    sink2 = _run_stream_resumable(spark, src, chk, running_user_totals, "update", [])
    got2 = {r.user_id: (r.n_events, r.total_value, r.last_event_id) for r in sink2}
    # user 1 resumes from (2, 3.75): old files are NOT re-read (exactly-once)
    assert got2 == {1: (3, 4.0, 4), 3: (1, 7.0, 5)}


def test_windowed_bounded_equals_batch(spark, tmp_path):
    """On bounded input the windowed stream (complete mode) equals the
    batch group-by — the invariant behind the oracle pairing."""
    from dataengineeringworkshop_spark.streaming.windows import windowed_agg

    src, chk = tmp_path / "src", tmp_path / "chk"
    rows = [
        {"event_id": i, "ts": f"2024-01-01 0{i % 3}:0{i % 6}:00", "user_id": i % 2, "value": float(i)}
        for i in range(12)
    ]
    _write_jsonl(src / "b1.json", rows)

    def build(stream):
        return windowed_agg(stream, "ts", "1 hour", "1 hour", ("user_id",), "value")

    streamed = _run_stream(spark, src, chk, build, "cmp_t", "complete")
    batch = (
        spark.read.schema(EVENT_SCHEMA).json(str(src))
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.expr("CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)").alias("total_value"),
        )
    )
    assert sorted(map(tuple, streamed.collect())) == sorted(map(tuple, batch.collect()))


def test_apply_changes_out_of_order_across_batches(spark, tmp_path):
    """APPLY CHANGES: batch 2 carries a newer update, a STALE (lower
    sequence) change for another key, and a brand-new key.  The stale
    row must NOT overwrite state merged from batch 1."""
    import pyspark.sql.functions as F

    from dataengineeringworkshop_spark.streaming.apply_changes import apply_changes
    from dataengineeringworkshop_spark.tables.versioned import VersionedTable

    src = tmp_path / "cdc_in"
    src.mkdir()
    ck = str(tmp_path / "ck")
    vt = VersionedTable(spark, str(tmp_path / "state"))
    schema = "k BIGINT, seq BIGINT, val STRING"

    def run():
        stream = spark.readStream.schema(schema).parquet(str(src))
        apply_changes(stream, vt, key="k", sequence_col="seq",
                      checkpoint=ck).awaitTermination()

    def drop(rows, name):
        # the file stream lists the base dir flat — stage the batch and
        # move its part-file in as a single new arrival
        import glob
        import shutil

        stage = tmp_path / f"stage_{name}"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(stage))
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        shutil.move(part, str(src / f"{name}.parquet"))

    drop([(1, 10, "a1"), (2, 10, "b1"), (3, 10, "c1")], "batch1")
    run()
    assert {r["val"] for r in vt.read().collect()} == {"a1", "b1", "c1"}

    drop(
        [(2, 20, "b2"),   # newer -> must win
         (3, 5, "stale"), # older than merged seq 10 -> must NOT win
         (4, 1, "d1")],   # new key -> insert
        "batch2",
    )
    run()
    state = {r["k"]: (r["seq"], r["val"]) for r in vt.read().collect()}
    assert state[1] == (10, "a1")
    assert state[2] == (20, "b2")
    assert state[3] == (10, "c1"), "stale out-of-order change overwrote newer state"
    assert state[4] == (1, "d1")


FUNNEL_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
    ]
)


def _run_funnel_stream(spark, src, chk, sink):
    from dataengineeringworkshop_spark.streaming.funnel import funnel_stage_tracker

    stream = spark.readStream.schema(FUNNEL_SCHEMA).json(str(src))

    def collect_batch(batch_df, batch_id):
        sink.extend(batch_df.collect())

    q = (
        funnel_stage_tracker(stream)
        .writeStream.foreachBatch(collect_batch)
        .outputMode("update")
        .option("checkpointLocation", str(chk))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sink


def _batch_funnel_stage(events):
    """Independent reference: the batch MIN-chain funnel semantics
    (earliest view, earliest click strictly after it, earliest purchase
    strictly after that) per user."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for e in events:
        by_user[e["user_id"]].append(e)
    stages = {}
    for uid, evs in by_user.items():
        views = sorted(e["ts"] for e in evs if e["event_type"] == "view")
        stage, t = 0, None
        if views:
            stage, t = 1, views[0]
            clicks = sorted(
                e["ts"] for e in evs if e["event_type"] == "click" and e["ts"] > t
            )
            if clicks:
                stage, t = 2, clicks[0]
                purchases = sorted(
                    e["ts"] for e in evs if e["event_type"] == "purchase" and e["ts"] > t
                )
                if purchases:
                    stage, t = 3, purchases[0]
        stages[uid] = stage
    return stages


def test_funnel_tracker_progresses_across_restarts(spark, tmp_path):
    """The stage survives checkpointed restarts and only advances on a
    strictly-later next-stage event."""
    src, chk = tmp_path / "src", tmp_path / "chk"
    _write_jsonl(
        src / "b1.json",
        [
            {"event_id": 1, "ts": "2024-01-01 00:01:00", "user_id": 1, "event_type": "view"},
            # same-timestamp click must NOT advance (strictly-after rule)
            {"event_id": 2, "ts": "2024-01-01 00:01:00", "user_id": 1, "event_type": "click"},
            # purchase before any click must be ignored for user 2
            {"event_id": 3, "ts": "2024-01-01 00:01:00", "user_id": 2, "event_type": "purchase"},
        ],
    )
    sink1 = _run_funnel_stream(spark, src, chk, [])
    got1 = {r.user_id: (r.stage, r.stage_name) for r in sink1}
    assert got1 == {1: (1, "view"), 2: (0, "none")}

    _write_jsonl(
        src / "b2.json",
        [
            {"event_id": 4, "ts": "2024-01-01 00:02:00", "user_id": 1, "event_type": "click"},
            {"event_id": 5, "ts": "2024-01-01 00:03:00", "user_id": 1, "event_type": "purchase"},
            {"event_id": 6, "ts": "2024-01-01 00:02:00", "user_id": 2, "event_type": "view"},
        ],
    )
    sink2 = _run_funnel_stream(spark, src, chk, [])
    got2 = {r.user_id: (r.stage, r.stage_name) for r in sink2}
    # user 1 resumed from stage 1 (view) and advanced click -> purchase;
    # user 2 entered the funnel at view (the earlier purchase stays ignored)
    assert got2 == {1: (3, "purchase"), 2: (1, "view")}


def test_funnel_tracker_parquet_sink(spark, tmp_path):
    """The tracker is sink-agnostic: the registry query's
    format("memory") sink is evidence-harness plumbing only.  Run the
    same operator into a real on-disk sink — update-mode stateful output
    can't feed an append-only file sink directly (Spark rejects it), so
    the production pattern is foreachBatch appending each micro-batch's
    emitted rows as parquet — and read the result back from disk."""
    from dataengineeringworkshop_spark.streaming.funnel import funnel_stage_tracker

    src, chk, out = tmp_path / "src", tmp_path / "chk", str(tmp_path / "out")
    _write_jsonl(
        src / "b1.json",
        [
            {"event_id": 1, "ts": "2024-01-01 00:01:00", "user_id": 1, "event_type": "view"},
            {"event_id": 2, "ts": "2024-01-01 00:02:00", "user_id": 1, "event_type": "click"},
            {"event_id": 3, "ts": "2024-01-01 00:01:00", "user_id": 2, "event_type": "view"},
        ],
    )
    stream = spark.readStream.schema(FUNNEL_SCHEMA).json(str(src))

    def to_parquet(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out)

    q = (
        funnel_stage_tracker(stream)
        .writeStream.foreachBatch(to_parquet)
        .outputMode("update")
        .option("checkpointLocation", str(chk))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    back = spark.read.parquet(out)
    got = {r.user_id: (r.stage, r.stage_name) for r in back.collect()}
    assert got == {1: (2, "click"), 2: (1, "view")}


def test_funnel_tracker_matches_batch_min_chain(spark, tmp_path):
    """Single ordered batch: the greedy stateful fold must equal the
    batch MIN-chain funnel (the e_funnel_conversion semantics) on a
    generated many-user event set."""
    import random

    rng = random.Random(42)
    types = ["view", "click", "purchase", "error", "signup"]
    events = []
    for eid in range(400):
        events.append(
            {
                "event_id": eid,
                "ts": f"2024-01-01 {rng.randrange(24):02d}:{rng.randrange(60):02d}:00",
                "user_id": rng.randrange(40),
                "event_type": rng.choice(types),
            }
        )
    # one batch, event-time ordered (the operator's ordering contract)
    events.sort(key=lambda e: (e["ts"], e["event_id"]))
    src, chk = tmp_path / "src", tmp_path / "chk"
    _write_jsonl(src / "b1.json", events)
    sink = _run_funnel_stream(spark, src, chk, [])
    got = {r.user_id: r.stage for r in sink}
    assert got == _batch_funnel_stage(events)


ROLLZ_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("value", DoubleType()),
    ]
)


def _rollz_events(n_users=6, per_user=60, seed=11):
    import random

    rng = random.Random(seed)
    events, eid = [], 0
    for u in range(n_users):
        base = rng.uniform(20, 80)
        for i in range(per_user):
            if rng.random() < 0.07:
                v = None  # null reading occupies a frame slot
            elif rng.random() < 0.06:
                v = round(base + rng.uniform(40, 90), 2)  # planted spike
            else:
                v = round(base + rng.uniform(-3, 3), 2)
            events.append(
                {
                    "event_id": eid,
                    "ts": f"2024-01-01 {i // 60:02d}:{i % 60:02d}:00",
                    "user_id": u,
                    "value": v,
                }
            )
            eid += 1
    return events


def _batch_rollz(spark, df):
    df.createOrReplaceTempView("rollz_batch")
    return {
        (r.user_id, r.event_id): r.z
        for r in spark.sql(
            """
            WITH w AS (
                SELECT user_id, event_id, value,
                       COUNT(value) OVER f AS n,
                       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER f AS DOUBLE) AS s,
                       CAST(SUM(CAST(value AS DECIMAL(18,2))
                                * CAST(value AS DECIMAL(18,2))) OVER f AS DOUBLE) AS ss
                FROM rollz_batch
                WINDOW f AS (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
            )
            SELECT user_id, event_id,
                   (value - s / n) / sqrt((ss - s * s / n) / (n - 1)) AS z
            FROM w
            WHERE n >= 8
              AND (ss - s * s / n) / (n - 1) > 0.0001
              AND ABS((value - s / n) / sqrt((ss - s * s / n) / (n - 1))) > 2.5
            """
        ).collect()
    }


@pytest.mark.parametrize("arrow_max", [None, 4])
def test_rolling_zscore_stream_matches_batch_window(spark, tmp_path, arrow_max):
    """Single ordered batch: the stateful ring-buffer fold must flag the
    SAME readings as the batch trailing-window SQL (the
    e_rolling_zscore_anomaly semantics), z agreeing to float tolerance,
    null readings occupying frame slots on both sides.  The arrow_max=4
    variant fractures each user's micro-batch into many pandas chunks
    delivered against event-time order (the source file is written
    time-reversed), pinning the concat-before-sort contract in a real
    engine run."""
    from dataengineeringworkshop_spark.streaming.rollingz import (
        rolling_zscore_detector,
    )

    events = _rollz_events()
    src, chk = tmp_path / "src", tmp_path / "chk"
    if arrow_max is not None:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                       str(arrow_max))
        file_events = sorted(events, key=lambda e: (e["ts"], e["event_id"]),
                             reverse=True)
    else:
        file_events = events
    _write_jsonl(src / "b1.json", file_events)
    stream = spark.readStream.schema(ROLLZ_SCHEMA).json(str(src))
    sink = []

    def collect_batch(batch_df, batch_id):
        sink.extend(batch_df.collect())

    try:
        q = (
            rolling_zscore_detector(stream)
            .writeStream.foreachBatch(collect_batch)
            .outputMode("update")
            .option("checkpointLocation", str(chk))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if arrow_max is not None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
    got = {(r.user_id, r.event_id): r.z_score for r in sink}

    bdf = spark.createDataFrame(
        [(e["event_id"], e["ts"], e["user_id"], e["value"]) for e in events],
        "event_id long, ts string, user_id long, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    want = _batch_rollz(spark, bdf)
    assert set(got) == set(want), (
        set(got) ^ set(want), len(got), len(want)
    )
    assert len(got) > 0, "test data planted no anomalies"
    for k in got:
        assert abs(got[k] - want[k]) < 1e-9, (k, got[k], want[k])


def test_rolling_zscore_state_survives_restart(spark, tmp_path):
    """The ring buffer persists across checkpointed restarts: a spike in
    batch 2 is judged against baseline readings ingested in batch 1."""
    from dataengineeringworkshop_spark.streaming.rollingz import (
        rolling_zscore_detector,
    )

    src, chk = tmp_path / "src", tmp_path / "chk"
    b1 = [
        {"event_id": i, "ts": f"2024-01-01 00:{i:02d}:00", "user_id": 1,
         "value": 50.0 + (i % 3)}
        for i in range(10)
    ]
    _write_jsonl(src / "b1.json", b1)
    stream = spark.readStream.schema(ROLLZ_SCHEMA).json(str(src))
    sink1 = []

    def mk(sink):
        def collect_batch(batch_df, batch_id):
            sink.extend(batch_df.collect())
        return collect_batch

    q = (
        rolling_zscore_detector(stream)
        .writeStream.foreachBatch(mk(sink1))
        .outputMode("update")
        .option("checkpointLocation", str(chk))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert sink1 == []  # baseline only, nothing anomalous

    b2 = [{"event_id": 99, "ts": "2024-01-01 00:30:00", "user_id": 1,
           "value": 500.0}]
    _write_jsonl(src / "b2.json", b2)
    stream2 = spark.readStream.schema(ROLLZ_SCHEMA).json(str(src))
    sink2 = []
    q2 = (
        rolling_zscore_detector(stream2)
        .writeStream.foreachBatch(mk(sink2))
        .outputMode("update")
        .option("checkpointLocation", str(chk))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    assert [(r.user_id, r.event_id) for r in sink2] == [(1, 99)], (
        "spike not judged against restart-restored baseline"
    )
    assert sink2[0].z_score > 100


def _write_jsonl_ordered(src, named_batches):
    """Write files with strictly increasing mtimes — the file source
    orders batches by modification time, and the session tests need
    delivery order to match event-time order (the operator's contract);
    same-mtime files land in nondeterministic order."""
    import os
    import time

    base = time.time()
    for i, (name, rows) in enumerate(named_batches):
        p = src / name
        _write_jsonl(p, rows)
        os.utime(p, (base + 10 * i, base + 10 * i))


def _run_sessions(spark, src, chk, sink, gap_seconds=600, delay="10 minutes"):
    """Bounded session-tracker run, one micro-batch PER FILE
    (maxFilesPerTrigger=1) so the event-time watermark advances between
    files and EventTimeTimeout eviction actually fires mid-run."""
    from dataengineeringworkshop_spark.streaming.sessions import session_tracker

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )

    def collect_batch(batch_df, batch_id):
        sink.extend(batch_df.collect())

    q = (
        session_tracker(stream, gap_seconds=gap_seconds, watermark_delay=delay)
        .writeStream.foreachBatch(collect_batch)
        .outputMode("append")
        .option("checkpointLocation", str(chk))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sink


def _batch_sessions(spark, events, gap_seconds=600):
    """Oracle: the BATCH gap-sessionizer's (user, session) intervals."""
    from dataengineeringworkshop_spark.operators.temporal import sessionize

    df = spark.createDataFrame(
        [(e["event_id"], e["ts"], e["user_id"]) for e in events],
        "event_id long, ts string, user_id long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    return {
        (r.user_id, r.start_us, r.end_us, r.n_events)
        for r in sessionize(df, "user_id", "ts", gap_seconds, "event_id")
        .groupBy("user_id", "session_id")
        .agg(
            F.min(F.unix_micros("ts")).alias("start_us"),
            F.max(F.unix_micros("ts")).alias("end_us"),
            F.count("*").alias("n_events"),
        )
        .collect()
    }


def test_session_tracker_matches_batch_sessionize(spark, tmp_path):
    """Closed-session rows == the batch sessionizer's sessions, once the
    watermark has passed them.  Three users, multiple sessions each,
    split across three files; a far-future flush event drives the final
    watermark past every real session so they ALL close (the flush
    event's own session stays open in state, by design)."""
    import random

    rng = random.Random(7)
    events, eid = [], 0
    for u in range(3):
        t = 1_000 + u * 37  # seconds into 2024-01-01
        for _ in range(rng.randint(3, 5)):  # sessions
            for _ in range(rng.randint(1, 6)):  # events in session
                events.append(
                    {"event_id": eid, "user_id": u, "value": 1.0,
                     "ts": __import__("datetime").datetime.utcfromtimestamp(
                         1704067200 + t).strftime("%Y-%m-%d %H:%M:%S")}
                )
                eid += 1
                t += rng.randint(1, 400)  # intra-session (< gap=600)
            t += rng.randint(700, 3000)  # inter-session (> gap)
    flush = {"event_id": 10_000, "user_id": 99, "value": 0.0,
             "ts": "2024-01-02 12:00:00"}

    # deliver in EVENT-TIME order (the operator's cross-batch ordering
    # contract): the 10-min watermark delay then covers every
    # intra-session gap (<400 s), so no straddling session is evicted
    # before its continuation arrives
    events.sort(key=lambda e: (e["ts"], e["event_id"]))
    src, chk = tmp_path / "src", tmp_path / "chk"
    third = len(events) // 3
    _write_jsonl_ordered(src, [
        ("b1.json", events[:third]),
        ("b2.json", events[third: 2 * third]),
        ("b3.json", events[2 * third:] + [flush]),
    ])

    got = {
        (r.user_id, r.start_us, r.end_us, r.n_events)
        for r in _run_sessions(spark, src, chk, [])
    }
    want = _batch_sessions(spark, events)  # flush session excluded
    assert got == want, (got ^ want, len(got), len(want))
    assert len(want) >= 9


def test_session_tracker_timeout_eviction_across_restart(spark, tmp_path):
    """A session left OPEN at shutdown closes via EventTimeTimeout when
    a later run's watermark passes it — and the emitted row carries the
    checkpoint-restored (start, end, n_events), proving state survived
    the restart and was then EVICTED (no re-emission on a third run)."""
    src, chk = tmp_path / "src", tmp_path / "chk"
    b1 = [
        {"event_id": i, "user_id": 1, "value": 1.0,
         "ts": f"2024-01-01 00:0{i}:00"}
        for i in range(3)
    ]
    _write_jsonl(src / "b1.json", b1)
    out1 = _run_sessions(spark, src, chk, [])
    assert out1 == []  # watermark never passed start+gap: stays open

    # a much-later event from ANOTHER user advances the global watermark
    _write_jsonl(src / "b2.json", [
        {"event_id": 50, "user_id": 2, "value": 1.0,
         "ts": "2024-01-01 06:00:00"},
    ])
    out2 = _run_sessions(spark, src, chk, [])
    assert [(r.user_id, r.start_us // 1_000_000, r.end_us // 1_000_000,
             r.n_events) for r in out2] == [
        (1, 1704067200, 1704067320, 3)
    ], out2

    # third run: the watermark passing user 2's 06:00 session closes IT,
    # but user 1's EVICTED state must not re-emit
    _write_jsonl(src / "b3.json", [
        {"event_id": 51, "user_id": 2, "value": 1.0,
         "ts": "2024-01-01 07:00:00"},
    ])
    out3 = _run_sessions(spark, src, chk, [])
    assert [(r.user_id, r.n_events) for r in out3] == [(2, 1)], out3


def test_session_tracker_correct_across_real_arrow_chunks(spark, tmp_path):
    """Engine-level pin of the concat-before-sort contract: with
    ``spark.sql.execution.arrow.maxRecordsPerBatch=4``, a user's 30-event
    micro-batch reaches the fold as ~8 pandas chunks, and the rows are
    written to the source file in REVERSE event-time order so chunk
    delivery order opposes event-time order.  A fold that sorted each
    chunk alone would gap-close phantom sessions; the concat-then-sort
    fold must still equal the batch sessionizer exactly."""
    import datetime as _dt

    saved = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "4")
    try:
        events, eid = [], 0
        for u in range(2):
            t = 500 + u * 13
            for _ in range(4):  # sessions
                for _ in range(7, 0, -1):  # 7 events per session
                    events.append(
                        {"event_id": eid, "user_id": u, "value": 1.0,
                         "ts": _dt.datetime.utcfromtimestamp(
                             1704067200 + t).strftime("%Y-%m-%d %H:%M:%S")}
                    )
                    eid += 1
                    t += 150  # intra-session (< gap=600)
                t += 900  # inter-session (> gap)
        flush = {"event_id": 10_000, "user_id": 99, "value": 0.0,
                 "ts": "2024-01-02 12:00:00"}

        # ONE data file, REVERSE event-time order: every Arrow chunk of a
        # user's rows is later-in-time than the next chunk delivered
        rev = sorted(events, key=lambda e: (e["ts"], e["event_id"]),
                     reverse=True)
        src, chk = tmp_path / "src", tmp_path / "chk"
        _write_jsonl_ordered(src, [
            ("b1.json", rev),
            ("b2.json", [flush]),
        ])

        got = {
            (r.user_id, r.start_us, r.end_us, r.n_events)
            for r in _run_sessions(spark, src, chk, [])
        }
        want = _batch_sessions(spark, events)  # flush session excluded
        assert got == want, (got ^ want, len(got), len(want))
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", saved)


def test_stream_stream_outer_join_eviction_boundary(spark, tmp_path):
    """Pins the left-outer stream-stream join's unmatched-emission rule
    that st_stream_stream_outer_join's oracle reproduces: a never-
    matched click flushes iff ceil((c_us + 10 min)/1 ms) < wm_ms, with
    wm_ms = min over sides of floor(max_event_us/1000) - 1 h.  Clicks
    planted at -1 ms / -1 us / 0 / +1 us / +999 us / +1 ms around the
    boundary prove both the strictness and the us->ms ceil."""
    import os
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    BASE = 1_700_000_000_000_000  # whole-ms epoch µs
    H_US = 3_600_000_000
    PMAX = BASE + 10 * H_US  # purchase side max == global watermark anchor
    CMAX = BASE + 20 * H_US  # click side max far ahead => min() picks purchases
    wm_ms = PMAX // 1000 - 3_600_000
    bnd_us = (wm_ms - 600_000) * 1000  # c_us where c+10min lands ON wm_ms
    rows = [
        (1, 999, "purchase", PMAX),
        (2, 998, "click", CMAX),
        (10, 1, "click", bnd_us - 1000),  # -1 ms: flushed
        (11, 2, "click", bnd_us),         # exact tie: held in state
        (12, 3, "click", bnd_us + 1000),  # +1 ms: held
        (13, 4, "click", bnd_us + 1),     # +1 µs: held (ceil, not floor)
        (14, 5, "click", bnd_us + 999),   # +999 µs: held
        (15, 6, "click", bnd_us - 1),     # -1 µs: held (ceil, not floor)
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
            "value": pa.array([1.0] * len(rows), pa.float64()),
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))

    from dataengineeringworkshop_spark.plans.streamq import (
        st_stream_stream_outer_join,
    )

    out = st_stream_stream_outer_join(spark, str(tmp_path))
    flushed = sorted(
        r.click_id for r in out.filter("purchase_id IS NULL").collect()
    )
    assert flushed == [10], flushed

    # and the oracle SQL reproduces the same set on the same parquet
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'"
    )
    from dataengineeringworkshop_spark.plans.registry import load_all

    oracle = load_all()["st_stream_stream_outer_join"].oracle
    got = sorted(
        r[0]
        for r in con.execute(oracle).fetchall()
        if r[1] is None
    )
    assert got == [10], got


def test_transform_with_state_totals_matches_batch(spark, tmp_path):
    """running_user_totals_tws (the Spark 4 transformWithStateInPandas
    successor API) must equal the batch per-user aggregate, like its
    applyInPandasWithState twin.  Skips when google.protobuf is absent
    (the TWS state-server protocol needs it; this container's pip has
    no network route — the skip IS the documented environment seam,
    exactly like delta-spark's)."""
    pytest.importorskip("google.protobuf")
    import tempfile
    import uuid

    from dataengineeringworkshop_spark.plans.streamq import _events_stream
    from dataengineeringworkshop_spark.streaming.stateful import (
        running_user_totals_tws,
    )

    sf = "/root/testdata/sf0.001"
    saved = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = _events_stream(spark, sf).select("user_id", "event_id", "value")
        out = running_user_totals_tws(stream)
        name = f"tws_{uuid.uuid4().hex[:8]}"
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", tempfile.mkdtemp(prefix="dew_tws_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        from pyspark.sql import Window

        t = spark.table(name)
        w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
        got = {
            (r.user_id, r.n_events, r.total_value, r.last_event_id)
            for r in t.withColumn("rn", F.row_number().over(w))
            .filter("rn = 1")
            .drop("rn")
            .collect()
        }
        want = {
            (r.user_id, r.n_events, r.total_value, r.last_event_id)
            for r in spark.read.parquet(f"{sf}/events.parquet")
            .groupBy("user_id")
            .agg(
                F.count("*").alias("n_events"),
                (
                    F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                ).alias("total_value"),
                F.max("event_id").alias("last_event_id"),
            )
            .collect()
        }
        assert got == want
    finally:
        if saved is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", saved)
