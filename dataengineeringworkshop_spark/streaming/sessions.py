"""Streaming gap-sessionizer with WATERMARK-DRIVEN STATE EVICTION — the
one Structured Streaming capability the other custom stateful operators
(funnel.py, rollingz.py, stateful.py) deliberately leave out: they hold
per-key state forever (``GroupStateTimeout.NoTimeout``), which is fine
for bounded keys but wrong for a 100 TB clickstream where most users go
idle and never return.

This operator is the streaming twin of the batch gap-sessionize
(``operators/temporal.py:sessionize`` — same gap rule, same
(ts, tiebreak) fold order) built on ``applyInPandasWithState`` with
``GroupStateTimeout.EventTimeTimeout``:

- per user, the OPEN session is the only state: (start_us, last_us,
  n_events) — three scalars, no event buffer;
- a session CLOSES (one output row) either when a same-user event
  arrives past the gap, or when the EVENT-TIME WATERMARK passes
  ``last_ts + gap`` and Spark fires the timeout callback — at which
  point the state is REMOVED.  Idle keys therefore cost nothing after
  one gap + watermark delay: total state is O(concurrently-active
  users), not O(users ever seen).

Correctness contract: closed-session rows are exactly the batch
sessionizer's sessions whose ``(end + gap) // 1ms`` is STRICTLY below
the final watermark (Spark arms and fires event-time timeouts at
millisecond precision, and firing is strict: ``timeout < watermark``);
sessions still open (or at/after the watermark) remain in state and
emit on a later batch/timeout.  Pinned against
``operators/temporal.py:sessionize`` in
tests/test_streaming_ext.py::test_session_tracker_matches_batch_sessionize.

Ordering contract (same as funnel.py/rollingz.py): events fold in
(ts, event_id) order within a micro-batch — ALL Arrow chunks of a key's
micro-batch data are concatenated before the one sort, so the order
holds even when a key's rows span multiple record batches; across
batches the fold assumes event-time-ordered delivery per user.  A late
event inside the watermark that lands in a still-open session merges
correctly (min/max interval extension); a late event older than an
already-evicted session starts a fresh session (the standard watermark
trade-off — the watermark delay is the knob).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n_events", LongType()),
    ]
)


def make_session_fn(gap_seconds: int = 1800):
    """Build the per-group fold (exposed for direct unit testing)."""
    gap_us = gap_seconds * 1_000_000

    def update(
        key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int]] = []  # (start, end, n)

        if state.hasTimedOut:
            # watermark passed last_us + gap: the open session is final
            start, last, n = state.get
            closed.append((start, last, n))
            state.remove()
        else:
            start, last, n = state.get if state.exists else (None, None, 0)
            # one sort over ALL Arrow chunks: applyInPandasWithState
            # delivers a key's micro-batch rows as MULTIPLE pandas
            # chunks (shuffle order) once they exceed
            # arrow.maxRecordsPerBatch — sorting each chunk alone would
            # fold out of event-time order for >10k-event users
            chunks = [c for c in batches if len(c)]  # drop empties (concat dtype warnings)
            if chunks:
                pdf = pd.concat(chunks).sort_values(["ts", "event_id"])
                for ts in pdf["ts"]:
                    t_us = int(pd.Timestamp(ts).value // 1000)
                    if start is None:
                        start, last, n = t_us, t_us, 1
                    elif t_us - last > gap_us:
                        closed.append((start, last, n))
                        start, last, n = t_us, t_us, 1
                    else:
                        # late in-watermark arrival can precede the open
                        # session's start — min-merge so the emitted
                        # interval covers it (the batch sessionizer's MIN)
                        start = min(start, t_us)
                        last = max(last, t_us)
                        n += 1
            if start is not None:
                # Spark's timeout semantics are MILLISECOND-strict:
                # setTimeoutTimestamp rejects t_ms < watermark_ms and the
                # timeout fires only once t_ms < a LATER watermark.  Close
                # inline under exactly the would-already-fire condition so
                # arming never raises and the boundary rule is one rule.
                wm_ms = state.getCurrentWatermarkMs()
                t_ms = (last + gap_us) // 1000
                if t_ms < wm_ms:
                    closed.append((start, last, n))
                    state.remove()
                else:
                    state.update((start, last, n))
                    state.setTimeoutTimestamp(t_ms)

        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "start_us": [c[0] for c in closed],
                "end_us": [c[1] for c in closed],
                "n_events": [c[2] for c in closed],
            }
        )

    return update


def session_tracker(
    stream: DataFrame,
    gap_seconds: int = 1800,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Closed-session stream: one append-mode row per finished session.
    Input needs columns (user_id, event_id, ts); the watermark is
    applied here (EventTimeTimeout requires one on the input)."""
    return (
        stream.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            make_session_fn(gap_seconds),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
