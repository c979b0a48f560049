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
batches the carried-over open session is merged by INTERVAL POSITION,
not fold order: a late in-watermark event within the gap of the open
session (on either side) merges into it, and one more than the gap
BEFORE the open session's start is emitted as its own earlier session —
exactly the batch sessionizer's split (round-8 fix: the old min-merge
silently absorbed that case).  A late event older than an
already-evicted session still starts a fresh session (the standard
watermark trade-off — the watermark delay is the knob).
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
                # 1) fold THIS batch's events alone into candidate
                # sessions (plain ascending gap fold)
                cand: list[tuple[int, int, int]] = []
                cs = ce = cn = None
                for ts in pdf["ts"]:
                    t_us = int(pd.Timestamp(ts).value // 1000)
                    if cs is None:
                        cs, ce, cn = t_us, t_us, 1
                    elif t_us - ce > gap_us:
                        cand.append((cs, ce, cn))
                        cs, ce, cn = t_us, t_us, 1
                    else:
                        ce, cn = t_us, cn + 1
                if cs is not None:
                    cand.append((cs, ce, cn))
                # 2) merge the carried-over open session in by interval
                # position, NOT by fold order: a cross-batch late event
                # can precede the open session's start by more than the
                # gap, and the batch sessionizer would emit it as its own
                # EARLIER session — a blind min-merge would silently
                # absorb it (round-8 fix; pinned in
                # tests/test_temporal_properties.py).  Sorted-by-start
                # gap-tolerant interval merge handles every case: within
                # gap on either side merges (and can bridge candidates),
                # beyond gap stays separate.
                if start is not None:
                    cand.append((start, last, n))
                    cand.sort()
                sessions: list[tuple[int, int, int]] = []
                for s, e, c in cand:
                    if sessions and s - sessions[-1][1] <= gap_us:
                        ps, pe, pc = sessions[-1]
                        sessions[-1] = (ps, max(pe, e), pc + c)
                    else:
                        sessions.append((s, e, c))
                # 3) everything but the newest session is gap-separated
                # from a later in-hand event → closes now (same inline
                # gap-close the pre-batch-parity fold applied); the
                # newest stays open
                closed.extend(sessions[:-1])
                start, last, n = sessions[-1] if sessions else (None, None, 0)
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
