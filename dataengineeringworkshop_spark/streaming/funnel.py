"""Streaming funnel-stage tracker — a custom stateful operator via
``applyInPandasWithState``.

The streaming twin of the batch ordered funnel
(``plans/analyticsq.py:e_funnel_conversion``): per user, track the
highest funnel stage reached, where stage N+1 only counts if its event
arrives with event time STRICTLY AFTER the time the user reached stage
N.  State per user is two numbers (stage index + the event time it was
reached) — O(distinct users) state at any event volume, sharded by the
groupBy key like every keyed state store.

Ordering contract: events are folded in (ts, event_id) order WITHIN a
micro-batch — all Arrow chunks of a key's micro-batch data are
concatenated before the one sort, so the order holds even when a key's
rows span multiple record batches; across batches the fold assumes
event-time-ordered delivery per user (the availableNow file-drop
pattern).  Under
cross-batch disorder the greedy fold can trail the batch MIN-chain
answer until the late stage event is superseded — the same caveat every
sequential stateful operator carries; a watermark + per-user buffer
would close it at the cost of state.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FUNNEL_STAGES: tuple[str, ...] = ("view", "click", "purchase")

STATE_SCHEMA = StructType(
    [
        StructField("stage_idx", IntegerType()),
        StructField("stage_ts_us", LongType()),  # event time stage was reached
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("stage", IntegerType()),  # 0 = not in funnel yet
        StructField("stage_name", StringType()),
        StructField("stage_ts_us", LongType()),
    ]
)


def _update_funnel(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    stage, stage_ts = state.get if state.exists else (0, -1)
    # one sort over ALL Arrow chunks: a key's micro-batch rows arrive as
    # multiple pandas chunks (shuffle order) past arrow.maxRecordsPerBatch,
    # and the stage fold is order-sensitive — per-chunk sorting would
    # advance stages out of event-time order for >10k-event users
    chunks = [c for c in batches if len(c)]  # drop empties (concat dtype warnings)
    if chunks:
        pdf = pd.concat(chunks).sort_values(["ts", "event_id"])
        for ts, etype in zip(pdf["ts"], pdf["event_type"]):
            if stage >= len(FUNNEL_STAGES):
                break
            ts_us = int(pd.Timestamp(ts).value // 1000)
            if etype == FUNNEL_STAGES[stage] and (stage == 0 or ts_us > stage_ts):
                stage += 1
                stage_ts = ts_us
    state.update((stage, stage_ts))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "stage": [stage],
            "stage_name": [FUNNEL_STAGES[stage - 1] if stage else "none"],
            "stage_ts_us": [stage_ts],
        }
    )


def funnel_stage_tracker(stream: DataFrame) -> DataFrame:
    """Per-user funnel progression over an event stream: emits each
    user's (stage, stage_name, stage_ts_us) row whenever the user
    appears in a micro-batch (``update`` output mode downstream)."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_funnel,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
