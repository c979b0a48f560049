"""Streaming rolling z-score anomaly detector — a custom stateful
operator via ``applyInPandasWithState``.

The streaming twin of the batch trailing-window query
(``plans/analyticsq.py:e_rolling_zscore_anomaly``): each reading is
scored against the mean/std of the user's PREVIOUS ``window`` readings
(the current reading never contaminates its own baseline), emitting
``(user_id, event_id, z_score)`` whenever ``|z| > threshold`` with at
least ``min_samples`` baseline points and a variance floor.

State per user is a fixed ``window``-deep ring buffer of readings —
O(distinct users × window) state, sharded by the groupBy key; the ring
never grows with stream length, which is what makes the operator
checkpoint-cheap at any volume.

Ordering contract (same as streaming/funnel.py): readings are folded in
(ts, event_id) order WITHIN a micro-batch — all Arrow chunks of a key's
micro-batch data are concatenated before the one sort, so the order
holds even when a key's rows span multiple record batches; across
batches the fold assumes event-time-ordered delivery per user (the
availableNow file-drop pattern).
"""

from __future__ import annotations

from collections.abc import Iterable
from math import sqrt

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [StructField("readings", ArrayType(DoubleType()))]  # oldest..newest
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("z_score", DoubleType()),
    ]
)


def make_rolling_z_fn(
    window: int = 20,
    min_samples: int = 8,
    threshold: float = 2.5,
    var_floor: float = 0.0001,
):
    """Build the per-group fold (exposed for direct unit testing)."""

    def update(
        key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        # ring of the last `window` ROWS (None = null reading), matching
        # the batch query's ROWS BETWEEN window PRECEDING AND 1 PRECEDING
        # frame exactly: null rows occupy frame slots but contribute to
        # neither count nor moments
        buf: list[float | None] = list(state.get[0]) if state.exists else []
        out_ids: list[int] = []
        out_z: list[float] = []
        # one sort over ALL Arrow chunks: a key's micro-batch rows arrive
        # as multiple pandas chunks (shuffle order) past
        # arrow.maxRecordsPerBatch — per-chunk sorting would interleave
        # chunks out of event-time order and score readings against a
        # baseline containing FUTURE readings
        chunks = [c for c in batches if len(c)]  # drop empties (concat dtype warnings)
        if chunks:
            # an all-NA value column arrives object-typed; pin float64
            # per chunk so the concat dtype is stable across pandas
            # versions (pandas>=2.1 FutureWarning: all-NA entries will
            # stop being excluded from result-dtype determination)
            chunks = [
                c if c["value"].dtype == "float64"
                else c.astype({"value": "float64"})
                for c in chunks
            ]
            pdf = pd.concat(chunks).sort_values(["ts", "event_id"])
            for event_id, value in zip(pdf["event_id"], pdf["value"]):
                is_null = value is None or pd.isna(value)
                if not is_null:
                    v = float(value)
                    vals = [x for x in buf if x is not None]
                    n = len(vals)
                    if n >= min_samples:
                        s = sum(vals)
                        ss = sum(x * x for x in vals)
                        var = (ss - s * s / n) / (n - 1)
                        if var > var_floor:
                            z = (v - s / n) / sqrt(var)
                            if abs(z) > threshold:
                                out_ids.append(int(event_id))
                                out_z.append(z)
                buf.append(None if is_null else float(value))
                if len(buf) > window:
                    buf.pop(0)
        state.update(([buf]))
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(out_ids),
                "event_id": out_ids,
                "z_score": out_z,
            }
        )

    return update


def rolling_zscore_detector(
    stream: DataFrame,
    window: int = 20,
    min_samples: int = 8,
    threshold: float = 2.5,
) -> DataFrame:
    """Per-user anomaly stream: emits flagged readings as they arrive
    (``update`` output mode downstream).  Input needs columns
    (user_id, event_id, ts, value)."""
    return stream.groupBy("user_id").applyInPandasWithState(
        make_rolling_z_fn(window, min_samples, threshold),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
