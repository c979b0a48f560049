"""Custom stateful streaming operator via ``applyInPandasWithState``.

``running_user_totals``: per-user running event count / value sum /
last-seen timestamp, updated each micro-batch — the "user profile
accumulator" shape (fraud scores, rate counters, per-entity feature
state) that windowed aggregation can't express because the state is
keyed by entity, not by time window.

State is a single row per user (three numbers), Arrow-batched per
micro-batch group — at 100 TB of events the state size is O(distinct
users), not O(events), and the state store shards by the groupBy key.
A processing-time timeout (``GroupStateTimeout``) would evict idle
users; kept NoTimeout here for deterministic tests.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        # exact integer cents (values are 2-decimal): order-independent
        # across events AND micro-batches, so the emitted total equals
        # the batch DECIMAL(18,2) sum bit-for-bit regardless of batching
        StructField("total_cents", LongType()),
        StructField("last_event_id", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_event_id", LongType()),
    ]
)


def _update_user(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, cents, last_id = state.get
    else:
        n, cents, last_id = 0, 0, -1
    for pdf in batches:
        n += len(pdf)
        # exact cents-arithmetic (values are 2-decimal), order-independent;
        # the division to double happens only at EMIT time so multi-batch
        # accumulation never compounds float error
        cents += int(pdf["value"].mul(100).round().sum())
        mx = int(pdf["event_id"].max())
        last_id = max(last_id, mx)
    state.update((n, cents, last_id))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [cents / 100.0],
            "last_event_id": [last_id],
        }
    )


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Stateful per-user accumulator over an event stream.

    Emits the updated totals row for every user seen in each micro-batch
    (``update`` output mode downstream)."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_user,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_user_totals_tws(stream: DataFrame) -> DataFrame:
    """The same per-user accumulator through Spark 4's
    ``transformWithStateInPandas`` — the successor stateful API
    (StatefulProcessor + typed state handles + timers) that replaces
    ``applyInPandasWithState``.  Semantics contract is identical to
    :func:`running_user_totals`: exact integer-cents accumulation in
    ValueState, division to double only at emit, so output equals the
    batch DECIMAL(18,2) aggregate bit-for-bit under any micro-batching.

    ENVIRONMENT SEAM: the TWS state-server protocol needs
    ``google.protobuf`` on the Python workers, which this container
    lacks (pip has no network route — same class as the delta-spark
    seam, retried and logged per round in PROGRESS.jsonl).  The
    operator raises ImportError eagerly when protobuf is absent;
    tests/test_streaming_ext.py exercises it under
    ``pytest.importorskip`` so it activates the moment the dependency
    exists.  Also requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass``) — set by the
    caller, since provider choice is a session-level deployment
    decision."""
    import google.protobuf  # noqa: F401  - eager seam check (see docstring)
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _TotalsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals",
                "n_events BIGINT, total_cents BIGINT, last_event_id BIGINT",
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                n, cents, last_id = self._state.get()
            else:
                n, cents, last_id = 0, 0, -1
            for pdf in rows:
                n += len(pdf)
                cents += int(pdf["value"].mul(100).round().sum())
                last_id = max(last_id, int(pdf["event_id"].max()))
            self._state.update((n, cents, last_id))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [cents / 100.0],
                    "last_event_id": [last_id],
                }
            )

        def close(self) -> None:
            pass

    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_TotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
