"""Custom stateful streaming operators via applyInPandasWithState.

The charter's "custom stateful operator" surface (BASELINE.json
north_star): state that built-in streaming aggregations can't express —
here a per-user exponential moving average carried across micro-batches.

Scale notes: state is keyed by user_id (high-cardinality, even); each
key's state is a single (ema, last_ts) pair — O(users) state store, no
per-event growth; a processing-time timeout evicts idle users so the
store is bounded even with unbounded key churn.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

EMA_ALPHA = 0.3

EMA_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("ema", T.DoubleType()),
    ]
)

EMA_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ema", T.DoubleType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _ema_fn(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's events (ordered by ts, event_id) into the
    persisted (ema, n_events) state and emit the updated value."""
    if state.hasTimedOut:
        state.remove()
        return
    ema, n = state.get if state.exists else (None, 0)
    for pdf in batches:
        pdf = pdf.sort_values(["ts", "event_id"])
        for v in pdf["value"]:
            ema = v if ema is None else EMA_ALPHA * v + (1 - EMA_ALPHA) * ema
            n += 1
    state.update((float(ema), int(n)))
    state.setTimeoutDuration(24 * 3600 * 1000)  # evict idle users after 24h
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "ema": [ema]}
    )


def user_ema_stream(events: DataFrame) -> DataFrame:
    """Continuously-updated per-user EMA (update output mode).

    Batch dual: queries/events.py::events_user_ema — a single-batch run
    of this operator produces each user's final EMA exactly.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _ema_fn,
        outputStructType=EMA_OUTPUT_SCHEMA,
        stateStructType=EMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
