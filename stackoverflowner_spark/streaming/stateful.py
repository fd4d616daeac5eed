"""Custom stateful streaming operator via applyInPandasWithState.

The reference has no streaming semantics; this is the engine's
training-pipeline extension: incremental per-key accumulation (user activity
totals / sessionization skeleton) maintained across micro-batches with
explicit state. The same pattern carries the KG use case of incremental
per-entity mention counters.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (DoubleType, LongType, StructField, StructType)

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])

STATE_SCHEMA = StructType([
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])


def _update(key: Tuple[Any, ...], pdfs: Iterable[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame([(user_id, n, total)],
                       columns=["user_id", "n_events", "total_value"])


def stateful_user_totals(events_stream: DataFrame) -> DataFrame:
    """Streaming per-user running totals; each micro-batch emits the updated
    totals for users present in the batch (Update semantics)."""
    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update, OUTPUT_SCHEMA, STATE_SCHEMA, "update",
            GroupStateTimeout.NoTimeout)
    )
