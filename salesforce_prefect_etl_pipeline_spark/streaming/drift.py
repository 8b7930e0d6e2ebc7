"""Stateful streaming drift detection.

The reference's row-count drift check persists one integer per object
between 15-minute batch runs and alerts on >=50% relative change
(tasks/quality_parallel.py:159-189). In Structured Streaming that
becomes a *custom stateful operator*: per group (event_type), compare
this micro-batch's row count against the previous batch's count kept in
the state store, emit a drift record per batch, carry state forward.

Implemented with ``applyInPandasWithState`` (Arrow-batched, GroupState
per key) — the Spark-native surface for custom streaming state beyond
built-in windows/aggregations. State size: one (count, batch_no) pair
per key; no watermark needed because state never grows with data volume.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DRIFT_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("batch_rows", T.LongType()),
        T.StructField("prev_rows", T.LongType()),
        T.StructField("relative_change", T.DoubleType()),
        T.StructField("alert", T.BooleanType()),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("prev_rows", T.LongType())])


def _drift_fn(threshold: float):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        rows = sum(len(p) for p in pdfs)
        prev = state.get[0] if state.exists else None
        change = None
        alert = False
        if prev is not None and prev > 0:
            change = abs(rows - prev) / prev
            alert = change >= threshold
        state.update((rows,))
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "batch_rows": [rows],
                "prev_rows": [prev],
                "relative_change": [change],
                "alert": [alert],
            }
        )

    return fn


def drift_stream(events: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Streaming plan: per event_type, per micro-batch row count compared
    to the previous batch's count (kept in the state store)."""
    return events.groupBy("event_type").applyInPandasWithState(
        _drift_fn(threshold),
        outputStructType=DRIFT_OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
