"""Custom stateful streaming via applyInPandasWithState — the PySpark-native
tool for operators Structured Streaming lacks (SURVEY.md §7 "What's hard").

running_totals() maintains per-key running (count, sum, last_lsn) across
micro-batches: the streaming analog of the reference's per-relation cache
(replication.go:44,318-338) and the op-counting metrics, with state owned
by Spark's state store (checkpointed, recoverable, partitioned by key —
no driver-side state, so it scales with executors)."""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n BIGINT, total DOUBLE, max_lsn BIGINT"
OUTPUT_SCHEMA = "key BIGINT, n BIGINT, total DOUBLE, max_lsn BIGINT"


def _update(
    key: Any,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (n, total, max_lsn) = state.get if state.exists else (0, 0.0, -1)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            max_lsn = max(max_lsn, int(pdf["lsn_num"].max()))
    state.update((n, total, max_lsn))
    yield pd.DataFrame(
        {"key": [key[0]], "n": [n], "total": [total], "max_lsn": [max_lsn]}
    )


def running_totals(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    lsn_num_col: str,
) -> DataFrame:
    """Per-key running aggregates over a stream, emitted every batch.

    Input columns are projected to (key, value, lsn_num); output is one row
    per key per batch with the cumulative state."""
    projected = stream.select(
        F.col(key_col).alias("key"),
        F.col(value_col).cast("double").alias("value"),
        F.col(lsn_num_col).cast("long").alias("lsn_num"),
    )
    return projected.groupBy("key").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
