"""Structured Streaming surface: CDC ingest → stateful apply → sinks.

The reference's consumer loop (client.go StreamWAL → apply) maps to:
    readStream(envelope dir/Kafka) → [dedup, resume filter] →
    foreachBatch(apply_cdc_batch) → materialized table state

Correctness properties preserved (BASELINE.md):
  * resume-exactness: checkpointing + an idempotent, whole-state
    recompute-free MERGE per micro-batch (at-least-once input collapses via
    per-key LSN max).
  * per-key ordering by numeric LSN survives any parallelism — each batch
    applies only changes newer than the key's current LSN.
  * snapshot+stream bootstrap joins at a single (lsn, tx_id) point
    (sources.bootstrap) — the stream side then starts from header.lsn.

On a cluster the sink would be Delta MERGE; locally we maintain a parquet
state directory with an atomic swap (write new → rename), which keeps the
same idempotence contract for tests.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from creek_spark.functions.lsn import lsn_num
from creek_spark.operators.cdc import latest_state


def read_envelope_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-based envelope stream (the staging-dir pattern from SURVEY.md
    O1: capture lands envelope parquet, Spark tails the directory).
    maxFilesPerTrigger is the backpressure knob (≙ the reference's cap-1
    channel lock-step)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def stream_wal_from(
    stream: DataFrame, timestamp=None, lsn: str | None = None
) -> DataFrame:
    """StreamWALFrom (client.go:227-294) on the streaming DataFrame —
    same predicates as the batch variant; Catalyst pushes them into the
    file-source scan."""
    out = stream
    if timestamp is not None:
        out = out.where(F.col("source.tx_at") >= F.lit(timestamp))
    if lsn is not None:
        out = out.where(lsn_num(F.col("source.lsn")) > lsn_num(F.lit(lsn)))
    return out


def dedup_stream(stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """At-least-once → effectively-once on the stream: duplicates of the
    same (source, op) — i.e. the same LSN redelivered — collapse within a
    bounded-state watermark window, the MsgID-dedup analog
    (internal/mq/nats.go:214)."""
    return stream.withWatermark("sent_at", watermark).dropDuplicatesWithinWatermark(
        ["source", "op"]
    )


class CdcApplier:
    """foreachBatch sink: maintains materialized table state under
    ``state_dir`` by merging each micro-batch of envelope rows.

    Merge = union(current state as 'r' ops @ their stored lsn, new batch)
    → latest_state.  Re-delivered batches are no-ops (same lsn loses to
    itself), which is what makes at-least-once delivery safe."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        key_cols: list[str],
        envelope_schema: T.StructType,
    ):
        self.spark = spark
        self.state_dir = state_dir
        self.key_cols = key_cols
        self.envelope_schema = envelope_schema
        self._lsn_col = "_creek_lsn"

    def current_state(self) -> DataFrame | None:
        if not os.path.exists(os.path.join(self.state_dir, "_SUCCESS")):
            return None
        return self.spark.read.parquet(self.state_dir)

    def _state_as_wal(self, state: DataFrame) -> DataFrame:
        after_t = self.envelope_schema["after"].dataType
        before_t = self.envelope_schema["before"].dataType
        return state.select(
            F.lit("state").alias("fingerprint"),
            F.struct(
                F.lit("state").alias("name"),
                F.lit("1970-01-01").cast("timestamp").alias("tx_at"),
                F.lit("db").alias("db"),
                F.lit("public").alias("schema"),
                F.lit("state").alias("table"),
                F.lit(0).cast("long").alias("tx_id"),
                F.col(self._lsn_col).alias("lsn"),
            ).alias("source"),
            F.lit("r").alias("op"),
            F.lit("1970-01-01").cast("timestamp").alias("sent_at"),
            F.lit(None).cast(before_t).alias("before"),
            F.struct(
                *[
                    F.col(f.name).cast(f.dataType).alias(f.name)
                    for f in after_t.fields
                ]
            ).alias("after"),
            F.lit(None).cast("array<string>").alias("unchanged_toast"),
        )

    def apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        from creek_spark.functions.lsn import lsn_str

        state = self.current_state()
        if state is not None and state.columns:
            sw = self._state_as_wal(state)
            wal_in = sw.unionByName(batch.select(*sw.columns))
        else:
            wal_in = batch
        # per-key max LSN — stored with the state so existing rows re-enter
        # the next batch's merge at their true stream position
        lsn_per_key = (
            wal_in.withColumn("_l", lsn_num(F.col("source.lsn")))
            .groupBy(
                *[
                    F.coalesce(F.col(f"after.{k}"), F.col(f"before.{k}")).alias(k)
                    for k in self.key_cols
                ]
            )
            .agg(F.max("_l").alias("_lmax"))
        )
        new_state = (
            latest_state(wal_in, self.key_cols)
            .join(lsn_per_key, self.key_cols, "left")
            .withColumn(
                self._lsn_col, lsn_str(F.coalesce(F.col("_lmax"), F.lit(0)))
            )
            .drop("_lmax")
        )
        tmp = self.state_dir + ".tmp"
        new_state.write.mode("overwrite").parquet(tmp)
        old = self.state_dir + ".old"
        if os.path.exists(old):
            shutil.rmtree(old)
        if os.path.exists(self.state_dir):
            os.rename(self.state_dir, old)
        os.rename(tmp, self.state_dir)
        if os.path.exists(old):
            shutil.rmtree(old)

    def start(
        self,
        stream: DataFrame,
        checkpoint_dir: str,
        *,
        available_now: bool = True,
    ):
        writer = (
            stream.writeStream.foreachBatch(self.apply_batch)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("update")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()


def sliding_counts(
    stream: DataFrame,
    *,
    time_col: str = "sent_at",
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked sliding-window aggregation: each event lands in
    window/slide overlapping windows.  State per key is bounded by the
    watermark, so executor memory is O(active windows), not O(stream)."""
    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(
            F.window(F.col(time_col), window, slide).alias("w"),
            F.col("op"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("wstart"),
            F.col("w.end").alias("wend"),
            "op",
            "n",
        )
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    *,
    left_time: str = "sent_at",
    right_time: str = "sent_at",
    watermark: str = "10 minutes",
    max_lag: str = "5 minutes",
) -> DataFrame:
    """Inner stream-stream equi-join with a bounded time-range condition.

    Both sides carry watermarks and the join requires
    ``right_time ∈ [left_time, left_time + max_lag]`` — this is what lets
    Spark expire buffered state (an unbounded stream-stream join would
    hold both streams forever).  Columns from both sides are preserved
    with `l_`/`r_` prefixes except the join key."""
    lw = left.withWatermark(left_time, watermark)
    rw = right.withWatermark(right_time, watermark)
    lsel = lw.select(
        F.col(on).alias(on),
        *[
            F.col(c).alias(f"l_{c}")
            for c in left.columns
            if c != on
        ],
    )
    rsel = rw.select(
        F.col(on).alias("_r_key"),
        *[
            F.col(c).alias(f"r_{c}")
            for c in right.columns
            if c != on
        ],
    )
    cond = (
        (F.col(on) == F.col("_r_key"))
        & (F.col(f"r_{right_time}") >= F.col(f"l_{left_time}"))
        & (
            F.col(f"r_{right_time}")
            <= F.col(f"l_{left_time}") + F.expr(f"INTERVAL {max_lag}")
        )
    )
    return lsel.join(rsel, cond, "inner").drop("_r_key")


def tumbling_counts(
    stream: DataFrame,
    *,
    time_col: str = "sent_at",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling-window aggregation over the change stream —
    late data beyond the watermark is dropped (explicit policy; the
    reference has none, SURVEY.md §2.2)."""
    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(
            F.window(F.col(time_col), window).alias("w"),
            F.col("op"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("wstart"), "op", "n")
    )
