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

On a cluster the sink would be Delta MERGE; locally we maintain a
hash-bucketed parquet state directory (hive partitions on
pmod(xxhash64(key), n_buckets)) — only buckets containing batch keys are
rewritten per trigger, which keeps the same idempotence contract for tests
while making per-batch cost O(|touched buckets|) instead of O(|state|).
Visibility is transactional via a `_manifest.json` swap (Delta-log analog):
each batch writes its touched buckets into a fresh version directory, then
atomically replaces the manifest mapping bucket → version dir, so a
concurrent reader sees the whole old state or the whole new state, never a
mix; superseded files survive one extra generation before GC (vacuum
analog) so in-flight readers of the previous manifest stay valid.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from creek_spark import fsio
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
    itself), which is what makes at-least-once delivery safe.

    Scale design: state is hash-bucketed by key —
    ``creek_bucket = pmod(xxhash64(keys), n_buckets)`` hive partitions —
    and each micro-batch rewrites ONLY the buckets whose keys appear in
    the batch, into a fresh version directory published by an atomic
    ``_manifest.json`` swap (see module docstring): readers always see a
    consistent committed snapshot, concurrent with writes.  Per-batch
    cost is O(|touched buckets|), not O(|state|): a steady trickle of
    changes no longer re-shuffles the whole table every trigger; version
    sprawl is bounded by an inline compaction fold every
    ``compact_versions`` generations.  On a real cluster the same
    contract is Delta MERGE + OPTIMIZE; this layout keeps the incremental
    property testable locally.  The only driver traffic is two bounded
    collects of distinct bucket ids (≤ n_buckets ints)."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        key_cols: list[str],
        envelope_schema: T.StructType,
        *,
        n_buckets: int = 64,
        compact_versions: int = 8,
    ):
        self.spark = spark
        self.state_dir = state_dir
        self.key_cols = key_cols
        self.envelope_schema = envelope_schema
        self.n_buckets = n_buckets
        self.compact_versions = compact_versions
        self._lsn_col = "_creek_lsn"
        # NOT underscore-prefixed: Spark's file listing treats `_*` paths
        # as hidden metadata and would skip the partition directories.
        self._bucket_col = "creek_bucket"

    def _bucket_of(self, cols) -> F.Column:
        return F.pmod(F.xxhash64(*cols), F.lit(self.n_buckets)).cast("int")

    # -- manifest-transactional state layout ---------------------------
    # state_dir/_manifest.json        {"version": N, "buckets": {b: vdir}}
    # state_dir/v000000N/creek_bucket=b/part-*.parquet
    # Readers resolve buckets through the manifest only; writers publish a
    # new version dir first and swap the manifest last (atomic
    # Hadoop-FS rename via creek_spark.fsio, so state rides the same
    # filesystem as the data — local, HDFS or object store), and an
    # interleaved reader sees old-or-new, never a mix.

    _MANIFEST = "_manifest.json"

    def _read_manifest(self) -> dict | None:
        m = fsio.read_json_or_none(
            self.spark, fsio.join(self.state_dir, self._MANIFEST)
        )
        if m is None:
            # pre-manifest layout (bucket dirs at the root): synthesize a
            # manifest pointing at "." so old state keeps working
            legacy = self._legacy_root_buckets()
            if legacy:
                return {"version": 0, "buckets": {str(b): "." for b in legacy}}
        return m

    def _legacy_root_buckets(self) -> list[int]:
        prefix = self._bucket_col + "="
        return [
            int(name[len(prefix):])
            for name in fsio.list_names(self.spark, self.state_dir)
            if name.startswith(prefix)
        ]

    def _state_buckets(self) -> list[int]:
        m = self._read_manifest()
        return sorted(int(b) for b in m["buckets"]) if m else []

    def current_state(self) -> DataFrame | None:
        """The committed state as of the manifest this call reads — a
        consistent snapshot regardless of concurrent apply_batch runs."""
        m = self._read_manifest()
        if not m or not m["buckets"]:
            return None
        by_ver: dict[str, list[int]] = {}
        for b, v in m["buckets"].items():
            by_ver.setdefault(v, []).append(int(b))
        parts = []
        for v, bs in sorted(by_ver.items()):
            vdir = fsio.join(self.state_dir, v)
            paths = [
                fsio.join(vdir, f"{self._bucket_col}={b}") for b in sorted(bs)
            ]
            parts.append(
                self.spark.read.option("basePath", vdir).parquet(*paths)
            )
        # allowMissingColumns: after a schema-widening restart, buckets
        # rewritten since the widening carry the new column while
        # untouched buckets persist under the old schema — the union
        # fills the gap with NULLs (ADD COLUMN semantics) instead of
        # refusing to read a half-migrated state
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p, allowMissingColumns=True)
        return df

    def _publish(
        self, old: dict | None, new_ver: str, present: set[int], touched: set[int]
    ) -> None:
        """Swap the manifest to the post-batch state, then GC bucket dirs
        no manifest generation references.  Retention = one generation:
        files the OLD manifest referenced stay on disk until the NEXT
        publish, so a reader that resolved the old manifest can still open
        its files (the vacuum analog)."""
        old_map = dict(old["buckets"]) if old else {}
        new_map = {
            b: v for b, v in old_map.items() if int(b) not in touched
        }
        new_map.update({str(b): new_ver for b in present})
        manifest = {
            "version": (old["version"] + 1) if old else 1,
            "buckets": new_map,
            "retain": sorted(
                {f"{v}/{self._bucket_col}={b}" for b, v in old_map.items()}
            ),
        }
        fsio.write_json_atomic(
            self.spark, fsio.join(self.state_dir, self._MANIFEST), manifest
        )

        # keep-set entries are state_dir-relative posix strings
        # ("v0000001/creek_bucket=3", or "./creek_bucket=3" for the
        # legacy root layout — normalized to drop the "./")
        norm = lambda rel: posixpath.normpath(rel)  # noqa: E731
        keep = {
            norm(f"{v}/{self._bucket_col}={b}")
            for b, v in new_map.items()
        } | {norm(p) for p in manifest["retain"]}
        for root in fsio.list_names(self.spark, self.state_dir):
            rdir = fsio.join(self.state_dir, root)
            if root.startswith(self._bucket_col + "="):  # legacy root bucket
                if norm(root) not in keep:
                    fsio.delete(self.spark, rdir)
            elif root.startswith("v") and fsio.is_dir(self.spark, rdir):
                subs = fsio.list_names(self.spark, rdir)
                gone = 0
                for sub in subs:
                    if (
                        sub.startswith(self._bucket_col + "=")
                        and norm(f"{root}/{sub}") not in keep
                    ):
                        fsio.delete(self.spark, fsio.join(rdir, sub))
                        gone += 1
                if gone == len(subs):
                    fsio.delete(self.spark, rdir)

    def _state_as_wal(self, state: DataFrame) -> DataFrame:
        after_t = self.envelope_schema["after"].dataType
        before_t = self.envelope_schema["before"].dataType
        # Schema evolution (upstream ADD COLUMN): the applier's envelope
        # schema can be WIDER than the persisted state — the reference
        # publishes a new fingerprint and keeps streaming (O10), so the
        # restarted consumer replays new-schema batches onto old-schema
        # state.  Fields the stored rows don't have surface as typed
        # NULLs, exactly Postgres's ADD COLUMN semantics for
        # pre-existing rows; dropped columns fall away because only the
        # current envelope's fields are selected.
        have = set(state.columns)
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
                    (F.col(f.name) if f.name in have else F.lit(None))
                    .cast(f.dataType)
                    .alias(f.name)
                    for f in after_t.fields
                ]
            ).alias("after"),
            F.lit(None).cast("array<string>").alias("unchanged_toast"),
        )

    def apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        from creek_spark.functions.lsn import lsn_str

        batch = batch.persist()
        try:
            # Buckets this batch touches: the after-image key (upserts) AND
            # the before-image key (deletes, and the delete leg of u_pk —
            # whose old key can live in a different bucket than the new).
            b_after = F.when(
                F.col("after").isNotNull(),
                self._bucket_of([F.col(f"after.{k}") for k in self.key_cols]),
            )
            b_before = F.when(
                F.col("before").isNotNull(),
                self._bucket_of([F.col(f"before.{k}") for k in self.key_cols]),
            )
            from creek_spark.streaming.rollup import bounded_partition_values

            touched = bounded_partition_values(
                batch.select(
                    F.explode(F.array(b_after, b_before)).alias("b")
                ).where(F.col("b").isNotNull()),
                "b",
                what="CdcApplier touched buckets",
            )
            # A truncate discards every older row in EVERY bucket.
            has_trunc = batch.where(F.col("op") == "t").limit(1).count() > 0
            if has_trunc:
                touched |= set(self._state_buckets())
            if not touched:
                return

            manifest = self._read_manifest()
            # Compaction: when committed buckets are spread over too many
            # version dirs (long trickle of small batches), fold the whole
            # state into this batch's version — the inline OPTIMIZE analog
            # that bounds reader-side union width.
            if (
                manifest
                and len(set(manifest["buckets"].values())) >= self.compact_versions
            ):
                touched |= {int(b) for b in manifest["buckets"]}

            state = self.current_state()
            if state is not None and state.columns:
                subset = state.where(
                    F.col(self._bucket_col).isin(list(touched))
                ).drop(self._bucket_col)
                sw = self._state_as_wal(subset)
                wal_in = sw.unionByName(batch.select(*sw.columns))
            else:
                wal_in = batch
            # per-key max LSN — stored with the state so existing rows
            # re-enter the next batch's merge at their true stream position
            lsn_per_key = (
                wal_in.withColumn("_l", lsn_num(F.col("source.lsn")))
                .groupBy(
                    *[
                        F.coalesce(
                            F.col(f"after.{k}"), F.col(f"before.{k}")
                        ).alias(k)
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
                .withColumn(
                    self._bucket_col,
                    self._bucket_of([F.col(k) for k in self.key_cols]),
                )
                .persist()
            )
            # Publish protocol: (1) write this batch's touched buckets
            # into a FRESH version dir (never in place — untouched
            # buckets' files stay byte-identical, asserted in tests);
            # (2) atomically swap the manifest; (3) GC superseded bucket
            # dirs with one generation of retention.  A crash between (1)
            # and (2) leaves an orphan dir the next publish GCs; readers
            # are consistent at every step.
            new_ver = f"v{(manifest['version'] + 1) if manifest else 1:09d}"
            (
                new_state.write.mode("overwrite")
                .partitionBy(self._bucket_col)
                .parquet(fsio.join(self.state_dir, new_ver))
            )
            # Buckets whose last key was deleted produce zero rows —
            # they simply drop out of the manifest mapping.
            present = bounded_partition_values(
                new_state, self._bucket_col, what="CdcApplier state buckets"
            )
            self._publish(manifest, new_ver, present, touched)
            new_state.unpersist()
        finally:
            batch.unpersist()

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
