"""Mergeable-sketch rollups: incremental distinct counts over time.

The hypertable-rollup pattern for 100 TB event streams: instead of
re-scanning raw events for every "distinct users in [t1, t2]" question,
maintain per-bucket HLL SKETCHES (Spark 3.5+ Datasketches binary
representation — `hll_sketch_agg`).  Sketches are MERGEABLE: any set of
buckets unions in O(sketch size), so a range estimate reads only the
rollup rows, never the raw data, and new buckets append incrementally
(e.g. from a foreachBatch sink).

Error is the standard HLL bound (~1.6% at lgConfigK=12 default); exact
re-computation stays available from raw data when it matters.  Unlike
`approx_count_distinct` (which collapses straight to a number), the
sketch column composes: daily → monthly → arbitrary ranges, and unions
across tables/sources.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sketch_rollup(
    df: DataFrame,
    value_col: str,
    *,
    time_col: str = "ts",
    bucket: str = "day",
    group_cols: list[str] | None = None,
    lgk: int = 12,
) -> DataFrame:
    """Aggregate raw rows into per-bucket (+ optional group) HLL sketches:
    (bucket_start, *group_cols, sketch binary, n_rows).

    One partial-aggregated shuffle over the raw data — the only time the
    raw data is ever touched.  Persist the result as the rollup table;
    append new buckets per micro-batch/partition-load."""
    bstart = F.date_trunc(bucket, F.col(time_col)).alias("bucket_start")
    groups = [bstart] + [F.col(c) for c in (group_cols or [])]
    return df.groupBy(*groups).agg(
        F.hll_sketch_agg(F.col(value_col).cast("string"), F.lit(lgk)).alias(
            "sketch"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )


def estimate_range(
    rollup: DataFrame,
    start,
    end,
    *,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Distinct-count estimate for bucket_start ∈ [start, end) from the
    rollup alone: filter buckets (partition-prunable on a bucket-
    partitioned rollup table), union sketches, estimate.  Never reads
    raw data.

    The range filters on BUCKET-START boundaries — pass bucket-aligned
    bounds (a half-covered bucket can only be refined from raw data or a
    finer rollup tier)."""
    in_range = rollup.where(
        (F.col("bucket_start") >= F.lit(start))
        & (F.col("bucket_start") < F.lit(end))
    )
    if group_cols:
        return in_range.groupBy(*group_cols).agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(
                "approx_distinct"
            ),
            F.sum("n_rows").alias("n_rows"),
        )
    return in_range.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_distinct"),
        F.sum("n_rows").alias("n_rows"),
    )


def merge_rollups(fine: DataFrame, bucket: str = "month") -> DataFrame:
    """Coarsen a rollup (daily → monthly …) by unioning sketches — the
    tiered-retention path: keep fine buckets hot, merged buckets cold.
    Group columns (everything that isn't bucket_start/sketch/n_rows)
    are preserved."""
    group_cols = [
        c for c in fine.columns if c not in ("bucket_start", "sketch", "n_rows")
    ]
    coarse = F.date_trunc(bucket, F.col("bucket_start")).alias("bucket_start")
    return fine.groupBy(coarse, *[F.col(c) for c in group_cols]).agg(
        F.hll_union_agg("sketch").alias("sketch"),
        F.sum("n_rows").alias("n_rows"),
    )


def histogram_sketch(
    df: DataFrame,
    value_col: str,
    *,
    bin_width: float = 5.0,
    time_col: str = "ts",
    bucket: str = "hour",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Fixed-width histogram sketch per (group, time-bucket) tier —
    the mergeable quantile counterpart of the HLL rollup above.  A
    histogram is the simplest sketch whose merge is EXACT (bin counts
    add), so unlike t-digest/KLL the rollup math is deterministic and
    oracle-checkable while keeping the same scale shape: per-bucket
    sketch rows are tiny, range/yearly quantile queries read only the
    rollup, and new buckets append incrementally from a stream sink.

    Bin id = floor(value / bin_width) (one IEEE division + floor, both
    engines identical).  Output: group_cols + (bucket_start, bin, n).
    """
    group_cols = group_cols or []
    bin_id = F.floor(F.col(value_col).cast("double") / F.lit(bin_width)).cast(
        "bigint"
    )
    return (
        df.groupBy(
            F.date_trunc(bucket, F.col(time_col)).alias("bucket_start"),
            *[F.col(c) for c in group_cols],
            bin_id.alias("bin"),
        ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def histogram_quantiles(
    hist: DataFrame,
    quantiles: list[float],
    *,
    bin_width: float = 5.0,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Merge histogram-sketch tiers across time and answer quantile
    queries from the merged counts alone (never the raw data).

    The q-quantile estimate is the LOWER EDGE (bin * bin_width) of the
    first bin whose cumulative count reaches ceil(q * total) — exact
    bin selection over exact integer counts, so the rollup answer is
    deterministic.  One shuffle of bin-count rows (tiny); the cumulative
    scan is a per-group window over |bins| rows.
    """
    group_cols = group_cols or []
    merged = hist.groupBy(*[F.col(c) for c in group_cols], "bin").agg(
        F.sum("n").cast("bigint").alias("n")
    )
    from pyspark.sql import Window

    from creek_spark.operators.distributed import const_partition

    # ungrouped rollups walk the bounded bin summary with a constant
    # partition key (see const_partition: keeps the WindowExec warning
    # class meaning "real unbounded global window")
    wpart = group_cols or [const_partition("bin")]
    wcum = (
        Window.partitionBy(*wpart)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy(*wpart)
    cum = merged.select(
        *group_cols,
        "bin",
        F.sum("n").over(wcum).alias("_cum"),
        F.sum("n").over(wtot).alias("_total"),
    )
    aggs = [F.max("_total").cast("bigint").alias("n_total")]
    for q in quantiles:
        rank = F.ceil(F.lit(q) * F.col("_total").cast("double")).cast("bigint")
        aggs.append(
            F.min(F.when(F.col("_cum") >= rank, F.col("bin"))).alias(
                f"_b{int(q * 100)}"
            )
        )
    out = cum.groupBy(*group_cols).agg(*aggs)
    for q in quantiles:
        name = f"p{int(q * 100)}_est"
        out = out.withColumn(
            name,
            F.col(f"_b{int(q * 100)}").cast("double") * F.lit(bin_width),
        ).drop(f"_b{int(q * 100)}")
    return out


def _cms_bucket(col, j: int, width: int):
    """Row-j count-min bucket for a string value: first 8 md5 hex chars
    of 'j:value' as an integer, mod width — exact integer arithmetic,
    reproducible in ANSI SQL (DuckDB: CAST('0x'||substr(md5(..),1,8) AS
    BIGINT) % width)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{j}:"), col)), 1, 8), 16, 10
    ).cast("long")
    return (h % F.lit(width)).cast("int")


def cms_build(
    df: DataFrame,
    value_col: str,
    *,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Count-min sketch of a (string) value stream: (row, bucket, cnt),
    ≤ depth·width rows total — the fixed-size frequency summary that
    answers "how often did X occur?" without storing the stream.

    Mergeable by cell addition (sum cnt on (row, bucket)), so sketches
    compose across batches/partitions losslessly — and plug straight
    into the streaming AdditiveRollupSink.  The build is one posexplode
    (depth rows per value) + one hash agg; map-side combine collapses
    each task to ≤ depth·width rows before the exchange, so shuffle
    volume is sketch-sized, never stream-sized."""
    v = F.col(value_col).cast("string")
    buckets = F.array(*[_cms_bucket(v, j, width) for j in range(depth)])
    return (
        df.select(F.posexplode(buckets).alias("row", "bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Lossless sketch union: cell-wise addition."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(
        F.sum("cnt").cast("bigint").alias("cnt")
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    probe_col: str,
    *,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Point estimates for probe values: est = min over rows of the
    probed cell (0 for an absent cell).  Guarantees est ≥ true count;
    the overestimate is collision mass bounded by stream_len/width per
    row.  The sketch side is ≤ depth·width rows — broadcast it; probing
    costs one broadcast join however large the probe set."""
    v = F.col(probe_col).cast("string")
    buckets = F.array(*[_cms_bucket(v, j, width) for j in range(depth)])
    probed = probes.select(
        F.col(probe_col), F.posexplode(buckets).alias("row", "bucket")
    )
    return (
        probed.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(probe_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("bigint").alias("est_count"))
    )


# ---------------------------------------------------------------- Bloom

BLOOM_M = 8192
BLOOM_K = 3


def _bloom_pos(name_col: Column, i: Column, m: int) -> Column:
    """k-th Bloom bit position: first 8 hex chars of md5(name '#' k)
    mod m — deterministic and identical in DuckDB SQL
    (``CAST('0x'||hex AS BIGINT)`` ≡ ``F.conv(hex, 16, 10)``)."""
    h = F.md5(F.concat(name_col, F.lit("#"), i.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % m


def _ks(k: int):
    return F.explode(F.array([F.lit(i) for i in range(1, k + 1)])).alias("i")


def bloom_bits(
    df: DataFrame, col: str, *, m: int = BLOOM_M, k: int = BLOOM_K
) -> DataFrame:
    """The filter itself: the distinct set bit positions (≤ m rows
    however large the input — broadcastable at any corpus size, and a
    mergeable sketch: bits of a union = union of bits, so micro-batch
    bit sets maintain the stream's filter exactly)."""
    return (
        df.select(F.col(col).alias("_n"), _ks(k))
        .select(_bloom_pos(F.col("_n"), F.col("i"), m).alias("pos"))
        .distinct()
    )


def bloom_probe(
    bits: DataFrame,
    probes: DataFrame,
    col: str,
    *,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """Per-probe matched-position count: all k bits set ⇔ nhit == k —
    the membership verdict (no false negatives by construction).  Joins
    on the bit position; the bits side is ≤ m rows."""
    pp = probes.select("*", _ks(k)).select(
        *[F.col(c) for c in probes.columns],
        _bloom_pos(F.col(col), F.col("i"), m).alias("pos"),
    )
    return (
        pp.join(bits.withColumn("_hit", F.lit(1)), "pos", "left")
        .groupBy(*[F.col(c) for c in probes.columns])
        .agg(F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("nhit"))
    )
