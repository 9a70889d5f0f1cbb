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
