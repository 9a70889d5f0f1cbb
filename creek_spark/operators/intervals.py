"""Interval-overlap join — the time-interval analog of the as-of join
(operators/asof.py), for joining two sets of [lo, hi] spans that overlap.

Spark has no native interval join (Flink's `intervalJoin` / range-join
hints in Databricks runtime are the comparables); the classic distributed
strategy is CELL BUCKETING: each interval is replicated to every
fixed-width time cell it touches, the join runs as an EQUI join on
(keys…, cell) with the overlap predicate as a residual filter, and each
qualifying pair is emitted exactly once by keeping only the FIRST cell
the two intervals share — no dedup shuffle.  Work is bounded by
cells-per-interval × per-cell density instead of |left| × |right|.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cells(lo: Column, hi: Column, cell_seconds: int) -> Column:
    # python-side product, emitted as a LONG literal (an int32 literal
    # would overflow under ANSI mode for cells ≥ ~36 min)
    us = F.lit(cell_seconds * 1_000_000).cast("bigint")
    return F.sequence(
        F.floor(F.unix_micros(lo) / us), F.floor(F.unix_micros(hi) / us)
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    *,
    left_bounds: tuple[str, str],
    right_bounds: tuple[str, str],
    cell_seconds: int = 21600,
) -> DataFrame:
    """Inner join of overlapping intervals: rows pair when they share a
    key AND ``l_lo <= r_hi AND r_lo <= l_hi`` (closed intervals).

    Each side explodes to the cells its interval touches; the equi join
    on (on…, cell) makes it a hash/sort-merge join, never a nested-loop
    over the key group.  The ``first shared cell`` condition
    (cell == max(cell_of(l_lo), cell_of(r_lo))) emits each pair exactly
    once without a distinct.  Pick ``cell_seconds`` ≈ the typical
    interval length: too small replicates intervals across many cells,
    too large degrades toward per-key nested loops.

    Timestamps are compared at Spark/parquet µs precision — identical in
    any SQL oracle over the same data.
    """
    llo, lhi = left_bounds
    rlo, rhi = right_bounds
    dup = set(left.columns) & set(right.columns) - set(on)
    if dup:
        raise ValueError(f"ambiguous non-key columns on both sides: {sorted(dup)}")
    l2 = left.withColumn(
        "_cell", F.explode(_cells(F.col(llo), F.col(lhi), cell_seconds))
    )
    r2 = right.withColumn(
        "_cell", F.explode(_cells(F.col(rlo), F.col(rhi), cell_seconds))
    )
    cell_us = F.lit(cell_seconds * 1_000_000).cast("bigint")
    first_shared = F.greatest(
        F.floor(F.unix_micros(F.col(llo)) / cell_us),
        F.floor(F.unix_micros(F.col(rlo)) / cell_us),
    )
    return (
        l2.join(r2, [*on, "_cell"])
        .where(
            (F.col(llo) <= F.col(rhi))
            & (F.col(rlo) <= F.col(lhi))
            & (F.col("_cell") == first_shared)
        )
        .drop("_cell")
    )
