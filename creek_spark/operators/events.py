"""Event-stream analytics operators: ordered funnels and retention
cohorts — the product-analytics queries a CDC-fed events table serves
once materialized (the reference delivers the stream only; rollups are
consumer work, as with the time-series family in the catalog).

Determinism: step qualification uses a strict total order
(ts, event_id) via a 1-PRECEDING window frame; cohort offsets are exact
integer divisions of epoch microseconds — every output is an integer
count, so SQL oracles match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

WEEK_US = 7 * 24 * 3600 * 1_000_000


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """Ordered-funnel conversion: (step, event_type, n_users).

    A user completes step i when an event of ``steps[i]`` occurs
    STRICTLY after some completion of step i-1 (total order
    ``order_cols``; the running step-(i-1) earliest-completion time is a
    window min over ROWS UNBOUNDED PRECEDING .. 1 PRECEDING, so
    same-instant events can't satisfy each other).

    Scale: all window passes share one (user) partitioning and one sort
    — a single shuffle of the event stream — followed by a per-user agg
    that reuses the same partitioning, then a 1-row global agg exploded
    into the per-step summary.  No joins, no second scan."""
    w = (
        Window.partitionBy(user_col)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    df = events.select(user_col, ts_col, type_col, *order_cols[1:])
    quals = []
    for i, s in enumerate(steps):
        q = F.col(type_col) == s
        if i > 0:
            q = q & F.col(f"_r{i - 1}").isNotNull()
        df = df.withColumn(f"_q{i}", q)
        quals.append(f"_q{i}")
        if i < len(steps) - 1:
            df = df.withColumn(
                f"_r{i}",
                F.min(F.when(F.col(f"_q{i}"), F.col(ts_col))).over(w),
            )
    per_user = df.groupBy(user_col).agg(
        *[
            F.max(F.when(F.col(q), 1).otherwise(0)).alias(f"_s{i}")
            for i, q in enumerate(quals)
        ]
    )
    totals = per_user.agg(
        *[F.sum(f"_s{i}").alias(f"_n{i}") for i in range(len(steps))]
    )
    out = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i + 1).alias("step"),
                    F.lit(s).alias("event_type"),
                    F.col(f"_n{i}").cast("bigint").alias("n_users"),
                )
                for i, s in enumerate(steps)
            ]
        )
    ).alias("x")
    return totals.select(out).select("x.step", "x.event_type", "x.n_users")


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly retention triangle: (cohort_week, week_offset, n_users) —
    distinct users from each first-activity cohort who were active
    ``week_offset`` weeks later.

    Scale: first-activity and weekly-activity both aggregate on the user
    key (one shuffle, near-uniform); the join re-uses that partitioning;
    the final (cohort, offset) agg is triangle-sized.  Offsets are exact
    integer divisions of epoch-microsecond differences."""
    wk = F.date_trunc("week", F.col(ts_col))
    firsts = events.groupBy(user_col).agg(
        F.min(wk).alias("_cohort")
    )
    active = events.select(
        F.col(user_col), wk.alias("_week")
    ).distinct()
    j = active.join(firsts, user_col)
    offset = F.expr(
        f"(unix_micros(_week) - unix_micros(_cohort)) div {WEEK_US}"
    )
    return (
        j.groupBy(
            F.col("_cohort").alias("cohort_week"),
            offset.cast("int").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )
