"""As-of join — for each left row, the most recent right row at or before it.

Spark has no built-in as-of join.  The scalable formulation here is the
union + last(ignoreNulls) window trick — zero Python, ONE shuffle on
(key, time), no per-key state, no rejoin:

    left(k, t, ...cols as struct)  ∪  right(k, t, payload struct)
    → last(payload, ignoreNulls) over (partition by k order by t, side)
    → keep left rows, unpack structs

This beats `applyInPandas` per key by a wide margin at scale: it's pure
whole-stage-codegen and partitions by key like any other window.  Skewed
keys are handled by AQE; for a pathological single hot key, pre-salt on a
time bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    value_cols: list[str] | None = None,
    *,
    direction: str = "backward",
    allow_exact_matches: bool = True,
    tolerance: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join.  ``direction='backward'`` matches the latest right
    row with right_time <= left_time (strict < when
    allow_exact_matches=False); 'forward' matches the earliest right row
    at/after.  ``tolerance`` (an INTERVAL string like ``'2 hours'``)
    rejects matches staler than the bound — the match columns come back
    null, exactly like no-match.

    Returns all left columns plus ``<right_time>{suffix}`` and
    ``<value>{suffix}`` for each right value column (null when no match).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    value_cols = value_cols or [
        c for c in right.columns if c not in on and c != right_time
    ]

    payload_t = F.struct(
        F.col(right_time).alias("_t"), *[F.col(c) for c in value_cols]
    )
    r = right.select(
        *on,
        F.col(right_time).alias("_evt_time"),
        F.lit(0).alias("_side"),
        payload_t.alias("_payload"),
    )
    left_struct = F.struct(*[F.col(c) for c in left.columns])
    l = left.select(
        *on,
        F.col(left_time).alias("_evt_time"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        left_struct.alias("_left"),
    )
    r = r.withColumn("_left", F.lit(None).cast(l.schema["_left"].dataType))
    unioned = r.unionByName(l)

    # On equal times the right row must sort before the left row iff exact
    # matches count (backward); mirrored for forward.
    side_order = (
        F.col("_side").asc() if allow_exact_matches else F.col("_side").desc()
    )
    time_order = (
        F.col("_evt_time").asc()
        if direction == "backward"
        else F.col("_evt_time").desc()
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(time_order, side_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = unioned.withColumn(
        "_m", F.last("_payload", ignorenulls=True).over(w)
    )

    out = matched.filter(F.col("_side") == 1)
    if tolerance is not None:
        # staleness bound: null the whole payload when the matched row is
        # further than `tolerance` from the left time (cheap column
        # expression — no extra shuffle)
        mt = F.col("_m").getField("_t")
        lt = F.col("_evt_time")
        in_bound = (
            mt >= lt - F.expr(f"INTERVAL {tolerance}")
            if direction == "backward"
            else mt <= lt + F.expr(f"INTERVAL {tolerance}")
        )
        out = out.withColumn(
            "_m", F.when(in_bound, F.col("_m"))  # else null
        )
    return out.select(
        *[F.col("_left").getField(c).alias(c) for c in left.columns],
        F.col("_m").getField("_t").alias(f"{right_time}{suffix}"),
        *[F.col("_m").getField(c).alias(f"{c}{suffix}") for c in value_cols],
    )
