"""Skew mitigation: salted aggregation and salted joins.

AQE's skew-join splitting (spark.sql.adaptive.skewJoin) handles most
cases at runtime; these operators are the explicit fallback for the two
shapes AQE can't fix:

  * a hash aggregation whose hot key overwhelms one reducer — salting
    splits each key into ``n_salts`` sub-groups that combine map-side,
    then a second (tiny) aggregation merges the sub-results;
  * a shuffle join against a small-but-not-broadcastable build side with
    a hot probe key — the build side is replicated once per salt so the
    hot key's rows spread over ``n_salts`` reducers.

Salts are deterministic (hash of a row-unique column, not rand()) so
results are reproducible and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (partial_agg, final_merge) pairs per supported algebraic aggregate
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(F.lit(1)), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    *,
    salt_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation with a deterministic salt.

    ``aggs`` is a list of (column, kind, alias) with kind in
    sum/count/min/max (the algebraic aggregates that merge losslessly).
    ``salt_col`` must be row-unique-ish (an id) — the salt is
    ``pmod(xxhash64(salt_col), n_salts)``, so re-runs produce identical
    partitioning (no rand()).

    Phase 1 groups by (keys, salt): the hot key's rows now hash to
    ``n_salts`` different reducers.  Phase 2 groups the ≤ |keys|×n_salts
    partial rows by keys alone — negligible at any scale."""
    salt = F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salts)).alias("_salt")
    partial = df.groupBy(*keys, salt).agg(
        *[
            _ALGEBRAIC[kind][0](col).alias(f"_p_{alias}")
            for col, kind, alias in aggs
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _ALGEBRAIC[kind][1](f"_p_{alias}").alias(alias)
            for _, kind, alias in aggs
        ]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    *,
    salt_col: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    For when the small side exceeds the broadcast threshold but a probe
    key is hot: each big row gets a deterministic salt from its own
    ``salt_col``; the small side is exploded ``n_salts``× with every salt
    value, so the join key becomes (on, salt) and the hot key's rows
    spread across ``n_salts`` reducers instead of one.

    Cost: small side shuffles n_salts× its size — worth it only when one
    reducer is the bottleneck.  ``how`` supports inner/left (the salted
    key never loses matches: every (key, salt) pair exists on the small
    side)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    b = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salts))
    )
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    return b.join(s, [on, "_salt"], how).drop("_salt")
