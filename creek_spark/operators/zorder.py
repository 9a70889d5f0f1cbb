"""Z-order (Morton) layout: multi-column data skipping for parquet.

A table range-partitioned and sorted on ONE column gives file-level
min/max pruning only for that column; filters on a second column read
everything.  Interleaving the bits of several columns' ranks into one
Z-VALUE and laying files out by it makes every participating column's
min/max ranges narrow per file — parquet footer stats then prune files
for filters on ANY of the columns (the technique Delta/Iceberg expose as
OPTIMIZE ZORDER BY; here it is plain Spark expressions + a range
repartition, usable on vanilla parquet).

Everything is JVM bit arithmetic in whole-stage codegen: per-column
min/max (one tiny agg, broadcast) → scale to a `bits`-wide integer rank
→ interleave → repartitionByRange(z) + sortWithinPartitions(z).  The
write shuffles once — the same cost as any clustered write."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _rank_expr(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Scale col into [0, 2^bits) using broadcast min/max — rank 0 when
    the column is constant (max == min)."""
    span = (cmax.cast("double") - cmin.cast("double"))
    scaled = F.when(
        span > 0,
        ((col.cast("double") - cmin.cast("double")) / span)
        * F.lit((1 << bits) - 1),
    ).otherwise(F.lit(0.0))
    return F.least(
        F.greatest(F.round(scaled).cast("long"), F.lit(0)),
        F.lit((1 << bits) - 1),
    )


def zvalue(df: DataFrame, cols: list[str], *, bits: int = 16) -> DataFrame:
    """Add a `_z` column: the Morton interleave of the ranks of ``cols``
    (first column gets the higher bit at each level).  bits × len(cols)
    must fit a long (≤ 63)."""
    if bits * len(cols) > 63:
        raise ValueError("bits * len(cols) must be <= 63")
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_min_{c}"), F.max(c).alias(f"_max_{c}")]
    stats = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(stats))
    ranks = [
        _rank_expr(
            F.col(c), F.col(f"_min_{c}"), F.col(f"_max_{c}"), bits
        )
        for c in cols
    ]
    n = len(cols)
    terms = []
    for i in range(bits):
        for j, r in enumerate(ranks):
            bit = F.shiftright(r, i).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, i * n + (n - 1 - j)))
    z = reduce(lambda a, b: a.bitwiseOR(b), terms)
    return out.withColumn("_z", z).drop(
        *[f"_min_{c}" for c in cols], *[f"_max_{c}" for c in cols]
    )


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    n_files: int = 16,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write df as parquet clustered by the Z-value of ``cols``:
    repartitionByRange(n_files, _z) + sortWithinPartitions(_z) → every
    file covers a compact Z-range, so its footer min/max is narrow in
    EVERY participating column."""
    zdf = zvalue(df, cols, bits=bits)
    (
        zdf.repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
