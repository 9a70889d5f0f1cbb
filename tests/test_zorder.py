"""Z-order layout: the measurable claim is DATA SKIPPING — for a point
filter on EITHER participating column, fewer parquet files' footer
[min, max] ranges overlap the value under Z-order than under a linear
single-column sort."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from creek_spark.operators.zorder import zorder_write, zvalue
from creek_spark.sources import read_table
from tests.conftest import SF_DIR


def _files_overlapping(path: str, col: str, value) -> int:
    """Count files whose footer stats admit `col == value`."""
    n = 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        if lo <= value <= hi:
            n += 1
    return n


def test_zvalue_interleaves_and_bounds(spark):
    df = spark.range(0, 1024).select(
        F.col("id").alias("a"), (1023 - F.col("id")).alias("b")
    )
    z = zvalue(df, ["a", "b"], bits=10)
    rows = z.select("a", "b", "_z").collect()
    assert len(rows) == 1024
    assert all(0 <= r["_z"] < (1 << 20) for r in rows)
    # corners: (min, max) ranks interleave to alternating bit patterns
    byab = {(r["a"], r["b"]): r["_z"] for r in rows}
    assert byab[(0, 1023)] == int("01" * 10, 2)   # a rank 0, b rank max
    assert byab[(1023, 0)] == int("10" * 10, 2)   # a rank max, b rank 0
    with pytest.raises(ValueError):
        zvalue(df, ["a", "b", "a", "b"], bits=16)


def test_zorder_skips_on_both_columns(spark, tmp_path):
    o = read_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    linear = str(tmp_path / "linear")
    zpath = str(tmp_path / "zorder")
    # linear layout: clustered on orderkey only
    (
        o.repartitionByRange(8, "o_orderkey")
        .sortWithinPartitions("o_orderkey")
        .write.mode("overwrite")
        .parquet(linear)
    )
    zorder_write(o, zpath, ["o_orderkey", "o_custkey"], n_files=8)

    probe = o.select("o_orderkey", "o_custkey").limit(1).collect()[0]
    # column 1: both layouts should skip well
    lin_a = _files_overlapping(linear, "o_orderkey", probe["o_orderkey"])
    z_a = _files_overlapping(zpath, "o_orderkey", probe["o_orderkey"])
    # column 2: linear layout cannot skip at all; z-order must
    lin_b = _files_overlapping(linear, "o_custkey", probe["o_custkey"])
    z_b = _files_overlapping(zpath, "o_custkey", probe["o_custkey"])
    n_lin = len(glob.glob(linear + "/*.parquet"))
    assert lin_b == n_lin  # every file admits the custkey: no skipping
    assert z_b < lin_b, (z_b, lin_b)  # z-order prunes on the second column
    assert z_a <= n_lin  # and stays reasonable on the first
    # correctness: same rows either way
    assert (
        spark.read.parquet(zpath).count()
        == spark.read.parquet(linear).count()
        == o.count()
    )
