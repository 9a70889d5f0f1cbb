"""Salted aggregation/join must be bit-equal to their unsalted forms —
the whole point is changing the partitioning without changing the
answer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from creek_spark.operators.skew import salted_aggregate, salted_join
from creek_spark.sources import read_table
from tests.conftest import SF_DIR


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_aggregate_matches_plain(spark):
    li = read_table(spark, SF_DIR, "lineitem")
    plain = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("sq"),
        F.count(F.lit(1)).alias("n"),
        F.min("l_extendedprice").alias("mn"),
        F.max("l_extendedprice").alias("mx"),
    )
    salted = salted_aggregate(
        li,
        ["l_returnflag"],
        [
            ("l_quantity", "sum", "sq"),
            ("l_quantity", "count", "n"),
            ("l_extendedprice", "min", "mn"),
            ("l_extendedprice", "max", "mx"),
        ],
        salt_col="l_orderkey",
        n_salts=8,
    )
    assert _sorted_rows(salted.select(*plain.columns)) == _sorted_rows(plain)


def test_salted_aggregate_spreads_hot_key(spark):
    li = read_table(spark, SF_DIR, "lineitem")
    salt = F.pmod(F.xxhash64(F.col("l_orderkey")), F.lit(8))
    # the phase-1 group count per key must be > 1: the hot key really is split
    n_partials = (
        li.groupBy("l_returnflag", salt.alias("s"))
        .count()
        .groupBy("l_returnflag")
        .count()
        .agg(F.min("count"))
        .collect()[0][0]
    )
    assert n_partials == 8


def test_salted_join_matches_plain_inner(spark):
    li = read_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity", "l_linenumber"
    )
    o = read_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    plain = li.join(o, "l_orderkey")
    salted = salted_join(li, o, "l_orderkey", salt_col="l_linenumber", n_salts=4)
    assert _sorted_rows(salted.select(*plain.columns)) == _sorted_rows(plain)


def test_salted_join_matches_plain_left(spark):
    # left join keeps unmatched big-side rows (orders with no lineitem here:
    # synthesize by filtering the small side)
    li = read_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_linenumber"
    )
    o_half = read_table(spark, SF_DIR, "orders").where(
        F.col("o_orderkey") % 2 == 0
    ).select(F.col("o_orderkey").alias("l_orderkey"), "o_totalprice")
    plain = li.join(o_half, "l_orderkey", "left")
    salted = salted_join(
        li, o_half, "l_orderkey", salt_col="l_linenumber", n_salts=4, how="left"
    )
    assert _sorted_rows(salted.select(*plain.columns)) == _sorted_rows(plain)


def test_salted_join_rejects_outer(spark):
    li = read_table(spark, SF_DIR, "lineitem")
    o = read_table(spark, SF_DIR, "orders")
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(li, o, "l_orderkey", salt_col="l_linenumber", how="full")
