"""Bucketed co-located joins: the write-once-shuffle-never pattern for
repeated fact-fact joins at scale.  The assertions are plan gates — the
join and aggregation over bucketed tables must show NO shuffle exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from creek_spark.plans import explain_str
from creek_spark.sources import read_table
from creek_spark.sources.bucketing import read_bucketed, write_bucketed
from tests.conftest import SF_DIR


@pytest.fixture()
def no_broadcast(spark):
    """Force shuffle-join planning so the bucketing effect is visible."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe)


def test_bucketed_join_no_shuffle(spark, no_broadcast):
    o = read_table(spark, SF_DIR, "orders")
    li = read_table(spark, SF_DIR, "lineitem")
    write_bucketed(o, "orders_b", ["o_orderkey"], 4, sort_cols=["o_orderkey"])
    write_bucketed(li, "lineitem_b", ["l_orderkey"], 4, sort_cols=["l_orderkey"])

    ob, lb = read_bucketed(spark, "orders_b"), read_bucketed(spark, "lineitem_b")
    joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey).select(
        "o_orderkey", "l_quantity"
    )
    plan = explain_str(joined, "simple")
    assert "SortMergeJoin" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan

    # same join WITHOUT bucketing shuffles both sides
    plain = o.join(li, o.o_orderkey == li.l_orderkey).select(
        "o_orderkey", "l_quantity"
    )
    plain_plan = explain_str(plain, "simple")
    assert plain_plan.count("Exchange hashpartitioning") >= 2, plain_plan

    # values identical either way
    assert joined.count() == plain.count()


def test_bucketed_agg_no_shuffle(spark):
    li = read_table(spark, SF_DIR, "lineitem")
    write_bucketed(li, "lineitem_b2", ["l_orderkey"], 4)
    agg = (
        read_bucketed(spark, "lineitem_b2")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    plan = explain_str(agg, "simple")
    assert "Exchange hashpartitioning" not in plan, plan
    assert agg.count() == li.select("l_orderkey").distinct().count()


def test_mismatched_bucket_counts_still_correct(spark, no_broadcast):
    """Different bucket counts can't use co-located reads — Spark must
    fall back to shuffling (correctness over layout)."""
    o = read_table(spark, SF_DIR, "orders")
    li = read_table(spark, SF_DIR, "lineitem")
    write_bucketed(o, "orders_b3", ["o_orderkey"], 4)
    write_bucketed(li, "lineitem_b3", ["l_orderkey"], 8)
    ob, lb = read_bucketed(spark, "orders_b3"), read_bucketed(spark, "lineitem_b3")
    joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey)
    # one side (the smaller bucket count) must still be exchanged
    assert joined.count() == o.join(li, o.o_orderkey == li.l_orderkey).count()
