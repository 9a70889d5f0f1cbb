"""Funnel / retention semantics on hand-checkable streams.  Oracle
parity at the corpus level is covered by test_oracle_parity."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from creek_spark.operators.events import funnel, retention_cohorts


def _ev(spark, rows):
    df = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, event_type string, off int"
    )
    return df.withColumn(
        "ts",
        F.to_timestamp(F.lit("2024-01-01 00:00:00"))
        + F.make_interval(secs=F.col("off")),
    ).drop("off")


def test_funnel_requires_strict_order(spark):
    rows = [
        # user 1 completes the full funnel in order
        (1, 1, "view", 0),
        (1, 2, "click", 10),
        (1, 3, "purchase", 20),
        # user 2 clicks BEFORE viewing → click doesn't count, purchase
        # can't qualify either
        (2, 4, "click", 0),
        (2, 5, "view", 10),
        (2, 6, "purchase", 20),
        # user 3 views only
        (3, 7, "view", 0),
    ]
    got = {
        r.step: r.n_users
        for r in funnel(_ev(spark, rows), ["view", "click", "purchase"]).collect()
    }
    assert got == {1: 3, 2: 1, 3: 1}


def test_funnel_same_instant_does_not_qualify(spark):
    # click at the same (ts, later event_id) as view DOES qualify (total
    # order by event_id breaks the tie); same event can't satisfy itself
    rows = [(1, 1, "view", 0), (1, 2, "click", 0)]
    got = {
        r.step: r.n_users
        for r in funnel(_ev(spark, rows), ["view", "click"]).collect()
    }
    assert got == {1: 1, 2: 1}


def test_retention_offsets(spark):
    rows = [
        # user 1: first activity week 0, active weeks 0 and 2
        (1, 1, "view", 0),
        (1, 2, "view", 14 * 24 * 3600),
        # user 2: only week 0
        (2, 3, "view", 0),
    ]
    got = {
        (r.cohort_week.date(), r.week_offset): r.n_users
        for r in retention_cohorts(_ev(spark, rows)).collect()
    }
    monday = dt.date(2024, 1, 1)  # 2024-01-01 is a Monday
    assert got == {(monday, 0): 2, (monday, 2): 1}
