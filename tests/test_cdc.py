"""CDC apply correctness — the engine's analog of the reference's
integration suite (listen_test.go: TestInsert/TestUpdate/TestDelete +
truncate/dedup/ordering semantics from replication.go)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from creek_spark.functions.lsn import lsn_num, lsn_str
from creek_spark.operators.cdc import changelog_stats, latest_state, wal_from
from tests.fixtures import OTHER_EXPECTED, other_wal_df


@pytest.fixture(scope="module")
def wal(spark):
    df = other_wal_df(spark)
    df.cache().count()
    return df


def state_dict(df):
    return {r["id"]: r["data"] for r in df.collect()}


def test_latest_state_full_semantics(spark, wal):
    """insert/update/u_pk/delete/truncate/dup/ooo/TOAST in one stream."""
    out = latest_state(wal)
    assert state_dict(out) == OTHER_EXPECTED


def test_latest_state_without_toast_handling(spark, wal):
    out = latest_state(wal, handle_toast=False)
    d = state_dict(out)
    # without carry-forward the unchanged-TOAST column collapses to NULL
    assert d[5] is None
    assert d[1] == "one-v3"


def test_wal_from_resume(spark, wal):
    """StreamWALFrom semantics (client.go:227-294): strictly-after LSN."""
    resumed = wal_from(wal, lsn="0/8")
    lsns = [r[0] for r in resumed.select(lsn_num("source.lsn")).collect()]
    assert min(lsns) == 9
    # resuming mid-stream then applying still converges for keys touched after
    out = latest_state(resumed)
    d = state_dict(out)
    assert d[1] == "one-v3" and d[30] == "three-moved"


def test_lsn_roundtrip(spark):
    df = spark.range(1).select(
        F.lit("1A/2B3C4D5E").alias("lsn")
    )
    n = df.select(lsn_num("lsn").alias("n"))
    val = n.collect()[0]["n"]
    assert val == (0x1A << 32) + 0x2B3C4D5E
    back = n.select(lsn_str(F.col("n")).alias("s")).collect()[0]["s"]
    assert back == "1A/2B3C4D5E"


def test_changelog_stats(spark, wal):
    stats = {(r["op"]): r["n"] for r in changelog_stats(wal).collect()}
    assert stats["c"] == 8
    assert stats["d"] == 2  # includes the duplicate delivery
    assert stats["t"] == 1
    assert stats["u_pk"] == 1


def test_latest_state_is_parallelism_invariant(spark, wal):
    """Per-key LSN ordering must survive any partitioning (SURVEY.md §4
    constraint #1)."""
    shuffled = wal.repartition(7)
    assert state_dict(latest_state(shuffled)) == OTHER_EXPECTED
    single = wal.coalesce(1)
    assert state_dict(latest_state(single)) == OTHER_EXPECTED
