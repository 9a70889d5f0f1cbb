"""Table profiler: one-pass column stats (operators/profile.py).

The oracle-parity entry `table_profile` proves exact cross-engine
values; these tests cover what the oracle can't — the approx
(HyperLogLog++) scale path, complex-typed columns, and the one-job
plan shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from creek_spark.operators.profile import profile_columns


def _rows(df):
    return {r["col"]: r.asDict() for r in df.collect()}


def test_exact_stats_small(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None), (2, None, 2.5)],
        "id int, s string, v double",
    )
    prof = _rows(profile_columns(df))
    assert set(prof) == {"id", "s", "v"}
    assert all(r["n_rows"] == 3 for r in prof.values())
    assert prof["id"]["n_distinct"] == 2 and prof["id"]["n_null"] == 0
    assert prof["id"]["min_num"] == 1.0 and prof["id"]["max_num"] == 2.0
    assert prof["s"]["n_null"] == 1
    assert prof["s"]["min_str"] == "a" and prof["s"]["max_str"] == "b"
    assert prof["s"]["min_num"] is None
    assert prof["v"]["n_null"] == 1 and prof["v"]["max_num"] == 2.5


def test_complex_columns_counts_only(spark):
    df = spark.createDataFrame(
        [([1, 2], 1), ([1, 2], 2), (None, 3)], "arr array<int>, id int"
    )
    prof = _rows(profile_columns(df))
    a = prof["arr"]
    assert a["n_null"] == 1 and a["n_distinct"] == 1
    assert a["min_num"] is None and a["min_str"] is None


def test_approx_path_no_expand(spark):
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("m"), F.col("id").cast("string").alias("s")
    )
    exact = profile_columns(df)
    approx = profile_columns(df, approx=True)
    # approx path must not plan an Expand (that's its entire point)
    assert "Expand" in exact._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in approx._jdf.queryExecution().executedPlan().toString()
    got = _rows(approx)
    # HLL++ at this cardinality is within a few percent
    assert abs(got["id"]["n_distinct"] - 1000) <= 50
    assert got["m"]["n_distinct"] == 7
    # non-cardinality stats identical to the exact path
    ex = _rows(exact)
    for c in ("id", "m", "s"):
        for k in ("n_rows", "n_null", "min_num", "max_num", "min_str", "max_str"):
            assert got[c][k] == ex[c][k]


def test_column_subset_order(spark):
    df = spark.createDataFrame([(1, "x")], "a int, b string")
    out = profile_columns(df, ["b"])
    assert [r["col"] for r in out.collect()] == ["b"]
