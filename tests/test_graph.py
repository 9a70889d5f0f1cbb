"""Graph operator semantics: BFS frontier dedup, hop minimality,
PageRank integer fixed-point behavior (dangling nodes, sinks).

Oracle parity at sf0.001/sf0.01 is covered by test_oracle_parity via the
catalog rows; these tests pin the hand-checkable small-graph semantics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from creek_spark.operators.graph import (
    event_transitions,
    k_hop_reachability,
    pagerank,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_reachability_min_hops_on_chain(spark):
    # a -> b -> c -> d: min_hops must be the shortest path, and the
    # k bound must cut off pairs beyond it
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    got = {
        (r.src, r.dst): r.min_hops
        for r in k_hop_reachability(e, k=2).collect()
    }
    assert got == {
        ("a", "b"): 1,
        ("b", "c"): 1,
        ("c", "d"): 1,
        ("a", "c"): 2,
        ("b", "d"): 2,
    }


def test_reachability_cycle_terminates_and_prefers_short_path(spark):
    # cycle a->b->a plus shortcut a->c and long way a->b->c
    e = _edges(spark, [("a", "b"), ("b", "a"), ("a", "c"), ("b", "c")])
    got = {
        (r.src, r.dst): r.min_hops
        for r in k_hop_reachability(e, k=3).collect()
    }
    assert got[("a", "c")] == 1  # direct edge wins over a->b->c
    assert got[("a", "a")] == 2  # via the cycle
    assert got[("b", "b")] == 2


def test_pagerank_sink_accumulates_more_than_source(spark):
    # a -> c, b -> c: c receives mass, a/b only keep the base share
    e = _edges(spark, [("a", "c"), ("b", "c")])
    ranks = {r.node: r.pagerank_scaled for r in pagerank(e, iters=3).collect()}
    assert ranks["c"] > ranks["a"] == ranks["b"]
    # sources get exactly the base share after iteration 1 (no in-edges)
    assert ranks["a"] == 150_000_000_000


def test_pagerank_deterministic_integer_values(spark):
    # two-node cycle: symmetric, exact fixed-point values are stable
    e = _edges(spark, [("a", "b"), ("b", "a")])
    r1 = {r.node: r.pagerank_scaled for r in pagerank(e, iters=3).collect()}
    r2 = {r.node: r.pagerank_scaled for r in pagerank(e, iters=3).collect()}
    assert r1 == r2
    assert r1["a"] == r1["b"]


def test_event_transitions_orders_within_user(spark):
    rows = [
        (1, 10, "x"),
        (1, 20, "y"),
        (2, 10, "y"),
        (2, 20, "x"),
        (2, 30, "y"),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, event_type string"
    ).withColumn("ts", F.to_timestamp(F.lit("2026-01-01")))
    got = {
        (r.src, r.dst): r.n_transitions
        for r in event_transitions(df, order_cols=("ts", "event_id")).collect()
    }
    assert got == {("x", "y"): 2, ("y", "x"): 1}
