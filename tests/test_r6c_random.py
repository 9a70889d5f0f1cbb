"""Randomized differential tests for the part-10 cores on SYNTHETIC
inputs — the fixed driver data can't exercise degree ties, dense tie
plateaus, or adversarial dominance chains, so these generate them
(seeded numpy; one Spark pass per seed)."""

from __future__ import annotations

import itertools

import numpy as np
from pyspark.sql import functions as F


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in sorted(pairs)], "u long, v long"
    )


def test_triangle_counts_random_graphs(spark):
    """Degree-oriented counting == set brute force on random graphs,
    including many equal-degree (orientation-tiebreak) nodes."""
    from creek_spark.operators.graph import triangle_corner_counts

    for seed in (1, 7, 23):
        rng = np.random.RandomState(seed)
        n = 24
        pairs = {
            (a, b)
            for a in range(n)
            for b in range(a + 1, n)
            if rng.rand() < 0.25
        }
        adj = {}
        for a, b in pairs:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        from collections import Counter

        expect = Counter()
        for a, b in pairs:
            for c in adj[a] & adj[b]:
                if c > b:
                    expect[a] += 1
                    expect[b] += 1
                    expect[c] += 1
        got = {
            r["n"]: r["n_triangles"]
            for r in triangle_corner_counts(_edges_df(spark, pairs)).collect()
        }
        assert got == dict(expect), seed


def test_common_neighbors_random_graphs(spark):
    from creek_spark.operators.graph import common_neighbor_pairs

    for seed in (3, 11):
        rng = np.random.RandomState(seed)
        n = 20
        pairs = {
            (a, b)
            for a in range(n)
            for b in range(a + 1, n)
            if rng.rand() < 0.3
        }
        adj = {}
        for a, b in pairs:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        expect = {}
        for u, w in itertools.combinations(sorted(adj), 2):
            if (u, w) in pairs:
                continue
            cn = len(adj[u] & adj[w])
            if cn:
                expect[(u, w)] = (cn, cn / (len(adj[u]) + len(adj[w]) - cn))
        out = common_neighbor_pairs(
            _edges_df(spark, pairs), max_deg=10**9
        ).collect()
        got = {
            (r["part_a"], r["part_b"]): (r["common_neighbors"], r["jaccard"])
            for r in out
        }
        assert set(got) == set(expect), seed
        for k, (cn, j) in expect.items():
            assert got[k][0] == cn and abs(got[k][1] - j) < 1e-12


def test_skyline_walk_random_tie_plateaus(spark):
    """The segmented level walk == O(n²) dominance on points drawn from
    a TINY value grid (3 prices × 3 sizes per brand → massive ties and
    exact duplicates)."""
    from creek_spark.operators.cachereg import register_cache
    from creek_spark.operators.distributed import segmented_running

    for seed in (5, 17):
        rng = np.random.RandomState(seed)
        rows = []
        for i in range(120):
            rows.append(
                (
                    f"B{rng.randint(3)}",
                    i,
                    float(900 + rng.randint(3)),  # 3 price levels
                    int(rng.randint(3) * 5 + 5),  # 3 sizes
                )
            )
        df = spark.createDataFrame(
            rows, "brand string, id long, price double, size int"
        )
        p = df.select(
            "brand", "id", "size", F.col("price").cast("decimal(12,2)").alias("pr")
        )
        lvl = p.groupBy("brand", "pr").agg(F.max("size").alias("_lmax"))
        r = register_cache(
            segmented_running(
                lvl, ["brand"], F.floor(F.col("pr")).cast("bigint"),
                [F.col("pr")],
                {"_rn": (F.lit(1), "rownum"), "_rmax": (F.col("_lmax"), "max")},
            ).drop("_seg")
        )
        prev = r.select(
            F.col("brand").alias("_kb"),
            (F.col("_rn") + F.lit(1)).alias("_kr"),
            F.col("_rmax").alias("_pmax"),
        )
        surv = (
            r.join(
                prev,
                F.col("brand").eqNullSafe(F.col("_kb"))
                & (F.col("_rn") == F.col("_kr")),
                "left",
            )
            .where(F.col("_pmax").isNull() | (F.col("_pmax") < F.col("_lmax")))
            .select("brand", "pr", "_lmax")
        )
        got = {
            r2["id"]
            for r2 in p.join(surv, ["brand", "pr"])
            .where(F.col("size") == F.col("_lmax"))
            .collect()
        }
        expect = set()
        by_brand = {}
        for b, i, pr, sz in rows:
            by_brand.setdefault(b, []).append((i, pr, sz))
        for b, pts in by_brand.items():
            for i, pr, sz in pts:
                dom = any(
                    p2 <= pr and s2 >= sz and (p2 < pr or s2 > sz)
                    for _, p2, s2 in pts
                )
                if not dom:
                    expect.add(i)
        assert got == expect, seed


def test_bloom_no_false_negatives_random_strings(spark):
    """Bloom property on random member sets: EVERY member probe hits."""
    from creek_spark.operators.sketches import bloom_bits, bloom_probe

    rng = np.random.RandomState(42)
    names = [
        "".join(rng.choice(list("abcdefgh0123"), size=12)) for _ in range(400)
    ]
    df = spark.createDataFrame([(s,) for s in names], "name string")
    bits = bloom_bits(df, "name")
    ph = bloom_probe(bits, df.distinct(), "name").collect()
    assert all(r["nhit"] == 3 for r in ph)
