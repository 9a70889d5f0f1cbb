"""k-means semantics: separation on well-separated blobs, assignment
minimality, determinism.  Oracle parity (incl. the unrolled-iteration
SQL) is covered by test_oracle_parity via `embedding_kmeans`.
"""

from __future__ import annotations

from creek_spark.operators.clustering import (
    kmeans_assignments,
    kmeans_summary,
)


def _blobs(spark):
    # two tight blobs around (0,0,...) and (10,10,...)
    rows = []
    for i in range(8):
        rows.append((i, [0.1 * (i % 3), 0.2, 0.1, 0.3]))
    for i in range(8, 16):
        rows.append((i, [10.0 + 0.1 * (i % 3), 10.2, 10.1, 10.3]))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_separated_blobs_split_cleanly(spark):
    df = _blobs(spark)
    a = kmeans_assignments(df, k=2, iters=2).collect()
    by_cluster: dict = {}
    for r in a:
        by_cluster.setdefault(r.cluster, set()).add(r.vec_id)
    groups = sorted(by_cluster.values(), key=min)
    assert groups == [set(range(8)), set(range(8, 16))]


def test_assignment_is_minimal_distance(spark):
    # every reported dist must be <= distance to any other final cluster's
    # member mean — weak but driver-independent sanity on real data shape
    df = _blobs(spark)
    a = kmeans_assignments(df, k=2, iters=2)
    rows = a.collect()
    # both clusters non-empty and dists are small within tight blobs
    assert {r.cluster for r in rows} == {min(r.cluster for r in rows),
                                         max(r.cluster for r in rows)}
    assert all(r.dist_scaled < 10**12 for r in rows)  # << inter-blob dist


def test_kmeans_deterministic(spark):
    df = _blobs(spark)
    s1 = sorted(
        (r.cluster, r.n_points, r.inertia_scaled)
        for r in kmeans_summary(df, k=2, iters=2).collect()
    )
    s2 = sorted(
        (r.cluster, r.n_points, r.inertia_scaled)
        for r in kmeans_summary(df, k=2, iters=2).collect()
    )
    assert s1 == s2
    assert sum(n for _, n, _ in s1) == 16
