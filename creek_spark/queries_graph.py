"""Catalog part 6 — graph operators over the events table.

Edge list = per-user event-type transition graph (lead() window over
(ts, event_id)); reachability is a bounded recursive CTE on the DuckDB
side vs. distributed BFS on the Spark side; PageRank is the fixed-point
integer formulation so the unrolled SQL oracle matches bit-for-bit.
"""

from __future__ import annotations

from creek_spark.operators import graph as gr
from creek_spark.queries import _t, register

REACH_K = 3
PR_ITERS = 3
PR_SCALE = 10**12
PR_NUM = 85
PR_DEN = 100

_EV = """
    ev AS (SELECT event_type,
                  lead(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS nxt
           FROM events),
    e AS (SELECT DISTINCT event_type AS src, nxt AS dst
          FROM ev WHERE nxt IS NOT NULL)
"""


@register(
    "graph_transitions",
    f"""
    WITH {_EV}
    SELECT event_type AS src, nxt AS dst,
           CAST(COUNT(*) AS BIGINT) AS n_transitions
    FROM ev WHERE nxt IS NOT NULL GROUP BY event_type, nxt
    """,
    "graph",
)
def graph_transitions(spark, sf_dir):
    """Event-type transition graph: one user-partitioned window pass +
    one (src, dst) hash agg."""
    return gr.event_transitions(_t(spark, sf_dir, "events"))


@register(
    "graph_reachability",
    f"""
    WITH RECURSIVE {_EV},
    r AS (SELECT src, dst, 1 AS hops FROM e
          UNION ALL
          SELECT r.src, n.dst, r.hops + 1
          FROM r JOIN e n ON n.src = r.dst WHERE r.hops < {REACH_K})
    SELECT src, dst, CAST(MIN(hops) AS INT) AS min_hops
    FROM r GROUP BY src, dst
    """,
    "graph",
)
def graph_reachability(spark, sf_dir):
    """Pairs reachable in ≤3 hops with min hop count — distributed BFS
    with a deduplicated frontier (work ∝ NEW pairs per round), matching
    the bounded recursive-CTE oracle exactly."""
    edges = gr.event_transitions(_t(spark, sf_dir, "events"))
    return gr.k_hop_reachability(edges, k=REACH_K)


def _pagerank_oracle() -> str:
    base = ((PR_DEN - PR_NUM) * PR_SCALE) // PR_DEN
    ctes = [f"r0 AS (SELECT n, CAST({PR_SCALE} AS BIGINT) AS rk FROM nodes)"]
    for i in range(1, PR_ITERS + 1):
        ctes.append(
            f"""s{i} AS (SELECT e.dst AS m, SUM(r.rk // od.outdeg) AS s
           FROM e JOIN od USING (src) JOIN r{i - 1} r ON r.n = e.src
           GROUP BY e.dst),
    r{i} AS (SELECT nodes.n,
                    {base} + COALESCE(({PR_NUM} * s{i}.s) // {PR_DEN}, 0) AS rk
             FROM nodes LEFT JOIN s{i} ON s{i}.m = nodes.n)"""
        )
    body = ",\n    ".join(ctes)
    return f"""
    WITH {_EV},
    nodes AS (SELECT src AS n FROM e UNION SELECT dst FROM e),
    od AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
    {body}
    SELECT n AS node, CAST(rk AS BIGINT) AS pagerank_scaled FROM r{PR_ITERS}
    """


@register("graph_pagerank", _pagerank_oracle(), "graph")
def graph_pagerank(spark, sf_dir):
    """Fixed-point integer PageRank, 3 unrolled iterations — floor
    division on scaled integer ranks makes the iterative algorithm
    oracle-exact (double summation order would diverge)."""
    edges = gr.event_transitions(_t(spark, sf_dir, "events"))
    return gr.pagerank(
        edges,
        iters=PR_ITERS,
        scale=PR_SCALE,
        damping_num=PR_NUM,
        damping_den=PR_DEN,
    )
