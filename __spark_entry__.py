"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The catalog itself lives in creek_spark.queries / queries_ext /
queries_northstar — importing them populates the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _catalog():
    import creek_spark.queries as q
    import creek_spark.queries_ext  # noqa: F401 — registers part 2
    import creek_spark.queries_northstar  # noqa: F401 — registers part 3
    import creek_spark.queries_tpch  # noqa: F401 — registers part 4
    import creek_spark.queries_analytics  # noqa: F401 — registers part 5
    import creek_spark.queries_graph  # noqa: F401 — registers part 6
    import creek_spark.queries_r4  # noqa: F401 — registers part 7
    import creek_spark.queries_r6  # noqa: F401 — registers part 8
    import creek_spark.queries_r6b  # noqa: F401 — registers part 9
    import creek_spark.queries_r6c  # noqa: F401 — registers part 10
    import creek_spark.queries_r11  # noqa: F401 — registers part 11

    return q.QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q3-shape
    shipping-priority (filtered broadcast join → agg → top-k)."""
    cat = _catalog()
    return cat["q3_shipping_priority"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in _catalog().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle for name, q in _catalog().items() if q.oracle is not None
    }
