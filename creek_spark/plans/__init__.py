"""Plan inspection helpers — used by tests to assert the *physical* plan is
the one we want at scale (broadcasts chosen, filters pushed to the scan,
top-k not global-sorting), not merely that results are correct."""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (classic PySpark)."""
    spark = df.sparkSession
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df) or "BroadcastNestedLoopJoin" in explain_str(df)


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section(s) of the formatted plan."""
    s = explain_str(df)
    return "\n".join(line for line in s.splitlines() if "PushedFilters" in line)


def has_topk(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in explain_str(df)


def codegen_stage_count(df: DataFrame, execute: bool = True) -> int:
    """Number of distinct whole-stage-codegen stages.  Under AQE the final
    plan (with codegen annotations) only exists after execution, so by
    default the query is materialized to the noop sink first."""
    if execute:
        # must run THIS df's query execution (df.write would plan a copy),
        # so the AQE final plan — with codegen annotations — attaches to it
        df.collect()
    ids = set()
    for line in explain_str(df).splitlines():
        if "codegen id :" in line:
            ids.add(line.rsplit("codegen id :", 1)[1].strip().rstrip("]"))
    return len(ids)


def has_partial_agg(df: DataFrame) -> bool:
    """Map-side combine present (partial_* aggregate before the exchange)."""
    return "partial_" in explain_str(df, "simple")


def plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's own size estimate for the optimized plan (bytes).

    For parquet scans this is file-size based (no ANALYZE needed); without
    CBO a filter does NOT shrink the estimate, so the number is an upper
    bound on the relation size — exactly the conservative figure a
    broadcast decision should use."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def broadcast_if_small(df: DataFrame, threshold_bytes: int | None = None) -> DataFrame:
    """`F.broadcast(df)` only when Catalyst's size estimate fits the
    session's `spark.sql.autoBroadcastJoinThreshold`.

    An unconditional hint *forces* the broadcast and overrides AQE — on a
    table that grows with scale factor (customer, supplier: ~rows × sf)
    that is a driver OOM at the 100 TB design point.  Gating on the
    optimizer's estimate keeps the hint (and the current plan) at bench
    scale while letting an over-threshold side fall back to SMJ, where
    the session's runtime Bloom filter takes over row pruning
    (test_runtime_bloom_filter_prunes_shuffle_join).  Fixed-cardinality
    dims (region: 5 rows, nation: 25) don't need the gate.
    """
    from pyspark.sql import functions as F

    spark = df.sparkSession
    if threshold_bytes is None:
        raw = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
        try:
            threshold_bytes = int(
                spark._jvm.org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
                    raw
                )
            )
        except Exception:
            threshold_bytes = -1
    if threshold_bytes is None or threshold_bytes <= 0:
        return df  # broadcasting disabled session-wide: never force it
    try:
        size = plan_size_bytes(df)
    except Exception:
        return df  # unknown size: let AQE decide at runtime
    return F.broadcast(df) if 0 <= size <= threshold_bytes else df


def has_python_stage(df: DataFrame) -> bool:
    """True if the plan drops into row/Arrow Python evaluation."""
    s = explain_str(df, "simple")
    return "BatchEvalPython" in s or "ArrowEvalPython" in s or "MapInPandas" in s
