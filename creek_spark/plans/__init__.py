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


def has_python_stage(df: DataFrame) -> bool:
    """True if the plan drops into row/Arrow Python evaluation."""
    s = explain_str(df, "simple")
    return "BatchEvalPython" in s or "ArrowEvalPython" in s or "MapInPandas" in s
