"""Data-quality audit checks — the dbt-test / Great-Expectations family,
run as plain aggregations so a 100 TB audit is a handful of scans.

Each check produces a one-row DataFrame ``(check STRING, n_bad BIGINT)``;
``dq_audit`` unions them into the audit report.  Checks are pure
DataFrame programs: FK checks are left-anti joins (broadcast when the
parent is dim-sized), uniqueness/null/range checks are single
aggregations with pushdown-friendly predicates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _one(name: str, df: DataFrame, n_bad: Column) -> DataFrame:
    return df.agg(n_bad.cast("bigint").alias("n_bad")).select(
        F.lit(name).alias("check"), "n_bad"
    )


def fk_check(
    name: str, child: DataFrame, parent: DataFrame, fk: str, pk: str
) -> DataFrame:
    """Orphaned-row count: child rows whose fk has no parent pk.
    Left-anti join; Spark broadcasts the parent when it is small, and at
    scale the runtime Bloom filter prunes the child scan first."""
    orphans = child.select(F.col(fk)).join(
        parent.select(F.col(pk).alias(fk)), fk, "left_anti"
    )
    return _one(name, orphans, F.count(F.lit(1)))


def unique_check(name: str, df: DataFrame, cols: list[str]) -> DataFrame:
    """Duplicate-key count: COUNT(*) − COUNT(DISTINCT cols…).  One
    aggregation; the distinct rides the same shuffle as a grouped count."""
    return _one(
        name,
        df.select(*cols),
        F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in cols]),
    )


def null_check(name: str, df: DataFrame, col: str) -> DataFrame:
    """NULL count for a column that must be populated."""
    return _one(
        name, df, F.count(F.when(F.col(col).isNull(), F.lit(1)))
    )


def range_check(name: str, df: DataFrame, predicate: Column) -> DataFrame:
    """Rows violating a domain predicate (predicate = the VALID range)."""
    return _one(
        name, df, F.count(F.when(~predicate, F.lit(1)))
    )


def dq_audit(checks: list[DataFrame]) -> DataFrame:
    """Union the per-check rows into one audit report.  Each input is a
    1-row aggregate, so the union is metadata-sized regardless of table
    size; the expensive work (scans/joins) runs in parallel stages."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out
