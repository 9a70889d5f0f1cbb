"""Bucketed tables: co-located, shuffle-free repeated joins.

At 100 TB the dominant cost of a fact-fact equi-join is shuffling both
sides on the join key.  Bucketing pays that shuffle ONCE at write time:
`bucketBy(n, key)` hash-partitions files on disk, and every later join
or aggregation on that key reads co-located buckets with NO exchange on
either side — the plan gate in tests/test_bucketing.py asserts exactly
that.  This is Spark's native answer to the co-partitioned-join problem
(the same layout contract a Delta/Iceberg table would carry as metadata).

Sizing rule: n_buckets × target-file-size ≈ table size; too few buckets
→ giant files and no parallelism, too many → the small-files problem.
Both sides of a planned join must use the SAME bucket count and key.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    *,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist df as a bucketed (and optionally sorted) parquet table in
    the session catalog.  Sorting within buckets additionally enables
    merge-join without a per-task sort.

    overwrite is made safe across sessions: with an in-memory catalog a
    previous process's managed-table LOCATION can outlive its catalog
    entry, and saveAsTable refuses to reuse it — drop both first."""
    spark = df.sparkSession
    if mode == "overwrite":
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        wh = spark.conf.get(
            "spark.sql.warehouse.dir", "spark-warehouse"
        ).removeprefix("file:")
        shutil.rmtree(os.path.join(wh, table.lower()), ignore_errors=True)
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table — bucket metadata comes from the catalog, so
    joins/aggs on the bucket key skip their exchange."""
    return spark.table(table)
