"""Small-file compaction: rewrite a parquet directory into size-targeted
files.

Streaming sinks, dynamic-partition overwrites, and fine-grained appends
all accrete small files; at scale the file COUNT becomes the bottleneck
(driver listing time, scheduler tasks, open-file overhead) long before
the bytes do.  Compaction is the standard maintenance op (Delta/Iceberg
`OPTIMIZE`): read once, rewrite into ~target-sized files, swap.

File sizing reads parquet FOOTERS only (no data scan) to pick the output
file count; the rewrite itself is one pass with no shuffle when shrinking
(`coalesce`) and one round-robin shuffle when growing.  The swap is
directory-rename based and briefly non-atomic — callers pause readers or
layer this under a table format that owns the manifest (which is what
makes Delta's OPTIMIZE atomic; vanilla parquet has no manifest to swap).
All filesystem traffic goes through creek_spark.fsio (Hadoop FS), so the
op runs against whatever filesystem holds the data — local, HDFS or
object store (where the dir renames are copies: schedule accordingly).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from creek_spark import fsio


def dir_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(n_files, total_bytes) for a parquet directory — fs metadata
    only."""
    files = [
        (n, sz)
        for n, sz in fsio.list_files(spark, path)
        if n.endswith(".parquet")
    ]
    return len(files), sum(sz for _, sz in files)


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    *,
    target_mb: int = 128,
    min_files_to_compact: int = 2,
) -> dict:
    """Rewrite ``path`` into ceil(total_bytes / target_mb) files.

    Returns {"before_files", "after_files", "bytes", "skipped"}.  Skips
    (no rewrite at all) when the directory is already at or below the
    target count — compaction must be idempotent and cheap to schedule.
    Row contents are preserved exactly; file-internal order may change
    (parquet directories carry no order contract)."""
    before, total = dir_stats(spark, path)
    target = max(1, -(-total // (target_mb * 1024 * 1024)))
    if before < min_files_to_compact or before <= target:
        return {
            "before_files": before,
            "after_files": before,
            "bytes": total,
            "skipped": True,
        }
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + ".compacting"
    fsio.delete(spark, tmp)
    out = df.coalesce(target) if target < before else df.repartition(target)
    out.write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + ".old"
    fsio.delete(spark, old)
    if not fsio.rename(spark, path, old):
        raise IOError(f"compaction: rename of {path} aside failed")
    if not fsio.rename(spark, tmp, path):
        raise IOError(f"compaction: swap of {tmp} into place failed")
    fsio.delete(spark, old)
    after, _ = dir_stats(spark, path)
    return {
        "before_files": before,
        "after_files": after,
        "bytes": total,
        "skipped": False,
    }
