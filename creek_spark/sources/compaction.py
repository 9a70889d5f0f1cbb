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
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession


def dir_stats(path: str) -> tuple[int, int]:
    """(n_files, total_bytes) for a parquet directory — footer/fs metadata
    only."""
    n = b = 0
    for name in os.listdir(path):
        if name.endswith(".parquet"):
            n += 1
            b += os.path.getsize(os.path.join(path, name))
    return n, b


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
    before, total = dir_stats(path)
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
    shutil.rmtree(tmp, ignore_errors=True)
    out = df.coalesce(target) if target < before else df.repartition(target)
    out.write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + ".old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    after, _ = dir_stats(path)
    return {
        "before_files": before,
        "after_files": after,
        "bytes": total,
        "skipped": False,
    }
