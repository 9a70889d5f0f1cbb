"""Small-file compaction: file count drops to the size-derived target,
row contents survive exactly, and the op is idempotent (second run
skips)."""

from __future__ import annotations

from creek_spark.sources.compaction import compact_parquet_dir, dir_stats
from creek_spark.sources import read_table
from tests.conftest import SF_DIR


def test_compacts_many_small_files(spark, tmp_path):
    li = read_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    path = str(tmp_path / "small")
    li.repartition(24).write.parquet(path)  # deliberately fragmented
    n0, _ = dir_stats(spark, path)
    assert n0 == 24
    before = {tuple(r) for r in spark.read.parquet(path).collect()}

    res = compact_parquet_dir(spark, path, target_mb=128)
    assert not res["skipped"]
    assert res["before_files"] == 24
    assert res["after_files"] < 24
    after = {tuple(r) for r in spark.read.parquet(path).collect()}
    assert after == before

    # idempotent: second run is a no-op
    res2 = compact_parquet_dir(spark, path, target_mb=128)
    assert res2["skipped"]
    assert res2["after_files"] == res["after_files"]


def test_skips_already_compact(spark, tmp_path):
    li = read_table(spark, SF_DIR, "lineitem").limit(100)
    path = str(tmp_path / "one")
    li.coalesce(1).write.parquet(path)
    res = compact_parquet_dir(spark, path)
    assert res["skipped"] and res["before_files"] == 1
