"""File-format connector round-trips + the second wave of streaming
operators (sliding windows, stream-stream join)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from creek_spark.sources import read_table
from creek_spark.sources.formats import (
    BATCH_FORMATS,
    is_avro_available,
    read_files,
    write_files,
)
from creek_spark.streaming import (
    read_envelope_stream,
    sliding_counts,
    stream_stream_join,
)
from tests.conftest import SF_DIR
from tests.fixtures import ENV_SCHEMA, other_wal_events


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json", "xml", "avro"])
def test_format_roundtrip(spark, tmp_path, fmt):
    if fmt == "avro" and not is_avro_available():
        pytest.skip("avro classes not on classpath")
    src = read_table(spark, SF_DIR, "nation")
    path = str(tmp_path / f"rt_{fmt}")
    write_files(src, path, fmt)
    back = read_files(spark, path, fmt, schema=src.schema)
    assert back.schema == src.schema
    assert _rows(back) == _rows(src)


def test_partitioned_write_prunes(spark, tmp_path):
    src = read_table(spark, SF_DIR, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_by_year")
    write_files(src, path, "parquet", partition_by=["o_year"])
    back = read_files(spark, path, "parquet").where(F.col("o_year") == 1996)
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition filter must prune at planning time, not post-scan
    assert "PartitionFilters: [isnotnull(o_year" in plan, plan
    n_oracle = src.where(F.col("o_year") == 1996).count()
    assert back.count() == n_oracle


def test_avro_resolution(spark, tmp_path):
    """Either the avro classes resolve (and the roundtrip test covers the
    format) or the gate raises a clear actionable error — never Spark's
    opaque 'Failed to find data source'."""
    from creek_spark.sources.formats import _resolve_format

    if is_avro_available():
        assert _resolve_format("avro").startswith("org.apache.spark.sql.avro")
    else:
        with pytest.raises(RuntimeError, match="spark-avro"):
            _resolve_format("avro")


def test_bad_format_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="unsupported format"):
        write_files(
            read_table(spark, SF_DIR, "nation"), str(tmp_path / "x"), "sequencefile"
        )
    assert "avro" in BATCH_FORMATS and "xml" in BATCH_FORMATS


def _write_batch(spark, rows, path):
    spark.createDataFrame(rows, schema=ENV_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_sliding_counts_stream(spark, tmp_path):
    src = str(tmp_path / "wal_slide")
    out_dir = str(tmp_path / "out_slide")
    ckpt = str(tmp_path / "ckpt_slide")
    _write_batch(spark, other_wal_events(), src)
    stream = read_envelope_stream(spark, src, ENV_SCHEMA)
    agg = sliding_counts(
        stream, time_col="sent_at", window="10 minutes", slide="5 minutes"
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.read.parquet(out_dir)
    assert set(out.columns) == {"wstart", "wend", "op", "n"}
    # sliding windows overlap: every closed window spans exactly 10 minutes
    spans = out.select(
        (F.col("wend").cast("long") - F.col("wstart").cast("long")).alias("s")
    ).distinct()
    assert [r["s"] for r in spans.collect()] in ([], [600])


def test_stream_stream_join(spark, tmp_path):
    left_dir = str(tmp_path / "ss_left")
    right_dir = str(tmp_path / "ss_right")
    out_dir = str(tmp_path / "ss_out")
    ckpt = str(tmp_path / "ss_ckpt")
    events = other_wal_events()
    _write_batch(spark, events, left_dir)
    _write_batch(spark, events, right_dir)
    left = read_envelope_stream(spark, left_dir, ENV_SCHEMA).select(
        F.col("source.lsn").alias("key"), F.col("sent_at"), F.col("op")
    )
    right = read_envelope_stream(spark, right_dir, ENV_SCHEMA).select(
        F.col("source.lsn").alias("key"), F.col("sent_at"), F.col("op")
    )
    joined = stream_stream_join(
        left, right, "key", left_time="sent_at", right_time="sent_at"
    )
    assert joined.isStreaming
    q = (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.read.parquet(out_dir)
    # same stream both sides, equal timestamps within lag → each key (lsn)
    # with multiplicity m fans out m×m joined rows
    batch = spark.createDataFrame(events, schema=ENV_SCHEMA).select(
        F.col("source.lsn").alias("key")
    )
    expected = (
        batch.groupBy("key")
        .count()
        .agg(F.sum(F.col("count") * F.col("count")))
        .collect()[0][0]
    )
    assert out.count() == expected
    assert {"key", "l_sent_at", "l_op", "r_sent_at", "r_op"} <= set(out.columns)
