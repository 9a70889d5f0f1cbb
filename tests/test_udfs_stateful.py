"""UDF surface (pandas_udf / applyInPandas / UDTF), stateful streaming
(applyInPandasWithState), infinity sentinels, and observability."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_pandas_udf_l2_normalize(spark, sf_dir):
    from creek_spark.functions.udfs import l2_normalize
    from creek_spark.sources import read_table

    emb = read_table(spark, sf_dir, "embeddings").limit(20)
    out = emb.select("vec_id", l2_normalize("embedding").alias("nv")).collect()
    for r in out:
        n = math.sqrt(sum(x * x for x in r["nv"]))
        assert abs(n - 1.0) < 1e-9


def test_apply_in_pandas_zscores(spark, sf_dir):
    from creek_spark.functions.udfs import robust_zscores
    from creek_spark.sources import read_table

    ev = read_table(spark, sf_dir, "events")
    out = robust_zscores(ev, "event_type", "value")
    assert out.count() == ev.count()
    stats = out.groupBy("event_type").agg(F.max(F.abs("robust_z")).alias("m"))
    assert all(r["m"] >= 0 for r in stats.collect())


def test_udtf_split_sentences(spark):
    from creek_spark.functions.udfs import register_all

    register_all(spark)
    rows = spark.sql(
        "SELECT s.* FROM VALUES ('one. two! three?') t(txt), "
        "LATERAL split_sentences(txt) s"
    ).collect()
    assert [(r["sent_idx"], r["sentence"]) for r in rows] == [
        (0, "one"), (1, "two"), (2, "three"),
    ]


def test_stateful_running_totals(spark, tmp_path):
    """applyInPandasWithState across two micro-batches: state carries."""
    from creek_spark.streaming.stateful import running_totals
    from tests.fixtures import ENV_SCHEMA, other_wal_events

    src = str(tmp_path / "wal")
    ckpt = str(tmp_path / "ckpt")

    def write(rows):
        spark.createDataFrame(rows, schema=ENV_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    events = other_wal_events()
    write(events)
    stream = spark.readStream.schema(ENV_SCHEMA).parquet(src)
    from creek_spark.functions.lsn import lsn_num

    prepared = stream.where(F.col("after").isNotNull()).select(
        F.col("after.id").alias("key_id"),
        F.lit(1.0).alias("one"),
        lsn_num(F.col("source.lsn")).alias("ln"),
    )
    totals = running_totals(prepared, "key_id", "one", "ln")
    q = (
        totals.writeStream.format("memory")
        .queryName("totals")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["key"]: (r["n"], r["max_lsn"]) for r in spark.sql("SELECT * FROM totals").collect()}
    # key 1: ops at lsn 1,5,15,14 (after-image) → n=4, max 15
    assert got[1] == (4, 15)
    # key 5: insert 9 + toast update 13
    assert got[5] == (2, 13)


def test_infinity_sentinels_roundtrip(spark):
    import datetime

    from creek_spark.functions.infinity import (
        finite_or_null,
        is_pg_infinity,
        pg_infinity_modifier,
    )
    from creek_spark.types.pgtypes import INFINITY_SENTINELS

    pos, neg = INFINITY_SENTINELS["date"]
    df = spark.sql(
        "SELECT * FROM VALUES (1, DATE'9999-12-31'), (2, DATE'0001-01-01'), "
        "(3, DATE'2024-05-01'), (4, CAST(NULL AS DATE)) AS t(id, d)"
    )
    out = df.select(
        "id",
        is_pg_infinity("d", "date").alias("inf"),
        pg_infinity_modifier("d", "date").alias("mod"),
        finite_or_null("d", "date").alias("fin"),
    ).orderBy("id").collect()
    assert [r["inf"] for r in out] == [True, True, False, False]
    assert [r["mod"] for r in out] == ["infinity", "negative_infinity", None, None]
    assert out[0]["fin"] is None and out[2]["fin"] is not None
    # sentinels order above/below all finite values (no special-casing)
    mx = df.agg(F.max("d")).collect()[0][0]
    mn = df.agg(F.min("d")).collect()[0][0]
    assert mx == pos and mn == neg


def test_observe_changes_counters(spark):
    from creek_spark.metrics import observe_changes
    from tests.fixtures import other_wal_df

    wal = other_wal_df(spark)
    observed, obs = observe_changes(wal)
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    assert m["rows_read"] == 16
    assert m["inserts"] == 8
    assert m["deletes"] == 2
    assert m["max_lsn"] == 15


def test_stream_metrics_listener(spark, tmp_path):
    from creek_spark.metrics import StreamMetricsListener
    from tests.fixtures import ENV_SCHEMA, other_wal_events

    listener = StreamMetricsListener()
    spark.streams.addListener(listener)
    try:
        src = str(tmp_path / "wal")
        spark.createDataFrame(other_wal_events(), schema=ENV_SCHEMA).write.mode(
            "append"
        ).parquet(src)
        q = (
            spark.readStream.schema(ENV_SCHEMA)
            .parquet(src)
            .groupBy("op")
            .count()
            .writeStream.format("memory")
            .queryName("mstats")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        import time

        for _ in range(20):  # listener events are async
            if listener.snapshot()["batches"]:
                break
            time.sleep(0.5)
        snap = listener.snapshot()
        assert snap["batches"], "no progress events captured"
        assert sum(b["numInputRows"] for b in snap["batches"]) == 16
    finally:
        spark.streams.removeListener(listener)


def test_pandas_grouped_agg_geometric_mean(spark, sf_dir):
    import math

    from creek_spark.functions.udfs import geometric_mean
    from creek_spark.sources import read_table

    ev = read_table(spark, sf_dir, "events").where(F.col("value") > 0)
    got = {
        r["event_type"]: r["gm"]
        for r in ev.groupBy("event_type")
        .agg(geometric_mean("value").alias("gm"))
        .collect()
    }
    # oracle: exp(mean(ln(x))) per group computed via built-ins
    want = {
        r["event_type"]: r["gm"]
        for r in ev.groupBy("event_type")
        .agg(F.exp(F.avg(F.ln("value"))).alias("gm"))
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=1e-9), k


def test_geometric_mean_registered_in_sql(spark, sf_dir):
    from creek_spark.functions.udfs import register_all
    from creek_spark.sources import register_views

    register_all(spark)
    register_views(spark, sf_dir)
    row = spark.sql(
        "SELECT geometric_mean(value) AS gm FROM events WHERE value > 0"
    ).collect()[0]
    assert row["gm"] > 0
