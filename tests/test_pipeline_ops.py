"""Training-pipeline operators: deterministic sampling, PII scrubbing,
sequence packing, weighted mixing — determinism and bound checks (the
catalog's `training_pipeline` entry oracle-checks values vs DuckDB)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from creek_spark.operators.pipeline import (
    deterministic_sample,
    mix_sources,
    pack_sequences,
    sample_hash,
    scrub_pii,
)
from creek_spark.sources import read_table
from tests.conftest import SF_DIR


def _docs(spark):
    return read_table(spark, SF_DIR, "documents")


def test_sample_deterministic_and_in_band(spark):
    docs = _docs(spark)
    n = docs.count()
    s1 = deterministic_sample(docs, "doc_id", 25, salt="s")
    s2 = deterministic_sample(docs, "doc_id", 25, salt="s")
    ids1 = {r[0] for r in s1.select("doc_id").collect()}
    ids2 = {r[0] for r in s2.select("doc_id").collect()}
    assert ids1 == ids2  # same decision every run
    # quantized Bernoulli: expect ~25%, allow a generous band at n=500
    assert 0.10 * n <= len(ids1) <= 0.40 * n
    # monotone: a higher rate keeps a superset of a lower rate's sample
    ids50 = {
        r[0]
        for r in deterministic_sample(docs, "doc_id", 50, salt="s")
        .select("doc_id")
        .collect()
    }
    assert ids1 <= ids50


def test_sample_rate_edges(spark):
    docs = _docs(spark)
    assert deterministic_sample(docs, "doc_id", 0).count() == 0
    assert deterministic_sample(docs, "doc_id", 100).count() == docs.count()
    with pytest.raises(ValueError):
        sample_hash(F.col("doc_id"), 101)


def test_scrub_pii(spark):
    rows = [
        (1, "mail me at alice.smith+x@example.co.uk today"),
        (2, "server 10.0.255.3 then 192.168.1.1 ok"),
        (3, "no pii here"),
        (4, "bob@ex.org and 8.8.8.8"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    out = {r["id"]: r for r in scrub_pii(df, "text").collect()}
    assert out[1]["text_scrubbed"] == "mail me at <EMAIL> today"
    assert out[1]["n_redactions"] == 1
    assert out[2]["text_scrubbed"] == "server <IP> then <IP> ok"
    assert out[2]["n_redactions"] == 2
    assert out[3]["text_scrubbed"] == "no pii here"
    assert out[3]["n_redactions"] == 0
    assert out[4]["text_scrubbed"] == "<EMAIL> and <IP>"
    assert out[4]["n_redactions"] == 2


def test_pack_sequences_invariants(spark):
    docs = _docs(spark).select(
        "doc_id", F.length("text").alias("n_chars")
    )
    packed = pack_sequences(docs, "doc_id", "n_chars", budget=4096, n_shards=8)
    rows = packed.collect()
    assert len(rows) == docs.count()  # packing assigns, never drops
    # offsets stay inside the budget and packs are contiguous per shard
    assert all(0 <= r["pack_offset"] < 4096 for r in rows)
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in rs:
            assert r["pack_id"] == cum // 4096, (shard, r)
            assert r["pack_offset"] == cum - r["pack_id"] * 4096
            cum += r["n_chars"]
    # deterministic across runs
    again = {
        (r["doc_id"], r["shard"], r["pack_id"])
        for r in pack_sequences(
            docs, "doc_id", "n_chars", budget=4096, n_shards=8
        ).collect()
    }
    assert again == {(r["doc_id"], r["shard"], r["pack_id"]) for r in rows}


def test_mix_sources_weights_and_alignment(spark):
    docs = _docs(spark)
    a = docs.select("doc_id", "text")
    b = docs.select("doc_id", "text", F.lit(1).alias("extra"))
    mixed = mix_sources({"wiki": (a, 100), "web": (b, 30)}, "doc_id")
    n = docs.count()
    counts = {
        r["source"]: r["n"]
        for r in mixed.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert counts["wiki"] == n
    assert 0.15 * n <= counts["web"] <= 0.45 * n
    # column alignment: wiki rows carry null extra
    assert "extra" in mixed.columns
    assert (
        mixed.where((F.col("source") == "wiki") & F.col("extra").isNotNull()).count()
        == 0
    )
    with pytest.raises(ValueError):
        mix_sources({"x": (a, 150)}, "doc_id")
    with pytest.raises(ValueError):
        mix_sources({}, "doc_id")


def test_split_assign_deterministic_partition(spark):
    from creek_spark.operators.pipeline import split_assign

    docs = _docs(spark)
    n = docs.count()
    s1 = split_assign(docs, "doc_id", {"train": 90, "val": 5, "test": 5})
    counts = {
        r["split"]: r["n"]
        for r in s1.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert sum(counts.values()) == n  # total partition, nothing dropped
    assert counts["train"] > counts.get("val", 0)
    assert counts["train"] > counts.get("test", 0)
    # deterministic across runs
    a = {(r["doc_id"], r["split"]) for r in s1.select("doc_id", "split").collect()}
    b = {
        (r["doc_id"], r["split"])
        for r in split_assign(docs, "doc_id", {"train": 90, "val": 5, "test": 5})
        .select("doc_id", "split")
        .collect()
    }
    assert a == b
    with pytest.raises(ValueError):
        split_assign(docs, "doc_id", {"train": 50, "val": 20})
