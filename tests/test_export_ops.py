"""Training-data export operators: SemDeDup, token-budget sampling,
stable shard export.

The catalog rows (dedup_semantic / sample_token_budget / export_shards)
prove oracle parity; these tests prove the operator properties the
oracles can't state — brute-force semantics, prefix determinism, shard
stability through the writer, partition pruning on the export layout.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from creek_spark.operators.clustering import kmeans_assignments, semantic_dedup
from creek_spark.operators.pipeline import (
    shard_assign,
    shard_stats,
    token_budget_sample,
    write_shards,
)
from creek_spark.sources import read_table


# ---------------------------------------------------------------- SemDeDup


def test_semantic_dedup_matches_brute_force(spark, sf_dir):
    """The one-pass rule, checked against a literal python reimplementation:
    j is removed iff some i<j in the same cluster has cosine ≥ τ."""
    emb = read_table(spark, sf_dir, "embeddings").limit(120)
    tau = 0.35
    out = {
        r["vec_id"]: (r["removed"], r["dup_of"])
        for r in semantic_dedup(emb, threshold=tau).collect()
    }
    asg = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assignments(emb, "vec_id", "embedding").collect()
    }
    vecs = {r["vec_id"]: r["embedding"] for r in emb.collect()}

    def cos(a, b):
        d = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) ** 2 for x in a))
        nb = math.sqrt(sum(float(x) ** 2 for x in b))
        return d / (na * nb)

    for j, vj in vecs.items():
        offenders = [
            i
            for i, vi in vecs.items()
            if i < j and asg[i] == asg[j] and cos(vi, vj) >= tau - 1e-9
        ]
        # the 1e-9 guard only matters for pairs exactly AT the threshold;
        # re-check exactly when python and the engine could disagree
        exact = [i for i in offenders if cos(vecs[i], vj) >= tau]
        removed, dup_of = out[j]
        assert removed == bool(exact), (j, exact)
        if exact:
            assert dup_of == min(exact)


def test_semantic_dedup_covers_every_row_once(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    out = semantic_dedup(emb)
    assert out.count() == emb.count()
    assert out.select("vec_id").distinct().count() == emb.count()
    # kept rows carry nulls, removed rows carry an earlier id
    bad = out.where(
        (F.col("removed") & (F.col("dup_of") >= F.col("vec_id")))
        | (~F.col("removed") & F.col("dup_of").isNotNull())
    )
    assert bad.count() == 0


# ---------------------------------------------------- token-budget sampling


def test_token_budget_is_prefix_of_md5_order(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    budget = 2000
    kept = token_budget_sample(docs, budget=budget).collect()
    assert kept, "budget too small for any doc?"
    by_src: dict[str, list] = {}
    for r in kept:
        by_src.setdefault(r["source"], []).append(r)
    full = {
        (r["doc_id"], r["source"])
        for r in docs.select("doc_id", "source").collect()
    }
    for src, rows in by_src.items():
        rows.sort(key=lambda r: (hashlib.md5(str(r["doc_id"]).encode()).hexdigest(), r["doc_id"]))
        # running sum including current row never exceeds the budget,
        # and cum_tokens is exactly the prefix sum in md5 order
        run = 0
        for r in rows:
            run += r["n_tokens"]
            assert r["cum_tokens"] == run
            assert run <= budget
        # maximality: the next doc in md5 order (if any) would overflow —
        # implied by cum ≤ budget filter on the full prefix sum; spot-check
        # that the kept set is not empty while the budget allows the
        # smallest doc
        assert (rows[0]["doc_id"], src) in full


def test_token_budget_deterministic_across_runs(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    a = sorted(map(tuple, token_budget_sample(docs, budget=1500).collect()))
    b = sorted(
        map(
            tuple,
            token_budget_sample(
                docs.repartition(7), budget=1500
            ).collect(),
        )
    )
    assert a == b


# ------------------------------------------------------------ shard export


def test_shard_assign_matches_md5_prefix_and_is_stable(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    out = shard_assign(docs, "doc_id", n_shards=16).collect()
    for r in out:
        want = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[0], 16)
        assert r["shard"] == want
    out256 = shard_assign(docs, "doc_id", n_shards=256).collect()
    for r in out256:
        want = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:2], 16)
        assert r["shard"] == want


def test_shard_assign_rejects_non_hex_counts(spark, sf_dir):
    import pytest

    docs = read_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError):
        shard_assign(docs, "doc_id", n_shards=10)


def test_write_shards_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    docs = read_table(spark, sf_dir, "documents")
    path = str(tmp_path / "shards")
    write_shards(docs, path, "doc_id", n_shards=16)
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    # shard is a pure function of doc_id: re-export places rows identically
    lookup = {
        r["doc_id"]: r["shard"]
        for r in shard_assign(docs, "doc_id").select("doc_id", "shard").collect()
    }
    for r in back.select("doc_id", "shard").collect():
        assert lookup[int(r["doc_id"])] == int(r["shard"])
    # partition pruning: a shard-filtered scan reads one directory
    plan = (
        back.where(F.col("shard") == 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "shard=3" in plan or "PartitionFilters" in plan


def test_shard_stats_totals(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    st = shard_stats(docs).collect()
    assert sum(r["n_docs"] for r in st) == docs.count()
    assert all(0 <= r["shard"] < 16 for r in st)
    assert all(r["min_id"] <= r["max_id"] for r in st)


# ----------------------------------------------------- incremental dedup


def test_incremental_dedup_equals_filtered_full_pairs(spark, sf_dir):
    """Pairs from (batch vs index ∪ batch) must equal the full-corpus
    pair set restricted to pairs touching the batch — the lossless-ness
    that justifies never re-deduping the corpus."""
    from creek_spark.operators.dedup import (
        incremental_lsh_candidates,
        minhash_index,
        minhash_lsh_candidates,
    )

    docs = read_table(spark, sf_dir, "documents")
    new = docs.where(F.col("doc_id") % 5 == 0)
    old = docs.where(F.col("doc_id") % 5 != 0)
    inc = incremental_lsh_candidates(
        new, minhash_index(old, "text", "doc_id"), "text", "doc_id"
    )
    full = minhash_lsh_candidates(docs, "text", "doc_id").where(
        (F.col("doc_a") % 5 == 0) | (F.col("doc_b") % 5 == 0)
    )
    assert sorted(map(tuple, inc.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_incremental_dedup_index_roundtrips_parquet(spark, sf_dir, tmp_path):
    """The index survives persistence: parquet-written bands give the
    same pairs as in-memory ones (the production flow writes the index
    once per corpus, reads it every batch)."""
    from creek_spark.operators.dedup import (
        incremental_lsh_candidates,
        minhash_index,
    )

    docs = read_table(spark, sf_dir, "documents").limit(200)
    new = docs.where(F.col("doc_id") % 5 == 0)
    old = docs.where(F.col("doc_id") % 5 != 0)
    idx = minhash_index(old, "text", "doc_id")
    p = str(tmp_path / "lsh_index")
    idx.write.parquet(p)
    mem = incremental_lsh_candidates(new, idx, "text", "doc_id")
    disk = incremental_lsh_candidates(
        new, spark.read.parquet(p), "text", "doc_id"
    )
    assert sorted(map(tuple, mem.collect())) == sorted(
        map(tuple, disk.collect())
    )


# ------------------------------------------------------- DSIR contrast


def test_dsir_contrast_sign_semantics(spark):
    """Docs made of target-exclusive grams score positive, raw-exclusive
    negative, and a doc mixing both sits between its endpoints."""
    from creek_spark.operators.text import dsir_contrast

    rows = [
        (1, "alpha beta alpha beta alpha beta", True),
        (2, "alpha beta alpha beta", True),
        (3, "gamma delta gamma delta gamma delta", False),
        (4, "gamma delta gamma delta", False),
        (5, "alpha beta gamma delta", False),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "is_t"])
    out = {
        r["doc_id"]: r["dsir_score"]
        for r in dsir_contrast(df, "text", "doc_id", "is_t").collect()
    }
    assert out[1] > 0 and out[2] > 0
    assert out[3] < 0 and out[4] < 0
    assert out[3] < out[5] < out[1]


def test_dsir_contrast_deterministic_across_partitionings(spark, sf_dir):
    from creek_spark.operators.text import dsir_contrast

    docs = read_table(spark, sf_dir, "documents").withColumn(
        "_t", F.col("lang") == "en"
    )
    a = sorted(map(tuple, dsir_contrast(docs, "text", "doc_id", "_t").collect()))
    b = sorted(
        map(
            tuple,
            dsir_contrast(
                docs.repartition(13), "text", "doc_id", "_t"
            ).collect(),
        )
    )
    assert a == b


# ---------------------------------------------------- streaming shard export


def test_stream_shard_writer_accumulates_and_replays(spark, sf_dir, tmp_path):
    """Micro-batches accumulate under batch=<id>/shard=K; replaying a
    batch is a no-op for the final dataset (its dir is overwritten); all
    rows land in the shard a batch-free export would choose."""
    from creek_spark.operators.pipeline import (
        shard_assign,
        stream_shard_writer,
    )

    docs = read_table(spark, sf_dir, "documents")
    path = str(tmp_path / "stream_shards")
    write = stream_shard_writer(path, "doc_id")
    b0 = docs.where(F.col("doc_id") % 3 == 0)
    b1 = docs.where(F.col("doc_id") % 3 == 1)
    b2 = docs.where(F.col("doc_id") % 3 == 2)
    write(b0, 0)
    write(b1, 1)
    write(b1, 1)  # replay: overwrite own dir, no duplication
    write(b2, 2)
    back = spark.read.option("basePath", path).parquet(path)
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()
    want = {
        r["doc_id"]: r["shard"]
        for r in shard_assign(docs, "doc_id").select("doc_id", "shard").collect()
    }
    for r in back.select("doc_id", "shard").collect():
        assert want[int(r["doc_id"])] == int(r["shard"])
    # batch pruning works: batch=1 holds exactly b1
    onlyb1 = back.where(F.col("batch") == 1)
    assert onlyb1.count() == b1.count()


def test_stream_shard_writer_refuses_reset_checkpoint(
    spark, sf_dir, tmp_path
):
    """Round-11 verdict finding: 'overwrites its own batch dir' is only
    replay-safe.  A reset/relocated checkpoint recycles batch ids with
    NEW rows — an unfenced overwrite would silently REPLACE an earlier
    committed batch's shards.  The sink now carries the same fence as
    every other foreachBatch sink: below-fence ids raise, an on-fence
    id with different content raises FenceContentError, a genuine
    replay (identical content) stays a no-op, and a crash between the
    data write and the fence publish replays idempotently."""
    import json
    import os

    import pytest

    from creek_spark.operators.pipeline import stream_shard_writer
    from creek_spark.streaming.fence import FenceContentError

    docs = read_table(spark, sf_dir, "documents")
    path = str(tmp_path / "stream_shards")
    write = stream_shard_writer(path, "doc_id")
    b0 = docs.where(F.col("doc_id") % 3 == 0)
    b1 = docs.where(F.col("doc_id") % 3 == 1)
    b2 = docs.where(F.col("doc_id") % 3 == 2)
    write(b0, 0)
    write(b1, 1)
    committed = spark.read.option("basePath", path).parquet(path).count()

    # reset checkpoint, id below the fence: refuse, change nothing
    with pytest.raises(ValueError, match="below stream_shard_writer"):
        write(b2, 0)
    # reset checkpoint landing exactly ON the fence with new rows:
    # the content fingerprint refuses it loudly
    with pytest.raises(FenceContentError, match="content differs"):
        write(b2, 1)
    # genuine replay: no-op, nothing duplicated or replaced
    write(b1, 1)
    back = spark.read.option("basePath", path).parquet(path)
    assert back.count() == committed
    assert back.where(F.col("batch") == 0).count() == b0.count()

    # crash window: data written, fence publish lost — the replay
    # rewrites the same dir and re-publishes (no loss, no duplication).
    # The rollback goes through fsio (the sink's own state layer): a
    # plain open() write would leave the local ChecksumFileSystem's
    # .crc sidecar stale, which the sink rightly refuses as corruption
    # rather than silently treating as "no fence".
    from creek_spark import fsio

    fence_path = os.path.join(path, "_fence.json")
    write(b2, 2)
    rec = fsio.read_json_or_none(spark, fence_path)
    fsio.write_json_atomic(
        spark, fence_path, {"last_batch_id": 1, "fence_print": None}
    )
    write(b2, 2)  # the replay after the simulated crash
    assert fsio.read_json_or_none(spark, fence_path) == rec
    back = spark.read.option("basePath", path).parquet(path)
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()


# --------------------------------------------------------- BPE pair counts


def test_bpe_pairs_match_brute_force(spark, sf_dir):
    """Weighted-vocabulary formulation == literal per-occurrence count."""
    from collections import Counter

    from creek_spark.operators.text import bpe_pair_counts

    docs = read_table(spark, sf_dir, "documents").limit(100)
    got = [(r["pair"], r["n_pair"]) for r in bpe_pair_counts(docs, "text", k=10).collect()]
    import re

    c: Counter = Counter()
    for r in docs.select("text").collect():
        norm = re.sub(r"[^a-z0-9]+", " ", r["text"].lower()).strip()
        for w in norm.split():
            for i in range(len(w) - 1):
                c[w[i : i + 2]] += 1
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == want


def test_bpe_pairs_plan_uses_take_ordered(spark, sf_dir):
    from creek_spark.operators.text import bpe_pair_counts
    from creek_spark.plans import explain_str, has_topk

    docs = read_table(spark, sf_dir, "documents")
    df = bpe_pair_counts(docs, "text")
    assert has_topk(df), explain_str(df)


# ------------------------------------------------------------- edge cases


def test_semantic_dedup_identical_vectors_keep_first(spark):
    """All-identical vectors: every row but the smallest id is removed,
    and dup_of chains to the first id."""
    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(1, 6)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r["vec_id"]: r for r in semantic_dedup(df, k=2, iters=1).collect()}
    assert not out[1]["removed"]
    for i in range(2, 6):
        assert out[i]["removed"] and out[i]["dup_of"] == 1


def test_token_budget_empty_and_oversized_docs(spark):
    """A doc alone over budget is dropped entirely; empty strata yield
    empty output, not errors."""
    from creek_spark.operators.pipeline import token_budget_sample

    rows = [
        (1, "one two three", "a"),
        (2, " ".join(["w"] * 50), "a"),   # 50 tokens, over budget alone
        (3, "x y", "b"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    kept = {
        r["doc_id"]: r["cum_tokens"]
        for r in token_budget_sample(df, budget=10).collect()
    }
    # doc 2 (50 tokens) can only be kept if it comes first in md5 order
    # AND fits — it doesn't fit, so it is never kept
    assert 2 not in kept
    assert 3 in kept


def test_bpe_pairs_short_words_excluded(spark):
    """Single-char words contribute no pairs; empty text contributes
    nothing (no ANSI substring errors)."""
    from creek_spark.operators.text import bpe_pair_counts

    rows = [(1, "a b c ab"), (2, ""), (3, "x")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["pair"]: r["n_pair"] for r in bpe_pair_counts(df, "text").collect()}
    assert got == {"ab": 1}


# --------------------------------------------------------- count-min sketch


def test_cms_overestimates_never_underestimates(spark, sf_dir):
    from creek_spark.operators.sketches import cms_build, cms_estimate

    from creek_spark.functions.text import tokens as _tokens

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(_tokens("text")).alias("tok"))
    # a tight sketch (width 8) forces collisions: est must still be >= exact
    sk = cms_build(toks, "tok", depth=3, width=8)
    exact = {
        r["tok"]: r["n"]
        for r in toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    probes = spark.createDataFrame([(t,) for t in list(exact)[:30]], ["tok"])
    est = cms_estimate(sk, probes, "tok", depth=3, width=8)
    for r in est.collect():
        assert r["est_count"] >= exact[r["tok"]], r


def test_cms_merge_equals_single_build(spark, sf_dir):
    """Cell-wise merge of per-batch sketches == one sketch of the union
    — the additivity that makes the sketch streamable."""
    from creek_spark.operators.sketches import cms_build, cms_merge

    from creek_spark.functions.text import tokens as _tokens

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(_tokens("text")).alias("tok"))
    b1 = toks.where(F.col("doc_id") % 2 == 0)
    b2 = toks.where(F.col("doc_id") % 2 == 1)
    merged = cms_merge(
        cms_build(b1, "tok"), cms_build(b2, "tok")
    )
    single = cms_build(toks, "tok")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, single.collect())
    )


def test_cms_sketch_is_bounded(spark, sf_dir):
    from creek_spark.operators.sketches import cms_build

    from creek_spark.functions.text import tokens as _tokens

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(_tokens("text")).alias("tok"))
    sk = cms_build(toks, "tok", depth=4, width=64)
    assert sk.count() <= 4 * 64


# ------------------------------------------------------- quarantine reads


def test_read_with_quarantine_splits_clean_and_bad(spark, tmp_path):
    from creek_spark.sources.formats import read_with_quarantine

    src = tmp_path / "in"
    src.mkdir()
    (src / "a.json").write_text(
        '{"id": 1, "v": "x"}\n'
        "THIS IS NOT JSON\n"
        '{"id": 2, "v": "y"}\n'
        '{"id": "boom", "v": 3}\n'
    )
    qdir = str(tmp_path / "quarantine")
    clean = read_with_quarantine(
        spark, str(src), "json", "id bigint, v string", quarantine_path=qdir
    )
    # count() must work too — the raw-file corrupt-column formulation
    # fails here with SPARK-21610 (the reason this is expression-based)
    assert clean.count() == 2
    rows = sorted((r["id"], r["v"]) for r in clean.collect())
    assert rows == [(1, "x"), (2, "y")]
    bad = spark.read.json(qdir)
    raws = sorted(r["raw"] for r in bad.collect())
    assert len(raws) == 2
    assert "THIS IS NOT JSON" in raws[1] or "THIS IS NOT JSON" in raws[0]
    assert all(r["source_file"].endswith("a.json") for r in bad.collect())


def test_read_with_quarantine_csv(spark, tmp_path):
    from creek_spark.sources.formats import read_with_quarantine

    src = tmp_path / "csv_in"
    src.mkdir()
    (src / "a.csv").write_text("id,v\n1,x\nnot_a_number,y\n3,z\n")
    clean = read_with_quarantine(
        spark, str(src), "csv", "id bigint, v string",
        quarantine_path=str(tmp_path / "q"),
    )
    assert sorted((r["id"], r["v"]) for r in clean.collect()) == [
        (1, "x"),
        (3, "z"),
    ]
    assert spark.read.json(str(tmp_path / "q")).count() == 1


def test_read_with_quarantine_csv_header_first_line_only(spark, tmp_path):
    """header=True must skip each file's FIRST line only (round-4
    advice): a data row equal to the header string survives, an oddly
    spaced header is still skipped (not quarantined), and a multi-file
    read drops one header per file."""
    from creek_spark.sources.formats import read_with_quarantine

    src = tmp_path / "csv_hdr"
    src.mkdir()
    # file a: normal header + a DATA row that equals the header string
    (src / "a.csv").write_text("id,v\n1,x\nid,v\n2,y\n")
    # file b: header with a space (string-match would miss it)
    (src / "b.csv").write_text("id, v\n3,z\n")
    clean = read_with_quarantine(
        spark, str(src), "csv", "id string, v string",
        quarantine_path=str(tmp_path / "qh"),
    )
    rows = sorted((r["id"], r["v"]) for r in clean.collect())
    assert rows == [("1", "x"), ("2", "y"), ("3", "z"), ("id", "v")]
    import glob

    bad_bytes = sum(
        len(open(p, "rb").read())
        for p in glob.glob(str(tmp_path / "qh" / "part-*"))
    )
    assert bad_bytes == 0  # nothing quarantined — headers were skipped


def test_read_with_quarantine_requires_schema_and_format(spark, tmp_path):
    import pytest

    from creek_spark.sources.formats import read_with_quarantine

    with pytest.raises(ValueError):
        read_with_quarantine(spark, str(tmp_path), "parquet", "id bigint")


# --------------------------------------------------------------- PII audit


def test_scrub_zeroes_the_pii_audit(spark):
    """The audit and the scrubber must agree: after scrub_pii, the same
    regex counts return to zero and n_redactions equals what the audit
    saw."""
    from creek_spark.operators.pipeline import (
        EMAIL_RE,
        IPV4_RE,
        scrub_pii,
    )

    rows = [
        (1, "write to a@b.com or c.d@e.org today"),
        (2, "server at 10.1.2.3 and 192.168.0.1"),
        (3, "clean text with no identifiers"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    scrubbed = scrub_pii(df, "text")
    got = {r["doc_id"]: r for r in scrubbed.collect()}
    assert got[1]["n_redactions"] == 2
    assert got[2]["n_redactions"] == 2
    assert got[3]["n_redactions"] == 0
    post = scrubbed.select(
        F.coalesce(
            F.regexp_count(F.col("text_scrubbed"), F.lit(EMAIL_RE)), F.lit(0)
        ).alias("e"),
        F.coalesce(
            F.regexp_count(F.col("text_scrubbed"), F.lit(IPV4_RE)), F.lit(0)
        ).alias("i"),
    ).agg(F.sum("e").alias("e"), F.sum("i").alias("i")).collect()[0]
    assert post["e"] == 0 and post["i"] == 0
