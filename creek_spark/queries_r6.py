"""Query catalog, part 8: corpus-curation operators layered on the dedup
and pipeline families — leakage-safe splitting, temperature mixing,
distribution-drift monitoring, and embedding-dimension profiling.

Determinism rules as in queries.py (decimal sandwich, integer quota
arithmetic, IEEE-only scalar math, md5 orderings).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from creek_spark.queries import _t, register
from creek_spark.queries_northstar import (
    BANDS,
    N_HASHES,
    SHINGLE_K,
    _cluster_oracle,
)
from creek_spark.operators import dedup as dd


# =====================================================================
# leakage-safe splitting (clusters share a split)
# =====================================================================

SPLIT_FRACTIONS = {"train": 90, "val": 5, "test": 5}
SPLIT_SALT = "split"


def _split_case() -> str:
    """The md5-threshold CASE mirroring pipeline.split_assign for
    SPLIT_FRACTIONS: sorted names, cumulative /256 thresholds."""
    acc, arms = 0, []
    names = sorted(SPLIT_FRACTIONS)
    for name in names[:-1]:
        acc += SPLIT_FRACTIONS[name]
        thr = format(int(acc * 256 / 100), "02x")
        arms.append(f"WHEN _fb < '{thr}' THEN '{name}'")
    return (
        f"CASE "
        + " ".join(arms)
        + f" ELSE '{names[-1]}' END"
    )


def _leakage_split_oracle() -> str:
    """Splice the recursive-closure component CTEs (same as
    dedup_clusters' oracle) into a CTE, then LEFT JOIN every document and
    split on the md5 of the component representative."""
    cluster_sql = _cluster_oracle().strip()
    with_part, final_select = cluster_sql.rsplit("SELECT s AS doc", 1)
    with_part = with_part.rstrip()
    if not with_part.endswith(","):
        with_part += ","
    case = _split_case()
    return f"""
    {with_part}
    comp AS (SELECT s AS doc{final_select}),
    rep AS (SELECT d.doc_id,
                   COALESCE(c.cluster, d.doc_id) AS cluster_rep
            FROM documents d LEFT JOIN comp c ON c.doc = d.doc_id),
    fb AS (SELECT doc_id, cluster_rep,
                  substring(md5('{SPLIT_SALT}' || CAST(cluster_rep AS VARCHAR)), 1, 2) AS _fb
           FROM rep)
    SELECT doc_id, cluster_rep, {case} AS split FROM fb
    """


@register("split_leakage_safe", _leakage_split_oracle(), "pipeline")
def split_leakage_safe(spark, sf_dir):
    """Cluster-aware train/val/test split: every near-duplicate cluster
    (connected components over the MinHash-LSH candidate pairs, exactly
    dedup_clusters' graph) lands in ONE split, keyed on the md5 of the
    cluster representative — the split that makes held-out evaluation
    honest on a corpus with near-dups.

    The oracle recomputes the components with a recursive transitive
    closure and applies the identical md5-threshold assignment — exact
    match despite the Spark side being an iterative
    (checkpoint-truncated) algorithm."""
    from creek_spark.operators.pipeline import leakage_safe_split

    docs = _t(spark, sf_dir, "documents")
    pairs = dd.minhash_lsh_candidates(
        docs, "text", "doc_id",
        n_hashes=N_HASHES, bands=BANDS, shingle_k=SHINGLE_K,
    )
    return leakage_safe_split(docs, pairs, "doc_id", SPLIT_FRACTIONS,
                              salt=SPLIT_SALT)


# =====================================================================
# temperature-based source mixing
# =====================================================================

MIX_BUDGET = 200
MIX_SALT = "mix"
MIX_SCALE = 1_000_000


def _mix_temperature_oracle() -> str:
    return f"""
    WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
               FROM documents GROUP BY lang),
    w AS (SELECT lang,
                 CAST(FLOOR(SQRT(CAST(n AS DOUBLE)) * {float(MIX_SCALE)}) AS BIGINT) AS w
          FROM c),
    tot AS (SELECT CAST(SUM(w) AS BIGINT) AS tw FROM w),
    q AS (SELECT lang, (CAST({MIX_BUDGET} AS BIGINT) * w) // tw AS quota
          FROM w, tot),
    r AS (SELECT doc_id, lang, n_chars,
                 ROW_NUMBER() OVER (
                     PARTITION BY lang
                     ORDER BY md5('{MIX_SALT}' || CAST(doc_id AS VARCHAR)), doc_id
                 ) AS rk
          FROM documents)
    SELECT r.doc_id, r.lang, r.n_chars
    FROM r JOIN q USING (lang) WHERE rk <= quota
    """


@register("mix_temperature", _mix_temperature_oracle(), "pipeline")
def mix_temperature(spark, sf_dir):
    """Temperature-(τ=0.5) mixture sampling over languages: per-language
    quotas ∝ sqrt(count) — the multilingual rebalancing move — with
    integer quota arithmetic and md5-rank selection so both engines pick
    the exact same rows.  The oracle's per-language ROW_NUMBER window is
    computed distributed via segmented_running (no low-cardinality
    partition sort)."""
    from creek_spark.operators.pipeline import temperature_mix_sample

    docs = _t(spark, sf_dir, "documents")
    out = temperature_mix_sample(
        docs, "lang", "doc_id",
        budget=MIX_BUDGET, weight_scale=MIX_SCALE, salt=MIX_SALT,
    )
    return out.select("doc_id", "lang", "n_chars")


# =====================================================================
# distribution drift (per-source TVD vs the corpus)
# =====================================================================

DRIFT_BIN_WIDTH = 100
DRIFT_N_BINS = 6


def _drift_oracle() -> str:
    w, nb = DRIFT_BIN_WIDTH, DRIFT_N_BINS
    return f"""
    WITH b AS (SELECT source,
                      LEAST(CAST(n_chars AS BIGINT) // {w}, {nb - 1}) AS bin
               FROM documents),
    gb AS (SELECT source, bin, CAST(COUNT(*) AS BIGINT) AS c_gb
           FROM b GROUP BY source, bin),
    gt AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_g FROM b GROUP BY source),
    cb AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS c_b FROM b GROUP BY bin),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM b),
    grid AS (SELECT gt.source, gt.n_g, cb.bin, cb.c_b, n.n,
                    COALESCE(gb.c_gb, 0) AS c_gb
             FROM gt CROSS JOIN cb CROSS JOIN n
             LEFT JOIN gb ON gb.source = gt.source AND gb.bin = cb.bin)
    SELECT source, CAST(n_g AS BIGINT) AS n_docs,
           CAST(CAST(SUM(ABS(c_gb * n - c_b * n_g)) AS BIGINT) AS DOUBLE)
               / (2.0 * CAST(n_g AS DOUBLE) * CAST(n AS DOUBLE)) AS tvd
    FROM grid GROUP BY source, n_g, n
    """


@register("quality_drift_tvd", _drift_oracle(), "quality")
def quality_drift_tvd(spark, sf_dir):
    """Per-source distribution drift: total-variation distance between
    each source's document-length distribution (100-char bins, top bin
    open) and the whole corpus — the pre-mix drift monitor.  Integer bin
    sums, one final IEEE division; one corpus scan, everything after is
    aggregate-sized and broadcast."""
    from creek_spark.operators.quality import distribution_drift

    docs = _t(spark, sf_dir, "documents")
    return distribution_drift(
        docs, "source", "n_chars",
        bin_width=DRIFT_BIN_WIDTH, n_bins=DRIFT_N_BINS,
    )


# =====================================================================
# embedding-dimension profiling
# =====================================================================

EMB_DIM_STATS_ORACLE = """
WITH pos AS (SELECT unnest(generate_series(1, len(embedding))) AS dim,
                    unnest([CAST(x AS DOUBLE) FOR x IN embedding]) AS v
             FROM embeddings),
a AS (SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(FLOOR(v * 1000000000.0) AS DECIMAL(38,0))) AS s,
             SUM(CAST(FLOOR(v * v * 1000000000000.0) AS DECIMAL(38,0))) AS ss,
             MIN(v) AS vmin, MAX(v) AS vmax
      FROM pos GROUP BY dim)
SELECT dim, n,
       CAST(s AS DOUBLE) / (1000000000.0 * CAST(n AS DOUBLE)) AS mean,
       CAST(ss AS DOUBLE) / (1000000000000.0 * CAST(n AS DOUBLE))
           - (CAST(s AS DOUBLE) / (1000000000.0 * CAST(n AS DOUBLE)))
             * (CAST(s AS DOUBLE) / (1000000000.0 * CAST(n AS DOUBLE))) AS variance,
       vmin, vmax
FROM a
"""


@register("embedding_dim_stats", EMB_DIM_STATS_ORACLE, "similarity")
def embedding_dim_stats_q(spark, sf_dir):
    """Per-dimension embedding statistics (count/mean/variance/min/max):
    the index-build sanity pass.  posexplode → hash aggregate on the
    dimension index (64 keys, map-side combine), decimal-sandwich sums,
    fixed-order IEEE mean/variance."""
    from creek_spark.operators.profile import embedding_dim_stats

    emb = _t(spark, sf_dir, "embeddings")
    return embedding_dim_stats(emb, "embedding")


# =====================================================================
# n-gram novelty scoring
# =====================================================================

NOVELTY_K = 3


def _novelty_oracle() -> str:
    from creek_spark.queries_northstar import _sql_shingles

    return f"""
    WITH {_sql_shingles(NOVELTY_K)},
    fr AS (SELECT shingle, CAST(COUNT(*) AS BIGINT) AS df
           FROM sh GROUP BY shingle)
    SELECT sh.doc, CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
           CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS novelty
    FROM sh JOIN fr USING (shingle) GROUP BY sh.doc
    """


@register("text_ngram_novelty", _novelty_oracle(), "text")
def text_ngram_novelty(spark, sf_dir):
    """Per-document 3-gram novelty (fraction of shingles unique to the
    document corpus-wide) — the add-new-content preference signal.  One
    scan, document frequency via an unordered shingle-partitioned window
    (no self-join), one per-doc hash aggregate."""
    from creek_spark.operators.text import ngram_novelty

    docs = _t(spark, sf_dir, "documents")
    return ngram_novelty(docs, "text", "doc_id", k=NOVELTY_K)


# =====================================================================
# seasonal decomposition (trend / hour-of-day seasonal / residual)
# =====================================================================

MA_HOURS = 12  # centered moving-average half-width (25-point window)


def _seasonal_oracle() -> str:
    w = MA_HOURS
    return f"""
    WITH h AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket,
             CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DECIMAL(18,2)) AS vd
      FROM events GROUP BY 1, 2),
    t AS (
      SELECT event_type, bucket, vd,
             CAST(SUM(vd) OVER wma AS DOUBLE)
                 / CAST(COUNT(*) OVER wma AS DOUBLE) AS trend
      FROM h
      WINDOW wma AS (PARTITION BY event_type ORDER BY bucket
                     ROWS BETWEEN {w} PRECEDING AND {w} FOLLOWING)),
    d AS (
      SELECT *, CAST(vd AS DOUBLE) - trend AS detr,
             EXTRACT(HOUR FROM bucket) AS hod
      FROM t),
    s AS (
      SELECT *,
             CAST(CAST(SUM(CAST(FLOOR(detr * 100.0) AS BIGINT)) OVER whod AS BIGINT) AS DOUBLE)
                 / (100.0 * CAST(COUNT(*) OVER whod AS DOUBLE)) AS seasonal
      FROM d
      WINDOW whod AS (PARTITION BY event_type, hod))
    SELECT event_type, bucket, CAST(vd AS DOUBLE) AS v,
           trend, seasonal, detr - seasonal AS residual
    FROM s
    """


@register("ts_seasonal_decompose", _seasonal_oracle(), "timeseries")
def ts_seasonal_decompose(spark, sf_dir):
    """Additive seasonal decomposition of the hourly revenue series per
    event type: trend = centered 25-point moving average, seasonal =
    hour-of-day mean of the detrended series, residual = the rest — the
    classical-decomposition baseline every monitoring stack runs before
    alerting on a seasonal metric.

    Determinism: hourly sums stay decimal; trend is one double division
    of exact operands; the seasonal mean sums FLOOR-quantized cents
    (floor has no cross-engine rounding ties) and divides once.

    Scale shape: the corpus collapses to the (type, hour) summary BEFORE
    any ordered work (same plan family as ts_cusum_hourly) — the moving
    average and hour-of-day windows walk a bounded series, never the
    corpus."""
    ev = _t(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(
        F.sum(F.col("value").cast("decimal(14,2)"))
        .cast("decimal(18,2)")
        .alias("vd")
    )
    from pyspark.sql import Window

    wma = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(-MA_HOURS, MA_HOURS)
    )
    t = h.select(
        "event_type",
        "bucket",
        "vd",
        (
            F.sum("vd").over(wma).cast("double")
            / F.count(F.lit(1)).over(wma).cast("double")
        ).alias("trend"),
    )
    d = t.select(
        "*",
        (F.col("vd").cast("double") - F.col("trend")).alias("detr"),
        F.hour("bucket").alias("hod"),
    )
    whod = Window.partitionBy("event_type", "hod")
    s = d.select(
        "*",
        (
            F.sum(F.floor(F.col("detr") * F.lit(100.0)).cast("bigint"))
            .over(whod)
            .cast("double")
            / (F.lit(100.0) * F.count(F.lit(1)).over(whod).cast("double"))
        ).alias("seasonal"),
    )
    return s.select(
        "event_type",
        "bucket",
        F.col("vd").cast("double").alias("v"),
        "trend",
        "seasonal",
        (F.col("detr") - F.col("seasonal")).alias("residual"),
    )


# =====================================================================
# revenue cohort LTV
# =====================================================================

COHORT_LTV_ORACLE = """
WITH r AS (SELECT o_custkey AS c, date_trunc('month', o_orderdate) AS mon,
                  SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS rev
           FROM orders GROUP BY 1, 2),
f AS (SELECT c, MIN(mon) AS cohort FROM r GROUP BY c),
sz AS (SELECT cohort, CAST(COUNT(*) AS BIGINT) AS cohort_size
       FROM f GROUP BY cohort),
cell AS (SELECT f.cohort,
                CAST(date_diff('month', f.cohort, r.mon) AS INT) AS age_months,
                CAST(COUNT(*) AS BIGINT) AS n_active,
                CAST(SUM(r.rev) AS DECIMAL(18,2)) AS revd
         FROM r JOIN f USING (c)
         GROUP BY f.cohort, age_months),
cum AS (SELECT cohort, age_months, n_active, revd,
               CAST(SUM(revd) OVER (PARTITION BY cohort ORDER BY age_months
                    ROWS UNBOUNDED PRECEDING) AS DECIMAL(20,2)) AS cumd
        FROM cell)
SELECT cum.cohort AS cohort_month, age_months, n_active,
       CAST(revd AS DOUBLE) AS revenue,
       CAST(cumd AS DOUBLE) AS cum_revenue,
       sz.cohort_size,
       CAST(cumd AS DOUBLE) / CAST(sz.cohort_size AS DOUBLE)
           AS ltv_per_customer
FROM cum JOIN sz USING (cohort)
"""


@register("orders_cohort_ltv", COHORT_LTV_ORACLE, "aggregation")
def orders_cohort_ltv(spark, sf_dir):
    """Revenue-cohort lifetime value: customers grouped by
    first-purchase month, revenue laid out by months-since-first, with
    the running cumulative per cohort and LTV per customer — the
    subscription/e-commerce finance staple (the revenue twin of
    events_retention's user-count triangle).

    Determinism: all revenue stays decimal through the per-cell sum AND
    the cumulative window; each double is one cast (plus one division
    for the per-customer LTV) of exact operands.

    Scale shape: orders collapse to the (customer, month) revenue grid
    first (one hash agg); firsts/sizes fold FROM that grid; the
    customer-keyed join reuses the grid's partitioning prefix; the
    cumulative window walks the (cohort, age) summary — bounded by
    months², never corpus-sized."""
    o = _t(spark, sf_dir, "orders")
    r = o.groupBy(
        F.col("o_custkey").alias("c"),
        F.date_trunc("month", F.col("o_orderdate")).alias("mon"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(14,2)")).alias("rev"))
    f = r.groupBy("c").agg(F.min("mon").alias("cohort"))
    sz = f.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    cell = (
        r.join(f, "c")
        .groupBy(
            "cohort",
            F.months_between(F.col("mon"), F.col("cohort"))
            .cast("int")
            .alias("age_months"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_active"),
            F.sum("rev").cast("decimal(18,2)").alias("revd"),
        )
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("cohort")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = cell.withColumn(
        "cumd", F.sum("revd").over(w).cast("decimal(20,2)")
    )
    return cum.join(F.broadcast(sz), "cohort").select(
        F.col("cohort").alias("cohort_month"),
        "age_months",
        "n_active",
        F.col("revd").cast("double").alias("revenue"),
        F.col("cumd").cast("double").alias("cum_revenue"),
        "cohort_size",
        (
            F.col("cumd").cast("double")
            / F.col("cohort_size").cast("double")
        ).alias("ltv_per_customer"),
    )


# =====================================================================
# XYZ demand-variability classification
# =====================================================================

XYZ_ORACLE = """
WITH m AS (SELECT l_partkey AS partkey,
                  date_trunc('month', l_shipdate) AS mon,
                  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS q
           FROM lineitem GROUP BY 1, 2),
s AS (SELECT partkey, CAST(COUNT(*) AS BIGINT) AS n_months,
             SUM(CAST(q AS DECIMAL(20,2))) AS sq,
             SUM(CAST(q * q AS DECIMAL(38,4))) AS sqq
      FROM m GROUP BY partkey),
c AS (SELECT partkey, n_months,
             CAST(sq AS DOUBLE) / CAST(n_months AS DOUBLE) AS mean_qty,
             SQRT(GREATEST(
                 CAST(sqq AS DOUBLE) / CAST(n_months AS DOUBLE)
                 - (CAST(sq AS DOUBLE) / CAST(n_months AS DOUBLE))
                   * (CAST(sq AS DOUBLE) / CAST(n_months AS DOUBLE)),
                 0.0)) AS std_qty
      FROM s)
SELECT partkey, n_months, mean_qty,
       std_qty / mean_qty AS cv,
       CASE WHEN std_qty / mean_qty < 0.5 THEN 'X'
            WHEN std_qty / mean_qty < 1.0 THEN 'Y'
            ELSE 'Z' END AS xyz_class
FROM c
"""


@register("parts_xyz_variability", XYZ_ORACLE, "aggregation")
def parts_xyz_variability(spark, sf_dir):
    """XYZ demand-variability classification per part: monthly demand
    series → coefficient of variation → X (steady, CV < 0.5) /
    Y (fluctuating, CV < 1.0) / Z (erratic) — pareto_abc's companion
    axis in the standard ABC-XYZ inventory matrix.

    Determinism: monthly quantities and their squares stay decimal
    through both aggregations; mean/std/cv are a fixed-order chain of
    IEEE ops (sqrt is correctly-rounded in both engines) on exact sums.

    Scale shape: two skew-free hash aggregations — (part, month) then
    part — with map-side combines; no window, no join, CV and class are
    pure projections."""
    li = _t(spark, sf_dir, "lineitem")
    m = li.groupBy(
        F.col("l_partkey").alias("partkey"),
        F.date_trunc("month", F.col("l_shipdate")).alias("mon"),
    ).agg(
        F.sum(F.col("l_quantity").cast("decimal(12,2)"))
        .cast("decimal(18,2)")
        .alias("q")
    )
    s = m.groupBy("partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_months"),
        F.sum(F.col("q").cast("decimal(20,2)")).alias("sq"),
        F.sum((F.col("q") * F.col("q")).cast("decimal(38,4)")).alias("sqq"),
    )
    mean = F.col("sq").cast("double") / F.col("n_months").cast("double")
    var = (
        F.col("sqq").cast("double") / F.col("n_months").cast("double")
        - mean * mean
    )
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    cv = std / mean
    return s.select(
        "partkey",
        "n_months",
        mean.alias("mean_qty"),
        cv.alias("cv"),
        F.when(cv < 0.5, F.lit("X"))
        .when(cv < 1.0, F.lit("Y"))
        .otherwise(F.lit("Z"))
        .alias("xyz_class"),
    )
