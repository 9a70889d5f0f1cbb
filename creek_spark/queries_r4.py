"""Query catalog, part 7: interval-overlap join, snapshot diffing, fuzzy
string matching — the round-4 widening of the join/CDC families.

Determinism rules as in queries.py (decimal sandwich, total-order
tiebreaks, IEEE-only scalar math).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from creek_spark.operators.cachereg import register_cache
from creek_spark.queries import QUERIES, _t, dec, register
from creek_spark.queries_ext import _events_envelope


@register(
    "join_interval_overlap",
    """
    WITH v AS (SELECT user_id, MIN(ts) AS v_lo, MAX(ts) AS v_hi
               FROM events WHERE event_type = 'view'
               GROUP BY user_id, date_trunc('day', ts)),
         c AS (SELECT user_id, MIN(ts) AS c_lo, MAX(ts) AS c_hi
               FROM events WHERE event_type = 'click'
               GROUP BY user_id, date_trunc('hour', ts))
    SELECT v.user_id, v_lo, v_hi, c_lo, c_hi
    FROM v JOIN c ON v.user_id = c.user_id
                 AND v_lo <= c_hi AND c_lo <= v_hi
    """,
    "join",
)
def join_interval_overlap(spark, sf_dir):
    """Interval-overlap join (Flink intervalJoin / range-join analog):
    per-user daily view spans × hourly click spans that overlap in time.

    The operator replicates each interval to the fixed 6h time cells it
    touches and joins EQUI on (user_id, cell) with the overlap predicate
    residual — per-key work is cell-local density, never |v|×|c| per
    user, and the first-shared-cell rule emits each pair exactly once
    with no dedup shuffle (operators/intervals.py)."""
    from creek_spark.operators.intervals import interval_overlap_join

    ev = _t(spark, sf_dir, "events")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", F.date_trunc("day", F.col("ts")).alias("_d"))
        .agg(F.min("ts").alias("v_lo"), F.max("ts").alias("v_hi"))
        .drop("_d")
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", F.date_trunc("hour", F.col("ts")).alias("_h"))
        .agg(F.min("ts").alias("c_lo"), F.max("ts").alias("c_hi"))
        .drop("_h")
    )
    return interval_overlap_join(
        v, c, ["user_id"],
        left_bounds=("v_lo", "v_hi"),
        right_bounds=("c_lo", "c_hi"),
        cell_seconds=21600,
    )


@register(
    "cdc_snapshot_diff",
    """
    WITH old_s AS (
      SELECT user_id, event_type, ts, value FROM (
        SELECT user_id, event_type, ts, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE event_id <= 800) t
      WHERE rn = 1 AND event_type <> 'error'),
    new_s AS (
      SELECT user_id, event_type, ts, value FROM (
        SELECT user_id, event_type, ts, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY event_id DESC) AS rn
        FROM events) t
      WHERE rn = 1 AND event_type <> 'error')
    SELECT COALESCE(o.user_id, n.user_id) AS user_id,
           CASE WHEN o.user_id IS NULL THEN 'added'
                WHEN n.user_id IS NULL THEN 'removed'
                ELSE 'changed' END AS change,
           o.event_type AS old_event_type, n.event_type AS new_event_type,
           o.value AS old_value, n.value AS new_value
    FROM old_s o FULL OUTER JOIN new_s n ON o.user_id = n.user_id
    WHERE o.user_id IS NULL OR n.user_id IS NULL
       OR o.event_type IS DISTINCT FROM n.event_type
       OR o.ts IS DISTINCT FROM n.ts
       OR o.value IS DISTINCT FROM n.value
    """,
    "cdc",
)
def cdc_snapshot_diff(spark, sf_dir):
    """Snapshot diff: classify every key as added/removed/changed between
    the state at LSN 800 and the current state (reference consumers diff
    successive snapshots to audit replication; the engine computes it as
    one full-outer join of two latest_state materializations).  At 100 TB
    both sides are key-partitioned state tables, so the join co-locates;
    unchanged keys (the overwhelming majority) are filtered pre-output."""
    from creek_spark.operators.cdc import latest_state
    from creek_spark.functions.lsn import lsn_num

    env = _events_envelope(_t(spark, sf_dir, "events"))
    num = lsn_num(F.col("source.lsn"))
    old_s = latest_state(env.filter(num <= 800), ["user_id"], handle_toast=False)
    new_s = latest_state(env, ["user_id"], handle_toast=False)
    o = old_s.select(
        F.col("user_id").alias("o_uid"),
        F.col("event_type").alias("old_event_type"),
        F.col("ts").alias("o_ts"),
        F.col("value").alias("old_value"),
    )
    n = new_s.select(
        F.col("user_id").alias("n_uid"),
        F.col("event_type").alias("new_event_type"),
        F.col("ts").alias("n_ts"),
        F.col("value").alias("new_value"),
    )
    j = o.join(n, o.o_uid == n.n_uid, "full_outer")
    differs = (
        o.o_uid.isNull()
        | n.n_uid.isNull()
        | ~F.col("old_event_type").eqNullSafe(F.col("new_event_type"))
        | ~F.col("o_ts").eqNullSafe(F.col("n_ts"))
        | ~F.col("old_value").eqNullSafe(F.col("new_value"))
    )
    change = (
        F.when(o.o_uid.isNull(), "added")
        .when(n.n_uid.isNull(), "removed")
        .otherwise("changed")
    )
    return j.where(differs).select(
        F.coalesce(o.o_uid, n.n_uid).alias("user_id"),
        change.alias("change"),
        "old_event_type",
        "new_event_type",
        "old_value",
        "new_value",
    )


@register(
    "join_fuzzy_match",
    """
    WITH q AS (SELECT p_partkey AS q_key, substring(p_name, 2) AS q_name
               FROM part WHERE p_partkey % 97 = 0),
    c AS (SELECT q_key, q_name, p_partkey AS match_key, p_name AS match_name,
                 CAST(levenshtein(q_name, p_name) AS INTEGER) AS dist
          FROM q CROSS JOIN part
          WHERE abs(length(q_name) - length(p_name)) <= 3
            AND levenshtein(q_name, p_name) <= 3),
    r AS (SELECT *, row_number() OVER (PARTITION BY q_key
                                       ORDER BY dist, match_key) AS rn
          FROM c)
    SELECT q_key, q_name, match_key, match_name, dist FROM r WHERE rn = 1
    """,
    "join",
)
def join_fuzzy_match(spark, sf_dir):
    """Fuzzy string matching: corrupted part names (leading char dropped)
    matched back to the catalog by Levenshtein distance ≤ 3, best match
    per query with a total-order tiebreak.  The query side is tiny and
    BROADCAST; a lossless length-band predicate prunes candidates before
    the edit-distance evaluation, so the scan side does |parts| cheap
    length checks and only band-local levenshtein calls — the shape that
    survives a 1000× part catalog (entity-resolution blocking)."""
    p = _t(spark, sf_dir, "part")
    q = p.where(F.col("p_partkey") % 97 == 0).select(
        F.col("p_partkey").alias("q_key"),
        F.expr("substring(p_name, 2)").alias("q_name"),
    )
    cand = (
        p.join(
            F.broadcast(q),
            F.abs(F.length("q_name") - F.length("p_name")) <= 3,
        )
        .withColumn("dist", F.levenshtein("q_name", "p_name").cast("int"))
        .where(F.col("dist") <= 3)
    )
    w = Window.partitionBy("q_key").orderBy("dist", "p_partkey")
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            "q_key",
            "q_name",
            F.col("p_partkey").alias("match_key"),
            F.col("p_name").alias("match_name"),
            "dist",
        )
    )


@register(
    "sample_stratified",
    """
    WITH ranked AS (
      SELECT source, lang, doc_id, n_chars,
             row_number() OVER (PARTITION BY source, lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                         doc_id) AS srank,
             COUNT(*) OVER (PARTITION BY source, lang) AS n
      FROM documents)
    SELECT source, lang, doc_id, n_chars
    FROM ranked
    WHERE srank <= CAST(ceil(0.2 * CAST(n AS DOUBLE)) AS BIGINT)
    """,
    "pipeline",
)
def sample_stratified(spark, sf_dir):
    """Exact-count stratified sampling: EXACTLY ceil(20% · n) documents
    per (source, lang) stratum, chosen by md5 rank — the balanced-corpus
    quota step where Bernoulli sampling can't guarantee small strata
    their count.  Pure function of ids → identical rows in any engine /
    any run; one per-stratum window shuffle (operators/pipeline.py)."""
    from creek_spark.operators.pipeline import stratified_exact_sample

    docs = _t(spark, sf_dir, "documents").select(
        "source", "lang", "doc_id", "n_chars"
    )
    return stratified_exact_sample(docs, ["source", "lang"], "doc_id", 0.2)


@register(
    "window_distribution",
    """
    SELECT event_id, event_type, value,
           ntile(4) OVER (PARTITION BY event_type
                          ORDER BY value, event_id) AS quartile,
           cume_dist() OVER (PARTITION BY event_type ORDER BY value) AS cume_d,
           percent_rank() OVER (PARTITION BY event_type ORDER BY value) AS pct_rank
    FROM events
    """,
    "window",
)
def window_distribution(spark, sf_dir):
    """Distribution window family: ntile quartile assignment (total-order
    tiebreak), cume_dist and percent_rank — the equal-frequency binning
    used for feature quantization.

    Scale shape (proactive round-5 fix): Spark's native
    ntile/cume_dist/percent_rank over ~5-value event_type partitions are
    single-task sorts of the corpus.  All three are instead derived in
    closed form from distributed counts: the global row_number comes
    from segmented_running (value-bucket segments, monotone in the
    (value, event_id) order), tie-aware ≤/< counts come from a
    cumulative sum over the (type, value)-distinct summary (same
    segmented decomposition), and n is a tiny broadcast aggregate.
      ntile(4):    tiles of size n div 4 (+1 for the first n mod 4)
      cume_dist:   cnt_le / n          (one exact-int double division)
      percent_rank:(rank-1)/(n-1) with rank = cnt_lt + 1, 0 when n = 1
    — identical values to the native window functions, no corpus-scale
    sorted partition anywhere in the plan."""
    from creek_spark.operators.distributed import segmented_running

    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    seg = F.floor(F.col("value") * 16).cast("bigint")
    base = segmented_running(
        ev,
        ["event_type"],
        seg,
        [F.col("value"), F.col("event_id")],
        {"_rn": (F.lit(1), "rownum")},
    )
    vc = ev.groupBy("event_type", "value").agg(F.count(F.lit(1)).alias("_vc"))
    vcum = segmented_running(
        vc,
        ["event_type"],
        F.floor(F.col("value") * 16).cast("bigint"),
        [F.col("value")],
        {"_cle": (F.col("_vc"), "sum")},
    ).select("event_type", "value", "_vc", "_cle")
    n = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("_n"))
    # null-safe joins: a NULL value (or type) is an ordinary partition /
    # ordering value in the native window form — plain equality would
    # silently drop those rows (round-5 ADVICE; segmented_running itself
    # became null-safe in round 6, so the whole path now tolerates NULLs)
    vcum_r = vcum.select(
        F.col("event_type").alias("_kt"),
        F.col("value").alias("_kv"),
        "_vc",
        "_cle",
    )
    j = (
        base.drop("_seg")
        .join(
            vcum_r,
            F.col("event_type").eqNullSafe(F.col("_kt"))
            & F.col("value").eqNullSafe(F.col("_kv")),
        )
        .drop("_kt", "_kv")
        .join(F.broadcast(n), "event_type")
    )
    rn, nn = F.col("_rn"), F.col("_n")
    base_sz = F.floor(nn / 4).cast("bigint")
    rem = nn - base_sz * 4
    cut = rem * (base_sz + 1)
    quartile = F.when(
        rn <= cut, F.ceil(rn / (base_sz + 1))
    ).otherwise(rem + F.ceil((rn - cut) / F.greatest(base_sz, F.lit(1))))
    cnt_lt = F.col("_cle") - F.col("_vc")
    return j.select(
        "event_id",
        "event_type",
        "value",
        quartile.cast("int").alias("quartile"),
        (F.col("_cle").cast("double") / nn.cast("double")).alias("cume_d"),
        F.when(nn == 1, F.lit(0.0))
        .otherwise(cnt_lt.cast("double") / (nn - 1).cast("double"))
        .alias("pct_rank"),
    )


@register(
    "dq_audit",
    """
    SELECT 'orders_fk_customer' AS check,
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT) AS n_bad
    UNION ALL
    SELECT 'lineitem_fk_orders',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT)
    UNION ALL
    SELECT 'customer_pk_unique',
           CAST((SELECT COUNT(*) - COUNT(DISTINCT c_custkey) FROM customer)
                AS BIGINT)
    UNION ALL
    SELECT 'events_value_nonnull',
           CAST((SELECT COUNT(CASE WHEN value IS NULL THEN 1 END)
                 FROM events) AS BIGINT)
    UNION ALL
    SELECT 'lineitem_qty_range',
           CAST((SELECT COUNT(CASE WHEN NOT (l_quantity >= 1
                                             AND l_quantity <= 50)
                              THEN 1 END)
                 FROM lineitem) AS BIGINT)
    """,
    "quality",
)
def dq_audit(spark, sf_dir):
    """Data-quality audit (the dbt-test battery as one report): FK
    orphan counts via broadcast left-anti joins, PK uniqueness as
    COUNT − COUNT(DISTINCT), null and domain-range violations as
    conditional counts.  Every check is a one-row aggregate, so the
    union is metadata-sized; at 100 TB the audit costs one scan per
    child table with pushdown-friendly predicates
    (operators/quality.py)."""
    from creek_spark.operators import quality as dq

    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    lineitem = _t(spark, sf_dir, "lineitem")
    events = _t(spark, sf_dir, "events")
    return dq.dq_audit(
        [
            dq.fk_check("orders_fk_customer", orders, customer,
                        "o_custkey", "c_custkey"),
            dq.fk_check("lineitem_fk_orders", lineitem, orders,
                        "l_orderkey", "o_orderkey"),
            dq.unique_check("customer_pk_unique", customer, ["c_custkey"]),
            dq.null_check("events_value_nonnull", events, "value"),
            dq.range_check(
                "lineitem_qty_range",
                lineitem,
                (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 50),
            ),
        ]
    )


# =====================================================================
# training-data export: token budgets, stable shards, semantic dedup
# =====================================================================

from creek_spark.queries_ext import SQL_TOKENS as _SQL_TOKENS

_DOC_TOKS = _SQL_TOKENS.format(c="text")

TOKEN_BUDGET = 2000


@register(
    "sample_token_budget",
    f"""
    SELECT doc_id, source, n_tokens, cum_tokens FROM (
      SELECT doc_id, source,
             CAST(len({_DOC_TOKS}) AS BIGINT) AS n_tokens,
             SUM(CAST(len({_DOC_TOKS}) AS BIGINT))
               OVER (PARTITION BY source
                     ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                     ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM documents) t
    WHERE cum_tokens <= {TOKEN_BUDGET}
    """,
    "pipeline",
)
def sample_token_budget(spark, sf_dir):
    """Token-budget sampling: per source, keep documents in md5 order
    while the running whitespace-token total stays ≤ 2000 — the
    "N tokens per source" mixture-construction step (count quotas can't
    cap compute; token budgets do).  Kept set is a deterministic prefix
    of the md5 order; one per-stratum window shuffle, running sum rides
    the rank's exchange (operators/pipeline.py token_budget_sample)."""
    from creek_spark.operators.pipeline import token_budget_sample

    docs = _t(spark, sf_dir, "documents")
    return token_budget_sample(
        docs, budget=TOKEN_BUDGET, text_col="text",
        id_col="doc_id", stratum_col="source",
    )


@register(
    "export_shards",
    f"""
    SELECT shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CAST(len({_DOC_TOKS}) AS BIGINT)) AS BIGINT) AS n_tokens,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_strata,
           MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
    FROM (SELECT *,
                 CAST(strpos('0123456789abcdef',
                             substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1
                      AS INTEGER) AS shard
          FROM documents) t
    GROUP BY shard
    """,
    "pipeline",
)
def export_shards(spark, sf_dir):
    """Stable-shard export manifest: shard = hex-prefix of md5(doc_id)
    (a pure function of the id — re-exports and incremental appends land
    rows in the same shard regardless of partitioning), with per-shard
    doc/token/strata balance stats.  Map-side assignment + one 16-row
    hash agg; the writer half (write_shards) streams each shard with a
    single repartition exchange (operators/pipeline.py)."""
    from creek_spark.operators.pipeline import shard_stats

    docs = _t(spark, sf_dir, "documents")
    return shard_stats(
        docs, id_col="doc_id", text_col="text",
        stratum_col="source", n_shards=16,
    )


@register(
    "training_export",
    None,  # assembled below after QUERIES["text_metrics"] exists
    "pipeline",
)
def training_export(spark, sf_dir):
    """The full export pipeline as ONE fused plan: quality-filter the
    corpus (best half per language by text_metrics score) → cap each
    source at a 2000-token budget (md5-order prefix) → assign stable
    md5-hex shards → emit the per-shard manifest.

    One metrics pass; the quality metrics computed for filtering are
    REUSED for the token budget (no re-tokenization).  Both ordered
    stages are segmented_running decompositions (proactive round-5 fix —
    lang and source are LOW-cardinality, so plain per-stratum windows
    would be single-task corpus sorts): the quality rank windows within
    (lang, score-bucket) segments, the token cumsum within
    (source, md5-prefix) segments, each with broadcast per-segment
    offsets; quotas come from a tiny per-language count of the raw
    table.  No stage leaves the JVM."""
    from creek_spark.operators import text as tx
    from creek_spark.operators.distributed import segmented_running
    from creek_spark.operators.pipeline import shard_assign

    docs = _t(spark, sf_dir, "documents")
    m = tx.text_metrics(docs, "text", "doc_id", keep=("lang", "source"))
    ranked = segmented_running(
        m.select("doc_id", "lang", "source", "n_tokens", "quality_score"),
        ["lang"],
        (-F.floor(F.col("quality_score") * 64)).cast("bigint"),
        [F.col("quality_score").desc(), F.col("doc_id")],
        {"_qrank": (F.lit(1), "rownum")},
        persist=True,  # input is the derived metrics pipeline
    )
    quota = docs.groupBy("lang").agg(
        F.ceil(F.lit(0.5) * F.count(F.lit(1)).cast("double")).alias("_quota")
    )
    q = (
        ranked.join(F.broadcast(quota), "lang")
        .where(F.col("_qrank") <= F.col("_quota"))
        .drop("_qrank", "_quota", "_seg")
    )
    tb = segmented_running(
        q.withColumn("_skey", F.md5(F.col("doc_id").cast("string"))),
        ["source"],
        F.substring(F.col("_skey"), 1, 2),
        [F.col("_skey"), F.col("doc_id")],
        {"_cum": (F.col("n_tokens").cast("bigint"), "sum")},
        persist=True,  # input chains the metrics + quality-filter legs
    ).where(F.col("_cum") <= 2000)
    sh = shard_assign(tb, "doc_id", n_shards=16)
    return sh.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.col("n_tokens").cast("bigint")).cast("bigint").alias("n_tokens"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
    )


def _training_export_oracle() -> str:
    inner = QUERIES["text_metrics"].oracle
    return f"""
    WITH m AS (SELECT mm.doc_id, d.lang, d.source, mm.n_tokens, mm.quality_score
               FROM ({inner}) mm JOIN documents d ON d.doc_id = mm.doc_id),
    q AS (SELECT doc_id, lang, source, n_tokens FROM (
            SELECT m.*,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY quality_score DESC, doc_id) AS qrank,
                   COUNT(*) OVER (PARTITION BY lang) AS n
            FROM m) t
          WHERE qrank <= CAST(ceil(0.5 * CAST(n AS DOUBLE)) AS BIGINT)),
    tb AS (SELECT doc_id, lang, source, n_tokens FROM (
            SELECT q.*,
                   SUM(CAST(n_tokens AS BIGINT))
                     OVER (PARTITION BY source
                           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                           ROWS UNBOUNDED PRECEDING) AS cum
            FROM q) t
          WHERE cum <= 2000),
    sh AS (SELECT *, CAST(strpos('0123456789abcdef',
                                 substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1
                          AS INTEGER) AS shard FROM tb)
    SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CAST(n_tokens AS BIGINT)) AS BIGINT) AS n_tokens,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
    FROM sh GROUP BY shard
    """


QUERIES["training_export"].oracle = _training_export_oracle()


@register(
    "ts_cusum_changepoints",
    """
    WITH stats AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sv,
             CAST(SUM(CAST(value AS DECIMAL(14,2))
                      * CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS svv
      FROM events GROUP BY event_type),
    base AS (
      SELECT e.event_id, e.event_type, e.value,
             CAST(SUM(CAST(e.value AS DECIMAL(14,2))) OVER w AS DOUBLE) AS s,
             CAST(row_number() OVER w AS DOUBLE) AS rn,
             sv, svv, CAST(n AS DOUBLE) AS nd
      FROM events e JOIN stats USING (event_type)
      WINDOW w AS (PARTITION BY e.event_type ORDER BY e.ts, e.event_id
                   ROWS UNBOUNDED PRECEDING)),
    c AS (SELECT *,
                 sqrt(GREATEST((svv - sv * sv / nd) / nd, 1e-12)) AS sigma,
                 s - rn * (sv / nd + 0.5 * sqrt(GREATEST((svv - sv * sv / nd) / nd, 1e-12))) AS cp,
                 s - rn * (sv / nd - 0.5 * sqrt(GREATEST((svv - sv * sv / nd) / nd, 1e-12))) AS cn
          FROM base),
    m AS (SELECT *, MIN(cp) OVER w2 AS cpmin, MAX(cn) OVER w2 AS cnmax
          FROM c
          WINDOW w2 AS (PARTITION BY event_type ORDER BY rn
                        ROWS UNBOUNDED PRECEDING))
    SELECT event_id, event_type, value,
           cp - cpmin AS cusum_pos, cnmax - cn AS cusum_neg
    FROM m
    WHERE GREATEST(cp - cpmin, cnmax - cn) > 5 * sigma
    """,
    "timeseries",
)
def ts_cusum_changepoints(spark, sf_dir):
    """Tabular CUSUM change-point detection per event_type: flags events
    where the one-sided cumulative deviation (allowance k = 0.5σ,
    decision threshold h = 5σ — the standard tabular-CUSUM setting)
    exceeds h.  Uses the prefix-sum form S⁺_t = C⁺_t − min_{j≤t} C⁺_j
    (C⁺_t = prefix_sum − t·(μ+k); mirrored for S⁻), which turns the
    non-associative max(0,·) recursion into prefix-sum ± running-extremum
    form.  Prefix sums are exact decimal (order-independent); μ, σ come
    from the same broadcast moments as ts_anomaly_zscore, so flagged
    rows AND both cusum values are bit-identical to the oracle.

    Scale shape (round-4 verdict fix): event_type has ~5 values, so a
    plain per-type window is five single-task sorts at 100 TB.  Both
    running passes instead use segmented_running — rows window within
    (type, hour) bounded segments and broadcast per-segment offsets
    reconstruct the global prefix sums/extrema exactly (the hour bucket
    is monotone in the (ts, event_id) order, so segment order refines
    row order).  The corpus shuffles once on (type, hour); every
    summary-level window walks the bounded segment SUMMARY (keyed by
    const_partition since round 9, so a clean run logs no global-window
    warning)."""
    from creek_spark.operators.distributed import segmented_running

    ev = _t(spark, sf_dir, "events")
    vd = dec("value", 14, 2)
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("nd"),
        F.sum(vd).cast("double").alias("sv"),
        F.sum(vd * vd).cast("double").alias("svv"),
    )
    base = segmented_running(
        ev.join(F.broadcast(stats), "event_type"),
        ["event_type"],
        F.date_trunc("hour", F.col("ts")),
        [F.col("ts"), F.col("event_id")],
        {"_s_dec": (vd, "sum"), "_rn_l": (F.lit(1), "rownum")},
        persist=True,  # both passes and both legs read this once
    ).withColumn("s", F.col("_s_dec").cast("double")).withColumn(
        "rn", F.col("_rn_l").cast("double")
    )
    sigma = F.sqrt(
        F.greatest(
            (F.col("svv") - F.col("sv") * F.col("sv") / F.col("nd"))
            / F.col("nd"),
            F.lit(1e-12),
        )
    )
    mu = F.col("sv") / F.col("nd")
    c = (
        base.withColumn("sigma", sigma)
        .withColumn(
            "cp",
            F.col("s")
            - F.col("rn") * (mu + F.lit(0.5) * F.col("sigma")),
        )
        .withColumn(
            "cn",
            F.col("s")
            - F.col("rn") * (mu - F.lit(0.5) * F.col("sigma")),
        )
    )
    # running min/max of cp/cn: same segmented decomposition, reusing
    # the first pass's (type, hour) segment column and sort order
    m = segmented_running(
        c,
        ["event_type"],
        "_seg",
        [F.col("ts"), F.col("event_id")],
        {"cpmin": (F.col("cp"), "min"), "cnmax": (F.col("cn"), "max")},
    )
    return (
        m.where(
            F.greatest(
                F.col("cp") - F.col("cpmin"), F.col("cnmax") - F.col("cn")
            )
            > F.lit(5) * F.col("sigma")
        )
        .select(
            "event_id",
            "event_type",
            "value",
            (F.col("cp") - F.col("cpmin")).alias("cusum_pos"),
            (F.col("cnmax") - F.col("cn")).alias("cusum_neg"),
        )
    )


@register(
    "ts_downsample_lttb",
    """
    WITH pts AS (
      SELECT event_id, event_type, ts, value,
             date_trunc('day', ts) AS bkt,
             CAST(epoch_us(ts) AS BIGINT) AS x
      FROM events),
    bsum AS (
      SELECT event_type, bkt,
             CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE) / COUNT(*) AS ax,
             CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) / COUNT(*) AS ay
      FROM pts GROUP BY event_type, bkt),
    nb AS (
      SELECT event_type, bkt,
             COALESCE(lag(ax)  OVER w, ax) AS px,
             COALESCE(lag(ay)  OVER w, ay) AS py,
             COALESCE(lead(ax) OVER w, ax) AS nx,
             COALESCE(lead(ay) OVER w, ay) AS ny
      FROM bsum
      WINDOW w AS (PARTITION BY event_type ORDER BY bkt)),
    scored AS (
      SELECT p.event_id, p.event_type, p.ts, p.value,
             abs((px - nx) * (CAST(p.value AS DOUBLE) - py)
                 - (px - CAST(p.x AS DOUBLE)) * (ny - py)) AS area,
             row_number() OVER (
               PARTITION BY p.event_type, p.bkt
               ORDER BY abs((px - nx) * (CAST(p.value AS DOUBLE) - py)
                            - (px - CAST(p.x AS DOUBLE)) * (ny - py)) DESC,
                        p.event_id) AS rn
      FROM pts p JOIN nb ON nb.event_type = p.event_type AND nb.bkt = p.bkt)
    SELECT event_id, event_type, ts, value, area
    FROM scored WHERE rn = 1
    """,
    "timeseries",
)
def ts_downsample_lttb(spark, sf_dir):
    """Largest-Triangle-Three-Buckets downsampling, parallel variant
    (Steinarsson 2013): one representative point per (event_type, day)
    — the one subtending the largest triangle against the NEIGHBOR
    BUCKETS' centroids.  Classic LTTB anchors on the previously selected
    point (inherently sequential); anchoring on bucket averages instead
    makes every bucket's choice independent — the standard
    parallelization, and the one a 1000-executor cluster needs.

    Plan: one corpus scan → per-(type,day) partial agg (bucket
    centroids, tiny) → centroid lag/lead over the SMALL summary → the
    summary broadcast back → per-bucket argmax as a max_by HASH
    aggregate (map-side combine — no sorted window anywhere near the
    corpus, so a huge single day never becomes a single-task sort;
    round-5 swap of the former row_number formulation).  Areas are
    fixed-order IEEE arithmetic on exact-decimal bucket means, and
    max_by's (area, −event_id) struct order reproduces the oracle's
    ORDER BY area DESC, event_id tiebreak exactly."""
    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        "event_id", "event_type", "ts", "value",
        F.date_trunc("day", F.col("ts")).alias("bkt"),
        F.unix_micros(F.col("ts")).alias("x"),
    )
    bsum = pts.groupBy("event_type", "bkt").agg(
        # epoch-µs are ~1.7e15 each: a bigint sum wraps (or throws under
        # ANSI) at ~5,400 events/bucket, while DuckDB promotes to 128-bit
        # — sum as decimal(38,0) on BOTH engines so centroids stay exact.
        (F.sum(F.col("x").cast("decimal(38,0)")).cast("double")
         / F.count(F.lit(1))).alias("ax"),
        (F.sum(dec("value", 14, 2)).cast("double") / F.count(F.lit(1))).alias("ay"),
    )
    wb = Window.partitionBy("event_type").orderBy("bkt")
    nb = bsum.select(
        "event_type", "bkt",
        F.coalesce(F.lag("ax").over(wb), F.col("ax")).alias("px"),
        F.coalesce(F.lag("ay").over(wb), F.col("ay")).alias("py"),
        F.coalesce(F.lead("ax").over(wb), F.col("ax")).alias("nx"),
        F.coalesce(F.lead("ay").over(wb), F.col("ay")).alias("ny"),
    )
    j = pts.join(F.broadcast(nb), ["event_type", "bkt"])
    area = F.abs(
        (F.col("px") - F.col("nx"))
        * (F.col("value").cast("double") - F.col("py"))
        - (F.col("px") - F.col("x").cast("double"))
        * (F.col("ny") - F.col("py"))
    )
    sel = (
        j.withColumn("area", area)
        .groupBy("event_type", "bkt")
        .agg(
            F.max_by(
                F.struct("event_id", "ts", "value", "area"),
                F.struct(F.col("area"), (-F.col("event_id")).alias("_nid")),
            ).alias("_sel")
        )
    )
    return sel.select(
        F.col("_sel.event_id").alias("event_id"),
        "event_type",
        F.col("_sel.ts").alias("ts"),
        F.col("_sel.value").alias("value"),
        F.col("_sel.area").alias("area"),
    )


@register(
    "events_sequences",
    """
    WITH o AS (
      SELECT user_id, event_type AS e1,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n_users_paths
    FROM o WHERE e2 IS NOT NULL AND e3 IS NOT NULL
    GROUP BY e1, e2, e3
    ORDER BY n_users_paths DESC, e1, e2, e3
    LIMIT 20
    """,
    "events",
)
def events_sequences(spark, sf_dir):
    """User-journey mining: the 20 most frequent 3-step event-type
    sequences across all per-user timelines (the PrefixSpan-lite
    contiguous variant).  One per-user window (lead×2 shares the sorted
    exchange), then a tiny path-keyed agg with map-side combine and a
    TakeOrdered top-k under a total order — path cardinality is
    |types|³-bounded, so the final agg is metadata-sized at any corpus
    scale."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).where(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    return (
        o.groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users_paths"))
        .orderBy(F.col("n_users_paths").desc(), "e1", "e2", "e3")
        .limit(20)
    )


@register(
    "text_keywords_tfidf",
    f"""
    WITH tk AS (SELECT doc_id AS doc, unnest({_DOC_TOKS}) AS term FROM documents),
    tf AS (SELECT doc, term, CAST(COUNT(*) AS BIGINT) AS tf
           FROM tk GROUP BY doc, term),
    df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
    nd AS (SELECT CAST(COUNT(DISTINCT doc) AS DOUBLE) AS n FROM tk),
    sc AS (SELECT doc, term, tf, df,
                  CAST(tf AS DOUBLE) * (n / CAST(df AS DOUBLE)) AS tfidf
           FROM tf JOIN df USING (term) CROSS JOIN nd),
    r AS (SELECT *, row_number() OVER (PARTITION BY doc
                                       ORDER BY tfidf DESC, term) AS rn
          FROM sc)
    SELECT doc AS doc_id, term, tf, df, tfidf, CAST(rn AS INTEGER) AS rn
    FROM r WHERE rn <= 3
    """,
    "text",
)
def text_keywords_tfidf(spark, sf_dir):
    """Keyword extraction: top-3 terms per document by tf-idf with the
    rational idf N/df (log-free — same ranking family as the BM25 row,
    and bit-stable across engines where ln() is not).  Shape: doc-term
    pre-agg → term-keyed df agg → join back → per-doc top-k window.
    Every post-tokenize exchange carries distinct (doc, term) rows; the
    corpus-size scalar rides a 1-row broadcast."""
    from creek_spark.functions.text import tokens as _tokens

    docs = _t(spark, sf_dir, "documents")
    tk = docs.select(
        F.col("doc_id").alias("doc"), F.explode(_tokens("text")).alias("term")
    )
    tf = tk.groupBy("doc", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    nd = tk.agg(F.countDistinct("doc").cast("double").alias("n"))
    sc = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(nd))
        .withColumn(
            "tfidf",
            F.col("tf").cast("double")
            * (F.col("n") / F.col("df").cast("double")),
        )
    )
    w = Window.partitionBy("doc").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        sc.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            F.col("doc").alias("doc_id"), "term", "tf", "df", "tfidf", "rn"
        )
    )


@register(
    "cdc_scd2_incremental",
    """
    WITH ch AS (
      SELECT user_id, event_id,
             CASE WHEN event_type = 'error' THEN 'd' ELSE 'u' END AS op,
             ts, event_type, value
      FROM events)
    SELECT user_id, op,
           CAST(event_id AS BIGINT) AS lsn_num,
           ts AS valid_from,
           lead(ts) OVER w AS valid_to,
           (lead(ts) OVER w IS NULL AND op <> 'd') AS is_current,
           CASE WHEN op = 'd' THEN NULL ELSE event_type END AS event_type,
           CASE WHEN op = 'd' THEN NULL ELSE ts END AS ts,
           CASE WHEN op = 'd' THEN NULL ELSE value END AS value
    FROM ch
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    """,
    "cdc",
)
def cdc_scd2_incremental(spark, sf_dir):
    """SCD2 history maintained incrementally across the LSN-800 batch
    boundary: recompute history only for keys the batch touches, carry
    the rest — and hash-match the FULL-recompute oracle, proving the
    maintenance is lossless (the versioned-history twin of
    cdc_incremental_mv).  Touched keys broadcast into the anti/semi
    joins; the carried history is never shuffled."""
    from creek_spark.operators.cdc import incremental_scd2

    env = _events_envelope(_t(spark, sf_dir, "events"))
    return incremental_scd2(env, 800, key_cols=["user_id"])


@register(
    "cdc_time_travel",
    """
    WITH ch AS (
      SELECT user_id, event_id,
             CASE WHEN event_type = 'error' THEN 'd' ELSE 'u' END AS op,
             ts, event_type, value
      FROM events),
    h AS (
      SELECT user_id, op, ts AS valid_from,
             lead(ts) OVER w AS valid_to,
             event_type, ts, value
      FROM ch
      WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
    tm AS (SELECT make_timestamp((epoch_us(MIN(ts)) + epoch_us(MAX(ts))) // 2)
                    AS tmid
           FROM events)
    SELECT user_id, event_type, ts, value, valid_from
    FROM h, tm
    WHERE op <> 'd' AND valid_from <= tmid
      AND (valid_to IS NULL OR valid_to > tmid)
    """,
    "cdc",
)
def cdc_time_travel(spark, sf_dir):
    """Time travel: the table state AS OF the stream's midpoint instant,
    answered from the SCD2 history (the warehouse pattern: one versioned
    materialization serves every point-in-time query, no log replay).
    The probe instant is derived from the data (midpoint of the ts
    range) so the query is scale-factor agnostic.  Plan: the scd2
    per-key window shuffle + a 1-row broadcast of the probe timestamp —
    the interval predicate is a per-row filter, no second exchange."""
    from creek_spark.operators.cdc import scd2_history

    ev = _t(spark, sf_dir, "events")
    env = _events_envelope(ev)
    hist = scd2_history(env, key_cols=["user_id"])
    tm = ev.agg(
        F.timestamp_micros(
            F.expr("(unix_micros(min(ts)) + unix_micros(max(ts))) div 2")
        ).alias("tmid")
    )
    return (
        hist.crossJoin(F.broadcast(tm))
        .where(
            (F.col("op") != "d")
            & (F.col("valid_from") <= F.col("tmid"))
            & (F.col("valid_to").isNull() | (F.col("valid_to") > F.col("tmid")))
        )
        .select("user_id", "event_type", "ts", "value", "valid_from")
    )


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _corr_oracle() -> str:
    pairs = [
        (a, b)
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i + 1 :]
    ]

    # decimal→double through VARCHAR: DuckDB's direct decimal→double
    # cast scales the hugeint in float arithmetic and is NOT correctly
    # rounded once the sum needs > 53 bits (measured at sf0.1:
    # ss_l_extendedprice exact 2224071148386123.169 → direct cast
    # ...123.0, Spark/Java/strtod all ...123.2); its string formatter +
    # fast_float parse ARE correctly rounded, so this route makes both
    # engines produce the bit-identical nearest double of the same
    # exact decimal at any scale factor.
    def as_dbl(expr: str) -> str:
        return f"CAST(CAST({expr} AS VARCHAR) AS DOUBLE)"

    stats = ",\n             ".join(
        f"{as_dbl(f'SUM(CAST({c} AS DECIMAL(19,4)))')} AS s_{c},\n             "
        f"{as_dbl(f'SUM(CAST({c} AS DECIMAL(19,4)) * CAST({c} AS DECIMAL(19,4)))')} AS ss_{c}"
        for c in _CORR_COLS
    )
    cross = ",\n             ".join(
        f"{as_dbl(f'SUM(CAST({a} AS DECIMAL(19,4)) * CAST({b} AS DECIMAL(19,4)))')} AS sp_{a}_{b}"
        for a, b in pairs
    )
    sel = "\n    UNION ALL\n    ".join(
        f"""SELECT '{a}' AS col_a, '{b}' AS col_b,
           (sp_{a}_{b} - s_{a} * s_{b} / nd)
             / sqrt((ss_{a} - s_{a} * s_{a} / nd) * (ss_{b} - s_{b} * s_{b} / nd)) AS corr
    FROM m"""
        for a, b in pairs
    )
    return f"""
    WITH m AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS nd,
             {stats},
             {cross}
      FROM lineitem)
    {sel}
    """


@register("profile_correlations", _corr_oracle(), "profile")
def profile_correlations(spark, sf_dir):
    """Pairwise Pearson correlations of the lineitem numeric columns in
    ONE scan: every sum / sum-of-squares / cross-product is an exact
    decimal aggregate in a single partial+final agg (no per-pair passes,
    no corr() builtin — its streaming accumulation is
    summation-order-dependent and can't hash-match an oracle), then the
    correlation formula is fixed-order IEEE arithmetic on the one
    broadcast stats row.  dim² terms ride one metadata-sized exchange —
    the column-profiler shape at any corpus size."""
    li = _t(spark, sf_dir, "lineitem")
    cols = _CORR_COLS
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    d = lambda c: dec(c, 14, 4)  # noqa: E731
    aggs = [F.count(F.lit(1)).cast("double").alias("nd")]
    for c in cols:
        aggs.append(F.sum(d(c)).cast("double").alias(f"s_{c}"))
        aggs.append(F.sum(d(c) * d(c)).cast("double").alias(f"ss_{c}"))
    for a, b in pairs:
        aggs.append(F.sum(d(a) * d(b)).cast("double").alias(f"sp_{a}_{b}"))
    m = li.agg(*aggs)
    out = None
    for a, b in pairs:
        corr = (
            F.col(f"sp_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}") / F.col("nd")
        ) / F.sqrt(
            (F.col(f"ss_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}") / F.col("nd"))
            * (F.col(f"ss_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}") / F.col("nd"))
        )
        row = m.select(
            F.lit(a).alias("col_a"), F.lit(b).alias("col_b"), corr.alias("corr")
        )
        out = row if out is None else out.unionByName(row)
    return out


@register(
    "ts_anomaly_mad",
    """
    WITH r1 AS (
      SELECT event_type, event_id, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events),
    med AS (
      SELECT event_type,
             MAX(CASE WHEN rn = CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1
                      THEN value END) AS med
      FROM r1 GROUP BY event_type),
    dev AS (
      SELECT e.event_id, e.event_type, e.value, m.med,
             abs(e.value - m.med) AS abs_dev
      FROM events e JOIN med m USING (event_type)),
    r2 AS (
      SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY abs_dev, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM dev),
    mad AS (
      SELECT event_type,
             MAX(CASE WHEN rn = CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1
                      THEN abs_dev END) AS mad
      FROM r2 GROUP BY event_type)
    SELECT d.event_id, d.event_type, d.value, d.med, d.abs_dev, m.mad
    FROM dev d JOIN mad m USING (event_type)
    WHERE d.abs_dev > 3 * GREATEST(m.mad, 0.01)
    """,
    "timeseries",
    headline=True,  # round-6: promoted per r5 verdict item 8 (the most
    # expensive catalog query — regressions in rank_pick/segmented
    # primitives must show in BENCH diffs, not only plan gates)
)
def ts_anomaly_mad(spark, sf_dir):
    """Robust outlier detection per event_type: |x − median| > 3·MAD —
    the estimator that survives the contaminated data z-scores break on
    (both median and MAD have a 50% breakdown point; mean/σ have 0%).
    Percentiles are the exact DISCRETE picks (rank-based, no
    interpolation) so every field is bit-identical cross-engine.

    Scale shape (round-4 verdict fix): ranking raw events inside ~5
    event_type partitions is five single-task sorts at 100 TB.  Both
    medians instead use discrete_percentile — two-level bucketed
    counting (coarse value-bucket counts locate the median's bucket;
    only that bucket's rows are revisited), so no corpus-scale sorted
    window exists anywhere in the plan; the per-type medians broadcast
    back exactly as before."""
    from creek_spark.operators.distributed import discrete_percentile

    ev = _t(spark, sf_dir, "events")
    med = discrete_percentile(
        ev,
        ["event_type"],
        F.col("value"),
        F.floor(F.col("value") * 16).cast("bigint"),
    ).select("event_type", F.col("_pick_v").alias("med"))
    dev = (
        ev.join(F.broadcast(med), "event_type")
        .select(
            "event_id", "event_type", "value", "med",
            F.abs(F.col("value") - F.col("med")).alias("abs_dev"),
        )
    )
    # dev feeds the MAD bucket counts, the MAD revisit AND the final
    # filter; cached once (caller-owned release via cachereg) so the
    # events scan + median broadcast join run once instead of three
    # times.  NO second persist inside the MAD rank_pick: its work frame
    # is dev + three derived columns, and re-projecting those from the
    # cached dev per consumer is far cheaper than a second corpus-sized
    # materialization barrier (measured at sf0.1: 4.4 s with it, 2.8 s
    # without).  At true cluster scale drop this cache too and let the
    # three consumers re-scan parquet (pushdown-pruned columnar scans
    # beat caching a corpus-sized frame; measured 3.6 s here).
    dev = register_cache(dev)
    mad = discrete_percentile(
        dev,
        ["event_type"],
        F.col("abs_dev"),
        F.floor(F.col("abs_dev") * 16).cast("bigint"),
    ).select("event_type", F.col("_pick_v").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .where(
            F.col("abs_dev") > F.lit(3) * F.greatest(F.col("mad"), F.lit(0.01))
        )
        .select("event_id", "event_type", "value", "med", "abs_dev", "mad")
    )


@register(
    "join_temporal_dim",
    """
    WITH ch AS (
      SELECT user_id, event_id,
             CASE WHEN event_type = 'error' THEN 'd' ELSE 'u' END AS op,
             ts, event_type, value
      FROM events),
    h AS (
      SELECT user_id, op, ts AS valid_from,
             lead(ts) OVER w AS valid_to,
             event_type AS hist_type, value AS hist_value
      FROM ch
      WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
    probes AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
    SELECT p.event_id, p.user_id, p.ts,
           h.hist_type, h.hist_value, h.valid_from
    FROM probes p JOIN h ON h.user_id = p.user_id
     AND h.op <> 'd'
     AND h.valid_from <= p.ts
     AND (h.valid_to IS NULL OR p.ts < h.valid_to)
    """,
    "join",
)
def join_temporal_dim(spark, sf_dir):
    """Point-in-time dimension join: every click event is enriched with
    the SCD2 version of its user's state that was valid AT THE EVENT'S
    OWN TIMESTAMP — the warehouse temporal join (FROM fact JOIN dim FOR
    SYSTEM_TIME AS OF fact.ts) that as-of joins approximate and interval
    membership answers exactly.  Plan: the scd2 per-key window + ONE
    user-keyed equi join carrying the interval predicate as a residual —
    per-key fan-out is that user's version count, never |fact|×|dim|,
    so the join survives any fact-table scale."""
    from creek_spark.operators.cdc import scd2_history

    ev = _t(spark, sf_dir, "events")
    env = _events_envelope(ev)
    h = scd2_history(env, key_cols=["user_id"]).select(
        "user_id", "op", "valid_from", "valid_to",
        F.col("event_type").alias("hist_type"),
        F.col("value").alias("hist_value"),
    )
    probes = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    return (
        probes.alias("p")
        .join(h.alias("h"), "user_id")
        .where(
            (F.col("h.op") != "d")
            & (F.col("h.valid_from") <= F.col("p.ts"))
            & (
                F.col("h.valid_to").isNull()
                | (F.col("p.ts") < F.col("h.valid_to"))
            )
        )
        .select(
            "event_id", "user_id", "ts",
            "hist_type", "hist_value", "valid_from",
        )
    )


@register(
    "basket_part_pairs",
    """
    WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
    n AS (SELECT CAST(COUNT(DISTINCT ok) AS DOUBLE) AS n_orders FROM li),
    pc AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS c FROM li GROUP BY pk),
    pairs AS (
      SELECT a.pk AS part_a, b.pk AS part_b, CAST(COUNT(*) AS BIGINT) AS n_pair
      FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY a.pk, b.pk)
    SELECT part_a, part_b, n_pair,
           CAST(n_pair AS DOUBLE) / n_orders AS support,
           (CAST(n_pair AS DOUBLE) * n_orders)
             / (CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE)) AS lift
    FROM pairs
    JOIN pc ca ON ca.pk = part_a
    JOIN pc cb ON cb.pk = part_b
    CROSS JOIN n
    ORDER BY n_pair DESC, part_a, part_b
    LIMIT 20
    """,
    "aggregation",
)
def basket_part_pairs(spark, sf_dir):
    """Market-basket affinity: the 20 part pairs most often ordered
    together, with support and lift.  The pair generator self-joins on
    the ORDER key, so pair space is Σ|basket|² (baskets are a handful of
    lines), never |parts|² — the co-occurrence shape that scales to any
    order count.  Per-part counts broadcast back; support/lift are
    fixed-order IEEE ratios of exact counts; top-k is TakeOrdered under
    a total order."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    n = li.agg(F.countDistinct("ok").cast("double").alias("n_orders"))
    pc = li.groupBy("pk").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    a = li.select(F.col("ok"), F.col("pk").alias("part_a"))
    b = li.select(F.col("ok"), F.col("pk").alias("part_b"))
    pairs = (
        a.join(b, "ok")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pair"))
    )
    ca = pc.select(F.col("pk").alias("part_a"), F.col("c").alias("ca"))
    cb = pc.select(F.col("pk").alias("part_b"), F.col("c").alias("cb"))
    return (
        pairs.join(F.broadcast(ca), "part_a")
        .join(F.broadcast(cb), "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a", "part_b", "n_pair",
            (F.col("n_pair").cast("double") / F.col("n_orders")).alias("support"),
            (
                (F.col("n_pair").cast("double") * F.col("n_orders"))
                / (F.col("ca").cast("double") * F.col("cb").cast("double"))
            ).alias("lift"),
        )
        .orderBy(F.col("n_pair").desc(), "part_a", "part_b")
        .limit(20)
    )


@register(
    "ts_growth_rates",
    """
    WITH m AS (
      SELECT o_orderpriority AS seg, CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS rev
      FROM orders GROUP BY 1, 2),
    g AS (
      SELECT seg, mon, rev,
             lag(rev)     OVER w AS prev_rev,
             lag(rev, 12) OVER w AS prev_year_rev
      FROM m WINDOW w AS (PARTITION BY seg ORDER BY mon))
    SELECT seg, mon, rev,
           rev - prev_rev AS mom_delta,
           CASE WHEN prev_year_rev IS NULL OR prev_year_rev = 0 THEN NULL
                ELSE rev / prev_year_rev END AS yoy_ratio
    FROM g
    """,
    "timeseries",
)
def ts_growth_rates(spark, sf_dir):
    """Period-over-period growth: monthly revenue per order priority
    with month-over-month delta and year-over-year ratio — the BI
    staple (lag on an aggregated series).  The corpus collapses to one
    (seg, month) row per group BEFORE the window, so the lag runs over
    a metadata-sized series: one partial+final agg shuffle plus a tiny
    per-seg window.  Decimal revenue sums keep every value bit-exact."""
    o = _t(spark, sf_dir, "orders")
    m = o.groupBy(
        F.col("o_orderpriority").alias("seg"),
        F.to_date(F.date_trunc("month", F.col("o_orderdate"))).alias("mon"),
    ).agg(F.sum(dec("o_totalprice", 14, 2)).cast("double").alias("rev"))
    w = Window.partitionBy("seg").orderBy("mon")
    g = m.select(
        "seg", "mon", "rev",
        F.lag("rev").over(w).alias("prev_rev"),
        F.lag("rev", 12).over(w).alias("prev_year_rev"),
    )
    return g.select(
        "seg", "mon", "rev",
        (F.col("rev") - F.col("prev_rev")).alias("mom_delta"),
        F.when(
            F.col("prev_year_rev").isNull() | (F.col("prev_year_rev") == 0),
            F.lit(None).cast("double"),
        ).otherwise(F.col("rev") / F.col("prev_year_rev")).alias("yoy_ratio"),
    )


@register(
    "customer_rfm",
    """
    WITH mx AS (SELECT MAX(o_orderdate) AS now FROM orders),
    c AS (
      SELECT o_custkey AS custkey,
             CAST(date_diff('day', MAX(o_orderdate), (SELECT now FROM mx)) AS BIGINT) AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS monetary
      FROM orders GROUP BY o_custkey),
    rr AS (SELECT *,
                  row_number() OVER (ORDER BY recency_days DESC, custkey) AS rr_r,
                  row_number() OVER (ORDER BY frequency, custkey) AS rr_f,
                  row_number() OVER (ORDER BY monetary, custkey) AS rr_m,
                  COUNT(*) OVER () AS n
           FROM c)
    SELECT custkey, recency_days, frequency, monetary,
           CAST(1 + (rr_r - 1) * 5 // n AS INTEGER) AS r_score,
           CAST(1 + (rr_f - 1) * 5 // n AS INTEGER) AS f_score,
           CAST(1 + (rr_m - 1) * 5 // n AS INTEGER) AS m_score
    FROM rr
    """,
    "aggregation",
    headline=True,  # round-6: promoted per r5 verdict item 8
)
def customer_rfm(spark, sf_dir):
    """RFM segmentation: per-customer recency (days since last order,
    relative to the corpus max date so the query is reproducible),
    frequency, exact-decimal monetary total, and 1-5 quantile scores
    per dimension (higher = better; deterministic custkey tiebreaks).

    Scores use the rank formula 1 + (rank-1)·5 div n — the same
    assignment ntile produces for these sizes, but written on explicit
    ranks so the oracle is engine-agnostic.

    Scale shape (round-4 verdict fix): instead of three UNPARTITIONED
    ranking windows over the customer aggregate (a single-task sort at
    sf100), each dimension's four score boundaries — the exact
    (value, custkey) tuples at ranks ceil(s·n/5), s=1..4 — are found
    with rank_pick (two-level bucketed counting, no corpus sort), pivoted
    into ONE 24-column row, broadcast, and every customer is scored
    map-side by tuple comparison against the boundaries.  Tie groups
    split across a boundary score identically to the rank formula
    because the boundary carries the custkey tiebreak."""
    from creek_spark.operators.distributed import rank_pick

    o = _t(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_orderdate").alias("now"))
    c = (
        o.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max("o_orderdate").alias("_last"),
            F.count(F.lit(1)).cast("bigint").alias("frequency"),
            F.sum(dec("o_totalprice", 14, 2)).cast("double").alias("monetary"),
        )
        .crossJoin(F.broadcast(mx))
        .select(
            "custkey",
            F.datediff(F.col("now"), F.col("_last")).cast("bigint").alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    c = register_cache(c)  # scanned once per dimension pass; caller-owned release
    # boundary ranks: score(r) = 1 + (r-1)*5 div n <= s  <=>  r <= ceil(s*n/5)
    ranks = lambda n: [  # noqa: E731
        F.floor((F.lit(s) * n + F.lit(4)) / F.lit(5)).cast("bigint")
        for s in (1, 2, 3, 4)
    ]
    # score ASCENDS along (sort_v asc, custkey asc); sort values cast
    # to double (exact for these magnitudes) so all three dimensions
    # ride ONE union frame and ONE rank_pick pass
    dims = ("r", "f", "m")
    # one scan of c fans out all three dimensions via explode — a union
    # of three projections would stack 3× the cached partitions and every
    # rank_pick pass over it would pay 3× the task count.  Spelled as ONE
    # parsed SQL expression (round 13, guide §5): the per-struct Column
    # chain cost ~330 py4j round trips per build; the string parses to
    # the identical explode(array(struct...)) tree.
    dim_structs = {
        "r": "struct('r' AS dim, CAST(-recency_days AS DOUBLE) AS sv, "
             "custkey AS custkey, CAST(-recency_days AS BIGINT) AS bkt)",
        "f": "struct('f' AS dim, CAST(frequency AS DOUBLE) AS sv, "
             "custkey AS custkey, CAST(frequency AS BIGINT) AS bkt)",
        "m": "struct('m' AS dim, CAST(monetary AS DOUBLE) AS sv, "
             "custkey AS custkey, CAST(FLOOR(monetary / 1000) AS BIGINT) AS bkt)",
    }
    u = c.selectExpr(
        f"explode(array({', '.join(dim_structs[d] for d in dims)})) AS _e"
    ).select("_e.dim", "_e.sv", "_e.custkey", "_e.bkt")
    # no work-cache: both rank_pick legs re-derive the explode from the
    # ALREADY-CACHED customer aggregate (3n tiny rows) — cheaper than a
    # second cache's materialization barrier
    picked = rank_pick(
        u, ["dim"], F.col("sv"), F.col("custkey"), F.col("bkt"), ranks,
    )
    # one parsed expression per column instead of hundreds of chained
    # py4j Column calls: this pivot + the scoring below were ~0.65 s of
    # driver time per build (r7 verdict item 5 — plan-build cost grows
    # with expression count, not data)
    # alias inside the parsed string (round 13): the separate .alias()
    # py4j call per column was ~1/3 of this block's driver cost
    cuts = picked.groupBy().agg(
        *[
            F.expr(
                f"max(CASE WHEN dim = '{d}' AND _ki = {i} THEN _pick_{s} END)"
                f" AS _b{d}{s}{i}"
            )
            for d in dims
            for i in range(4)
            for s in ("v", "t")
        ]
    )
    scored = c.crossJoin(F.broadcast(cuts))
    def score(d, sv_sql):
        above = " + ".join(
            f"CAST(({sv_sql} > _b{d}v{i}) OR (({sv_sql} = _b{d}v{i}) "
            f"AND custkey > _b{d}t{i}) AS INT)"
            for i in range(4)
        )
        return F.expr(f"CAST(1 + {above} AS INT)")
    return scored.select(
        "custkey", "recency_days", "frequency", "monetary",
        score("r", "CAST(-recency_days AS DOUBLE)").alias("r_score"),
        score("f", "CAST(frequency AS DOUBLE)").alias("f_score"),
        score("m", "CAST(monetary AS DOUBLE)").alias("m_score"),
    )


@register(
    "ts_forecast_snaive",
    """
    WITH h AS (
      SELECT event_type, date_trunc('hour', ts) AS bkt,
             SUM(CAST(value AS DECIMAL(14,2))) AS v
      FROM events GROUP BY 1, 2),
    j AS (
      SELECT a.event_type, a.bkt, a.v AS actual, f.v AS forecast
      FROM h a JOIN h f
        ON f.event_type = a.event_type
       AND f.bkt = a.bkt - INTERVAL 7 DAY)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_eval,
           CAST(SUM(abs(actual - forecast)) AS DOUBLE) / COUNT(*) AS mae,
           CAST(SUM(actual - forecast) AS DOUBLE) / COUNT(*) AS bias
    FROM j GROUP BY event_type
    """,
    "timeseries",
)
def ts_forecast_snaive(spark, sf_dir):
    """Forecast-baseline evaluation: the seasonal-naive predictor
    (this hour = same hour last week) scored per event_type with MAE
    and bias — the sanity bar every fancier forecaster must beat, and
    the backtest shape (self-join at a fixed lag, exact-decimal error
    sums) that generalizes to any horizon.  The series is aggregated
    BEFORE the lag join, so the join touches (type, hour) rows, not
    events; errors stay decimal-exact until one final division."""
    ev = _t(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bkt")
    ).agg(F.sum(dec("value", 14, 2)).alias("v"))
    a = h.select("event_type", "bkt", F.col("v").alias("actual"))
    f = h.select(
        "event_type",
        (F.col("bkt") + F.expr("INTERVAL 7 DAY")).alias("bkt"),
        F.col("v").alias("forecast"),
    )
    j = a.join(f, ["event_type", "bkt"])
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_eval"),
        (
            F.sum(F.abs(F.col("actual") - F.col("forecast"))).cast("double")
            / F.count(F.lit(1))
        ).alias("mae"),
        (
            F.sum(F.col("actual") - F.col("forecast")).cast("double")
            / F.count(F.lit(1))
        ).alias("bias"),
    )


@register(
    "pareto_abc",
    """
    WITH pr AS (
      SELECT l_partkey AS pk,
             SUM(CAST(l_extendedprice AS DECIMAL(14,2))
                 * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS rev
      FROM lineitem GROUP BY l_partkey),
    t AS (SELECT SUM(rev) AS total FROM pr),
    r AS (
      SELECT pk, rev,
             SUM(rev) OVER (ORDER BY rev DESC, pk
                            ROWS UNBOUNDED PRECEDING) AS cum
      FROM pr),
    c AS (
      SELECT pk, rev,
             CASE WHEN CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) <= 0.80 THEN 'A'
                  WHEN CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) <= 0.95 THEN 'B'
                  ELSE 'C' END AS abc
      FROM r CROSS JOIN t)
    SELECT abc,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(rev) AS DOUBLE) AS revenue,
           CAST(MIN(rev) AS DOUBLE) AS min_part_rev,
           CAST(MAX(rev) AS DOUBLE) AS max_part_rev
    FROM c GROUP BY abc
    """,
    "aggregation",
)
def pareto_abc(spark, sf_dir):
    """Pareto/ABC classification: parts bucketed by cumulative revenue
    share (A ≤ 80%, B ≤ 95%, C the tail) — the inventory-analytics
    staple built on a cumulative-share prefix sum.  The fact table
    collapses to one row per part BEFORE any ordered work; revenue stays
    exact decimal through the running sum; the share comparison is one
    IEEE division per part.

    Scale shape (round-4 verdict fix): the cumulative revenue is a
    segmented_running prefix sum, not a global ordered window — parts
    window within bounded $1000-revenue-band segments (the band is
    monotone in the rev-desc order) and broadcast per-band offsets
    reconstruct the exact global running sum; the only order-only-shaped
    window walks the ~|revenue range|/1000-row band summary, never the
    catalog (const_partition-keyed since round 9 — zero global-window
    warnings)."""
    from creek_spark.operators.distributed import segmented_running

    li = _t(spark, sf_dir, "lineitem")
    pr = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(
            dec("l_extendedprice", 14, 2)
            * (F.lit(1).cast("decimal(4,2)") - dec("l_discount", 4, 2))
        ).alias("rev")
    )
    t = pr.agg(F.sum("rev").alias("total"))
    r = segmented_running(
        pr,
        [],
        (-F.floor(F.col("rev") / 1000)).cast("bigint"),
        [F.col("rev").desc(), F.col("pk")],
        {"cum": (F.col("rev"), "sum")},
    )
    share = F.col("cum").cast("double") / F.col("total").cast("double")
    c = r.crossJoin(F.broadcast(t)).withColumn(
        "abc",
        F.when(share <= 0.80, "A").when(share <= 0.95, "B").otherwise("C"),
    )
    return c.groupBy("abc").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum("rev").cast("double").alias("revenue"),
        F.min("rev").cast("double").alias("min_part_rev"),
        F.max("rev").cast("double").alias("max_part_rev"),
    )


@register(
    "orders_near_duplicates",
    """
    WITH cells AS (
      SELECT o_custkey AS ck, floor(o_totalprice / 500) AS bkt,
             COUNT(*) AS n
      FROM orders GROUP BY 1, 2)
    SELECT a.o_custkey AS custkey,
           a.o_orderkey AS order_a, b.o_orderkey AS order_b,
           CAST(abs(a.o_totalprice - b.o_totalprice) AS DOUBLE) AS amount_gap,
           CAST(abs(date_diff('day', a.o_orderdate, b.o_orderdate)) AS BIGINT) AS day_gap
    FROM orders a
    JOIN orders b
      ON a.o_custkey = b.o_custkey
     AND a.o_orderkey < b.o_orderkey
     AND abs(a.o_totalprice - b.o_totalprice) <= 500
     AND abs(date_diff('day', a.o_orderdate, b.o_orderdate)) <= 30
    JOIN cells c
      ON c.ck = b.o_custkey AND c.bkt = floor(b.o_totalprice / 500)
    WHERE c.n <= 64
    """,
    "join",
)
def orders_near_duplicates(spark, sf_dir):
    """Duplicate-transaction detection: pairs of orders by the same
    customer with near-identical totals (within $500) inside a 30-day
    window — the double-charge / replayed-submission audit, via
    operators/dedup.banded_record_pairs: side A replicates to its $500
    bucket and both neighbors, the join is EQUI on (custkey, bucket)
    with the exact residual predicates, each qualifying pair emitted
    exactly once.

    Hot-key cap (round-4 verdict fix): per-(customer, band) density is
    unbounded for whale customers, so cells with more than 64 orders are
    excluded from pair generation BEFORE the join (a skew-free count agg
    + anti-join) — the oracle applies the identical density predicate.
    Excluded cells surface in the orders_hotkey_cells audit query."""
    from creek_spark.operators.dedup import banded_record_pairs

    o = _t(spark, sf_dir, "orders")
    pairs, _ = banded_record_pairs(
        o, "o_custkey", "o_orderkey", "o_totalprice", "o_orderdate",
        tol=500, days=30, max_band_rows=64,
    )
    return pairs.select(
        F.col("key").alias("custkey"),
        F.col("id_a").alias("order_a"),
        F.col("id_b").alias("order_b"),
        "amount_gap",
        "day_gap",
    )


@register(
    "orders_hotkey_cells",
    """
    SELECT o_custkey AS custkey,
           CAST(floor(o_totalprice / 500) AS BIGINT) AS band,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY 1, 2
    HAVING COUNT(*) > 1
    """,
    "join",
)
def orders_hotkey_cells(spark, sf_dir):
    """The capped-keys audit companion of orders_near_duplicates: every
    (customer, $500-band) cell whose density exceeds the threshold —
    here 1, so the audit is non-vacuous at test scale; production uses
    the pair query's cap.  One skew-free hash agg, no joins."""
    from creek_spark.operators.dedup import banded_record_pairs

    o = _t(spark, sf_dir, "orders")
    _, capped = banded_record_pairs(
        o, "o_custkey", "o_orderkey", "o_totalprice", "o_orderdate",
        tol=500, days=30, max_band_rows=1,
    )
    return capped.select(
        F.col("key").alias("custkey"),
        F.col("_bkt").cast("bigint").alias("band"),
        F.col("n_rows").cast("bigint").alias("n_orders"),
    )


@register(
    "pii_audit",
    r"""
    WITH u AS (
      SELECT source,
             CASE WHEN doc_id % 10 = 0
                  THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                       || '@example.com at 10.0.0.' || CAST(doc_id % 256 AS VARCHAR)
                  ELSE text END AS text
      FROM documents),
    m AS (
      SELECT source,
             len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
             len(regexp_extract_all(text, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS n_ip
      FROM u)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN n_email > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_email,
           CAST(SUM(CASE WHEN n_ip > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_ip,
           CAST(SUM(n_email) AS BIGINT) AS total_emails,
           CAST(SUM(n_ip) AS BIGINT) AS total_ips
    FROM m GROUP BY source
    """,
    "pipeline",
)
def pii_audit(spark, sf_dir):
    """PII exposure report before a corpus ships: per source, how many
    documents contain emails / IPv4 literals and the total match counts
    — the audit that decides whether scrub_pii must run and proves it
    did (post-scrub, the counts return to zero; asserted in
    tests/test_export_ops.py).  The synthetic corpus carries no PII, so
    every 10th document gets a deterministic injected contact line —
    the regexes (the SAME ones the scrubber uses,
    operators/pipeline.py EMAIL_RE / IPV4_RE) must actually fire for
    the hash to match.  One scan + one source-keyed partial agg."""
    from creek_spark.operators.pipeline import EMAIL_RE, IPV4_RE

    docs = _t(spark, sf_dir, "documents")
    injected = F.when(
        F.col("doc_id") % 10 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com at 10.0.0."),
            (F.col("doc_id") % 256).cast("string"),
        ),
    ).otherwise(F.col("text"))
    u = docs.select("source", injected.alias("text"))
    ne = F.coalesce(F.regexp_count(F.col("text"), F.lit(EMAIL_RE)), F.lit(0))
    ni = F.coalesce(F.regexp_count(F.col("text"), F.lit(IPV4_RE)), F.lit(0))
    m = u.select("source", ne.alias("n_email"), ni.alias("n_ip"))
    return m.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("n_email") > 0, 1).otherwise(0)).cast("bigint").alias("docs_with_email"),
        F.sum(F.when(F.col("n_ip") > 0, 1).otherwise(0)).cast("bigint").alias("docs_with_ip"),
        F.sum("n_email").cast("bigint").alias("total_emails"),
        F.sum("n_ip").cast("bigint").alias("total_ips"),
    )


@register(
    "events_sessionize",
    """
    WITH o AS (
      SELECT user_id, event_id, event_type, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                          > 1800 * 1000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
      SELECT *,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM o)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(ts) AS t_start, MAX(ts) AS t_end,
           CAST((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000
                AS BIGINT) AS duration_secs,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_event_types
    FROM s GROUP BY user_id, session_id
    """,
    "events",
)
def events_sessionize(spark, sf_dir):
    """Batch sessionization: per-user event timelines split at >30-minute
    inactivity gaps (the web/product-analytics staple, and the
    conversation-segmentation shape an LLM-data pipeline applies to chat
    logs before packing).  Session boundaries are a lag-gap indicator
    summed into session ids; stats aggregate per (user, session).

    Scale: user_id is near-uniform high-cardinality, so BOTH windows are
    honest per-key work sharing ONE sorted exchange, and the final agg
    reuses the same partitioning prefix.  Gap arithmetic is integer
    epoch-µs — bit-exact cross-engine; duration uses integer division."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(
        F.lag("ts").over(w).isNull() | (gap > F.lit(1800) * 1000000), 1
    ).otherwise(0)
    s = ev.select("user_id", "event_id", "event_type", "ts").withColumn(
        "session_id",
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return s.groupBy(
        "user_id", F.col("session_id").cast("bigint").alias("session_id")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.min("ts").alias("t_start"),
        F.max("ts").alias("t_end"),
        F.floor(
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
            / F.lit(1000000)
        )
        .cast("bigint")
        .alias("duration_secs"),
        F.countDistinct("event_type").cast("bigint").alias("n_event_types"),
    )


@register(
    "ts_cusum_hourly",
    """
    WITH h AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket,
             CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DECIMAL(18,2)) AS vd
      FROM events GROUP BY 1, 2),
    stats AS (
      SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS nd,
             CAST(SUM(vd) AS DOUBLE) AS sv,
             CAST(SUM(vd * vd) AS DOUBLE) AS svv
      FROM h GROUP BY event_type),
    base AS (
      SELECT h.event_type, h.bucket, h.vd,
             CAST(SUM(vd) OVER w AS DOUBLE) AS s,
             CAST(row_number() OVER w AS DOUBLE) AS rn,
             nd, sv, svv
      FROM h JOIN stats USING (event_type)
      WINDOW w AS (PARTITION BY h.event_type ORDER BY h.bucket
                   ROWS UNBOUNDED PRECEDING)),
    c AS (SELECT *,
                 sqrt(GREATEST((svv - sv * sv / nd) / nd, 1e-12)) AS sigma,
                 s - rn * (sv / nd + 0.5 * sqrt(GREATEST((svv - sv * sv / nd) / nd, 1e-12))) AS cp,
                 s - rn * (sv / nd - 0.5 * sqrt(GREATEST((svv - sv * sv / nd) / nd, 1e-12))) AS cn
          FROM base),
    m AS (SELECT *, MIN(cp) OVER w2 AS cpmin, MAX(cn) OVER w2 AS cnmax
          FROM c
          WINDOW w2 AS (PARTITION BY event_type ORDER BY bucket
                        ROWS UNBOUNDED PRECEDING))
    SELECT event_type, bucket, CAST(vd AS DOUBLE) AS v,
           cp - cpmin AS cusum_pos, cnmax - cn AS cusum_neg
    FROM m
    WHERE GREATEST(cp - cpmin, cnmax - cn) > 5 * sigma
    """,
    "timeseries",
)
def ts_cusum_hourly(spark, sf_dir):
    """Tabular CUSUM over the HOURLY aggregated series (allowance 0.5σ,
    threshold 5σ over hourly totals) — the level-shift detector for
    aggregate drift, and the formulation whose state is purely additive:
    its streaming twin (streaming/detectors.py::StreamingCusum)
    maintains the hourly cells through AdditiveRollupSink and rescoring
    reproduces these rows bit-for-bit.

    Scale: the corpus collapses to the (type, hour) summary BEFORE any
    ordered work, so the prefix windows here walk a bounded series —
    plain per-type windows are correct (contrast ts_cusum_changepoints,
    which flags individual events and therefore windows the corpus in
    (type, hour) segments).  Hourly sums stay decimal through the prefix
    sum; one final double cast."""
    ev = _t(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(F.sum(dec("value", 14, 2)).cast("decimal(18,2)").alias("vd"))
    stats = h.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("nd"),
        F.sum("vd").cast("double").alias("sv"),
        F.sum(F.col("vd") * F.col("vd")).cast("double").alias("svv"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = (
        h.join(F.broadcast(stats), "event_type")
        .withColumn("s", F.sum("vd").over(w).cast("double"))
        .withColumn("rn", F.row_number().over(
            Window.partitionBy("event_type").orderBy("bucket")
        ).cast("double"))
    )
    sigma = F.sqrt(
        F.greatest(
            (F.col("svv") - F.col("sv") * F.col("sv") / F.col("nd"))
            / F.col("nd"),
            F.lit(1e-12),
        )
    )
    mu = F.col("sv") / F.col("nd")
    c = (
        base.withColumn("sigma", sigma)
        .withColumn("cp", F.col("s") - F.col("rn") * (mu + F.lit(0.5) * F.col("sigma")))
        .withColumn("cn", F.col("s") - F.col("rn") * (mu - F.lit(0.5) * F.col("sigma")))
    )
    m = c.withColumn("cpmin", F.min("cp").over(w)).withColumn(
        "cnmax", F.max("cn").over(w)
    )
    return (
        m.where(
            F.greatest(F.col("cp") - F.col("cpmin"), F.col("cnmax") - F.col("cn"))
            > F.lit(5) * F.col("sigma")
        )
        .select(
            "event_type",
            "bucket",
            F.col("vd").cast("double").alias("v"),
            (F.col("cp") - F.col("cpmin")).alias("cusum_pos"),
            (F.col("cnmax") - F.col("cn")).alias("cusum_neg"),
        )
    )
