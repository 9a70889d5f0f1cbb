"""Query catalog, part 2: scalar functions, CDC reconstruction, streaming
windows, and the training-data-pipeline operators (dedup / similarity /
text analysis / multimodal).  Same determinism rules as queries.py.

The md5-based dedup/similarity SQL is generated programmatically from the
same parameters the Spark operators use, guaranteeing parity by
construction.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from creek_spark.queries import QUERIES, _t, dec, dsum, register

# Shared SQL fragments (must mirror creek_spark.functions.text exactly)
SQL_NORM = "trim(regexp_replace(lower({c}), '[^a-z0-9]+', ' ', 'g'))"
SQL_TOKENS = "string_split_regex(" + SQL_NORM + ", '\\s+')"


# =====================================================================
# scalar functions
# =====================================================================


@register(
    "scalar_string_math",
    """
    SELECT p_partkey,
           upper(p_name) AS up_name,
           CAST(length(p_name) AS INTEGER) AS name_len,
           substr(p_name, 1, 10) AS name10,
           concat_ws('-', p_brand, p_type) AS brand_type,
           replace(p_name, 'a', '@') AS replaced,
           lpad(p_brand, 12, '*') AS padded,
           regexp_extract(p_name, '^[a-z]+') AS first_word,
           CAST(len(string_split(p_name, ' ')) AS INTEGER) AS n_words,
           abs(p_retailprice - 1000.0) AS abs_price_dev,
           CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
           CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
           sqrt(CAST(p_size AS DOUBLE)) AS sqrt_size,
           CAST(p_partkey % 5 AS BIGINT) AS mod5,
           CAST(p_size * p_size AS INTEGER) AS size_sq
    FROM part
    """,
    "scalar",
)
def scalar_string_math(spark, sf_dir):
    """String + math scalar families in one wide projection (all JVM
    built-ins, whole-stage codegen)."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up_name"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 10).alias("name10"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_name", "a", "@").alias("replaced"),
        F.lpad("p_brand", 12, "*").alias("padded"),
        F.regexp_extract("p_name", "^[a-z]+", 0).alias("first_word"),
        F.size(F.split(F.col("p_name"), " ", -1)).alias("n_words"),
        F.abs(F.col("p_retailprice") - 1000.0).alias("abs_price_dev"),
        F.ceil("p_retailprice").alias("price_ceil"),
        F.floor("p_retailprice").alias("price_floor"),
        F.sqrt(F.col("p_size").cast("double")).alias("sqrt_size"),
        (F.col("p_partkey") % 5).alias("mod5"),
        (F.col("p_size") * F.col("p_size")).alias("size_sq"),
    )


@register(
    "scalar_date_json",
    """
    SELECT event_id,
           CAST(year(ts) AS INTEGER) AS yr,
           CAST(month(ts) AS INTEGER) AS mo,
           CAST(day(ts) AS INTEGER) AS dom,
           date_trunc('day', ts) AS day_start,
           CAST(date_diff('day', CAST(ts AS DATE), DATE '2026-01-01') AS INTEGER) AS days_to_end,
           last_day(CAST(ts AS DATE)) AS month_end,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int
    FROM events
    """,
    "scalar",
)
def scalar_date_json(spark, sf_dir):
    """Date/time + JSON scalar families over the events stream table."""
    ev = _t(spark, sf_dir, "events")
    k_str = F.get_json_object("props", "$.k")
    return ev.select(
        "event_id",
        F.year("ts").alias("yr"),
        F.month("ts").alias("mo"),
        F.dayofmonth("ts").alias("dom"),
        F.date_trunc("day", "ts").alias("day_start"),
        F.datediff(F.lit("2026-01-01").cast("date"), F.to_date("ts")).alias(
            "days_to_end"
        ),
        F.last_day(F.to_date("ts")).alias("month_end"),
        k_str.alias("k_str"),
        k_str.cast("int").alias("k_int"),
    )


@register(
    "scalar_array_map",
    """
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_val,
           CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE)
             + CAST(embedding[3] AS DOUBLE) + CAST(embedding[4] AS DOUBLE) AS first4_sum,
           CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS max_val,
           CAST(len(embedding) AS DOUBLE) AS m_dim,
           CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS m_maxv,
           'dim,maxv' AS m_keys,
           2 AS m_size
    FROM embeddings
    """,
    "scalar",
)
def scalar_array_map(spark, sf_dir):
    """Array + map scalar families.  The map columns are built with Spark
    map_* functions (map_from_arrays → element_at / map_keys / size) and
    verified by value: building a map and extracting its entries must
    round-trip, so the oracle states the extracted values directly (DuckDB
    MAP internals differ; the *values* are engine-neutral)."""
    e = _t(spark, sf_dir, "embeddings")
    el = lambda i: F.element_at("embedding", i).cast("double")
    m = F.map_from_arrays(
        F.array(F.lit("dim"), F.lit("maxv")),
        F.array(
            F.size("embedding").cast("double"),
            F.array_max("embedding").cast("double"),
        ),
    )
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        el(1).alias("first_val"),
        (el(1) + el(2) + el(3) + el(4)).alias("first4_sum"),
        F.array_max("embedding").cast("double").alias("max_val"),
        F.element_at(m, F.lit("dim")).alias("m_dim"),
        F.element_at(m, F.lit("maxv")).alias("m_maxv"),
        F.array_join(F.map_keys(m), ",").alias("m_keys"),
        F.size(m).alias("m_size"),
    )


# =====================================================================
# CDC (the reference's core semantics, oracle-checked on driver data)
# =====================================================================


def _events_envelope(ev):
    """Map the events table to a WAL envelope (error → delete, else
    upsert; lsn from event_id) — the deterministic change stream the CDC
    catalog entries replay through the real operators."""
    return ev.select(
        F.lit("fp-events").alias("fingerprint"),
        F.struct(
            F.lit("creek").alias("name"),
            F.col("ts").alias("tx_at"),
            F.lit("db").alias("db"),
            F.lit("public").alias("schema"),
            F.lit("events").alias("table"),
            F.col("event_id").alias("tx_id"),
            F.concat(F.lit("0/"), F.upper(F.hex("event_id"))).alias("lsn"),
        ).alias("source"),
        F.when(F.col("event_type") == "error", "d").otherwise("u").alias("op"),
        F.col("ts").alias("sent_at"),
        F.struct(F.col("user_id")).alias("before"),
        F.when(F.col("event_type") == "error", F.lit(None)).otherwise(
            F.struct("user_id", "event_type", "ts", "value")
        ).alias("after"),
        F.lit(None).cast("array<string>").alias("unchanged_toast"),
    )


@register(
    "cdc_latest_state",
    """
    WITH ranked AS (
      SELECT user_id, event_type, ts, value,
             row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      FROM events)
    SELECT user_id, event_type, ts, value
    FROM ranked WHERE rn = 1 AND event_type <> 'error'
    """,
    "cdc",
    headline=True,
)
def cdc_latest_state(spark, sf_dir):
    """End-to-end CDC apply through the real operator: events are mapped to
    a WAL envelope (error → delete, else upsert; lsn from event_id), then
    creek_spark.operators.cdc.latest_state reconstructs current state —
    per-key LSN ordering, one shuffle (SURVEY.md §7 step 2)."""
    from creek_spark.operators.cdc import latest_state

    env = _events_envelope(_t(spark, sf_dir, "events"))
    # this envelope never marks TOAST columns and only emits u/d ops →
    # skip the carry-forward pass AND the truncate-watermark scan (which
    # costs a full extra pass over the stream to find 't' rows that
    # provably don't exist here)
    return latest_state(
        env, key_cols=["user_id"], handle_toast=False, handle_truncate=False
    )


@register(
    "cdc_changelog_stats",
    """
    SELECT op, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(event_id) AS BIGINT) AS min_lsn,
           CAST(MAX(event_id) AS BIGINT) AS max_lsn
    FROM (SELECT CASE WHEN event_type = 'error' THEN 'd' ELSE 'u' END AS op,
                 event_id
          FROM events) t
    GROUP BY op
    """,
    "cdc",
)
def cdc_changelog_stats(spark, sf_dir):
    """Observability counters over the derived change stream (metrics.go
    analog), keyed by op."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            F.when(F.col("event_type") == "error", "d").otherwise("u").alias("op"),
            "event_id",
        )
        .groupBy("op")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("event_id").alias("min_lsn"),
            F.max("event_id").alias("max_lsn"),
        )
    )


# =====================================================================
# streaming-shape (batch-equivalent windowed aggregation)
# =====================================================================


@register(
    "stream_windows",
    """
    SELECT 'tumbling' AS kind,
           event_type AS grp,
           (epoch_us(ts) // 1000000) // 300 * 300 AS wstart_s,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY grp, wstart_s
    UNION ALL
    SELECT 'session' AS kind, grp, wstart_s, n_events, sum_value FROM (
      WITH marked AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)) > 3600000000
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_sess
        FROM events),
      sess AS (
        SELECT user_id, ts, value,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        FROM marked)
      SELECT CAST(user_id AS VARCHAR) || '#' || CAST(sess_id AS VARCHAR) AS grp,
             epoch_us(MIN(ts)) // 1000000 AS wstart_s,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
      FROM sess GROUP BY user_id, sess_id) s
    """,
    "streaming",
    headline=True,
)
def stream_windows(spark, sf_dir):
    """Tumbling (5 min) and session (1 h gap) window aggregations in one
    tagged result — the exact programs creek_spark.streaming runs under
    readStream with watermarks (tumbling_counts / session windows), here
    executed on the bounded events table so both are oracle-checkable.
    The session side is the gaps-and-islands batch mirror of
    F.session_window (deterministic, unlike the streaming operator's
    state timeouts)."""
    ev = _t(spark, sf_dir, "events")
    tumbling = (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "sum_value", 14, 2),
        )
        .select(
            F.lit("tumbling").alias("kind"),
            F.col("event_type").alias("grp"),
            F.unix_seconds(F.col("w.start")).alias("wstart_s"),
            "n_events",
            "sum_value",
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    marked = ev.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(gap_us > 3600 * 1000000, 1)
        .when(F.lag("ts").over(w).isNull(), 1)
        .otherwise(0)
        .alias("new_sess"),
    )
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = marked.withColumn("sess_id", F.sum("new_sess").over(wsum))
    session = (
        sess.groupBy("user_id", "sess_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("_start"),
            dsum("value", "sum_value", 14, 2),
        )
        .select(
            F.lit("session").alias("kind"),
            F.concat_ws(
                "#", F.col("user_id").cast("string"), F.col("sess_id").cast("string")
            ).alias("grp"),
            F.unix_seconds(F.col("_start")).alias("wstart_s"),
            "n_events",
            "sum_value",
        )
    )
    return tumbling.unionByName(session)


@register(
    "cdc_scd2_history",
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
def cdc_scd2_history(spark, sf_dir):
    """Type-2 SCD history through the real operator: the envelope replay
    of cdc_latest_state, materialized as versioned [valid_from, valid_to)
    rows with an is_current flag — same single per-key window shuffle."""
    from creek_spark.operators.cdc import scd2_history

    env = _events_envelope(_t(spark, sf_dir, "events"))
    return scd2_history(env, key_cols=["user_id"])


@register(
    "cdc_incremental_mv",
    """
    WITH ranked AS (
      SELECT user_id, event_type, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY event_id DESC) AS rn
      FROM events)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
    FROM ranked WHERE rn = 1 AND event_type <> 'error'
    GROUP BY event_type
    """,
    "cdc",
)
def cdc_incremental_mv(spark, sf_dir):
    """Incrementally-maintained materialized view: the changelog is split
    at lsn 800 into a materialized batch and a new micro-batch; the new
    batch updates the state by recomputing ONLY touched keys (anti-join
    carries untouched rows unchanged), then the per-event_type aggregate
    is taken over the maintained state.  The oracle is a FULL recompute —
    hash equality proves the incremental path is lossless, the property a
    foreachBatch MERGE sink relies on at 100 TB where re-reading the
    whole log per batch is impossible."""
    from creek_spark.operators.cdc import incremental_latest_state

    env = _events_envelope(_t(spark, sf_dir, "events"))
    state = incremental_latest_state(
        env, 800, key_cols=["user_id"], handle_toast=False
    )
    return (
        state.where(F.col("event_type") != "error")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            dsum("value", "sum_value", 14, 2),
        )
    )
