"""Query catalog, part 3: training-data-pipeline operators over the
`documents` and `embeddings` tables — dedup (exact / MinHash-LSH /
SimHash / n-gram Jaccard), similarity search, text analysis, multimodal
metadata.

The MinHash/SimHash oracle SQL is *generated* from the same (n_hashes,
bands, k, bits) parameters the Spark operators use, so both sides are the
same algorithm by construction; hashing is md5 (available and identical in
both engines).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from creek_spark.operators import dedup as dd
from creek_spark.operators import similarity as sim
from creek_spark.operators import text as tx
from creek_spark.queries import QUERIES, _t, register
from creek_spark.functions.text import norm_text
from creek_spark.queries_ext import SQL_NORM, SQL_TOKENS

_NORM = SQL_NORM.format(c="text")
_TOKS = SQL_TOKENS.format(c="text")

N_HASHES = 16
BANDS = 4
ROWS_PER_BAND = N_HASHES // BANDS
SHINGLE_K = 3
JACCARD_K = 5
JACCARD_THRESHOLD = 0.8
MAX_SHINGLE_FREQ = 100
SIMHASH_BITS = 16


def _sql_shingles(k: int) -> str:
    """CTE producing distinct (doc, shingle) — mirrors dedup.shingle_rows."""
    concat = " || ' ' || ".join(f"t[i+{j}]" for j in range(k))
    return f"""
    toks AS (SELECT doc_id AS doc, {_TOKS} AS t FROM documents),
    sh AS (SELECT DISTINCT doc, s AS shingle
           FROM (SELECT doc, unnest([{concat} FOR i IN generate_series(1, len(t)-{k - 1})]) AS s
                 FROM toks) u)
    """


# =====================================================================
# dedup
# =====================================================================


@register(
    "dedup_exact",
    """
    SELECT md5(text) AS content_md5,
           CAST(MIN(doc_id) AS BIGINT) AS keep_id,
           CAST(COUNT(*) AS BIGINT) AS n_dups
    FROM documents GROUP BY md5(text)
    """,
    "dedup",
    headline=True,
)
def dedup_exact(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return dd.exact_dedup(docs, "text", "doc_id")


def _minhash_oracle(extra_where: str = "") -> str:
    # one-permutation minhash: md5('<g>:'||shingle) split into 8 4-hex
    # chunks (mirrors dedup.minhash_signatures / CHUNKS_PER_MD5)
    mins = ",\n           ".join(
        f"MIN(substr(md5('{i // 8}:' || shingle), {(i % 8) * 4 + 1}, 4)) AS h{i}"
        for i in range(N_HASHES)
    )
    band_selects = []
    for b in range(BANDS):
        cols = " || ".join(f"h{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND))
        band_selects.append(
            f"SELECT doc, {b} AS band, md5({cols}) AS sig FROM sigs"
        )
    bands_sql = "\n    UNION ALL\n    ".join(band_selects)
    return f"""
    WITH {_sql_shingles(SHINGLE_K)},
    sigs AS (SELECT doc, {mins} FROM sh GROUP BY doc),
    bands AS ({bands_sql})
    SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
    FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
    WHERE a.doc < b.doc{extra_where}
    """


@register("dedup_minhash_lsh", _minhash_oracle(), "dedup", headline=True)
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup candidates: shingle → 16 minhashes → 4 banded
    signatures → bucket self-join.  The join keys on (band, sig), so cost
    is bucket-bounded — the property that survives 10⁹ documents."""
    docs = _t(spark, sf_dir, "documents")
    return dd.minhash_lsh_candidates(
        docs, "text", "doc_id",
        n_hashes=N_HASHES, bands=BANDS, shingle_k=SHINGLE_K,
    )


@register(
    "dedup_incremental",
    _minhash_oracle(" AND (a.doc % 5 = 0 OR b.doc % 5 = 0)"),
    "dedup",
)
def dedup_incremental(spark, sf_dir):
    """Crawl-over-crawl dedup: the docs with doc_id % 5 = 0 play the NEW
    batch, the rest the already-indexed corpus.  Only the batch is
    shingled/hashed; the corpus side is its persisted (doc, band, sig)
    LSH index (operators/dedup.py minhash_index) — cost ∝ batch, never
    corpus.  Oracle: the full-corpus LSH pair set restricted to pairs
    touching the batch (sigs are per-doc, so the two formulations are
    identical — also proven row-level in tests/test_export_ops.py)."""
    docs = _t(spark, sf_dir, "documents")
    new = docs.where(F.col("doc_id") % 5 == 0)
    old = docs.where(F.col("doc_id") % 5 != 0)
    index = dd.minhash_index(
        old, "text", "doc_id",
        n_hashes=N_HASHES, bands=BANDS, shingle_k=SHINGLE_K,
    )
    return dd.incremental_lsh_candidates(
        new, index, "text", "doc_id",
        n_hashes=N_HASHES, bands=BANDS, shingle_k=SHINGLE_K,
    )


def _simhash_oracle() -> str:
    signs = []
    for j in range(SIMHASH_BITS):
        nib = j // 4 + 1
        k = j % 4
        signs.append(
            f"SUM(CASE WHEN ((strpos('0123456789abcdef', substr(th, {nib}, 1)) - 1) >> {k}) & 1 = 1 "
            f"THEN 1 ELSE -1 END) AS s{j}"
        )
    signs_sql = ",\n           ".join(signs)
    total = " + ".join(
        f"CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(SIMHASH_BITS)
    )
    return f"""
    WITH tk AS (SELECT doc_id AS doc, unnest({_TOKS}) AS tok FROM documents),
    h AS (SELECT doc, md5(tok) AS th FROM tk),
    s AS (SELECT doc, {signs_sql} FROM h GROUP BY doc)
    SELECT doc, CAST({total} AS INTEGER) AS simhash FROM s
    """


@register("dedup_simhash", _simhash_oracle(), "dedup")
def dedup_simhash(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return dd.simhash(docs, "text", "doc_id", bits=SIMHASH_BITS)


def _jaccard_oracle() -> str:
    return f"""
    WITH {_sql_shingles(JACCARD_K)},
    freq_ok AS (SELECT shingle FROM sh GROUP BY shingle
                HAVING COUNT(*) <= {MAX_SHINGLE_FREQ}),
    fsh AS (SELECT sh.doc, sh.shingle FROM sh JOIN freq_ok USING (shingle)),
    sizes AS (SELECT doc, CAST(COUNT(*) AS BIGINT) AS sz FROM fsh GROUP BY doc),
    inter AS (SELECT a.doc AS doc_a, b.doc AS doc_b, CAST(COUNT(*) AS BIGINT) AS inter
              FROM fsh a JOIN fsh b ON a.shingle = b.shingle AND a.doc < b.doc
              GROUP BY a.doc, b.doc)
    SELECT doc_a, doc_b,
           CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE) AS jaccard
    FROM inter JOIN sizes sa ON sa.doc = doc_a JOIN sizes sb ON sb.doc = doc_b
    WHERE CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= {JACCARD_THRESHOLD}
    """


@register("dedup_ngram_jaccard", _jaccard_oracle(), "dedup")
def dedup_ngram_jaccard(spark, sf_dir):
    """Exact 5-gram Jaccard ≥ 0.8 with a stop-shingle cap bounding the
    self-join fan-out (hot shingles contribute freq² pairs)."""
    docs = _t(spark, sf_dir, "documents")
    return dd.ngram_jaccard_pairs(
        docs, "text", "doc_id",
        shingle_k=JACCARD_K, threshold=JACCARD_THRESHOLD,
        max_shingle_freq=MAX_SHINGLE_FREQ,
    )


def _cluster_oracle() -> str:
    """Connected components over the minhash candidate pairs via a
    recursive transitive closure (UNION dedups, so it terminates)."""
    pairs_sql = _minhash_oracle().strip()
    # reuse the generated minhash CTEs; splice the final SELECT into a CTE
    # rsplit: the pairs projection is the LAST "SELECT DISTINCT" (the
    # shingle CTE contains an earlier one)
    with_part, select_part = pairs_sql.rsplit("SELECT DISTINCT", 1)
    return f"""
    WITH RECURSIVE {with_part.strip()[len("WITH "):].rstrip().rstrip(",")},
    pairs AS (SELECT DISTINCT{select_part}),
    edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
    reach AS (SELECT s, d FROM edges
              UNION
              SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s)
    SELECT s AS doc, LEAST(s, MIN(d)) AS cluster FROM reach GROUP BY s
    """


@register("dedup_clusters", _cluster_oracle(), "dedup")
def dedup_clusters(spark, sf_dir):
    """LSH candidate pairs → duplicate clusters via min-label-propagation
    connected components (iterative: O(diameter) distributed rounds).
    The oracle computes the same components with a recursive transitive
    closure — exact match, not rows-only, despite being an iterative
    algorithm."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dd.minhash_lsh_candidates(
        docs, "text", "doc_id",
        n_hashes=N_HASHES, bands=BANDS, shingle_k=SHINGLE_K,
    )
    return dd.connected_components(pairs)


EMB_DUP_THRESHOLD = 0.35

EMB_DUP_ORACLE = f"""
WITH e AS (SELECT vec_id, label, embedding FROM embeddings),
norms AS (SELECT vec_id AS id,
                 SUM(CAST(CAST(v AS DOUBLE) * CAST(v AS DOUBLE) AS DECIMAL(38,12))) AS ns
          FROM (SELECT vec_id, unnest(embedding) AS v FROM e) u
          GROUP BY vec_id),
pos AS (SELECT vec_id, label,
               unnest(generate_series(1, len(embedding))) AS pos,
               unnest([CAST(x AS DOUBLE) FOR x IN embedding]) AS v
        FROM e),
dots AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                SUM(CAST(a.v * b.v AS DECIMAL(38,12))) AS dot
         FROM pos a JOIN pos b
           ON a.label = b.label AND a.pos = b.pos AND a.vec_id < b.vec_id
         GROUP BY a.vec_id, b.vec_id)
SELECT id_a, id_b, cos_sim FROM (
  SELECT id_a, id_b,
         CAST(dot AS DOUBLE)
           / (sqrt(CAST(na.ns AS DOUBLE)) * sqrt(CAST(nb.ns AS DOUBLE))) AS cos_sim
  FROM dots JOIN norms na ON na.id = id_a
            JOIN norms nb ON nb.id = id_b) s
WHERE cos_sim >= {EMB_DUP_THRESHOLD}
"""


@register("dedup_embedding_cosine", EMB_DUP_ORACLE, "dedup")
def dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-dup pairs, blocked by label so the self-join
    is |block|²-bounded (the blocking key generalizes to an LSH bucket
    for unlabeled corpora — see similarity.hyperplane_sign_bits)."""
    emb = _t(spark, sf_dir, "embeddings")
    return sim.embedding_near_dups(
        emb, id_col="vec_id", vec_col="embedding", block_col="label",
        threshold=EMB_DUP_THRESHOLD,
    )


# =====================================================================
# similarity search
# =====================================================================

SIM_ORACLE = """
WITH q AS (SELECT vec_id AS q_id, embedding AS e FROM embeddings WHERE vec_id < 10),
qp AS (SELECT q_id, unnest(generate_series(1, len(e))) AS pos,
              unnest([CAST(x AS DOUBLE) FOR x IN e]) AS qv FROM q),
cp AS (SELECT vec_id AS n_id, unnest(generate_series(1, len(embedding))) AS pos,
              unnest([CAST(x AS DOUBLE) FOR x IN embedding]) AS cv FROM embeddings),
dots AS (SELECT q_id, n_id, SUM(CAST(qv * cv AS DECIMAL(38,12))) AS dot
         FROM qp JOIN cp USING (pos) GROUP BY q_id, n_id),
norms AS (SELECT vec_id AS id,
                 SUM(CAST(CAST(v AS DOUBLE) * CAST(v AS DOUBLE) AS DECIMAL(38,12))) AS ns
          FROM (SELECT vec_id, unnest(embedding) AS v FROM embeddings) u
          GROUP BY vec_id),
scored AS (SELECT q_id, n_id,
                  CAST(dot AS DOUBLE) / (sqrt(CAST(qn.ns AS DOUBLE)) * sqrt(CAST(cn.ns AS DOUBLE))) AS cos_sim
           FROM dots JOIN norms qn ON qn.id = dots.q_id
                     JOIN norms cn ON cn.id = dots.n_id
           WHERE q_id <> n_id)
SELECT q_id, n_id, cos_sim, rnk FROM (
  SELECT q_id, n_id, cos_sim,
         CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, n_id) AS INTEGER) AS rnk
  FROM scored) r
WHERE rnk <= 5
"""


@register("similarity_topk", SIM_ORACLE, "similarity", headline=True)
def similarity_topk(spark, sf_dir):
    """Brute-force exact cosine top-5 for 10 query vectors against the
    whole corpus; exact-decimal dot products for cross-engine parity.
    (bench uses the zip_with fast path: cosine_topk_fast.)"""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return sim.cosine_topk(emb, queries, k=5)


ANN_DIM = 64
ANN_PLANES = 6
ANN_CELLS = 16
ANN_NPROBE = 8

# Shared oracle CTEs: per-dimension double values and decimal norm-squares
# (the engine's _exact_dot quantizes each product to DECIMAL(…,12) and sums
# exactly, so any summation order — Spark fold or SQL GROUP BY — agrees).
_ANN_EP = """
ep AS (SELECT vec_id, unnest(generate_series(1, len(embedding))) AS d,
              unnest([CAST(x AS DOUBLE) FOR x IN embedding]) AS v FROM embeddings),
norms AS (SELECT vec_id AS id, SUM(CAST(v * v AS DECIMAL(25,12))) AS ns
          FROM ep GROUP BY vec_id)"""

_ANN_SCORE = """
dots AS (SELECT pr.q_id, pr.n_id, SUM(CAST(qe.v * ce.v AS DECIMAL(25,12))) AS dot
         FROM pairs pr
         JOIN ep qe ON qe.vec_id = pr.q_id
         JOIN ep ce ON ce.vec_id = pr.n_id AND ce.d = qe.d
         GROUP BY pr.q_id, pr.n_id),
scored AS (SELECT d.q_id, d.n_id,
                  CAST(d.dot AS DOUBLE)
                    / (sqrt(CAST(qn.ns AS DOUBLE)) * sqrt(CAST(cn.ns AS DOUBLE))) AS cos_sim
           FROM dots d JOIN norms qn ON qn.id = d.q_id
                       JOIN norms cn ON cn.id = d.n_id)
SELECT q_id, n_id, cos_sim, rnk FROM (
  SELECT q_id, n_id, cos_sim,
         CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, n_id) AS INTEGER) AS rnk
  FROM scored) r
WHERE rnk <= {k}"""


def _lsh_oracle(dim: int = ANN_DIM, n_planes: int = ANN_PLANES, k: int = 5) -> str:
    """LSH ANN oracle generated from the SAME md5-derived ±1 weight matrix
    the Spark operator inlines (sim.hyperplane_weights) — both engines are
    the same projection by construction."""
    values = ", ".join(
        f"({p}, [{', '.join(str(int(w)) for w in ws)}])"
        for p, ws in enumerate(sim.hyperplane_weights(dim, n_planes))
    )
    return f"""
WITH planes(p, w) AS (VALUES {values}),
{_ANN_EP},
wp AS (SELECT p, unnest(generate_series(1, len(w))) AS d, unnest(w) AS wv FROM planes),
plane_sums AS (SELECT e.vec_id, wp.p, SUM(CAST(e.v * wp.wv AS DECIMAL(25,12))) AS s
               FROM ep e JOIN wp USING (d) GROUP BY e.vec_id, wp.p),
sigs AS (SELECT vec_id, CAST(SUM(CASE WHEN s > 0 THEN (1 << p) ELSE 0 END) AS INTEGER) AS bucket
         FROM plane_sums GROUP BY vec_id),
pairs AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id
          FROM sigs q JOIN sigs c ON q.bucket = c.bucket
          WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id),
{_ANN_SCORE.format(k=k)}
"""


def _ivf_oracle(n_cells: int = ANN_CELLS, nprobe: int = ANN_NPROBE, k: int = 5) -> str:
    """IVF ANN oracle: centroids are the n_cells smallest md5(id) vectors
    (same seedless draw as sim.ivf_centroids); assignment and probing rank
    by the same decimal-exact cosine with the same cent_ord tie-break."""
    return f"""
WITH {_ANN_EP.lstrip()},
cents AS (SELECT vec_id AS cent_id,
                 CAST(row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS INTEGER) AS cent_ord
          FROM embeddings
          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
          LIMIT {n_cells}),
cd AS (SELECT a.vec_id AS id, ce.cent_id, ce.cent_ord,
              SUM(CAST(a.v * b.v AS DECIMAL(25,12))) AS dot
       FROM ep a
       JOIN cents ce ON TRUE
       JOIN ep b ON b.vec_id = ce.cent_id AND b.d = a.d
       GROUP BY a.vec_id, ce.cent_id, ce.cent_ord),
cent_sims AS (SELECT cd.id, cd.cent_id, cd.cent_ord,
                     CAST(cd.dot AS DOUBLE)
                       / (sqrt(CAST(n1.ns AS DOUBLE)) * sqrt(CAST(n2.ns AS DOUBLE))) AS sim
              FROM cd JOIN norms n1 ON n1.id = cd.id
                      JOIN norms n2 ON n2.id = cd.cent_id),
cells AS (SELECT id AS n_id, cent_id AS cell_id FROM (
            SELECT id, cent_id,
                   row_number() OVER (PARTITION BY id ORDER BY sim DESC, cent_ord) AS r
            FROM cent_sims) t WHERE r = 1),
probes AS (SELECT id AS q_id, cent_id AS cell_id FROM (
            SELECT id, cent_id,
                   row_number() OVER (PARTITION BY id ORDER BY sim DESC, cent_ord) AS r
            FROM cent_sims WHERE id < 10) t WHERE r <= {nprobe}),
pairs AS (SELECT p.q_id, c.n_id
          FROM probes p JOIN cells c ON c.cell_id = p.cell_id
          WHERE p.q_id <> c.n_id),
{_ANN_SCORE.format(k=k)}
"""


@register("similarity_lsh", _lsh_oracle(), "similarity")
def similarity_lsh(spark, sf_dir):
    """Random-hyperplane LSH ANN (fixed planes, zero index shuffle), run
    decimal-exact so bucket membership, candidate set, scores and ranks
    are all bit-reproducible in the generated DuckDB oracle.  Recall < 1
    by design (floors pytest-gated in tests/test_similarity.py); the
    oracle proves the approximation itself is computed correctly."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return sim.lsh_bucket_topk(
        emb, queries, dim=ANN_DIM, n_planes=ANN_PLANES, k=5, exact=True
    )


@register("similarity_ivf", _ivf_oracle(), "similarity")
def similarity_ivf(spark, sf_dir):
    """IVF coarse-quantization ANN (data-adaptive cells, probes 3 of 16),
    decimal-exact end to end: centroid choice, cell assignment (max_by
    partial agg, N-row exchange), probe ranking and final top-k all match
    the generated DuckDB oracle bit for bit."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return sim.ivf_topk(
        emb, queries, k=5, n_cells=ANN_CELLS, nprobe=ANN_NPROBE, exact=True
    )


ANN_PQ_M = 8
ANN_PQ_CODES = 64


def _pq_oracle(dim: int = ANN_DIM, m: int = ANN_PQ_M, n_codes: int = ANN_PQ_CODES, k: int = 5) -> str:
    """PQ/ADC oracle: same md5-drawn codebook, same decimal-quantized
    squared-distance argmin encoding (ties → smallest code ordinal),
    same decimal LUT partial dot products summed per (query, candidate)."""
    sub = dim // m
    return f"""
WITH {_ANN_EP.lstrip()},
cb AS (SELECT cid, CAST(row_number() OVER (ORDER BY mkey, cid) - 1 AS INTEGER) AS t FROM (
         SELECT vec_id AS cid, md5(CAST(vec_id AS VARCHAR)) AS mkey
         FROM embeddings ORDER BY mkey, cid LIMIT {n_codes}) s),
cbe AS (SELECT cb.t, ep.d, ep.v, CAST((ep.d - 1) // {sub} AS INTEGER) AS j
        FROM cb JOIN ep ON ep.vec_id = cb.cid),
cpe AS (SELECT vec_id AS n_id, d, v, CAST((d - 1) // {sub} AS INTEGER) AS j FROM ep),
dists AS (SELECT c.n_id, c.j, b.t,
                 SUM(CAST((c.v - b.v) * (c.v - b.v) AS DECIMAL(25,12))) AS dist
          FROM cpe c JOIN cbe b ON b.j = c.j AND b.d = c.d
          GROUP BY c.n_id, c.j, b.t),
codes AS (SELECT n_id, j, t AS code FROM (
            SELECT n_id, j, t,
                   row_number() OVER (PARTITION BY n_id, j ORDER BY dist, t) AS rn
            FROM dists) r WHERE rn = 1),
qe AS (SELECT vec_id AS q_id, d, v, CAST((d - 1) // {sub} AS INTEGER) AS j
       FROM ep WHERE vec_id < 10),
lut AS (SELECT q.q_id, q.j, b.t, SUM(CAST(q.v * b.v AS DECIMAL(25,12))) AS pdot
        FROM qe q JOIN cbe b ON b.j = q.j AND b.d = q.d
        GROUP BY q.q_id, q.j, b.t),
adc AS (SELECT l.q_id, c.n_id, SUM(l.pdot) AS dot
        FROM codes c JOIN lut l ON l.j = c.j AND l.t = c.code
        WHERE l.q_id <> c.n_id
        GROUP BY l.q_id, c.n_id),
scored AS (SELECT a.q_id, a.n_id,
                  CAST(a.dot AS DOUBLE)
                    / (sqrt(CAST(qn.ns AS DOUBLE)) * sqrt(CAST(cn.ns AS DOUBLE))) AS adc_sim
           FROM adc a JOIN norms qn ON qn.id = a.q_id
                      JOIN norms cn ON cn.id = a.n_id)
SELECT q_id, n_id, adc_sim, rnk FROM (
  SELECT q_id, n_id, adc_sim,
         CAST(row_number() OVER (PARTITION BY q_id ORDER BY adc_sim DESC, n_id) AS INTEGER) AS rnk
  FROM scored) r
WHERE rnk <= {k}
"""


def _ivfpq_oracle(
    dim: int = ANN_DIM,
    m: int = ANN_PQ_M,
    n_codes: int = ANN_PQ_CODES,
    n_cells: int = ANN_CELLS,
    nprobe: int = ANN_NPROBE,
    k: int = 5,
    rerank: int = 0,
    residual: bool = False,
) -> str:
    """IVFADC oracle: the IVF cell/probe CTEs (verbatim from
    `_ivf_oracle`, both already driver-proven) restrict the PQ ADC sum
    (verbatim from `_pq_oracle`) to probed-cell candidate pairs.

    ``residual``: codebook values and corpus encode inputs become
    x − c_cell (double-exact subtraction joining each id's `cells` row
    back to the centroid's raw values), and the ADC dot adds the
    q·c_cell term — already computed for every (id, centroid) pair in
    the `cd` CTE — before the LUT sum.  Mirrors
    operators/similarity.py pq_residual_codebook / _adc_sim_col
    (with_cdot=True) term for term."""
    sub = dim // m
    tail = _ivfpq_tail_rerank(k, rerank) if rerank else _ivfpq_tail_plain(k)
    if residual:
        cbe = f"""cbe AS (SELECT cb.t, e.d, CAST(e.v - ce.v AS DOUBLE) AS v,
               CAST((e.d - 1) // {sub} AS INTEGER) AS j
        FROM cb JOIN cells cl ON cl.n_id = cb.cid
        JOIN ep e ON e.vec_id = cb.cid
        JOIN ep ce ON ce.vec_id = cl.cell_id AND ce.d = e.d)"""
        cpe = f"""cpe AS (SELECT e.vec_id AS n_id, e.d, CAST(e.v - ce.v AS DOUBLE) AS v,
               CAST((e.d - 1) // {sub} AS INTEGER) AS j
        FROM ep e JOIN cells cl ON cl.n_id = e.vec_id
        JOIN ep ce ON ce.vec_id = cl.cell_id AND ce.d = e.d)"""
        adc = """adc AS (SELECT p.q_id, p.n_id,
               CAST(qc.dot + SUM(l.pdot) AS DECIMAL(25,12)) AS dot
        FROM pairs p
        JOIN cells cl ON cl.n_id = p.n_id
        JOIN cd qc ON qc.id = p.q_id AND qc.cent_id = cl.cell_id
        JOIN codes c ON c.n_id = p.n_id
        JOIN lut l ON l.q_id = p.q_id AND l.j = c.j AND l.t = c.code
        GROUP BY p.q_id, p.n_id, qc.dot)"""
    else:
        cbe = f"""cbe AS (SELECT cb.t, ep.d, ep.v, CAST((ep.d - 1) // {sub} AS INTEGER) AS j
        FROM cb JOIN ep ON ep.vec_id = cb.cid)"""
        cpe = f"""cpe AS (SELECT vec_id AS n_id, d, v, CAST((d - 1) // {sub} AS INTEGER) AS j FROM ep)"""
        adc = """adc AS (SELECT p.q_id, p.n_id, SUM(l.pdot) AS dot
        FROM pairs p
        JOIN codes c ON c.n_id = p.n_id
        JOIN lut l ON l.q_id = p.q_id AND l.j = c.j AND l.t = c.code
        GROUP BY p.q_id, p.n_id)"""
    return f"""
WITH {_ANN_EP.lstrip()},
cents AS (SELECT vec_id AS cent_id,
                 CAST(row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS INTEGER) AS cent_ord
          FROM embeddings
          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
          LIMIT {n_cells}),
cd AS (SELECT a.vec_id AS id, ce.cent_id, ce.cent_ord,
              SUM(CAST(a.v * b.v AS DECIMAL(25,12))) AS dot
       FROM ep a
       JOIN cents ce ON TRUE
       JOIN ep b ON b.vec_id = ce.cent_id AND b.d = a.d
       GROUP BY a.vec_id, ce.cent_id, ce.cent_ord),
cent_sims AS (SELECT cd.id, cd.cent_id, cd.cent_ord,
                     CAST(cd.dot AS DOUBLE)
                       / (sqrt(CAST(n1.ns AS DOUBLE)) * sqrt(CAST(n2.ns AS DOUBLE))) AS sim
              FROM cd JOIN norms n1 ON n1.id = cd.id
                      JOIN norms n2 ON n2.id = cd.cent_id),
cells AS (SELECT id AS n_id, cent_id AS cell_id FROM (
            SELECT id, cent_id,
                   row_number() OVER (PARTITION BY id ORDER BY sim DESC, cent_ord) AS r
            FROM cent_sims) t WHERE r = 1),
probes AS (SELECT id AS q_id, cent_id AS cell_id FROM (
            SELECT id, cent_id,
                   row_number() OVER (PARTITION BY id ORDER BY sim DESC, cent_ord) AS r
            FROM cent_sims WHERE id < 10) t WHERE r <= {nprobe}),
pairs AS (SELECT p.q_id, c.n_id
          FROM probes p JOIN cells c ON c.cell_id = p.cell_id
          WHERE p.q_id <> c.n_id),
cb AS (SELECT cid, CAST(row_number() OVER (ORDER BY mkey, cid) - 1 AS INTEGER) AS t FROM (
         SELECT vec_id AS cid, md5(CAST(vec_id AS VARCHAR)) AS mkey
         FROM embeddings ORDER BY mkey, cid LIMIT {n_codes}) s),
{cbe},
{cpe},
dists AS (SELECT c.n_id, c.j, b.t,
                 SUM(CAST((c.v - b.v) * (c.v - b.v) AS DECIMAL(25,12))) AS dist
          FROM cpe c JOIN cbe b ON b.j = c.j AND b.d = c.d
          GROUP BY c.n_id, c.j, b.t),
codes AS (SELECT n_id, j, t AS code FROM (
            SELECT n_id, j, t,
                   row_number() OVER (PARTITION BY n_id, j ORDER BY dist, t) AS rn
            FROM dists) r WHERE rn = 1),
qe AS (SELECT vec_id AS q_id, d, v, CAST((d - 1) // {sub} AS INTEGER) AS j
       FROM ep WHERE vec_id < 10),
lut AS (SELECT q.q_id, q.j, b.t, SUM(CAST(q.v * b.v AS DECIMAL(25,12))) AS pdot
        FROM qe q JOIN cbe b ON b.j = q.j AND b.d = q.d
        GROUP BY q.q_id, q.j, b.t),
{adc},
scored AS (SELECT a.q_id, a.n_id,
                  CAST(a.dot AS DOUBLE)
                    / (sqrt(CAST(qn.ns AS DOUBLE)) * sqrt(CAST(cn.ns AS DOUBLE))) AS adc_sim
           FROM adc a JOIN norms qn ON qn.id = a.q_id
                      JOIN norms cn ON cn.id = a.n_id){tail}
"""


def _ivfpq_tail_plain(k: int) -> str:
    return f"""
SELECT q_id, n_id, adc_sim, rnk FROM (
  SELECT q_id, n_id, adc_sim,
         CAST(row_number() OVER (PARTITION BY q_id ORDER BY adc_sim DESC, n_id) AS INTEGER) AS rnk
  FROM scored) r
WHERE rnk <= {k}"""


def _ivfpq_tail_rerank(k: int, rerank: int) -> str:
    """Exact-cosine refinement of the top-``rerank`` ADC candidates —
    the decimal dot/norm arithmetic is the driver-proven SIM_ORACLE
    pattern, applied to the ADC-ranked candidate set."""
    return f""",
adc_rank AS (SELECT q_id, n_id FROM (
  SELECT q_id, n_id,
         row_number() OVER (PARTITION BY q_id ORDER BY adc_sim DESC, n_id) AS rn
  FROM scored) r WHERE rn <= {rerank}),
ex AS (SELECT ar.q_id, ar.n_id,
              SUM(CAST(a.v * b.v AS DECIMAL(25,12))) AS dot
       FROM adc_rank ar
       JOIN ep a ON a.vec_id = ar.q_id
       JOIN ep b ON b.vec_id = ar.n_id AND b.d = a.d
       GROUP BY ar.q_id, ar.n_id)
SELECT q_id, n_id, cos_sim, rnk FROM (
  SELECT e.q_id, e.n_id,
         CAST(e.dot AS DOUBLE)
           / (sqrt(CAST(qn.ns AS DOUBLE)) * sqrt(CAST(cn.ns AS DOUBLE))) AS cos_sim,
         CAST(row_number() OVER (
           PARTITION BY e.q_id
           ORDER BY CAST(e.dot AS DOUBLE)
                      / (sqrt(CAST(qn.ns AS DOUBLE)) * sqrt(CAST(cn.ns AS DOUBLE))) DESC,
                    e.n_id) AS INTEGER) AS rnk
  FROM ex e JOIN norms qn ON qn.id = e.q_id
            JOIN norms cn ON cn.id = e.n_id) t
WHERE rnk <= {k}"""


@register("similarity_ivfpq", _ivfpq_oracle(), "similarity")
def similarity_ivfpq(spark, sf_dir):
    """IVFADC raw ADC ranking (probe 8 of 16 cells, 8×64 codes, no
    rerank) — decimal-exact end to end so cells, probes, codes, scores
    and ranks all match the assembled DuckDB oracle bit for bit.  The
    PRODUCT default adds the exact-cosine rerank (next entry)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return sim.ivfpq_topk(
        emb,
        queries,
        dim=ANN_DIM,
        m=ANN_PQ_M,
        n_codes=ANN_PQ_CODES,
        n_cells=ANN_CELLS,
        nprobe=ANN_NPROBE,
        k=5,
        rerank=0,
    )


@register("similarity_ivfpq_rerank", _ivfpq_oracle(rerank=sim.DEFAULT_RERANK), "similarity")
def similarity_ivfpq_rerank(spark, sf_dir):
    """IVFADC at the shipped defaults — exact-cosine rerank of the
    top-100 ADC candidates (recall@5 ≈ 0.72 on the unstructured bench
    corpus, gated in test_similarity) —
    the recall-restoring refinement as a fully ORACLED operator: cells,
    probes, codes, the ADC candidate ranking AND the exact rescoring all
    reproduce in the generated ANSI-SQL oracle bit for bit.  Candidate
    ids are a tiny broadcast joined back to the co-located vectors; at
    100 TB this is the standard candidates→store lookup
    (operators/similarity.py ivfpq_topk(rerank=...) / ivfpq_search)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return sim.ivfpq_topk(
        emb,
        queries,
        dim=ANN_DIM,
        m=ANN_PQ_M,
        n_codes=ANN_PQ_CODES,
        n_cells=ANN_CELLS,
        nprobe=ANN_NPROBE,
        k=5,
        rerank=sim.DEFAULT_RERANK,
    )


@register(
    "similarity_ivfadc_residual", _ivfpq_oracle(residual=True), "similarity"
)
def similarity_ivfadc_residual(spark, sf_dir):
    """IVFADC with RESIDUAL product codes (Jégou et al. §IV): codes
    quantize r = x − c_cell against a residual-trained codebook and the
    ADC estimate is q·c_cell + q·r̂ — the q·c term rides the probe row
    (one exact dot per probed cell, never per candidate) and the LUT
    stays one-per-query.  Decimal-exact end to end — cell assignment,
    the double-exact residual subtraction, codes, LUTs, the seeded ADC
    sum — so the DuckDB oracle reproduces every row bit for bit.

    Shipped honestly as a NON-default: residual coding wins when the
    corpus clusters (residual variance < raw variance — real embedding
    corpora); on this synthetic unstructured corpus ‖x − c‖ ≈ √2·‖x‖
    and raw codes rank better, so `ivfpq_index_build(residual=None)`
    auto-picks raw here.  This row pins the residual path's full
    cross-engine determinism at the same 8×64-code operating point."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return sim.ivfpq_topk(
        emb,
        queries,
        dim=ANN_DIM,
        m=ANN_PQ_M,
        n_codes=ANN_PQ_CODES,
        n_cells=ANN_CELLS,
        nprobe=ANN_NPROBE,
        k=5,
        rerank=0,
        residual=True,
    )


@register("similarity_pq", _pq_oracle(), "similarity")
def similarity_pq(spark, sf_dir):
    """Product-quantization ANN (8 sub-quantizers × 16 codes, ADC scan):
    the memory-compressed scale path — each candidate costs m table
    lookups instead of dim multiplies, and the stored index is m codes +
    one norm per vector.  Decimal-exact end to end (md5 codebook draw,
    quantized sq-distance argmin encoding, LUT partial dot products), so
    codes, scores and ranks match the generated DuckDB oracle bit for
    bit.  Recall floors pytest-gated in tests/test_similarity.py; the
    rerank refinement is covered there too."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return sim.pq_topk(
        emb, queries, dim=ANN_DIM, m=ANN_PQ_M, n_codes=ANN_PQ_CODES, k=5
    )


# =====================================================================
# text analysis
# =====================================================================


_STOP_LIST = ", ".join(f"'{s}'" for s in tx.STOPWORDS)

@register(
    "text_metrics",
    f"""
    WITH base AS (
      SELECT doc_id, text, {_NORM} AS norm, {_TOKS} AS toks FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS INTEGER) AS n_tokens,
           CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS INTEGER) AS n_bpe_tokens,
           CAST(length(norm) AS INTEGER) AS n_chars_norm,
           CAST(length(text) AS INTEGER) AS n_chars_raw,
           CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
             / CAST(length(text) AS DOUBLE) AS punct_ratio,
           CAST(len(list_filter(toks, x -> x IN ({_STOP_LIST}))) AS DOUBLE)
             / CAST(len(toks) AS DOUBLE) AS stopword_ratio,
           CAST(length(replace(norm, ' ', '')) AS DOUBLE)
             / CAST(len(toks) AS DOUBLE) AS mean_token_len,
           (CASE WHEN len(toks) >= 5 THEN 1.0 ELSE 0.0 END)
             * (1.0 - CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
                      / CAST(length(text) AS DOUBLE))
             * (0.5 + CAST(len(list_filter(toks, x -> x IN ({_STOP_LIST}))) AS DOUBLE)
                      / CAST(len(toks) AS DOUBLE)) AS quality_score
    FROM base
    """,
    "text",
    headline=True,
)
def text_metrics(spark, sf_dir):
    """Token stats + quality heuristics in one scan (token counts, BPE-ish
    pre-token count, char counts, punctuation/stopword ratios, mean token
    length, combined quality score) — the cheap pre-dedup filter battery."""
    docs = _t(spark, sf_dir, "documents")
    return tx.text_metrics(docs, "text", "doc_id")


def _lang_fp_oracle() -> str:
    hits = {
        lang: f"len(list_filter(toks, x -> x IN ({', '.join(repr(m) for m in markers)})))"
        for lang, markers in sorted(tx.LANG_MARKERS.items())
    }
    greatest = "greatest(" + ", ".join(hits.values()) + ")"
    whens = "\n           ".join(
        f"WHEN {greatest} > 0 AND {h} = {greatest} THEN '{lang}'"
        for lang, h in hits.items()
    )
    return f"""
    WITH base AS (SELECT doc_id, {_TOKS} AS toks, md5({_NORM}) AS fp
                  FROM documents)
    SELECT doc_id,
           CASE {whens} ELSE 'und' END AS pred_lang,
           CAST({greatest} AS INTEGER) AS marker_hits,
           fp, substr(fp, 1, 8) AS fp_bucket
    FROM base
    """


def _langid_confusion_oracle() -> str:
    hits = {
        lang: f"len(list_filter(toks, x -> x IN ({', '.join(repr(m) for m in markers)})))"
        for lang, markers in sorted(tx.LANG_MARKERS.items())
    }
    greatest = "greatest(" + ", ".join(hits.values()) + ")"
    whens = "\n           ".join(
        f"WHEN {greatest} > 0 AND {h} = {greatest} THEN '{lang}'"
        for lang, h in hits.items()
    )
    return f"""
    WITH base AS (SELECT doc_id, lang, {_TOKS} AS toks FROM documents),
    p AS (SELECT lang AS true_lang,
                 CASE {whens} ELSE 'und' END AS pred_lang
          FROM base)
    SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
    FROM p GROUP BY true_lang, pred_lang
    """


@register("text_langid_confusion", _langid_confusion_oracle(), "text")
def text_langid_confusion(spark, sf_dir):
    """Classifier evaluation in-engine: the marker-word language-ID
    heuristic scored against the labeled lang column as a confusion
    matrix (true_lang, pred_lang, n) — the quality-report every
    lang-filter deployment needs before it gates a corpus.  One scan +
    one |langs|²-bounded agg; the prediction is the same deterministic
    argmax the green text_lang_fingerprint row proves."""
    docs = _t(spark, sf_dir, "documents")
    pred = tx.lang_id(docs, "text", "doc_id").select(
        "doc_id", F.col("pred_lang")
    )
    truth = docs.select("doc_id", F.col("lang").alias("true_lang"))
    return (
        truth.join(pred, "doc_id")
        .groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


@register("text_lang_fingerprint", _lang_fp_oracle(), "text")
def text_lang_fingerprint(spark, sf_dir):
    """Marker-word language ID + content fingerprint in one scan."""
    docs = _t(spark, sf_dir, "documents")
    out = tx.lang_fingerprint(docs, "text", "doc_id")
    return out.select(
        "doc_id",
        "pred_lang",
        F.col("marker_hits").cast("int").alias("marker_hits"),
        "fp",
        "fp_bucket",
    )


# =====================================================================
# multimodal (binary columns; decode is stubbed, plumbing is real)
# =====================================================================


@register(
    "multimodal_binary_meta",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5
    FROM documents
    """,
    "multimodal",
)
def multimodal_binary_meta(spark, sf_dir):
    """Opaque-binary plumbing: payload as BinaryType + JVM-side metadata
    (length/digest) — metadata queries never decode.  (md5 of the utf-8
    bytes ≡ md5 of the text.)"""
    docs = _t(spark, sf_dir, "documents")
    blob = docs.select(
        "doc_id", F.encode("text", "utf-8").alias("content")
    )
    return blob.select(
        "doc_id",
        F.length("content").cast("bigint").alias("n_bytes"),
        F.md5("content").alias("content_md5"),
    )


@register(
    "multimodal_features",
    """
    SELECT doc_id AS media_id,
           'image' AS kind,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           4 AS feat_dim,
           CAST(octet_length(encode(text)) AS FLOAT) AS feat_len,
           CAST(octet_length(encode(text)) % 7 AS FLOAT) AS feat_mod
    FROM documents
    """,
    "multimodal",
)
def multimodal_features(spark, sf_dir):
    """mapInPandas feature-extraction plumbing over binary payloads with a
    deterministic fake decoder (codec libs absent here; the decode stub is
    the documented injection point for PIL/librosa/ffmpeg).

    The catalog entry projects the feature array to scalar columns — both
    because the driver's canonicalizer sorts rows (arrays are unhashable in
    pandas) and because the byte-length-derived features are expressible in
    ANSI SQL, upgrading this from rows-only to a full hash-match.  The
    array-returning operator stays for API users (tests/test_multimodal.py
    covers the full feature vector)."""
    from creek_spark.operators.multimodal import extract_features

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "utf-8").alias("content"),
    )
    feats = extract_features(media, fake_decode=True)
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        "feat_dim",
        F.element_at("features", 1).alias("feat_len"),
        F.element_at("features", 4).alias("feat_mod"),
    )


@register(
    "multimodal_av_headers",
    """
    SELECT doc_id AS media_id,
           CASE CAST(doc_id % 4 AS INTEGER)
             WHEN 0 THEN 'wav' WHEN 1 THEN 'mp4/isom'
             WHEN 2 THEN 'flac' ELSE 'mp3' END AS format,
           CAST(CASE CAST(doc_id % 4 AS INTEGER)
             WHEN 0 THEN (doc_id % 10 + 1) * 250
             WHEN 1 THEN (doc_id % 100 + 1) * 10
             WHEN 2 THEN (doc_id % 10 + 1) * 250
             ELSE (doc_id % 30 + 1) * 100 END AS BIGINT) AS duration_ms,
           CAST(CASE CAST(doc_id % 4 AS INTEGER)
             WHEN 0 THEN 8000 + ((doc_id // 4) % 4) * 4000
             WHEN 2 THEN 16000 + ((doc_id // 4) % 2) * 32000
             WHEN 3 THEN CASE CAST((doc_id // 4) % 3 AS INTEGER)
               WHEN 0 THEN 44100 WHEN 1 THEN 48000 ELSE 32000 END
             ELSE NULL END AS INTEGER) AS sample_rate,
           CAST(CASE WHEN doc_id % 4 = 1 THEN NULL
                     ELSE (doc_id // 4) % 2 + 1 END AS INTEGER) AS n_channels,
           CAST(CASE CAST(doc_id % 4 AS INTEGER)
             WHEN 0 THEN 16
             WHEN 2 THEN 16 + ((doc_id // 4) % 2) * 8
             ELSE NULL END AS INTEGER) AS bit_depth
    FROM documents
    """,
    "multimodal",
)
def multimodal_av_headers(spark, sf_dir):
    """AV twin of multimodal_image_headers: synthesize spec-valid WAV /
    MP4 / FLAC / MP3 containers from doc_id arithmetic, decode with the
    pure-stdlib parser, and let the oracle predict every field —
    duration comes back through the actual RIFF data-size / mvhd
    timescale / FLAC 36-bit total-samples / MP3 CBR-bitrate math, so a
    mismatch means real header bytes broke.  The FLAC arm alternates
    16/24-bit depth and 16/48 kHz; the MP3 arm cycles the three MPEG-1
    sample rates and both channel modes (bit_depth NULL — lossy audio
    has no fixed sample width; its duration is the CBR estimate, exact
    for these constant-bitrate payloads)."""
    from creek_spark.operators.multimodal import (
        decode_av_headers,
        flac_bytes,
        mp3_bytes,
        mp4_bytes,
        wav_bytes,
    )

    def synth(batches):
        import pandas as pd  # noqa: PLC0415 — worker-side import

        for pdf in batches:
            content = []
            for i in pdf["doc_id"]:
                i = int(i)
                arm = i % 4
                if arm == 0:
                    content.append(
                        wav_bytes(
                            seconds=(i % 10 + 1) * 0.25,
                            rate=8000 + ((i // 4) % 4) * 4000,
                            channels=(i // 4) % 2 + 1,
                            bits=16,
                        )
                    )
                elif arm == 1:
                    content.append(
                        mp4_bytes(timescale=600, duration=(i % 100 + 1) * 6)
                    )
                elif arm == 2:
                    rate = 16000 + ((i // 4) % 2) * 32000
                    content.append(
                        flac_bytes(
                            total_samples=(i % 10 + 1) * rate // 4,
                            rate=rate,
                            channels=(i // 4) % 2 + 1,
                            bits=16 + ((i // 4) % 2) * 8,
                        )
                    )
                else:
                    content.append(
                        mp3_bytes(
                            duration_ms=(i % 30 + 1) * 100,
                            kbps=128,
                            rate=(44100, 48000, 32000)[(i // 4) % 3],
                            channels=(i // 4) % 2 + 1,
                            id3=i % 8 == 3,  # half the mp3s carry ID3v2
                        )
                    )
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": content})

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    media = docs.mapInPandas(
        synth, schema="media_id bigint, content binary"
    )
    return decode_av_headers(media, strict=True).select(
        "media_id", "format", "duration_ms", "sample_rate",
        "n_channels", "bit_depth",
    )


@register(
    "multimodal_frame_plan",
    """
    SELECT doc_id AS media_id, unnest(generate_series(0, doc_id % 60 + 5, 5)) AS frame_ts
    FROM documents
    """,
    "multimodal",
)
def multimodal_frame_plan(spark, sf_dir):
    """Video frame-sampling work plan driven by REAL container decode:
    synthesize an MP4 per document whose mvhd encodes a (doc_id % 60 + 5)
    second duration, recover the duration through the stdlib box parser,
    and expand one decode task every 5 s — (media_id, frame_ts) rows.
    The oracle predicts the expansion from the same arithmetic, so a
    mismatch means duration recovery or the expansion broke.  Payload
    bytes are never touched after the header read; the expansion is a
    JVM sequence/explode."""
    from creek_spark.operators.multimodal import decode_av_headers, mp4_bytes

    def synth(batches):
        import pandas as pd  # noqa: PLC0415 — worker-side import

        for pdf in batches:
            content = [
                mp4_bytes(timescale=600, duration=(int(i) % 60 + 5) * 600)
                for i in pdf["doc_id"]
            ]
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": content})

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    media = docs.mapInPandas(synth, schema="media_id bigint, content binary")
    hdrs = decode_av_headers(media, strict=True)
    dur_s = (F.col("duration_ms") / F.lit(1000)).cast("long")
    return hdrs.select(
        "media_id",
        F.explode(F.sequence(F.lit(0).cast("long"), dur_s, F.lit(5).cast("long"))).alias(
            "frame_ts"
        ),
    )


@register(
    "multimodal_image_headers",
    """
    SELECT doc_id AS media_id,
           CASE CAST(doc_id % 7 AS INTEGER)
             WHEN 0 THEN 'bmp' WHEN 1 THEN 'gif' WHEN 2 THEN 'png'
             WHEN 3 THEN 'webp' WHEN 4 THEN 'tiff'
             WHEN 5 THEN 'avif' ELSE 'heic' END AS format,
           CAST(doc_id % 512 + 1 AS INTEGER) AS width,
           CAST(doc_id % 256 + 1 AS INTEGER) AS height,
           CAST(CASE CAST(doc_id % 7 AS INTEGER)
             WHEN 0 THEN 24 WHEN 6 THEN 10 ELSE 8 END AS INTEGER)
             AS bit_depth,
           CAST(CASE CAST(doc_id % 7 AS INTEGER)
             WHEN 0 THEN 3 WHEN 1 THEN 1 WHEN 2 THEN 3
             WHEN 3 THEN CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 4 END
             ELSE 3 END AS INTEGER) AS n_channels,
           CAST(CASE WHEN doc_id % 7 < 3 THEN 3 ELSE NULL END AS INTEGER)
             AS n_channels_decoded
    FROM documents
    """,
    "multimodal",
)
def multimodal_image_headers(spark, sf_dir):
    """Round-trip proof that the image header decoder is REAL: synthesize
    a deterministic spec-valid BMP/GIF/PNG/WebP/TIFF/AVIF/HEIC payload
    per document (stdlib byte builders), then recover geometry with
    `decode_image_headers` (pure-stdlib parse over Arrow batches).  The
    oracle predicts the decoded fields from the same doc_id arithmetic —
    a hash mismatch means either the builder or the parser mangled real
    header bytes.  ``n_channels_decoded`` (round 12) reports the
    pixel-decode channel count beside the container truth: the GIF arm
    stores 1 index sample per pixel but decodes to 3 channels
    (palette→RGB), so header rows join coherently against pixel_stats
    rows; the WebP/TIFF/AVIF/HEIC arms (round 12) are header-parseable
    but outside the pixel decoders' profile, so their decoded count is
    NULL — the same split media_report monitors.  Variant coverage: the
    WebP arm alternates lossy VP8 (3 channels) with alpha-flagged
    lossless VP8L (4) by doc parity; the TIFF arm alternates byte order
    AND the inline vs behind-offset BitsPerSample layout; the AVIF arm
    carries a smaller thumbnail ispe the largest-extent rule must skip;
    the HEIC arm is 10-bit (the common HDR depth) under the mif1
    brand."""
    from creek_spark.operators.multimodal import (
        avif_bytes,
        bmp_bytes,
        decode_image_headers,
        gif_bytes,
        png_bytes,
        tiff_bytes,
        webp_bytes,
    )

    def synth(batches):
        import pandas as pd  # noqa: PLC0415 — worker-side import

        for pdf in batches:
            content = []
            for i in pdf["doc_id"]:
                i = int(i)
                w, h = i % 512 + 1, i % 256 + 1
                arm = i % 7
                if arm == 3:
                    content.append(
                        webp_bytes(w, h, layout="vp8")
                        if i % 2 == 0
                        else webp_bytes(w, h, layout="vp8l", alpha=True)
                    )
                elif arm == 4:
                    content.append(
                        tiff_bytes(
                            w, h, big_endian=i % 2 == 0,
                            bits_behind_offset=i % 2 == 1,
                        )
                    )
                elif arm == 5:
                    content.append(
                        avif_bytes(w, h, thumb=(max(1, w // 4), max(1, h // 4)))
                    )
                elif arm == 6:
                    content.append(
                        avif_bytes(w, h, brand="mif1", bit_depth=10)
                    )
                else:
                    content.append([bmp_bytes, gif_bytes, png_bytes][arm](w, h))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": content})

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    media = docs.mapInPandas(
        synth, schema="media_id bigint, content binary"
    )
    hdrs = decode_image_headers(media, strict=True)
    return hdrs.select(
        "media_id", "format", "width", "height", "bit_depth",
        "n_channels", "n_channels_decoded",
    )


@register(
    "multimodal_patch_plan",
    """
    WITH m AS (
      SELECT doc_id AS media_id,
             CAST(doc_id % 512 + 1 AS BIGINT) AS width,
             CAST(doc_id % 256 + 1 AS BIGINT) AS height,
             CAST(((doc_id % 512 + 1 + 15) // 16)
                  * ((doc_id % 256 + 1 + 15) // 16) AS BIGINT) AS n_patches,
             CAST(doc_id % 8 AS INTEGER) AS shard
      FROM documents),
    cum AS (
      SELECT *, SUM(n_patches) OVER (PARTITION BY shard ORDER BY media_id
                                     ROWS UNBOUNDED PRECEDING) AS cum_incl
      FROM m)
    SELECT media_id, n_patches, shard,
           CAST((cum_incl - n_patches) // 1024 AS INTEGER) AS pack_id,
           CAST((cum_incl - n_patches) % 1024 AS INTEGER) AS pack_offset
    FROM cum
    """,
    "multimodal",
)
def multimodal_patch_plan(spark, sf_dir):
    """Vision-LM preprocessing plan driven by REAL image decode: every
    document gets a spec-valid synthesized image, geometry is recovered
    through the stdlib header parser, ViT-style 16×16 patch counts are
    computed (ceil(w/16)·ceil(h/16)), and images are packed into
    1024-patch batches per shard — the multimodal twin of text sequence
    packing, sharing pack_sequences' segmented cumsum.  The oracle
    predicts geometry AND pack layout from the doc_id arithmetic, so a
    mismatch means header decode, patch math, or the distributed cumsum
    broke.  Image bytes are touched only inside the Arrow-batched
    header parse; everything after is JVM integer arithmetic."""
    from creek_spark.operators.multimodal import (
        bmp_bytes,
        decode_image_headers,
        gif_bytes,
        png_bytes,
    )
    from creek_spark.operators.pipeline import pack_sequences

    def synth(batches):
        import pandas as pd  # noqa: PLC0415 — worker-side import

        for pdf in batches:
            content = []
            for i in pdf["doc_id"]:
                i = int(i)
                w, h = i % 512 + 1, i % 256 + 1
                content.append([bmp_bytes, gif_bytes, png_bytes][i % 3](w, h))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": content})

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    media = docs.mapInPandas(synth, schema="media_id bigint, content binary")
    hdrs = decode_image_headers(media, strict=True)
    patches = hdrs.select(
        "media_id",
        (
            F.floor((F.col("width") + 15) / 16)
            * F.floor((F.col("height") + 15) / 16)
        )
        .cast("bigint")
        .alias("n_patches"),
    )
    packed = pack_sequences(
        patches,
        "media_id",
        "n_patches",
        budget=1024,
        shard_col=F.pmod(F.col("media_id"), F.lit(8)),
    )
    return packed.select(
        "media_id", "n_patches", "shard", "pack_id", "pack_offset"
    )


# =====================================================================
# training pipeline (sampling / scrubbing / packing — operators/pipeline)
# =====================================================================

from creek_spark.operators import pipeline as pl  # noqa: E402

_PIPE_SQL = f"""
    WITH scrubbed AS (
      SELECT doc_id,
             length(text) AS n_chars,
             substr(md5('s' || CAST(doc_id AS VARCHAR)), 1, 2) < '40' AS sampled,
             CAST(len(regexp_extract_all(text, '{pl.EMAIL_RE}'))
                  + len(regexp_extract_all(text, '{pl.IPV4_RE}')) AS INTEGER)
               AS n_redactions,
             CAST(length(regexp_replace(
                    regexp_replace(text, '{pl.EMAIL_RE}', '<EMAIL>', 'g'),
                    '{pl.IPV4_RE}', '<IP>', 'g')) AS INTEGER) AS scrubbed_len,
             CAST(doc_id % 8 AS INTEGER) AS shard
      FROM documents),
    cum AS (
      SELECT *,
             SUM(n_chars) OVER (PARTITION BY shard ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_chars
               AS cum_before
      FROM scrubbed)
    SELECT doc_id, sampled, n_redactions, scrubbed_len, shard,
           CAST(cum_before // 4096 AS INTEGER) AS pack_id,
           CAST(cum_before % 4096 AS INTEGER) AS pack_offset
    FROM cum
"""


@register("training_pipeline", _PIPE_SQL, "pipeline")
def training_pipeline(spark, sf_dir):
    """The per-document decisions of a pretraining-data pipeline in one
    scan: deterministic 25% sample flag (md5-derived — reruns and
    late shards decide identically), PII scrub audit (emails + IPv4
    redacted, span count + scrubbed length), and sequence packing
    (shard → cumulative-offset pack assignment under a 4096-token
    budget).  Sampling/scrub are stateless per-row expressions that
    fuse into the scan; packing adds the pipeline's only shuffle (by
    shard).  Operators: operators/pipeline.py."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", F.length("text").alias("n_chars")
    )
    scr = pl.scrub_pii(docs, "text")
    packed = pl.pack_sequences(
        scr,
        "doc_id",
        "n_chars",
        budget=4096,
        n_shards=8,
        shard_col=F.pmod(F.col("doc_id"), F.lit(8)),
    )
    return packed.select(
        "doc_id",
        pl.sample_hash(F.col("doc_id"), 25, salt="s").alias("sampled"),
        "n_redactions",
        F.length(F.col("text_scrubbed")).cast("int").alias("scrubbed_len"),
        "shard",
        "pack_id",
        "pack_offset",
    )


CONTAM_K = 5
CONTAM_BENCH_MAX = 20
CONTAM_MIN_COVERAGE = 0.2


def _contamination_oracle() -> str:
    """Same shingle CTE as the dedup oracles; bench side = doc_id <
    CONTAM_BENCH_MAX, coverage = overlap / bench shingle count."""
    return f"""
    WITH {_sql_shingles(CONTAM_K)},
    bsz AS (SELECT doc AS bench_doc, CAST(COUNT(*) AS BIGINT) AS bsz
            FROM sh WHERE doc < {CONTAM_BENCH_MAX} GROUP BY doc),
    inter AS (SELECT c.doc, b.doc AS bench_doc, CAST(COUNT(*) AS BIGINT) AS n_overlap
              FROM sh c JOIN sh b ON b.shingle = c.shingle
              WHERE b.doc < {CONTAM_BENCH_MAX} AND c.doc <> b.doc
              GROUP BY c.doc, b.doc)
    SELECT i.doc, i.bench_doc, i.n_overlap,
           CAST(i.n_overlap AS DOUBLE) / CAST(z.bsz AS DOUBLE) AS coverage
    FROM inter i JOIN bsz z USING (bench_doc)
    WHERE CAST(i.n_overlap AS DOUBLE) / CAST(z.bsz AS DOUBLE) >= {CONTAM_MIN_COVERAGE}
    """


@register("contamination_check", _contamination_oracle(), "pipeline")
def contamination_check(spark, sf_dir):
    """Eval-set contamination scan: corpus documents covering ≥ 20% of a
    benchmark document's 5-gram shingles (bench = doc_id < 20 as the
    stand-in eval suite).  One corpus scan, bench shingles broadcast, no
    self-join — the pair space is corpus×bench, not corpus²."""
    from creek_spark.operators.pipeline import contamination_overlap

    docs = _t(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") < CONTAM_BENCH_MAX)
    return contamination_overlap(
        docs, bench, "text", "doc_id", k=CONTAM_K, min_coverage=CONTAM_MIN_COVERAGE
    )


PASSAGE_WINDOW = 10
PASSAGE_MIN_DOCS = 2


def _passages_oracle() -> str:
    """Same token CTE as the shingle oracles; aligned 10-token chunks,
    md5 digest, grouped across the corpus."""
    w = PASSAGE_WINDOW
    return f"""
    WITH toks AS (SELECT doc_id AS doc, {_TOKS} AS t FROM documents),
    ch AS (SELECT doc, array_to_string(t[i*{w}+1 : i*{w}+{w}], ' ') AS chunk
           FROM toks, unnest(generate_series(0, len(t) // {w} - 1)) AS g(i))
    SELECT md5(chunk) AS passage_md5,
           CAST(COUNT(DISTINCT doc) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(MIN(doc) AS BIGINT) AS first_doc
    FROM ch GROUP BY md5(chunk)
    HAVING COUNT(DISTINCT doc) >= {PASSAGE_MIN_DOCS}
    """


@register("dedup_passages", _passages_oracle(), "dedup")
def dedup_passages(spark, sf_dir):
    """Passage-level exact dedup: aligned 10-token chunks repeated across
    ≥2 documents — the boilerplate/template leak doc-level dedup misses.
    One scan + one explode (fewer rows than the token stream) + one
    hash-agg on the uniform md5 digest; skew-free at any corpus size."""
    docs = _t(spark, sf_dir, "documents")
    return dd.repeated_passages(
        docs, "text", "doc_id", window=PASSAGE_WINDOW, min_docs=PASSAGE_MIN_DOCS
    )


def _corpus_report_oracle() -> str:
    """Wraps the text_metrics oracle (nested WITH in a subquery) and
    aggregates per (source, lang); mean quality rides a decimal cast
    (scale 12 — no double can tie at a 5^13-denominator midpoint, so
    both engines round identically)."""
    inner = QUERIES["text_metrics"].oracle
    return f"""
    SELECT d.source, d.lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(m.n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(CAST(m.quality_score AS DECIMAL(18,12))) AS DOUBLE)
             / COUNT(*) AS mean_quality,
           CAST(SUM(CASE WHEN m.quality_score < 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_low_quality
    FROM ({inner}) m JOIN documents d ON d.doc_id = m.doc_id
    GROUP BY d.source, d.lang
    """


def _dedup_keep_best_oracle() -> str:
    """Exact-dup groups on the normalized-text digest over the corpus ∪
    a punctuation-damaged copy of every document (same normalized text,
    strictly worse punct_ratio → lower quality): the kept representative
    must be the clean original, by QUALITY, not by id."""
    toks = SQL_TOKENS.format(c="u.text")
    norm = SQL_NORM.format(c="u.text")
    quality = f"""(CASE WHEN len({toks}) >= 5 THEN 1.0 ELSE 0.0 END)
             * (1.0 - CAST(length(u.text) - length(regexp_replace(u.text, '[^a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
                      / CAST(length(u.text) AS DOUBLE))
             * (0.5 + CAST(len(list_filter({toks}, x -> x IN ({_STOP_LIST}))) AS DOUBLE)
                      / CAST(len({toks}) AS DOUBLE))"""
    return f"""
    WITH u AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text || ' !!!! ???? ####' FROM documents),
    m AS (SELECT u.doc_id, {quality} AS quality_score, md5({norm}) AS h
          FROM u),
    r AS (SELECT doc_id, h, quality_score,
                 row_number() OVER (PARTITION BY h
                                    ORDER BY quality_score DESC, doc_id) AS rn,
                 COUNT(*) OVER (PARTITION BY h) AS n
          FROM m),
    kept AS (SELECT h, doc_id AS kept_as FROM r WHERE rn = 1)
    SELECT r.doc_id, k.kept_as, CAST(r.n AS BIGINT) AS n_copies
    FROM r JOIN kept k ON k.h = r.h
    WHERE r.n > 1 AND r.rn > 1
    """


@register("dedup_exact_keep_best", _dedup_keep_best_oracle(), "dedup")
def dedup_exact_keep_best(spark, sf_dir):
    """Exact dedup that keeps the BEST copy: the corpus plus a
    punctuation-damaged twin of every document (same normalized text —
    the md5 group key — but strictly lower text_metrics quality) is
    deduped by digest, and within each group the highest quality score
    survives (doc_id tiebreak); the rest emit (doc_id, kept_as,
    n_copies).  The production refinement of keep-smallest-id dedup —
    near-identical crawls differ in truncation/encoding damage and you
    keep the cleanest.  Single scan + ONE digest-keyed window shuffle;
    the kept-representative join rides the same hash key."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    damaged = docs.select(
        (F.col("doc_id") + F.lit(1000000)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" !!!! ???? ####")).alias("text"),
    )
    u = docs.unionByName(damaged)
    m = tx.text_metrics(u, "text", "doc_id", keep=("text",)).select(
        "doc_id", "quality_score",
        F.md5(norm_text(F.col("text"))).alias("h"),
    )
    w = Window.partitionBy("h").orderBy(
        F.col("quality_score").desc(), F.col("doc_id")
    )
    wc = Window.partitionBy("h")
    r = m.select(
        "doc_id", "h", "quality_score",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    kept = r.where(F.col("rn") == 1).select(
        "h", F.col("doc_id").alias("kept_as")
    )
    return (
        r.join(kept, "h")
        .where((F.col("n") > 1) & (F.col("rn") > 1))
        .select("doc_id", "kept_as", F.col("n").cast("bigint").alias("n_copies"))
    )


QUALITY_KEEP_FRAC = 0.5


def _quality_filter_oracle() -> str:
    """Per-language top-half quality filter over the text_metrics score
    (nested WITH in a subquery, same wrapper trick as corpus_report)."""
    inner = QUERIES["text_metrics"].oracle
    return f"""
    SELECT doc_id, lang, quality_score, qrank FROM (
      SELECT m.doc_id, d.lang, m.quality_score,
             CAST(row_number() OVER (PARTITION BY d.lang
                                     ORDER BY m.quality_score DESC,
                                              m.doc_id) AS INTEGER) AS qrank,
             COUNT(*) OVER (PARTITION BY d.lang) AS n
      FROM ({inner}) m JOIN documents d ON d.doc_id = m.doc_id) t
    WHERE qrank <= CAST(ceil({QUALITY_KEEP_FRAC} * CAST(n AS DOUBLE)) AS BIGINT)
    """


@register("sample_quality_filter", _quality_filter_oracle(), "pipeline")
def sample_quality_filter(spark, sf_dir):
    """Quality-quantile filtering: keep the best ceil(50%·n) documents
    per language by the text_metrics quality score (ties broken by
    doc_id) — the model-free FineWeb-style "train on the better half"
    selection step.

    Scale shape (proactive round-5 fix): lang has a handful of values,
    so a per-language ranking window is a few single-task sorts of the
    corpus.  The rank instead comes from segmented_running — documents
    window within (lang, score-bucket) segments (the bucket is monotone
    along the score-desc order) with broadcast per-segment offsets — and
    the quota joins back from a tiny per-language count of the raw
    table (no second metrics pass)."""
    from creek_spark.operators.distributed import segmented_running

    docs = _t(spark, sf_dir, "documents")
    m = tx.text_metrics(docs, "text", "doc_id", keep=("lang",)).select(
        "doc_id", "lang", "quality_score"
    )
    base = segmented_running(
        m,
        ["lang"],
        (-F.floor(F.col("quality_score") * 64)).cast("bigint"),
        [F.col("quality_score").desc(), F.col("doc_id")],
        {"qrank": (F.lit(1), "rownum")},
        persist=True,  # input is the derived metrics pipeline
    )
    quota = docs.groupBy("lang").agg(
        F.ceil(
            F.lit(QUALITY_KEEP_FRAC) * F.count(F.lit(1)).cast("double")
        ).alias("_quota")
    )
    return (
        base.join(F.broadcast(quota), "lang")
        .where(F.col("qrank") <= F.col("_quota"))
        .select(
            "doc_id", "lang", "quality_score",
            F.col("qrank").cast("int").alias("qrank"),
        )
    )


@register("corpus_report", _corpus_report_oracle(), "text")
def corpus_report(spark, sf_dir):
    """Per-(source, lang) corpus report card: doc counts, token totals,
    mean quality, low-quality counts — the rollup every ingest batch gets
    before it is admitted to a training mix.  Single scan: text_metrics
    passes source/lang through its one projection (keep=), so the report
    is scan → project → one partial+final aggregate, no join."""
    docs = _t(spark, sf_dir, "documents")
    m = tx.text_metrics(docs, "text", "doc_id", keep=("source", "lang"))
    return m.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        (
            F.sum(F.col("quality_score").cast("decimal(18,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_quality"),
        F.sum(
            F.when(F.col("quality_score") < 0.5, 1).otherwise(0)
        ).cast("bigint").alias("n_low_quality"),
    )


def _repetition_oracle() -> str:
    """Same gram construction as repetition_metrics: one UNION ALL branch
    per size (DuckDB list comprehension + inclusive 1-based slices)."""
    branches = []
    for k in tx.REPETITION_SIZES:
        branches.append(
            f"SELECT doc, {k} AS k, "
            f"unnest([array_to_string(t[i : i+{k - 1}], ' ') "
            f"FOR i IN generate_series(1, len(t)-{k - 1})]) AS gram "
            f"FROM toks WHERE len(t) >= {k}"
        )
    union = "\n      UNION ALL\n      ".join(branches)
    cols = []
    for k in tx.REPETITION_SIZES:
        tot = f"MAX(CASE WHEN k={k} THEN tot END)"
        cols.append(f"CAST({tot} AS BIGINT) AS n_{k}grams")
        cols.append(
            f"CAST(MAX(CASE WHEN k={k} THEN mx END) AS DOUBLE) / {tot}"
            f" AS top_{k}gram_frac"
        )
        cols.append(
            f"CAST(MAX(CASE WHEN k={k} THEN dup END) AS DOUBLE) / {tot}"
            f" AS dup_{k}gram_frac"
        )
    sel = ",\n           ".join(cols)
    return f"""
    WITH toks AS (SELECT doc_id AS doc, {_TOKS} AS t FROM documents),
    g AS ({union}),
    c AS (SELECT doc, k, gram, COUNT(*) AS cnt FROM g GROUP BY doc, k, gram),
    p AS (SELECT doc, k, MAX(cnt) AS mx, SUM(cnt) AS tot,
                 SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS dup
          FROM c GROUP BY doc, k)
    SELECT doc AS doc_id,
           {sel}
    FROM p GROUP BY doc
    """


@register("text_repetition", _repetition_oracle(), "text")
def text_repetition(spark, sf_dir):
    """Gopher-style intra-document repetition filters (top-k-gram and
    duplicate-k-gram fractions over token windows) — the standard cheap
    signal for machine-generated/boilerplate text.  One scan, one
    struct-tagged explode for all gram sizes, two doc-keyed hash aggs."""
    docs = _t(spark, sf_dir, "documents")
    return tx.repetition_metrics(docs, "text", "doc_id")


def _lm_familiarity_oracle(n: int = 2) -> str:
    return f"""
    WITH toks AS (SELECT doc_id AS doc, {_TOKS} AS t FROM documents),
    g AS (SELECT doc,
                 unnest([array_to_string(t[i : i+{n - 1}], ' ')
                         FOR i IN generate_series(1, len(t)-{n - 1})]) AS gram
          FROM toks WHERE len(t) >= {n}),
    dg AS (SELECT doc, gram, COUNT(*) AS occ FROM g GROUP BY doc, gram),
    cg AS (SELECT gram, SUM(occ) AS cnt FROM dg GROUP BY gram)
    SELECT doc AS doc_id,
           CAST(SUM(occ) AS BIGINT) AS n_{n}grams,
           CAST(SUM(occ*cnt) AS DOUBLE) / SUM(occ) AS mean_{n}gram_freq,
           CAST(SUM(CASE WHEN cnt = occ THEN occ ELSE 0 END) AS DOUBLE)
             / SUM(occ) AS novel_{n}gram_frac
    FROM dg JOIN cg USING (gram) GROUP BY doc
    """


CMS_DEPTH = 4
CMS_WIDTH = 64
CMS_PROBES = ["spark", "vector", "merge", "window", "zzzqq"]


def _cms_oracle() -> str:
    probe_vals = ", ".join(f"('{t}')" for t in CMS_PROBES)
    probe_list = ", ".join(f"'{t}'" for t in CMS_PROBES)
    rows_vals = ", ".join(f"({j})" for j in range(CMS_DEPTH))
    return f"""
    WITH toks AS (SELECT unnest({_TOKS}) AS tok FROM documents),
    hrows AS (SELECT * FROM (VALUES {rows_vals}) t(j)),
    cells AS (SELECT j,
                     CAST('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || tok), 1, 8)
                          AS BIGINT) % {CMS_WIDTH} AS bucket,
                     CAST(COUNT(*) AS BIGINT) AS cnt
              FROM toks CROSS JOIN hrows GROUP BY 1, 2),
    probes AS (SELECT * FROM (VALUES {probe_vals}) p(term)),
    pc AS (SELECT term, j,
                  CAST('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || term), 1, 8)
                       AS BIGINT) % {CMS_WIDTH} AS bucket
           FROM probes CROSS JOIN hrows),
    est AS (SELECT term, CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS est_count
            FROM pc LEFT JOIN cells c ON c.j = pc.j AND c.bucket = pc.bucket
            GROUP BY term),
    exact AS (SELECT tok AS term, CAST(COUNT(*) AS BIGINT) AS exact_count
              FROM toks WHERE tok IN ({probe_list}) GROUP BY tok)
    SELECT est.term, est.est_count,
           CAST(COALESCE(exact.exact_count, 0) AS BIGINT) AS exact_count
    FROM est LEFT JOIN exact ON exact.term = est.term
    """


@register("sketch_cms_counts", _cms_oracle(), "sketch")
def sketch_cms_counts(spark, sf_dir):
    """Count-min sketch over the document token stream: fixed
    depth×width cell grid (mergeable by addition — composes with the
    streaming rollup sink), probed for a term list alongside the exact
    counts (est ≥ exact always; equality whenever no collision).  Build
    shuffles ≤ depth·width rows after map-side combine; probing is one
    broadcast join of the sketch (operators/sketches.py cms_*)."""
    from creek_spark.functions.text import tokens as _tokens
    from creek_spark.operators.sketches import cms_build, cms_estimate

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(F.explode(_tokens("text")).alias("tok"))
    sk = cms_build(toks, "tok", depth=CMS_DEPTH, width=CMS_WIDTH)
    probes = spark.createDataFrame([(t,) for t in CMS_PROBES], ["term"])
    est = cms_estimate(sk, probes, "term", depth=CMS_DEPTH, width=CMS_WIDTH)
    exact = (
        toks.where(F.col("tok").isin(CMS_PROBES))
        .groupBy(F.col("tok").alias("term"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_count"))
    )
    return est.join(exact, "term", "left").select(
        "term",
        "est_count",
        F.coalesce(F.col("exact_count"), F.lit(0)).cast("bigint").alias("exact_count"),
    )


BPE_TOP_K = 20


def _bpe_oracle(k: int = BPE_TOP_K) -> str:
    return f"""
    WITH w AS (SELECT unnest({_TOKS}) AS w FROM documents),
    wc AS (SELECT w, COUNT(*) AS wn FROM w GROUP BY w),
    p AS (SELECT substr(w, i, 2) AS pair, wn
          FROM wc, unnest(generate_series(1, length(w)-1)) AS t(i)
          WHERE length(w) >= 2),
    c AS (SELECT pair, CAST(SUM(wn) AS BIGINT) AS n_pair FROM p GROUP BY pair)
    SELECT pair, n_pair FROM c ORDER BY n_pair DESC, pair LIMIT {k}
    """


@register("text_bpe_pairs", _bpe_oracle(), "text")
def text_bpe_pairs(spark, sf_dir):
    """One BPE-training merge step: top-20 adjacent character pairs by
    corpus frequency.  Scalable formulation — distinct-word counts first
    (the only token-stream shuffle), pair enumeration over the
    VOCABULARY weighted by word count, TakeOrdered top-k with a total
    (count, pair) order (operators/text.py bpe_pair_counts)."""
    docs = _t(spark, sf_dir, "documents")
    return tx.bpe_pair_counts(docs, "text", k=BPE_TOP_K)


DSIR_TARGET_LANG = "en"


def _dsir_oracle(n: int = 2) -> str:
    return f"""
    WITH toks AS (SELECT doc_id AS doc, (lang = '{DSIR_TARGET_LANG}') AS t,
                         {_TOKS} AS tk FROM documents),
    g AS (SELECT doc, t,
                 unnest([array_to_string(tk[i : i+{n - 1}], ' ')
                         FOR i IN generate_series(1, len(tk)-{n - 1})]) AS gram
          FROM toks WHERE len(tk) >= {n}),
    dg AS (SELECT doc, t, gram, COUNT(*) AS occ FROM g GROUP BY doc, t, gram),
    cg AS (SELECT gram,
                  SUM(CASE WHEN t THEN occ ELSE 0 END) AS ct,
                  SUM(CASE WHEN NOT t THEN occ ELSE 0 END) AS cr
           FROM dg GROUP BY gram),
    tot AS (SELECT SUM(ct) AS nt, SUM(cr) AS nr FROM cg),
    ds AS (SELECT doc, SUM(occ) AS ng,
                  SUM(CAST(occ AS DECIMAL(19,0)) * CAST(ct AS DECIMAL(19,0))) AS a,
                  SUM(CAST(occ AS DECIMAL(19,0)) * CAST(cr AS DECIMAL(19,0))) AS b
           FROM dg JOIN cg USING (gram) GROUP BY doc)
    SELECT doc AS doc_id, CAST(ng AS BIGINT) AS n_{n}grams,
           CAST(a AS DOUBLE) / CAST(nt AS DOUBLE)
             - CAST(b AS DOUBLE) / CAST(nr AS DOUBLE) AS dsir_score
    FROM ds, tot
    """


@register("text_dsir_contrast", _dsir_oracle(), "text")
def text_dsir_contrast(spark, sf_dir):
    """DSIR-style importance contrast: per-document lean toward the
    English subset (the "target" domain) vs the rest of the corpus on
    bigram relative frequencies — the data-selection score that picks
    raw documents resembling a curated target.  Log-free (decimal sums,
    two IEEE divisions) so it is oracle-exact; post-explode exchanges
    carry distinct (doc, gram) rows only, totals ride a 1-row
    broadcast (operators/text.py dsir_contrast)."""
    docs = _t(spark, sf_dir, "documents").withColumn(
        "_is_en", F.col("lang") == DSIR_TARGET_LANG
    )
    return tx.dsir_contrast(docs, "text", "doc_id", "_is_en")


@register("text_lm_familiarity", _lm_familiarity_oracle(), "text")
def text_lm_familiarity(spark, sf_dir):
    """Count-based corpus-LM familiarity / novelty per document (the
    perplexity-filter stand-in, log-free so it is oracle-exact).  All
    post-explode exchanges carry distinct-(doc,gram) rows only."""
    docs = _t(spark, sf_dir, "documents")
    return tx.lm_familiarity(docs, "text", "doc_id")


KM_K = 8
KM_ITERS = 2
KM_SCALE = 10**6


def _kmeans_ctes(k: int = KM_K, iters: int = KM_ITERS, s: int = KM_SCALE):
    """Unrolled Lloyd iterations as a CTE chain — exact because every
    step is integer arithmetic (quantized components, BIGINT distances,
    truncating-division means: DuckDB `//` and Spark `div` both truncate
    toward zero).  Returns (ctes, final_assign_name) so other oracles
    (semantic dedup) can build on the same assignment."""

    def assign(i, cents):
        return f"""a{i} AS (
      SELECT id, v, cid, d AS dist FROM (
        SELECT id, v, cid, d,
               row_number() OVER (PARTITION BY id ORDER BY d, mkey, cid) AS rn
        FROM (SELECT q.id, q.v, c.mkey, c.cid,
                     list_sum([(q.v[i]-c.cv[i])*(q.v[i]-c.cv[i])
                               FOR i IN generate_series(1, len(q.v))]) AS d
              FROM qv q CROSS JOIN {cents} c) dd) rr
      WHERE rn = 1)"""

    def update(i):
        return f"""e{i} AS (
      SELECT cid, i AS pos, SUM(v[i]) AS sm, COUNT(*) AS n
      FROM a{i}, unnest(generate_series(1, len(v))) AS t(i)
      GROUP BY cid, i),
    c{i} AS (
      SELECT c.mkey, c.cid,
             CASE WHEN COUNT(e.pos) = 0 THEN any_value(c.cv)
                  ELSE list(e.sm // e.n ORDER BY e.pos) END AS cv
      FROM c{i - 1} c LEFT JOIN e{i} e ON e.cid = c.cid
      GROUP BY c.mkey, c.cid)"""

    ctes = [
        f"""qv AS (SELECT vec_id AS id,
                   [CAST(FLOOR(CAST(x AS DOUBLE) * {s}) AS BIGINT)
                    FOR x IN embedding] AS v
            FROM embeddings)""",
        f"""c0 AS (SELECT md5(CAST(id AS VARCHAR)) AS mkey, id AS cid, v AS cv
            FROM qv ORDER BY mkey, cid LIMIT {k})""",
    ]
    for i in range(1, iters + 1):
        ctes.append(assign(i, f"c{i - 1}"))
        ctes.append(update(i))
    ctes.append(assign(iters + 1, f"c{iters}"))
    return ctes, f"a{iters + 1}"


def _kmeans_oracle(k: int = KM_K, iters: int = KM_ITERS, s: int = KM_SCALE) -> str:
    ctes, final = _kmeans_ctes(k, iters, s)
    body = ",\n    ".join(ctes)
    return f"""
    WITH {body}
    SELECT cid AS cluster, CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(SUM(dist) AS BIGINT) AS inertia_scaled
    FROM {final} GROUP BY cid
    """


SEMDEDUP_THRESHOLD = 0.35


def _semdedup_oracle(
    k: int = KM_K, iters: int = KM_ITERS, s: int = KM_SCALE,
    tau: float = SEMDEDUP_THRESHOLD,
) -> str:
    """SemDeDup oracle: the unrolled-Lloyd assignment CTEs as the
    blocking key, then in-cluster upper-triangular cosine (exact decimal
    dot, same shape the green similarity_topk oracle uses) and the
    paper's one-pass "remove j when ∃ i<j with sim ≥ τ" rule."""
    ctes, final = _kmeans_ctes(k, iters, s)
    body = ",\n    ".join(ctes)
    return f"""
    WITH {body},
    asg AS (SELECT id, cid FROM {final}),
    ep AS (SELECT vec_id AS id, unnest(generate_series(1, len(embedding))) AS pos,
                  unnest([CAST(x AS DOUBLE) FOR x IN embedding]) AS ev
           FROM embeddings),
    norms AS (SELECT vec_id AS id,
                     SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(38,12))) AS ns
              FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings) u
              GROUP BY vec_id),
    pairs AS (SELECT a.id AS id_a, b.id AS id_b
              FROM asg a JOIN asg b ON a.cid = b.cid AND a.id < b.id),
    dots AS (SELECT p.id_a, p.id_b,
                    SUM(CAST(ea.ev * eb.ev AS DECIMAL(38,12))) AS dot
             FROM pairs p
             JOIN ep ea ON ea.id = p.id_a
             JOIN ep eb ON eb.id = p.id_b AND eb.pos = ea.pos
             GROUP BY p.id_a, p.id_b),
    sims AS (SELECT id_a, id_b,
                    CAST(dot AS DOUBLE)
                      / (sqrt(CAST(na.ns AS DOUBLE)) * sqrt(CAST(nb.ns AS DOUBLE))) AS cs
             FROM dots
             JOIN norms na ON na.id = dots.id_a
             JOIN norms nb ON nb.id = dots.id_b),
    rem AS (SELECT id_b, MIN(id_a) AS dup_of, MAX(cs) AS max_sim
            FROM sims WHERE cs >= {tau} GROUP BY id_b)
    SELECT asg.id AS vec_id, asg.cid AS cluster,
           (rem.id_b IS NOT NULL) AS removed, rem.dup_of, rem.max_sim
    FROM asg LEFT JOIN rem ON rem.id_b = asg.id
    """


@register("dedup_semantic", _semdedup_oracle(), "dedup")
def dedup_semantic(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023): k-means blocking + in-cluster
    cosine ≥ τ against any earlier id → removed, with the surviving
    representative (smallest offending id) attached.

    Scale: pair space is |cluster|²-bounded — the clustering IS the
    blocking; assignment is a broadcast-centroid map-side fold (zero
    corpus shuffle per Lloyd round), norms precomputed pre-join, dots
    exact decimal folds in whole-stage codegen."""
    from creek_spark.operators.clustering import semantic_dedup

    emb = _t(spark, sf_dir, "embeddings")
    return semantic_dedup(
        emb, "vec_id", "embedding",
        k=KM_K, iters=KM_ITERS, scale=KM_SCALE,
        threshold=SEMDEDUP_THRESHOLD,
    )


@register("embedding_kmeans", _kmeans_oracle(), "similarity")
def embedding_kmeans(spark, sf_dir):
    """Distributed k-means (2 exact Lloyd rounds + reporting assign) on
    integer-quantized embeddings.  Assignment is a map-side fold over one
    broadcast centroid row (zero corpus shuffle); the centroid update's
    posexplode collapses to k·dim rows per task via partial aggregation —
    per iteration: one corpus scan, no corpus-sized exchange."""
    from creek_spark.operators.clustering import kmeans_summary

    emb = _t(spark, sf_dir, "embeddings")
    return kmeans_summary(
        emb, "vec_id", "embedding", k=KM_K, iters=KM_ITERS, scale=KM_SCALE
    )


# =====================================================================
# BM25 keyword search (retrieval over the documents table)
# =====================================================================

BM25_TERMS = ["spark", "vector", "merge", "window"]
BM25_K = 10
# constants below mirror bm25_topk's k1=1.2, b=0.75 defaults
_BM25_TERM_LIST = ", ".join(f"'{t}'" for t in BM25_TERMS)


def _bm25_oracle() -> str:
    return f"""
    WITH bl AS (
      SELECT doc_id AS doc, {_TOKS} AS toks FROM documents),
    dl AS (SELECT doc, toks, CAST(len(toks) AS BIGINT) AS dl FROM bl),
    stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                     CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dl),
    tf AS (
      SELECT doc, dl, tok AS term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (SELECT doc, dl, unnest(toks) AS tok FROM dl)
      WHERE tok IN ({_BM25_TERM_LIST})
      GROUP BY doc, dl, tok),
    dft AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
    sc AS (
      SELECT doc,
             CAST(round(
               ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                  / (CAST(df AS DOUBLE) + 0.5))
               * (CAST(tf AS DOUBLE) * 2.2)
               / (CAST(tf AS DOUBLE) + 0.3
                  + ((0.8999999999999999 * CAST(dl AS DOUBLE))
                     * CAST(n_docs AS DOUBLE)) / CAST(sum_dl AS DOUBLE))
               * 1000000000.0) AS BIGINT) AS si
      FROM tf JOIN dft USING (term) CROSS JOIN stats)
    SELECT doc AS doc_id, CAST(SUM(si) AS BIGINT) AS score_i
    FROM sc GROUP BY doc
    ORDER BY score_i DESC, doc_id LIMIT {BM25_K}
    """


@register("text_bm25_search", _bm25_oracle(), "text")
def text_bm25_search(spark, sf_dir):
    """BM25 keyword retrieval: top-10 documents for a 4-term query, with
    the rational-idf variant (ln is libm-dependent; the rational form is
    monotone in df so ranking behavior is standard) and per-term scores
    fixed to integer nanos before the cross-term sum, so results are
    bit-identical across engines.  One corpus scan (doc length + postings
    together), query-term filter BEFORE explode, df/N/avgdl broadcast,
    TakeOrdered top-k — no token-stream shuffle, no global sort."""
    docs = _t(spark, sf_dir, "documents")
    return tx.bm25_topk(
        docs, "text", "doc_id", BM25_TERMS, k=BM25_K, k1=1.2, b=0.75
    )
