"""Similarity search over embedding columns (array<float>).

Two paths:
  * cosine_topk        — brute-force exact top-k, the correctness baseline.
    Oracle-exact variant: per-dimension products are cast to DECIMAL and
    summed exactly, so Spark and an ANSI-SQL engine agree bit-for-bit
    (double summation is order-dependent; decimal summation is not).
  * cosine_topk_fast   — zip_with/aggregate fold (whole-stage codegen, no
    explode) for throughput; identical ranking in practice, used by bench.
  * lsh_bucket_topk    — random-hyperplane LSH scale path: queries only
    compare against vectors sharing a hash bucket, turning O(Q·N) into
    O(Q·bucket).  Hyperplanes are derived deterministically from md5 so
    results are reproducible (and oracle-able) without a RNG.

At 100 TB the brute-force path is a broadcast of the (small) query set
against a partitioned corpus — no shuffle of the big side; the LSH path
shuffles the corpus once on bucket id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from creek_spark.functions.vectors import cosine_similarity


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (q_id, n_id, cos_sim double, rnk int), rnk 1..k, self-match
    excluded, ties broken by n_id.

    Plan shape: broadcast-nested-loop of the (small) query side against
    the partitioned corpus; each pair's dot product and each row's norm
    are `_exact_dot` folds — zip_with + aggregate over DECIMAL, entirely
    inside whole-stage codegen.  No explode, no pre-ranking shuffle: the
    only exchange is the per-query top-k window over |Q|·|corpus| scored
    rows.  Decimal addition is associative, so the fold's left-to-right
    order is bit-identical to any grouped/exploded summation an ANSI-SQL
    oracle performs (double summation would be order-dependent)."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("q_id"), F.col(vec_col).alias("_qv")
        ).withColumn("_qn", _exact_dot(F.col("_qv"), F.col("_qv")))
    )
    c = corpus.select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("_cv")
    ).withColumn("_cn", _exact_dot(F.col("_cv"), F.col("_cv")))
    scored = (
        c.crossJoin(q)
        .where(F.col("q_id") != F.col("n_id"))
        .withColumn(
            "cos_sim",
            _exact_dot(F.col("_qv"), F.col("_cv")).cast("double")
            / (
                F.sqrt(F.col("_qn").cast("double"))
                * F.sqrt(F.col("_cn").cast("double"))
            ),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("n_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("q_id", "n_id", "cos_sim", "rnk")
    )


def cosine_topk_fast(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Throughput variant: broadcast cross-join + zip_with fold.

    No explode/shuffle of per-dimension rows; the entire dot product runs
    inside whole-stage codegen.  Used by bench.py."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
        )
    )
    c = corpus.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.crossJoin(q)
        .where(F.col("q_id") != F.col("n_id"))
        .withColumn("cos_sim", cosine_similarity(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("n_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("q_id", "n_id", "cos_sim", "rnk")
    )


def _exact_dot(a, b):
    """Exact decimal dot product of two float arrays, fully inside
    whole-stage codegen (zip_with + aggregate fold, no explode/shuffle).
    Decimal addition is associative/commutative, so the fold order does
    not affect the result — bit-identical to an ANSI-SQL decimal SUM."""
    prods = F.zip_with(
        a, b, lambda x, y: (x.cast("double") * y.cast("double")).cast("decimal(25,12)")
    )
    # precision 25 (not 38): at 38, Spark's a+b yields (38,11) — a scale
    # truncation; at 25 the sum is (26,12) exact and the cast back to
    # (25,12) is lossless (13 integer digits ≫ any bounded-norm dot).
    return F.aggregate(
        prods,
        F.lit(0).cast("decimal(25,12)"),
        lambda acc, x: (acc + x).cast("decimal(25,12)"),
    )


def embedding_near_dups(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    threshold: float = 0.35,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within a blocking key.

    Output: (id_a, id_b, cos_sim double), id_a < id_b, cos_sim ≥ threshold.
    Pairs are only formed inside a block (``block_col``) — the standard
    scale guard that keeps the self-join |block|²-bounded instead of
    |corpus|².  For unlabeled corpora pass an LSH bucket id (e.g.
    ``hyperplane_sign_bits``) as the block column; semantics are identical.

    Norms are computed once per row *before* the self-join (N folds, not
    2·pairs), and the dot product is an exact decimal fold so the result
    is deterministic and oracle-matchable across engines."""
    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
        F.col(block_col).alias("_blk"),
    ).withColumn("_norm_sq", _exact_dot(F.col("_vec"), F.col("_vec")))
    a = base.select(
        F.col("_id").alias("id_a"),
        F.col("_vec").alias("_va"),
        F.col("_blk").alias("_blk"),
        F.col("_norm_sq").alias("_na"),
    )
    b = base.select(
        F.col("_id").alias("id_b"),
        F.col("_vec").alias("_vb"),
        F.col("_blk").alias("_blk"),
        F.col("_norm_sq").alias("_nb"),
    )
    return (
        a.join(b, on="_blk")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos_sim",
            _exact_dot(F.col("_va"), F.col("_vb")).cast("double")
            / (
                F.sqrt(F.col("_na").cast("double"))
                * F.sqrt(F.col("_nb").cast("double"))
            ),
        )
        .where(F.col("cos_sim") >= F.lit(threshold))
        .select("id_a", "id_b", "cos_sim")
    )


def hyperplane_sign_bits(vec_col, dim: int, n_planes: int = 8):
    """Deterministic random-hyperplane signature (int 0..2^n_planes-1).

    Plane p's weight for dimension d is ±1 from one md5("p:d") hex bit —
    a reproducible Rademacher projection (no RNG, no state, identical in
    SQL)."""
    import hashlib

    sig = None
    for p in range(n_planes):
        acc = None
        for d in range(dim):
            h = hashlib.md5(f"{p}:{d}".encode()).hexdigest()
            w = 1 if int(h[0], 16) & 1 else -1
            term = F.element_at(vec_col, d + 1).cast("double") * F.lit(float(w))
            acc = term if acc is None else acc + term
        bit = F.when(acc > 0, F.lit(1 << p)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return sig.cast("int")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 3,
) -> DataFrame:
    """IVF (inverted-file) ANN: data-adaptive coarse quantization.

    Index: ``n_cells`` centroids are chosen deterministically (the vectors
    with the smallest md5(id) — a seedless pseudo-random sample), and every
    corpus vector is assigned to its nearest centroid (its *cell*).
    Search: each query ranks the centroids, probes its ``nprobe`` nearest
    cells, and runs exact cosine only against those cells' members —
    expected cost Q·N·(nprobe/n_cells) instead of Q·N.

    Versus ``lsh_bucket_topk``: IVF cells adapt to the data distribution
    (clustered corpora get balanced cells where fixed hyperplanes
    wouldn't), at the cost of one extra shuffle to build the assignment.
    Recall < 1 by design → rows-only correctness check.

    Scale shape: centroids are a K-row broadcast; cell assignment is one
    crossJoin (map-side, no shuffle of the corpus) + a partial-aggregated
    groupBy on the corpus id; the probe join shuffles on cell_id, whose
    cardinality (n_cells) should be sized ≥ executor count at real scale."""
    cos = cosine_similarity  # cosine ranks == (negated) distance ranks for argmax

    cents = F.broadcast(
        corpus.select(
            F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cent_vec")
        )
        .orderBy(F.md5(F.col("cent_id").cast("string")), F.col("cent_id"))
        .limit(n_cells)
    )

    def assign(df: DataFrame, side_id: str, side_vec: str, rank_limit: int):
        scored = df.crossJoin(cents).withColumn(
            "_sim", cos(F.col(side_vec), F.col("cent_vec"))
        )
        w = Window.partitionBy(side_id).orderBy(
            F.col("_sim").desc(), F.col("cent_id").asc()
        )
        return (
            scored.withColumn("_crk", F.row_number().over(w))
            .where(F.col("_crk") <= rank_limit)
            .select(side_id, side_vec, F.col("cent_id").alias("cell_id"))
        )

    c = corpus.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("c_vec"))
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    cells = assign(c, "n_id", "c_vec", 1)
    probes = F.broadcast(assign(q, "q_id", "q_vec", nprobe))

    scored = (
        cells.join(probes, "cell_id")
        .where(F.col("q_id") != F.col("n_id"))
        .withColumn("cos_sim", cos(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("n_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("q_id", "n_id", "cos_sim", "rnk")
    )


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    k: int = 5,
) -> DataFrame:
    """ANN: compare queries only against corpus vectors in the same
    random-hyperplane bucket.  Recall < 1 by design; the scale path when
    brute force is too expensive (expected bucket size = N / 2^n_planes)."""
    sig = hyperplane_sign_bits(F.col(vec_col), dim, n_planes)
    c = corpus.select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("c_vec"), sig.alias("bucket")
    )
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"), sig.alias("bucket")
        )
    )
    scored = (
        c.join(q, "bucket")
        .where(F.col("q_id") != F.col("n_id"))
        .withColumn("cos_sim", cosine_similarity(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("n_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("q_id", "n_id", "cos_sim", "rnk")
    )
