"""StreamingAnnIndex: continuous IVFADC index maintenance.

The production ANN freshness problem: new documents arrive continuously,
and rebuilding a billion-vector index per batch is absurd.  The standard
answer (Faiss's train-vs-add split) maps cleanly onto Structured
Streaming because `ivfpq_index_append` is bit-exact associative under
frozen quantizers (operators/similarity.py): encode cost ∝ batch, the
existing index is never rewritten, and any batch split yields identical
stored codes.

Exactly-once discipline (the same batch_id-fencing every streaming sink
in this repo uses — AdditiveRollupSink, StreamingNearDedup, the shard
producer): each micro-batch writes its codes under its OWN
``codes/batch=<id>`` directory with mode("overwrite"), so a replayed
trigger after a failure rewrites that one directory and nothing else —
idempotent, no dedup pass, no manifest.  The bootstrap corpus (which
also trains the quantizers) owns ``batch=0``; micro-batch ``i`` owns
``batch=i+1``.

Search is completely unchanged: `ivfpq_search` reads ``codes/`` and
discovers (batch, cell_id) as partition columns; the candidate join
still keys on cell_id — the INNER partition — so probed-cell partition
pruning works exactly as in the static layout.

    idx = StreamingAnnIndex(spark, path)
    idx.bootstrap(seed_corpus, train="kmeans")        # train + batch=0
    (stream.writeStream.foreachBatch(idx.foreach_batch())
        .option("checkpointLocation", ...).start())
    ...
    idx.search(queries, k=5)
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from creek_spark.operators.similarity import (
    ivfpq_index_append,
    ivfpq_index_build,
    ivfpq_search,
)


class StreamingAnnIndex:
    def __init__(self, spark, path: str, *, id_col: str = "vec_id",
                 vec_col: str = "embedding", dim: int = 64, m: int = 8):
        self.spark = spark
        self.path = path
        self.id_col, self.vec_col = id_col, vec_col
        self.dim, self.m = dim, m

    def bootstrap(self, corpus: DataFrame, **build_kw) -> None:
        """Train the quantizers on the seed corpus and store its codes as
        ``batch=0``.  ``build_kw`` passes through to `ivfpq_index_build`
        (train=, residual=, n_cells=, store_vectors=, ...)."""
        ivfpq_index_build(
            corpus, self.path, id_col=self.id_col, vec_col=self.vec_col,
            dim=self.dim, m=self.m,
            codes_dir=f"{self.path}/codes/batch=0", **build_kw,
        )

    def apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        """Encode one micro-batch under the frozen quantizers into its
        fenced ``batch=<id+1>`` directory (overwrite → replay-safe)."""
        ivfpq_index_append(
            batch, self.path, id_col=self.id_col, vec_col=self.vec_col,
            dim=self.dim, m=self.m,
            codes_dir=f"{self.path}/codes/batch={batch_id + 1}",
            mode="overwrite",
        )

    def foreach_batch(self):
        """Adapter for ``writeStream.foreachBatch``."""

        def _fn(batch: DataFrame, batch_id: int) -> None:
            self.apply_batch(batch, batch_id)

        return _fn

    def search(self, queries: DataFrame, **kw) -> DataFrame:
        """`ivfpq_search` over everything ingested so far (committed
        batch directories)."""
        return ivfpq_search(
            self.spark, self.path, queries,
            id_col=self.id_col, vec_col=self.vec_col,
            dim=self.dim, m=self.m, **kw,
        )
