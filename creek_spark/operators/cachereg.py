"""Session-wide registry for operator-owned persisted frames.

Query functions return lazy DataFrames, so an operator that persists an
intermediate (rank_pick's bucketed input, customer_rfm's customer
aggregate, LSH signature frames) cannot unpersist it before the caller's
final action — the cache would be released before it is ever read.  The
lifetime is therefore CALLER-owned: every such persist is registered
here, and long-lived sessions (bench.py per query, services between
requests) call :func:`release_caches` after the consuming action.
Without that call Spark's LRU still bounds storage — the registry just
makes release deterministic instead of eviction-pressure driven.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_CACHES: list[DataFrame] = []


def register_cache(df: DataFrame) -> DataFrame:
    """Persist ``df`` and record it for a later :func:`release_caches`."""
    cached = df.persist()
    _CACHES.append(cached)
    return cached


def release_caches() -> None:
    """Unpersist every registered frame (newest first)."""
    while _CACHES:
        _CACHES.pop().unpersist()
