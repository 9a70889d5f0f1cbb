"""Text-processing column helpers (all JVM-side built-ins).

Used by the dedup / text-analysis operators.  Deterministic and expressible
in ANSI SQL so every downstream operator can be oracle-checked against
DuckDB on the same parquet.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def norm_text(col: Column | str) -> Column:
    """Normalization used for fingerprinting/dedup: lowercase, strip
    non-alphanumerics to spaces, collapse whitespace, trim."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(c)
    c = F.regexp_replace(c, r"[^a-z0-9]+", " ")
    return F.trim(c)


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of the normalized text (array<string>)."""
    return F.split(norm_text(col), r"\s+")


def shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    """k-word shingles (space-joined) from an already-materialized token
    array column.

    ``toks`` should be a plain column attribute, not an inline
    ``tokens(...)`` expression: higher-order lambdas evaluate their body
    per element, so an inline tokenize would re-run the regex+split once
    per shingle per word — O(tokens²) per document.  Materialize tokens
    in a projection first (across a shuffle boundary if Catalyst would
    otherwise collapse the projections back together)."""
    n = F.size(toks)
    # guard: F.sequence(1, 0) DESCENDS in Spark; short docs get no shingles
    idx = F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(k)]),
    )


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """k-word shingles as space-joined strings (array<string>).

    Built with a SQL transform over a sequence — no UDF; identical results
    are obtained in DuckDB SQL for the oracle.  Prefer tokenizing into a
    materialized column + ``shingles_from_tokens`` in hot paths (see its
    docstring for why)."""
    return shingles_from_tokens(tokens(col), k)
