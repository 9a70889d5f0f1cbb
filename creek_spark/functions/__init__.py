"""Column-level helpers shared across operators.

Everything here is built from `pyspark.sql.functions` (JVM-side, codegen'd)
— no Python UDFs — so these stay inside whole-stage codegen at scale.
"""

from creek_spark.functions.lsn import lsn_num, lsn_str
from creek_spark.functions.text import (
    norm_text,
    tokens,
    word_shingles,
)
from creek_spark.functions.vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "cosine_similarity",
    "dot",
    "l2_norm",
    "lsn_num",
    "lsn_str",
    "norm_text",
    "tokens",
    "word_shingles",
]
