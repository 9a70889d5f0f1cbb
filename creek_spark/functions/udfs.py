"""UDF / UDAF / UDTF surface — the escape hatches, used sparingly.

The engine's rule (SURVEY.md §2.2): built-ins first; when Python is
unavoidable use Arrow-vectorized pandas UDFs (batch transfer), never
row-at-a-time.  This module demonstrates each registration path with
operators that are actually useful to the pipeline:

  * pandas_udf scalar   — L2-normalize an embedding column
  * pandas_udf grouped  — per-group robust z-score via applyInPandas
  * Python UDTF         — split a document into numbered sentences
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf, udtf


@pandas_udf(T.ArrayType(T.DoubleType()))
def l2_normalize(v: pd.Series) -> pd.Series:
    """Arrow-batched vector normalization (numpy inside the batch)."""
    import numpy as np

    def norm(x):
        if x is None:
            return None
        a = np.asarray(x, dtype="float64")
        n = float(np.linalg.norm(a))
        return (a / n).tolist() if n > 0 else a.tolist()

    return v.map(norm)


def robust_zscores(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Per-group median/MAD z-scores via applyInPandas — the grouped-map
    (UDAF-style) path; each group becomes one pandas DataFrame."""
    schema = T.StructType(
        [
            T.StructField(group_col, df.schema[group_col].dataType),
            T.StructField(value_col, T.DoubleType()),
            T.StructField("robust_z", T.DoubleType()),
        ]
    )

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        med = pdf[value_col].median()
        mad = (pdf[value_col] - med).abs().median()
        z = (pdf[value_col] - med) / (1.4826 * mad) if mad > 0 else pdf[value_col] * 0.0
        return pd.DataFrame(
            {
                group_col: pdf[group_col],
                value_col: pdf[value_col].astype("float64"),
                "robust_z": z.astype("float64"),
            }
        )

    return df.select(group_col, F.col(value_col).cast("double").alias(value_col)) \
        .groupBy(group_col).applyInPandas(per_group, schema=schema)


# NB: DataType object, not the DDL string "double" — string return types
# are parsed at decoration (import) time and require an active session
@pandas_udf(T.DoubleType())
def geometric_mean(v: pd.Series) -> float:
    """True grouped-agg pandas UDF (UDAF path): Arrow hands the whole
    group's values as one Series, one scalar comes back.  Usable in
    ``groupBy().agg()`` and as a SQL aggregate once registered.  Partial
    aggregation does NOT apply (Spark ships all group rows to Python) —
    prefer built-ins like exp(avg(ln(x))) when the group is huge; this
    path is for aggregates with no SQL decomposition."""
    import numpy as np

    x = v.dropna()
    x = x[x > 0]
    if len(x) == 0:
        return float("nan")
    return float(np.exp(np.log(x.astype("float64")).mean()))


@udtf(returnType="sent_idx int, sentence string")
class SplitSentences:
    """Python UDTF (Spark 3.5+): one input document → N sentence rows.
    Lateral-joinable: SELECT s.* FROM docs, LATERAL split_sentences(text) s."""

    def eval(self, text: str):
        if text is None:
            return
        parts = [p.strip() for p in text.replace("!", ".").replace("?", ".").split(".")]
        for i, p in enumerate(parts):
            if p:
                yield i, p


def register_all(spark: SparkSession) -> None:
    """Register the full UDF surface for SQL use."""
    spark.udf.register("l2_normalize", l2_normalize)
    spark.udf.register("geometric_mean", geometric_mean)
    spark.udtf.register("split_sentences", SplitSentences)
