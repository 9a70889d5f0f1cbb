"""creek_spark — a PySpark-native analytics engine with the data-processing
capabilities of the reference CDC pipeline (modfin/creek), rebuilt Spark-first.

The reference (see SURVEY.md) is a PostgreSQL logical-replication → Avro →
NATS pipeline.  This package re-expresses its semantics on Spark DataFrames /
Structured Streaming and supplies the general relational operator surface plus
large-scale training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal columns).

Layout:
    session     — SparkSession builder tuned for local[N] and cluster use
    types       — pg→Spark schema mapping, CDC envelope, CRC-64-AVRO fingerprint
    functions   — column-level helpers (LSN parsing, text, vectors)
    operators   — cdc apply, as-of join, dedup, similarity, text, multimodal
    sources     — table/snapshot/bootstrap readers + schema registry
    streaming   — Structured Streaming CDC + windowed/stateful ops
    queries     — the query catalog used by __spark_entry__ / bench
"""

from creek_spark.engine import Engine
from creek_spark.session import get_spark

__all__ = ["Engine", "get_spark"]
__version__ = "0.1.0"
