from creek_spark.types.envelope import (
    OPS,
    envelope_schema,
    source_schema,
)
from creek_spark.types.fingerprint import avro_fingerprint, fingerprint_schema
from creek_spark.types.pgtypes import (
    PGColumn,
    decode_numeric_typmod,
    pg_relation_to_struct,
    pg_type_to_spark,
)

__all__ = [
    "OPS",
    "PGColumn",
    "avro_fingerprint",
    "decode_numeric_typmod",
    "envelope_schema",
    "fingerprint_schema",
    "pg_relation_to_struct",
    "pg_type_to_spark",
    "source_schema",
]
