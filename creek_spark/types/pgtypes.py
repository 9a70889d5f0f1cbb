"""PostgreSQL type → Spark type mapping with the reference's semantics.

Parity targets (cited against /root/reference):
  * the 18 supported scalar pg types + their array variants
    (pgtype-avro/type_map.go:40-78); unknown types fall back to text
    (pgtype-avro/pgtype.go:90-96)
  * nullability: a column is nullable iff it is NOT part of the primary key,
    or unconditionally when the table's replica identity != 'd'
    (pgtype-avro/pgtype.go:108-142)
  * per-field metadata ``pgType`` (original type name) and ``pgKey`` (bool)
    (pgtype-avro/schema.go:86-87, pgtype.go:136-141) — clients recover the
    primary key from ``pgKey`` (client.go:607-622)
  * numeric precision/scale recovered from the pg typmod with the VARHDRSZ
    offset (pgtype-avro/pgtype.go:237-246); typmod −1 (unconstrained numeric)
    gets a documented default of DecimalType(38, 18)
  * ±infinity dates/times/timestamps: Spark temporal types cannot represent
    ±infinity, so we mirror the reference's extra union member
    (pgtype-avro/pgtype.go:9-12,144-156) with documented sentinel values; see
    INFINITY_SENTINELS and the companion helpers in creek_spark.functions.
"""

from __future__ import annotations

import datetime
from dataclasses import dataclass, field

from pyspark.sql import types as T

VARHDRSZ = 4

# Default for typmod-less `numeric` (typmod −1 yields nonsense p/s through the
# decode below — the reference never hits this path in tests; we document a
# wide default instead).
DEFAULT_NUMERIC = (38, 18)

# Sentinels standing in for pg ±infinity temporal values (the reference uses
# an Avro enum union member `infinity_modifier`, pgtype-avro/pgtype.go:9-12).
# These are the extreme representable Spark values; `creek_spark.functions`
# exposes is_pg_infinity()/pg_infinity_modifier() to recover the modifier.
INFINITY_SENTINELS = {
    "date": (datetime.date(9999, 12, 31), datetime.date(1, 1, 1)),
    "timestamp": (
        datetime.datetime(9999, 12, 31, 23, 59, 59, 999999),
        datetime.datetime(1, 1, 1, 0, 0, 0, 0),
    ),
    # `time` is carried as µs-since-midnight (LongType), matching the
    # reference's duration-µs encoding (pgtype-avro/conversion.go:31-32).
    "time": (2**63 - 1, -(2**63) + 1),
}

_SCALAR_MAP: dict[str, T.DataType] = {
    "bool": T.BooleanType(),
    "char": T.StringType(),
    "varchar": T.StringType(),
    "bpchar": T.StringType(),
    "text": T.StringType(),
    "date": T.DateType(),
    "float4": T.FloatType(),
    "float8": T.DoubleType(),
    "int2": T.ShortType(),
    "int4": T.IntegerType(),
    "int8": T.LongType(),
    "json": T.StringType(),
    "jsonb": T.StringType(),
    "time": T.LongType(),  # µs since midnight
    "timestamp": T.TimestampNTZType(),
    "timestamptz": T.TimestampType(),
    "uuid": T.StringType(),
}

SUPPORTED_PG_TYPES = tuple(sorted(_SCALAR_MAP) + ["numeric"])


def decode_numeric_typmod(typmod: int) -> tuple[int, int]:
    """Recover (precision, scale) from a pg numeric typmod.

    Mirrors pgtype-avro/pgtype.go:237-246 (the VARHDRSZ offset quirk).
    typmod −1 (unconstrained `numeric`) → DEFAULT_NUMERIC.
    """
    if typmod < VARHDRSZ:
        return DEFAULT_NUMERIC
    precision = ((typmod - VARHDRSZ) >> 16) & 0xFFFF
    # Scale is an 11-bit sign-extended field (pg commit 085f931f52): pg
    # allows NUMERIC(p, s) with s in [-1000, 1000].  Taking the raw low 16
    # bits would turn NUMERIC(5,-2) into scale 65534.
    scale = (((typmod - VARHDRSZ) & 0x7FF) ^ 1024) - 1024
    return precision, scale


def encode_numeric_typmod(precision: int, scale: int) -> int:
    # pg masks the (possibly negative) scale to 11 bits on encode.
    return ((precision << 16) | (scale & 0x7FF)) + VARHDRSZ


def pg_type_to_spark(pg_type: str, typmod: int = -1) -> T.DataType:
    """Map a pg type name (optionally `_`-prefixed or `[]`-suffixed array)
    to a Spark DataType.  Unknown scalars fall back to StringType, matching
    the reference's text fallback (pgtype-avro/pgtype.go:90-96)."""
    name = pg_type.strip().lower()
    if name.startswith("_"):  # pg catalog array naming: _int4 == int4[]
        return T.ArrayType(pg_type_to_spark(name[1:], typmod))
    if name.endswith("[]"):
        return T.ArrayType(pg_type_to_spark(name[:-2], typmod))
    if name == "numeric":
        p, s = decode_numeric_typmod(typmod)
        if s < 0:
            # Spark DecimalType forbids negative scale; NUMERIC(p, -s) holds
            # p significant digits times 10^|s| → at most p+|s| integer
            # digits, exactly representable at scale 0.
            p, s = min(p - s, 38), 0
        return T.DecimalType(p, s)
    return _SCALAR_MAP.get(name, T.StringType())


@dataclass
class PGColumn:
    """One column of a pg relation, as the reference sees it via
    RelationMessage / catalog reflection (internal/dao/snapshots.go:164-237).

    ``flags`` is 1 when the column is part of the replica-identity key
    (primary key under default replica identity), else 0 — the same bit the
    reference reads (pgtype-avro/pgtype.go:108-142, replication.go:541-557).
    """

    name: str
    pg_type: str
    typmod: int = -1
    flags: int = 0

    @property
    def is_key(self) -> bool:
        return self.flags == 1


@dataclass
class PGRelation:
    namespace: str
    name: str
    columns: list[PGColumn] = field(default_factory=list)
    replica_identity: str = "d"  # 'd' default | 'f' full | 'i' index | 'n' nothing


def _column_nullable(col: PGColumn, replica_identity: str) -> bool:
    # pgtype-avro/pgtype.go:108-142: nullable iff not a key column, or
    # unconditionally when replica identity differs from default ('d').
    if replica_identity != "d":
        return True
    return not col.is_key


def pg_relation_to_struct(
    relation: PGRelation,
    keys_only: bool = False,
) -> T.StructType:
    """Build the Spark StructType for a relation (the analog of
    RelationMessageToAvro, pgtype-avro/pgtype.go:39-235).

    With ``keys_only`` the struct contains only replica-identity key columns —
    the shape of the envelope's *before* image for plain updates
    (RelationMessageKeysToAvro, pgtype-avro/pgtype.go:57-78;
    replication.go:541-557).
    """
    fields = []
    for col in relation.columns:
        if keys_only and not col.is_key:
            continue
        dtype = pg_type_to_spark(col.pg_type, col.typmod)
        fields.append(
            T.StructField(
                col.name,
                dtype,
                nullable=_column_nullable(col, relation.replica_identity),
                metadata={"pgType": col.pg_type, "pgKey": col.is_key},
            )
        )
    return T.StructType(fields)


def key_columns(schema: T.StructType) -> list[str]:
    """Recover the primary key from field metadata — the analog of the
    client's Keys() (client.go:607-622)."""
    return [f.name for f in schema.fields if (f.metadata or {}).get("pgKey")]
