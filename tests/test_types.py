"""Unit tests for the pg→Spark type system.

Mirrors the reference's schema-builder tests (pgtype-avro/pgtype_test.go:
table-driven RelationMessage → expected schema) — no Spark session needed.
"""

from __future__ import annotations

from pyspark.sql import types as T

from creek_spark.types import (
    PGColumn,
    decode_numeric_typmod,
    envelope_schema,
    pg_relation_to_struct,
    pg_type_to_spark,
)
from creek_spark.types.pgtypes import (
    PGRelation,
    encode_numeric_typmod,
    key_columns,
)


def test_scalar_mapping():
    cases = {
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
        "time": T.LongType(),
        "timestamp": T.TimestampNTZType(),
        "timestamptz": T.TimestampType(),
        "uuid": T.StringType(),
    }
    for pg, expected in cases.items():
        assert pg_type_to_spark(pg) == expected, pg


def test_array_mapping():
    assert pg_type_to_spark("_int4") == T.ArrayType(T.IntegerType())
    assert pg_type_to_spark("int8[]") == T.ArrayType(T.LongType())
    assert pg_type_to_spark("_text") == T.ArrayType(T.StringType())


def test_unknown_type_falls_back_to_text():
    # parity: pgtype-avro/pgtype.go:90-96
    assert pg_type_to_spark("inet") == T.StringType()
    assert pg_type_to_spark("some_custom_enum") == T.StringType()


def test_numeric_typmod_roundtrip():
    # parity: pgtype-avro/pgtype.go:237-246 (VARHDRSZ offset)
    # numeric(10,5) — the reference's types.sql fixture uses this
    tm = encode_numeric_typmod(10, 5)
    assert decode_numeric_typmod(tm) == (10, 5)
    assert pg_type_to_spark("numeric", tm) == T.DecimalType(10, 5)
    # typmod-less numeric → documented default
    assert pg_type_to_spark("numeric", -1) == T.DecimalType(38, 18)


def test_numeric_typmod_negative_scale():
    # pg allows NUMERIC(p, s) with s in [-1000, 1000]; the scale field is an
    # 11-bit sign-extended value — taking the raw low 16 bits would decode
    # NUMERIC(5,-2) as scale 65534.
    tm = encode_numeric_typmod(5, -2)
    assert decode_numeric_typmod(tm) == (5, -2)
    # Spark DecimalType forbids negative scale → widen to the exact
    # scale-0 equivalent: 5 significant digits × 10² needs 7 integer digits
    assert pg_type_to_spark("numeric", tm) == T.DecimalType(7, 0)
    tm = encode_numeric_typmod(10, -1000)
    assert decode_numeric_typmod(tm) == (10, -1000)
    tm = encode_numeric_typmod(10, 1000)
    assert decode_numeric_typmod(tm) == (10, 1000)


def _rel(replica_identity="d"):
    return PGRelation(
        namespace="public",
        name="other",
        columns=[
            PGColumn("id", "int4", flags=1),
            PGColumn("data", "text", flags=0),
        ],
        replica_identity=replica_identity,
    )


def test_relation_to_struct_nullability_and_metadata():
    # parity: pgtype-avro/pgtype.go:108-142 (nullable iff not key),
    # schema.go:86-87 (pgType/pgKey attributes)
    st = pg_relation_to_struct(_rel())
    assert [f.name for f in st.fields] == ["id", "data"]
    assert st["id"].nullable is False
    assert st["data"].nullable is True
    assert st["id"].metadata == {"pgType": "int4", "pgKey": True}
    assert st["data"].metadata == {"pgType": "text", "pgKey": False}
    assert key_columns(st) == ["id"]


def test_non_default_replica_identity_makes_all_nullable():
    st = pg_relation_to_struct(_rel(replica_identity="f"))
    assert st["id"].nullable is True


def test_keys_only_struct():
    # parity: key-only before image (replication.go:541-557)
    st = pg_relation_to_struct(_rel(), keys_only=True)
    assert [f.name for f in st.fields] == ["id"]


def test_envelope_schema_shapes():
    # parity: messages.go:58-89 — before=key shape, after=full shape
    row = pg_relation_to_struct(_rel())
    env = envelope_schema(row)
    names = [f.name for f in env.fields]
    assert names == [
        "fingerprint",
        "source",
        "op",
        "sent_at",
        "before",
        "after",
        "unchanged_toast",
    ]
    assert [f.name for f in env["before"].dataType.fields] == ["id"]
    assert [f.name for f in env["after"].dataType.fields] == ["id", "data"]
    src = env["source"].dataType
    assert [f.name for f in src.fields] == [
        "name",
        "tx_at",
        "db",
        "schema",
        "table",
        "tx_id",
        "lsn",
    ]
