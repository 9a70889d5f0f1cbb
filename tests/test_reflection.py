"""O14 catalog reflection: SQL construction + row parsing (no live pg in
the sandbox — the query string and the parser are the pure, testable
halves; reflect_table composes them over JDBC)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from creek_spark.sources.reflection import parse_reflection_rows, reflection_query
from creek_spark.types.pgtypes import pg_relation_to_struct


def test_reflection_query_shape():
    q = reflection_query("public", "orders")
    assert "pg_catalog.pg_attribute" in q
    assert "nspname = 'public'" in q
    assert "relname = 'orders'" in q
    assert "NOT a.attisdropped" in q
    assert "attnum > 0" in q
    # replica-identity CASE exactly as the reference resolves the key bit
    assert "WHEN 'f' THEN true" in q
    assert "COALESCE(i.indisprimary, false)" in q
    assert "ORDER BY a.attnum" in q


def test_reflection_query_quotes_literals():
    q = reflection_query("we'ird", "ta'ble")
    assert "'we''ird'" in q
    assert "'ta''ble'" in q


def test_parse_rows_to_relation_and_struct():
    rows = [
        ("id", "int4", -1, True, "d"),
        ("price", "numeric", (12 << 16) + 2 + 4, False, "d"),
        ("tags", "_text", -1, False, "d"),
        ("note", "text", -1, False, "d"),
    ]
    rel = parse_reflection_rows("public", "things", rows)
    assert rel.replica_identity == "d"
    assert [c.name for c in rel.columns] == ["id", "price", "tags", "note"]
    assert rel.columns[0].is_key and not rel.columns[1].is_key

    st = pg_relation_to_struct(rel)
    assert st["id"].dataType == T.IntegerType()
    assert not st["id"].nullable
    assert st["id"].metadata.get("pgKey") is True
    assert st["price"].dataType == T.DecimalType(12, 2)
    assert st["tags"].dataType == T.ArrayType(T.StringType())


def test_parse_rows_replica_identity_full():
    rows = [
        ("id", "int4", -1, True, "f"),
        ("data", "text", -1, True, "f"),
    ]
    rel = parse_reflection_rows("public", "full_ident", rows)
    assert rel.replica_identity == "f"
    # under 'f' every column carries the key bit (the reference's CASE)
    assert all(c.is_key for c in rel.columns)


def test_parse_empty_raises():
    with pytest.raises(ValueError, match="no columns"):
        parse_reflection_rows("public", "missing", [])
