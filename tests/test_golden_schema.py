"""Cross-implementation schema conformance: the engine must be able to
emit the EXACT WAL-envelope Avro schema the reference pins as an inline
golden (integration_tests/listen_test.go:208-769), so an existing creek
Go client (hamba/avro decoder keyed on CRC-64-AVRO fingerprints) could
decode this engine's output without modification.

``tests/golden/publish_message_types.json`` is that golden, reproduced
verbatim (minified) as a conformance fixture — byte-level agreement is
the entire point, so originality is not applicable to this one file.
The table behind it is ``public.types`` (integration_tests/testdata/
types.sql): every scalar/array type the reference maps, with a uuid
primary key."""

from __future__ import annotations

import json
import os

from creek_spark.sources.golden import (
    avro_canonical_form,
    canonical_fingerprint,
    publish_message_schema,
    relation_record,
)
from creek_spark.types.pgtypes import PGColumn, PGRelation

_GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "publish_message_types.json")


def _numeric_typmod(p: int, s: int) -> int:
    return ((p << 16) | s) + 4


def _types_relation() -> PGRelation:
    """public.types exactly as a pgoutput Relation message describes it:
    lowercased names, catalog type names (SQL char(1) is bpchar OID 1042;
    array types are the catalog's _-prefixed element names), typmod only
    where it matters (numeric(10,5)), flags=1 on the uuid PK."""
    nm = _numeric_typmod(10, 5)
    cols = [
        ("bool", "bool", -1, 0),
        ("char", "bpchar", 5, 0),
        ("varchar", "varchar", -1, 0),
        ("bpchar", "bpchar", -1, 0),
        ("date", "date", -1, 0),
        ("float4", "float4", -1, 0),
        ("float8", "float8", -1, 0),
        ("int2", "int2", -1, 0),
        ("int4", "int4", -1, 0),
        ("int8", "int8", -1, 0),
        ("json", "json", -1, 0),
        ("jsonb", "jsonb", -1, 0),
        ("text", "text", -1, 0),
        ("time", "time", -1, 0),
        ("timestamp", "timestamp", -1, 0),
        ("timestamptz", "timestamptz", -1, 0),
        ("uuid", "uuid", -1, 1),
        ("numeric", "numeric", nm, 0),
        ("boolarr", "_bool", -1, 0),
        ("chararr", "_bpchar", 5, 0),
        ("varchararr", "_varchar", -1, 0),
        ("bpchararr", "_bpchar", -1, 0),
        ("datearr", "_date", -1, 0),
        ("float4arr", "_float4", -1, 0),
        ("float8arr", "_float8", -1, 0),
        ("int2arr", "_int2", -1, 0),
        ("int4arr", "_int4", -1, 0),
        ("int8arr", "_int8", -1, 0),
        ("jsonarr", "_json", -1, 0),
        ("jsonbarr", "_jsonb", -1, 0),
        ("textarr", "_text", -1, 0),
        ("timearr", "_time", -1, 0),
        ("timestamparr", "_timestamp", -1, 0),
        ("timestamptzarr", "_timestamptz", -1, 0),
        ("uuidarr", "_uuid", -1, 0),
        ("numericarr", "_numeric", nm, 0),
    ]
    return PGRelation(
        "public",
        "types",
        [PGColumn(n, t, m, f) for n, t, m, f in cols],
        "d",
    )


def test_publish_message_schema_matches_reference_golden():
    golden = json.load(open(_GOLDEN))
    ours = publish_message_schema(_types_relation())
    assert ours == golden  # full JSON-tree equality (assert.JSONEq analog)


def test_canonical_fingerprint_matches_reference_golden():
    """The fingerprint a hamba/avro client computes is CRC-64-AVRO over
    the Parsing Canonical Form — equality of PCF bytes (and hence the
    8-byte fingerprint) proves the registry keys line up."""
    golden = json.load(open(_GOLDEN))
    ours = publish_message_schema(_types_relation())
    assert avro_canonical_form(ours) == avro_canonical_form(golden)
    assert canonical_fingerprint(ours) == canonical_fingerprint(golden)
    # and it is a real discriminator: any schema change moves it
    rel2 = _types_relation()
    rel2.columns = rel2.columns[:-1]
    assert canonical_fingerprint(publish_message_schema(rel2)) != canonical_fingerprint(ours)


def test_parsing_canonical_form_rules():
    """PCF spot checks against the Avro spec: logical/custom attributes
    stripped, primitives reduced, names resolved to fullnames."""
    assert avro_canonical_form({"type": "int", "logicalType": "date"}) == '"int"'
    assert (
        avro_canonical_form(
            {"type": "bytes", "logicalType": "decimal", "precision": 10, "scale": 5}
        )
        == '"bytes"'
    )
    assert avro_canonical_form({"type": "string", "logicalType": "uuid"}) == '"string"'
    rec = {
        "name": "r",
        "namespace": "ns",
        "type": "record",
        "fields": [{"name": "f", "type": ["null", "e"], "pgKey": True}],
    }
    # field's named reference "e" resolves inside the record's namespace
    assert (
        avro_canonical_form(rec)
        == '{"name":"ns.r","type":"record","fields":[{"name":"f","type":["null","ns.e"]}]}'
    )
    enum = {"name": "before.infinity_modifier", "type": "enum", "symbols": ["a", "b"]}
    assert (
        avro_canonical_form(enum)
        == '{"name":"before.infinity_modifier","type":"enum","symbols":["a","b"]}'
    )


def test_before_record_keys_only_and_infinity_declared_per_record():
    """before carries replica-identity keys only (golden: just uuid); a
    record with two temporal columns declares infinity_modifier once and
    references it by fullname afterwards (pgtype.go:144-156)."""
    rel = _types_relation()
    before = relation_record(rel, "before", keys_only=True)
    assert [f["name"] for f in before["fields"]] == ["uuid"]
    assert before["fields"][0]["type"] == {"type": "string", "logicalType": "uuid"}

    after = relation_record(rel, "after")
    decls = [
        f
        for f in after["fields"]
        if isinstance(f["type"], list)
        and any(
            isinstance(m, dict) and m.get("type") == "enum" for m in f["type"]
        )
    ]
    assert len(decls) == 1 and decls[0]["name"] == "date"
    # the time field references the declared enum by fullname
    time_f = [f for f in after["fields"] if f["name"] == "time"][0]
    assert time_f["type"][2] == "after.infinity_modifier"


def test_non_default_replica_identity_nullifies_keys():
    rel = _types_relation()
    rel.replica_identity = "f"
    rec = relation_record(rel, "after")
    uuid_f = [f for f in rec["fields"] if f["name"] == "uuid"][0]
    assert uuid_f["type"] == ["null", {"type": "string", "logicalType": "uuid"}]
