"""Live catalog reflection (O14): pg_catalog → PGRelation.

The reference reflects a relation inside the snapshot transaction
(internal/dao/snapshots.go:164-237): one query for (oid, relreplident),
one for the attributes with the replica-identity key bit
(`CASE c.relreplident WHEN 'f' … ELSE COALESCE(i.indisprimary, false)`).

Spark-first shape: a SINGLE catalog query (the attribute query joined to
pg_type/pg_namespace so it needs no oid round-trip and returns type
*names*, which is what our type mapping keys on — the reference maps
atttypid through its compiled-in oid table instead).  The query string
and the row→PGRelation parser are pure and unit-tested; `reflect_table`
runs them through the JDBC reader (catalog rows are tiny — collecting
them on the driver is the correct plan)."""

from __future__ import annotations

from pyspark.sql import SparkSession

from creek_spark.types.pgtypes import PGColumn, PGRelation


def _quote_literal(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def reflection_query(namespace: str, table: str) -> str:
    """The attribute-reflection SQL (snapshots.go:186-198 folded with its
    oid lookup, 166-170, into one statement).  Returns one row per live
    column, in attnum order, with the replica-identity key bit resolved
    exactly as the reference's CASE does."""
    ns, tbl = _quote_literal(namespace), _quote_literal(table)
    return f"""
    SELECT a.attname,
           t.typname,
           a.atttypmod,
           CASE c.relreplident
               WHEN 'f' THEN true
               WHEN 'n' THEN false
               ELSE COALESCE(i.indisprimary, false)
           END AS is_key,
           c.relreplident::text AS replident
    FROM pg_catalog.pg_attribute a
    JOIN pg_catalog.pg_class c ON a.attrelid = c.oid
    JOIN pg_catalog.pg_namespace n ON c.relnamespace = n.oid
    JOIN pg_catalog.pg_type t ON a.atttypid = t.oid
    LEFT JOIN pg_catalog.pg_index i
           ON a.attrelid = i.indrelid AND a.attnum = ANY(i.indkey)
    WHERE n.nspname = {ns} AND c.relname = {tbl}
      AND a.attnum > 0 AND NOT a.attisdropped
    ORDER BY a.attnum
    """.strip()


def parse_reflection_rows(
    namespace: str, table: str, rows: list
) -> PGRelation:
    """Rows of (attname, typname, atttypmod, is_key, replident) →
    PGRelation.  Accepts any sequence-of-sequences (JDBC Row objects,
    tuples from a test)."""
    if not rows:
        raise ValueError(f"relation {namespace}.{table} has no columns")
    cols = [
        PGColumn(
            name=r[0],
            pg_type=r[1],
            typmod=int(r[2]),
            flags=1 if bool(r[3]) else 0,
        )
        for r in rows
    ]
    replident = str(rows[0][4])
    return PGRelation(
        namespace=namespace, name=table, columns=cols,
        replica_identity=replident,
    )


def reflect_table(
    spark: SparkSession,
    url: str,
    namespace: str,
    table: str,
    properties: dict | None = None,
) -> PGRelation:
    """Run the reflection query over JDBC and build the PGRelation —
    initRelationSchema's read half (internal/dao/init.go:250-290).
    Catalog output is O(columns); the collect is bounded and correct."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("query", reflection_query(namespace, table))
    )
    for k, v in (properties or {}).items():
        reader = reader.option(str(k), str(v))
    rows = reader.load().collect()
    return parse_reflection_rows(namespace, table, rows)
