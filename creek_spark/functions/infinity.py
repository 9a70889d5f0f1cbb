"""±infinity temporal values — the reference's infinity_modifier union
member (pgtype-avro/pgtype.go:9-12,144-156; conversion.go:36-53) mapped to
documented sentinel values (types.pgtypes.INFINITY_SENTINELS), since Spark
temporal types cannot represent ±infinity.

The helpers below recover the modifier, so a consumer can round-trip:
    pg 'infinity'::date  → DATE'9999-12-31'  → modifier 'infinity'
    pg '-infinity'::date → DATE'0001-01-01'  → modifier 'negative_infinity'
Sentinels order correctly (+inf sorts above all real values, −inf below),
so filters/sorts/windows behave sensibly without special-casing."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from creek_spark.types.pgtypes import INFINITY_SENTINELS


# SQL-literal forms: py4j cannot pass year-1 dates through F.lit
# (java.sql.Date.valueOf rejects them), so sentinels are built as exprs.
_SENTINEL_EXPRS = {
    "date": ("DATE'9999-12-31'", "DATE'0001-01-01'"),
    "timestamp": (
        "TIMESTAMP'9999-12-31 23:59:59.999999'",
        "TIMESTAMP'0001-01-01 00:00:00'",
    ),
    "time": (str(2**63 - 1) + "L", str(-(2**63) + 1) + "L"),
}


def _sentinels(kind: str):
    pos, neg = _SENTINEL_EXPRS[kind]
    return F.expr(pos), F.expr(neg)


def is_pg_infinity(col: Column | str, kind: str = "date") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    pos, neg = _sentinels(kind)
    return c.isNotNull() & ((c == pos) | (c == neg))


def pg_infinity_modifier(col: Column | str, kind: str = "date") -> Column:
    """'infinity' | 'negative_infinity' | NULL — the Avro enum values the
    reference publishes (pgtype-avro/pgtype.go:9-12)."""
    c = F.col(col) if isinstance(col, str) else col
    pos, neg = _sentinels(kind)
    return (
        F.when(c == pos, F.lit("infinity"))
        .when(c == neg, F.lit("negative_infinity"))
        .otherwise(F.lit(None).cast("string"))
    )


def finite_or_null(col: Column | str, kind: str = "date") -> Column:
    """Mask sentinels to NULL — for aggregations where ±infinity must not
    contaminate min/max/avg."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(~is_pg_infinity(c, kind), c)
