"""Wire-format round trip + schema evolution through the registry.

Mirrors the reference's TestSchema/TestTypes flow: encode envelope rows as
framed single-object messages, decode by fingerprint, and reconstruct state
across TWO schema generations of one table (FIXTURES.md F4's evolution
requirement)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from creek_spark.sources.registry import SchemaRegistry
from creek_spark.sources.wire import (
    MAGIC,
    decode_frames,
    encode_frames,
    reconcile_generations,
    split_frames,
)
from creek_spark.types import envelope_schema
from creek_spark.types.fingerprint import fingerprint_schema
from creek_spark.types.pgtypes import PGColumn, PGRelation, pg_relation_to_struct
from tests.fixtures import ENV_SCHEMA, other_wal_df


def test_frame_roundtrip(spark):
    wal = other_wal_df(spark)
    fp = fingerprint_schema(ENV_SCHEMA)
    framed = encode_frames(
        wal.withColumn("fingerprint", F.lit(fp)),
        F.struct(*[F.col(c) for c in wal.columns]),
    )
    rows = framed.collect()
    assert all(bytes(r["frame"][:2]) == MAGIC for r in rows)

    valid, quarantined = split_frames(framed)
    assert quarantined.count() == 0
    got_fps = [r["fingerprint"] for r in valid.select("fingerprint").distinct().collect()]
    assert got_fps == [fp]

    decoded = decode_frames(valid, {fp: ENV_SCHEMA})[fp]
    assert decoded.count() == wal.count()
    a = sorted(str(r) for r in wal.select("op", "after.id", "after.data").collect())
    b = sorted(str(r) for r in decoded.select("op", "after.id", "after.data").collect())
    assert a == b


def test_quarantine_bad_magic(spark):
    wal = other_wal_df(spark).limit(3)
    fp = fingerprint_schema(ENV_SCHEMA)
    framed = encode_frames(
        wal.withColumn("fingerprint", F.lit(fp)),
        F.struct(*[F.col(c) for c in wal.columns]),
    )
    corrupted = framed.withColumn(
        "frame",
        F.when(
            F.rand(seed=1) < 2,  # corrupt every row deterministically
            F.concat(F.lit(b"\x00\x00"), F.col("frame")),
        ).otherwise(F.col("frame")),
    )
    valid, quarantined = split_frames(corrupted)
    assert valid.count() == 0
    assert quarantined.count() == 3


def test_schema_evolution_two_generations(spark):
    """A DDL change mid-stream: generation 2 adds a column.  Frames of both
    generations ride one stream; registry-dispatched decode + reconcile
    rebuilds a single table view (old rows null for the new column)."""
    rel_v1 = PGRelation(
        "public", "other",
        [PGColumn("id", "int4", flags=1), PGColumn("data", "text")],
    )
    rel_v2 = PGRelation(
        "public", "other",
        [
            PGColumn("id", "int4", flags=1),
            PGColumn("data", "text"),
            PGColumn("extra", "int8"),
        ],
    )
    env1 = envelope_schema(pg_relation_to_struct(rel_v1))
    env2 = envelope_schema(pg_relation_to_struct(rel_v2))
    reg = SchemaRegistry()
    fp1, fp2 = reg.put(env1, "db.public.other"), reg.put(env2, "db.public.other")
    assert fp1 != fp2

    import datetime

    t0 = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)

    def src(i):
        return ("creek", t0, "db", "public", "other", i, f"0/{i:X}")

    g1 = spark.createDataFrame(
        [
            (fp1, src(1), "c", t0, None, (1, "one"), None),
            (fp1, src(2), "c", t0, None, (2, "two"), None),
        ],
        schema=env1,
    )
    g2 = spark.createDataFrame(
        [
            (fp2, src(3), "u", t0, (1,), (1, "one-v2", 42), None),
            (fp2, src(4), "c", t0, None, (3, "three", 7), None),
        ],
        schema=env2,
    )
    frames1 = encode_frames(g1, F.struct(*[F.col(c) for c in g1.columns]))
    frames2 = encode_frames(g2, F.struct(*[F.col(c) for c in g2.columns]))
    stream = frames1.unionByName(frames2)

    valid, quarantined = split_frames(stream)
    assert quarantined.count() == 0
    registry = {fp1: reg.get(fp1), fp2: reg.get(fp2)}
    by_fp = decode_frames(valid, registry)
    assert by_fp[fp1].count() == 2 and by_fp[fp2].count() == 2

    # flatten each generation's after-image, reconcile, rebuild state
    from creek_spark.operators.cdc import latest_state

    merged = reconcile_generations(
        {
            fp1: by_fp[fp1],
            fp2: by_fp[fp2],
        }
    )
    state = latest_state(merged, key_cols=["id"])
    got = {r["id"]: (r["data"], r["extra"]) for r in state.collect()}
    assert got == {1: ("one-v2", 42), 2: ("two", None), 3: ("three", 7)}
