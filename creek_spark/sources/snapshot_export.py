"""Consistent PARALLEL JDBC snapshots via Postgres exported snapshots.

The reference's snapshot is ONE RepeatableRead read-only transaction that
captures (lsn, txid, now, reltuples-estimate) and then streams `SELECT *`
serially on that same connection (internal/dao/snapshots.go:38-110).
That is correct but single-connection — at 100 TB the snapshot read IS
the bottleneck.  Postgres' own scale-out recipe (what pg_dump -j and
Debezium's incremental snapshotter use) keeps the consistency guarantee
while fanning the read out:

1. a COORDINATOR transaction (REPEATABLE READ, READ ONLY) pins the MVCC
   snapshot and publishes it with ``pg_export_snapshot()``;
2. every worker connection begins its own REPEATABLE READ transaction
   and adopts the same visibility with ``SET TRANSACTION SNAPSHOT
   '<id>'`` — all workers then see the exact same point-in-time state;
3. the coordinator transaction stays open until every worker is done
   (an exported snapshot is only adoptable while its exporting
   transaction lives), then commits.

Spark-first mapping: the workers ARE the JDBC partitions.  Spark's JDBC
source runs ``sessionInitStatement`` on every partition connection
before issuing the partition query, so the adoption statement rides the
standard partitioned read — no custom data source needed:

    with SnapshotExporter(host, port, user=..., database=...) as snap:
        df = spark.read.format("jdbc").options(
            **snap.jdbc_options(url, "public.big_table",
                                partition_column="id",
                                lower_bound=0, upper_bound=10**9,
                                num_partitions=256)).load()
        path = write_snapshot(df, base_dir, "big_table", **snap.header_kwargs())
    # exiting the context commits the coordinator tx

The coordinator speaks the v3 simple-query protocol over the repo's own
socket client (sources/walsender.py) — the same transport the walsender
bootstrap uses, so the TranscriptServer test backend exercises the full
conversation without a real Postgres.
"""

from __future__ import annotations

import datetime

from creek_spark.sources import jdbc_options
from creek_spark.sources.walsender import (
    _send_msg,
    _simple_query,
    dial_pg,
    parse_lsn,
)

EXPORT_SQL = (
    "SELECT pg_export_snapshot(), pg_current_wal_lsn(), txid_current(), now()"
)


def adopt_statement(snapshot_id: str) -> str:
    """The per-worker adoption statement — what every JDBC partition
    connection runs before its partition query (Spark's
    ``sessionInitStatement``).  BEGIN must precede SET TRANSACTION
    SNAPSHOT in the same batch: the adoption is only legal as the first
    action of a fresh REPEATABLE READ transaction."""
    return (
        "BEGIN TRANSACTION ISOLATION LEVEL REPEATABLE READ READ ONLY; "
        f"SET TRANSACTION SNAPSHOT '{snapshot_id}'"
    )


class SnapshotExporter:
    """Coordinator for a consistent parallel snapshot (context manager).

    On ``__enter__``: dial a plain (non-replication) connection, open the
    pinning transaction and capture the reference header fields PLUS the
    exported snapshot id —

        BEGIN TRANSACTION ISOLATION LEVEL REPEATABLE READ READ ONLY
        SELECT pg_export_snapshot(), pg_current_wal_lsn(),
               txid_current(), now()

    (the reference captures the same lsn/txid/now triple inside its
    serial snapshot tx, snapshots.go:48-55; ``pg_export_snapshot`` is
    the one addition that makes the visibility shareable).

    On ``__exit__``: COMMIT and close — after which the snapshot id is
    no longer adoptable, so the context bounds exactly the window in
    which partition reads are consistent."""

    def __init__(self, host: str, port: int, *, user: str = "creek",
                 database: str = "postgres"):
        self.addr = (host, port)
        self.user, self.database = user, database
        self.sock = None
        self.snapshot_id: str | None = None
        self.lsn: str | None = None
        self.tx_id: int | None = None
        self.at: datetime.datetime | None = None

    # -- lifecycle -----------------------------------------------------

    def __enter__(self) -> "SnapshotExporter":
        self.sock = dial_pg(
            self.addr, self.user, self.database, replication=False
        )
        _simple_query(
            self.sock,
            "BEGIN TRANSACTION ISOLATION LEVEL REPEATABLE READ READ ONLY",
        )
        row = _simple_query(self.sock, EXPORT_SQL)[0]
        self.snapshot_id = row[0].decode()
        self.lsn = row[1].decode()
        self.tx_id = int(row[2])
        self.at = datetime.datetime.fromisoformat(row[3].decode())
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        try:
            if self.sock is not None:
                _simple_query(
                    self.sock, "COMMIT" if exc_type is None else "ROLLBACK"
                )
                _send_msg(self.sock, "X", b"")  # Terminate
                self.sock.close()
        except OSError:
            pass
        self.sock = None

    # -- Spark integration ----------------------------------------------

    def jdbc_options(self, url: str, table: str, **kw) -> dict[str, str]:
        """`sources.jdbc_options` + the snapshot adoption as
        ``sessionInitStatement`` — pass straight to
        ``spark.read.format("jdbc").options(**...)``.  Requires the full
        partition triple for a parallel read (jdbc_options raises on an
        incomplete one, so a silently-serial consistent read can't
        happen by accident)."""
        if self.snapshot_id is None:
            raise RuntimeError("SnapshotExporter is not entered")
        opts = jdbc_options(url, table, **kw)
        opts["sessionInitStatement"] = adopt_statement(self.snapshot_id)
        return opts

    def header_kwargs(self) -> dict:
        """The (lsn, tx_id, at) the snapshot header records — the same
        fields the reference captures in its snapshot tx
        (snapshots.go:104-110) — for `sources.write_snapshot`."""
        if self.snapshot_id is None:
            raise RuntimeError("SnapshotExporter is not entered")
        return {"lsn": self.lsn, "tx_id": self.tx_id, "at": self.at}

    def lsn_num(self) -> int:
        """The pinned WAL position as a comparable integer — the
        bootstrap join point (state = snapshot ∪ wal WHERE lsn_num >
        this)."""
        return parse_lsn(self.lsn)
