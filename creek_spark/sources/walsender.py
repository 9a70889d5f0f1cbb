"""Walsender replication-session surface (O1's live network loop),
driven from recorded session transcripts.

The reference's capture process holds a logical-replication session
open: START_REPLICATION from the slot's ``confirmed_flush_lsn``, a
receive loop over CopyData frames (XLogData 'w' / primary keepalive
'k'), a 5 s standby-status-update cadence acking the current LSN,
immediate replies to reply-requested keepalives, CopyDone/timeline
handoff, and reconnect-with-resume on connection loss
(/root/reference/internal/dao/replication.go:96-307, 88-94, 583-599;
init.go:147-248).  This module implements that session state machine
over a pluggable transport; the sandbox has no Postgres (BASELINE.json
scopes live capture out), so the shipped transport replays a RECORDED
transcript — the same bytes a socket would deliver — which makes every
branch of the loop (resume, keepalive reply, cadence, disconnect)
deterministic and testable.  A socket transport only needs
``frames()``/``send()``.

Frame layouts (public "Streaming Replication Protocol" docs):

  backend  'w' wal_start u64 | wal_end u64 | server_clock i64 | payload
  backend  'k' wal_end u64 | server_clock i64 | reply_requested u8
  frontend 'r' write u64 | flush u64 | apply u64 | client_clock i64 | reply u8

Transcript format: one lowercase-hex backend CopyData frame per line;
``#`` comments; ``!disconnect`` simulates the connection dropping
mid-session (the session reconnects and resumes from its acked LSN,
mirroring tryConnect's backoff path); ``!copydone`` simulates the
server ending the copy stream (the session acks CopyDone and restarts
replication, replication.go:183-200).

Resume: the consumer calls :meth:`WalSenderSession.ack` after it has
durably applied rows up to an LSN (the CdcApplier commit point); the
session persists it like the slot's ``confirmed_flush_lsn`` and a
restarted session both STARTs from it and drops any re-delivered rows
at or below it — so transcript → session → CdcApplier survives a
kill/restart with exactly-once effect.
"""

from __future__ import annotations

import os
import struct

from creek_spark.sources.pgoutput import PgOutputDecoder

_STATE_FILE = "walsender_lsn"


class TranscriptTransport:
    """Replay a recorded replication session file; collect sent frames.

    ``sent`` holds every frontend message the session wrote:
    ``("start", lsn)`` markers for START_REPLICATION, ``("status",
    write, flush, apply, reply)`` for standby status updates, and
    ``("copydone",)`` — enough for tests to assert protocol behavior
    without a byte-level frontend codec (the 'r' frame bytes are also
    kept in ``sent_raw``)."""

    def __init__(self, path: str):
        with open(path) as f:
            self.lines = [
                ln.strip()
                for ln in f
                if ln.strip() and not ln.strip().startswith("#")
            ]
        self.sent: list[tuple] = []
        self.sent_raw: list[bytes] = []

    def frames(self):
        yield from self.lines

    def send_start(self, lsn: int) -> None:
        self.sent.append(("start", lsn))

    def send_copydone(self) -> None:
        self.sent.append(("copydone",))

    def send_status(self, write: int, flush: int, apply: int, clock: int, reply: int) -> None:
        self.sent.append(("status", write, flush, apply, reply))
        self.sent_raw.append(
            b"r" + struct.pack(">QQQqB", write, flush, apply, clock, reply)
        )


def encode_xlogdata(wal_start: int, payload: bytes, *, wal_end: int | None = None, clock: int = 0) -> bytes:
    return (
        b"w"
        + struct.pack(">QQq", wal_start, wal_end if wal_end is not None else wal_start, clock)
        + payload
    )


def encode_keepalive(wal_end: int, *, clock: int = 0, reply: bool = False) -> bytes:
    return b"k" + struct.pack(">Qq?", wal_end, clock, reply)


class WalSenderSession:
    """The reference's replication receive loop as a resumable generator.

    Parameters mirror the reference knobs: ``status_interval_us`` is the
    5 s ack cadence (replication.go:97-98) measured on the SERVER clock
    carried in frames (deterministic under replay — a socket transport
    sees the same cadence because the server stamps every frame).
    """

    def __init__(
        self,
        transport,
        state_dir: str,
        *,
        source_name: str = "creek-spark",
        db: str = "postgres",
        status_interval_us: int = 5_000_000,
    ):
        self.transport = transport
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)
        self.status_interval_us = status_interval_us
        self.decoder = PgOutputDecoder(source_name, db)
        self.acked_lsn = self._load_lsn()
        self.current_lsn = self.acked_lsn
        self._last_status_clock: int | None = None

    # -- confirmed_flush_lsn analog -----------------------------------

    def _state_path(self) -> str:
        return os.path.join(self.state_dir, _STATE_FILE)

    def _load_lsn(self) -> int:
        try:
            with open(self._state_path()) as f:
                return int(f.read().strip())
        except (OSError, ValueError):
            return 0

    def ack(self, lsn: int) -> None:
        """Durably confirm rows ≤ lsn (the consumer's commit point); the
        next status update and any restart use it — the client-side
        twin of the slot advancing confirmed_flush_lsn."""
        if lsn <= self.acked_lsn:
            return
        tmp = self._state_path() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(lsn))
        os.replace(tmp, self._state_path())
        self.acked_lsn = lsn

    # -- protocol actions ---------------------------------------------

    def _send_status(self, clock: int, reply: int = 0) -> None:
        # pglogrepl.SendStandbyStatusUpdate with WALWritePosition only:
        # flush/apply default to the write position (replication.go:88-94)
        self.transport.send_status(
            self.current_lsn, self.current_lsn, self.current_lsn, clock, reply
        )
        self._last_status_clock = clock

    def _maybe_status(self, clock: int) -> None:
        if (
            self._last_status_clock is None
            or clock - self._last_status_clock >= self.status_interval_us
        ):
            self._send_status(clock)

    # -- the receive loop ---------------------------------------------

    def stream(self):
        """Yield ``(wal_start_lsn, envelope_row)`` pairs in WAL order,
        excluding rows at or below the acked LSN (re-delivered data
        after a resume).  Runs the full session protocol on the way."""
        self.transport.send_start(self.acked_lsn)
        for line in self.transport.frames():
            if line == "!disconnect":
                # conn closed → tryConnect backoff → StartReplication
                # from the confirmed LSN (replication.go:137-148, 583-599)
                self.transport.send_start(self.acked_lsn)
                continue
            if line == "!copydone":
                # server ended the copy stream: ack CopyDone, restart
                # replication on the returned position (replication.go:183-200)
                self.transport.send_copydone()
                self.transport.send_start(self.acked_lsn)
                continue
            frame = bytes.fromhex(line)
            tag = chr(frame[0])
            if tag == "k":
                wal_end, clock, reply = struct.unpack_from(">Qq?", frame, 1)
                if wal_end > self.current_lsn:
                    self.current_lsn = wal_end
                if reply:
                    self._send_status(clock, reply=0)
                else:
                    self._maybe_status(clock)
                continue
            if tag == "w":
                wal_start, _wal_end, clock = struct.unpack_from(">QQq", frame, 1)
                if wal_start > self.current_lsn:
                    self.current_lsn = wal_start
                rows = self.decoder.feed(frame[25:], wal_start)
                if wal_start > self.acked_lsn:
                    for r in rows:
                        yield wal_start, r
                self._maybe_status(clock)
                continue
            # unexpected frame: the reference logs and continues
        # close() sends a final status before disconnecting
        self._send_status(self._last_status_clock or 0)

    def stream_rows(self):
        """Envelope rows only (transcript-wide), for DataFrame assembly."""
        return [r for _, r in self.stream()]


def ingest_transcript(
    spark,
    session: WalSenderSession,
    wal_dir: str,
    row_schema,
    *,
    batch_rows: int = 1000,
) -> int:
    """Drain a walsender session into staged envelope parquet under
    ``wal_dir`` — the directory the streaming pipeline tails
    (streaming.read_envelope_stream → CdcApplier) — acking the session
    only AFTER each batch is durably written, so a crash between write
    and ack re-delivers (and the applier's same-LSN merge no-ops it:
    at-least-once transport + idempotent sink = effectively-once).

    This is the bridge that makes the session product-reachable: the
    reference's producer loop writes decoded WAL to its bus the same
    way (receive → publish → ack LSN).  Returns rows written."""
    from creek_spark.types.envelope import envelope_schema

    schema = envelope_schema(row_schema)
    buf: list[dict] = []
    hi = 0
    total = 0

    def flush() -> None:
        nonlocal buf, total
        if not buf:
            return
        spark.createDataFrame(buf, schema).coalesce(1).write.mode(
            "append"
        ).parquet(wal_dir)
        session.ack(hi)  # durable → confirm (crash before this re-sends)
        total += len(buf)
        buf = []

    for lsn, row in session.stream():
        buf.append(row)
        hi = max(hi, lsn)
        if len(buf) >= batch_rows:
            flush()
    flush()
    return total
