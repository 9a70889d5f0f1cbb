"""Daemon configuration — the creekd config surface, Spark-shaped.

The reference's only executable is the producer daemon
(cmd/creekd.go:36-57): a flat flag/env config (PG_URI, PG_TABLES,
PG_PUBLICATION_*, NATS_*, LOG_LEVEL) wired straight into serve().  The
Spark engine's equivalent deployment knobs:

    CREEK_WAL_DIR        staged envelope directory (the NATS-subject analog)
    CREEK_BASE_DIR       state + checkpoints + registry + tables.json root
    CREEK_TABLES         comma-separated table names to subscribe
                         (PG_TABLES analog; schemas must already be in the
                         registry — via reflect_table or a prior ADD)
    CREEK_TRIGGER_SECONDS  micro-batch cadence (PG_MESSAGE_TIMEOUT analog)
    CREEK_AVAILABLE_NOW  'true' → drain staged data and exit (batch mode)
    CREEK_SHUFFLE_PARTITIONS / CREEK_LOG_LEVEL  Spark session knobs

Flags take the same names (`--wal-dir`, `--tables`, ...) and override
env, exactly like the reference's cli.EnvVars sourcing."""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass
class Config:
    wal_dir: str = ""
    base_dir: str = ""
    tables: list[str] = field(default_factory=list)
    trigger_seconds: int = 10  # parity: PG_MESSAGE_TIMEOUT default 10s
    available_now: bool = False
    shuffle_partitions: int | None = None
    log_level: str = "info"
    # recorded replication-session transcript to ingest before the run
    # (walsender session → per-table staged envelope parquet)
    transcript: str = ""
    # live walsender endpoint "host:port" (v3-protocol socket client);
    # mutually exclusive with transcript
    walsender: str = ""
    slot: str = "creek"
    publication: str = "creek"
    # reference serves promhttp on :7779 (cmd/creekd.go:48); None = off,
    # 0 = ephemeral (tests)
    metrics_port: int | None = None

    def validate(self) -> None:
        if self.transcript and self.walsender:
            raise ValueError("--transcript and --walsender are mutually exclusive")
        if not self.wal_dir:
            raise ValueError("wal_dir is required (CREEK_WAL_DIR / --wal-dir)")
        if not self.base_dir:
            raise ValueError("base_dir is required (CREEK_BASE_DIR / --base-dir)")

    @classmethod
    def load(cls, argv: list[str] | None = None, env: dict | None = None) -> "Config":
        """env first, flags override — the reference's cli.EnvVars order."""
        env = os.environ if env is None else env
        cfg = cls(
            wal_dir=env.get("CREEK_WAL_DIR", ""),
            base_dir=env.get("CREEK_BASE_DIR", ""),
            tables=[
                t.strip()
                for t in env.get("CREEK_TABLES", "").split(",")
                if t.strip()
            ],
            trigger_seconds=int(env.get("CREEK_TRIGGER_SECONDS", "10")),
            available_now=env.get("CREEK_AVAILABLE_NOW", "").lower()
            in ("1", "true", "yes"),
            shuffle_partitions=(
                int(env["CREEK_SHUFFLE_PARTITIONS"])
                if "CREEK_SHUFFLE_PARTITIONS" in env
                else None
            ),
            log_level=env.get("CREEK_LOG_LEVEL", "info"),
            transcript=env.get("CREEK_TRANSCRIPT", ""),
            walsender=env.get("CREEK_WALSENDER", ""),
            slot=env.get("CREEK_SLOT", "creek"),
            publication=env.get("CREEK_PUBLICATION", "creek"),
            metrics_port=(
                int(env["CREEK_METRICS_PORT"])
                if "CREEK_METRICS_PORT" in env
                else None
            ),
        )
        args = list(argv or [])
        i = 0
        flags = {
            "--wal-dir": "wal_dir",
            "--base-dir": "base_dir",
            "--trigger-seconds": "trigger_seconds",
            "--log-level": "log_level",
            "--transcript": "transcript",
            "--walsender": "walsender",
            "--slot": "slot",
            "--publication": "publication",
            "--shuffle-partitions": "shuffle_partitions",
            "--metrics-port": "metrics_port",
        }
        while i < len(args):
            a = args[i]
            if a == "--available-now":
                cfg.available_now = True
                i += 1
                continue
            if a == "--tables":
                cfg.tables = [t.strip() for t in args[i + 1].split(",") if t.strip()]
                i += 2
                continue
            if a in flags:
                v = args[i + 1]
                name = flags[a]
                cur = getattr(cfg, name)
                setattr(
                    cfg,
                    name,
                    int(v)
                    if isinstance(cur, int)
                    or name in ("shuffle_partitions", "metrics_port")
                    else v,
                )
                i += 2
                continue
            raise ValueError(f"unknown flag {a!r}")
        cfg.validate()
        return cfg
