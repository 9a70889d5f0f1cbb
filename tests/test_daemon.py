"""Daemon entrypoint (`python -m creek_spark`) and its creekd-shaped
config: env sourcing, flag override, and a batch-mode (--available-now)
end-to-end run over staged envelope files."""

from __future__ import annotations

import pytest

from creek_spark.config import Config
from tests.fixtures import ENV_SCHEMA, OTHER_EXPECTED, ROW_SCHEMA, other_wal_events


def test_config_env_and_flag_override():
    env = {
        "CREEK_WAL_DIR": "/w",
        "CREEK_BASE_DIR": "/b",
        "CREEK_TABLES": "public.a, public.b",
        "CREEK_TRIGGER_SECONDS": "5",
    }
    cfg = Config.load([], env)
    assert cfg.wal_dir == "/w" and cfg.base_dir == "/b"
    assert cfg.tables == ["public.a", "public.b"]
    assert cfg.trigger_seconds == 5 and not cfg.available_now

    cfg2 = Config.load(
        ["--tables", "public.c", "--trigger-seconds", "2", "--available-now"],
        env,
    )
    assert cfg2.tables == ["public.c"]
    assert cfg2.trigger_seconds == 2 and cfg2.available_now


def test_config_validation_and_unknown_flag():
    with pytest.raises(ValueError, match="wal_dir"):
        Config.load([], {})
    with pytest.raises(ValueError, match="unknown flag"):
        Config.load(["--frob", "x"], {"CREEK_WAL_DIR": "/w", "CREEK_BASE_DIR": "/b"})


def test_daemon_available_now_end_to_end(spark, tmp_path):
    """Register a schema, stage WAL files, run main(--available-now):
    state materializes and the process exits 0.  Reuses the live session
    (get_spark returns the active one)."""
    from creek_spark.__main__ import main
    from creek_spark.sources.registry import SchemaRegistry

    wal = str(tmp_path / "wal")
    base = str(tmp_path / "cdc")
    # the daemon resolves schemas from the registry under base_dir
    SchemaRegistry(str(tmp_path / "cdc/registry")).put(
        ROW_SCHEMA, source="public.other"
    )
    spark.createDataFrame(other_wal_events(), schema=ENV_SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(wal)

    rc = main(
        ["--available-now", "--tables", "public.other"],
        {"CREEK_WAL_DIR": wal, "CREEK_BASE_DIR": base},
    )
    assert rc == 0
    got = {
        r["id"]: r["data"]
        for r in spark.read.parquet(base + "/state/public_other")
        .select("id", "data")
        .collect()
    }
    assert got == OTHER_EXPECTED


def test_daemon_no_tables_is_error(spark, tmp_path):
    from creek_spark.__main__ import main

    rc = main(
        ["--available-now", "--tables", "public.mystery"],
        {
            "CREEK_WAL_DIR": str(tmp_path / "w"),
            "CREEK_BASE_DIR": str(tmp_path / "b"),
        },
    )
    assert rc == 1
