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
