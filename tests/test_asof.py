"""As-of join semantics pinned on a hand-computed fixture: direction,
exact-match inclusion, tolerance, and no-match nulls.  (The catalog's
join_asof covers oracle parity on the driver data; these cover the knobs
the oracle query doesn't exercise.)"""

from __future__ import annotations

import datetime as dt

import pytest

from creek_spark.operators.asof import asof_join


def ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


@pytest.fixture()
def quotes(spark):
    # key A: quotes at 09:00=1.0, 10:00=2.0 ; key B: 12:00=9.0
    return spark.createDataFrame(
        [("A", ts(9), 1.0), ("A", ts(10), 2.0), ("B", ts(12), 9.0)],
        "sym string, qt timestamp, px double",
    )


@pytest.fixture()
def trades(spark):
    # A@09:30 → 1.0 ; A@10:00 → exact-match boundary ; A@08:00 → no match
    # C@09:00 → key never quoted
    return spark.createDataFrame(
        [("A", ts(9, 30)), ("A", ts(10)), ("A", ts(8)), ("C", ts(9))],
        "sym string, tt timestamp",
    )


def _rows(df):
    return {
        (r["sym"], r["tt"]): (r["qt_asof"], r["px_asof"]) for r in df.collect()
    }


def test_backward_with_exact(spark, quotes, trades):
    out = asof_join(trades, quotes, ["sym"], "tt", "qt")
    got = _rows(out)
    assert got[("A", ts(9, 30))] == (ts(9), 1.0)
    assert got[("A", ts(10))] == (ts(10), 2.0)  # exact match taken
    assert got[("A", ts(8))] == (None, None)  # nothing at/before
    assert got[("C", ts(9))] == (None, None)  # unseen key


def test_backward_strict(spark, quotes, trades):
    out = asof_join(
        trades, quotes, ["sym"], "tt", "qt", allow_exact_matches=False
    )
    got = _rows(out)
    assert got[("A", ts(10))] == (ts(9), 1.0)  # exact match excluded


def test_forward(spark, quotes, trades):
    out = asof_join(trades, quotes, ["sym"], "tt", "qt", direction="forward")
    got = _rows(out)
    assert got[("A", ts(8))] == (ts(9), 1.0)  # earliest at/after
    assert got[("A", ts(9, 30))] == (ts(10), 2.0)
    assert got[("A", ts(10))] == (ts(10), 2.0)


def test_tolerance_rejects_stale(spark, quotes, trades):
    out = asof_join(
        trades, quotes, ["sym"], "tt", "qt", tolerance="15 minutes"
    )
    got = _rows(out)
    assert got[("A", ts(9, 30))] == (None, None)  # 30 min stale > 15 min
    assert got[("A", ts(10))] == (ts(10), 2.0)  # 0 min stale


def test_tolerance_forward(spark, quotes, trades):
    out = asof_join(
        trades, quotes, ["sym"], "tt", "qt",
        direction="forward", tolerance="45 minutes",
    )
    got = _rows(out)
    assert got[("A", ts(8))] == (None, None)  # next quote 60 min away
    assert got[("A", ts(9, 30))] == (ts(10), 2.0)  # 30 min ahead, in bound
