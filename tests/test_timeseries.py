"""Generic as-of join operator (operators/timeseries.py): directions,
ties, missing keys, tolerance, value carrying — hand-checkable fixtures.
The events-scale path is oracle-gated via the `asof_join` driver query."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from database_collector_spark.operators.timeseries import asof_join


def _frames(spark):
    trades = spark.createDataFrame(
        [
            Row(sym="A", ts=15, qty=1),
            Row(sym="A", ts=20, qty=2),  # tie with a price row
            Row(sym="A", ts=5, qty=3),   # before any price
            Row(sym="B", ts=15, qty=4),  # no prices for B at all
        ]
    )
    prices = spark.createDataFrame(
        [Row(sym="A", ts=10, px=1.0), Row(sym="A", ts=20, px=2.0)]
    )
    return trades, prices


def test_asof_backward_with_ties_and_misses(spark):
    trades, prices = _frames(spark)
    got = {
        (r["sym"], r["ts"]): (r["ts_right"], r["px_right"])
        for r in asof_join(
            trades, prices, by=("sym",), value_cols=("px",)
        ).collect()
    }
    assert got[("A", 15)] == (10, 1.0)
    assert got[("A", 20)] == (20, 2.0)  # equal ts matches (<= semantics)
    assert got[("A", 5)] == (None, None)
    assert got[("B", 15)] == (None, None)
    # left is preserved row-for-row (left outer)
    assert len(got) == 4


def test_asof_forward(spark):
    trades, prices = _frames(spark)
    got = {
        (r["sym"], r["ts"]): r["ts_right"]
        for r in asof_join(
            trades, prices, by=("sym",), direction="forward"
        ).collect()
    }
    assert got[("A", 5)] == 10
    assert got[("A", 15)] == 20
    assert got[("A", 20)] == 20  # ties match forward too
    assert got[("B", 15)] is None


def test_asof_tolerance_nulls_stale_matches(spark):
    trades, prices = _frames(spark)
    got = {
        (r["sym"], r["ts"]): (r["ts_right"], r["px_right"])
        for r in asof_join(
            trades,
            prices,
            by=("sym",),
            value_cols=("px",),
            tolerance_seconds=3,
        ).collect()
    }
    assert got[("A", 15)] == (None, None)  # gap 5 > tolerance 3
    assert got[("A", 20)] == (20, 2.0)     # gap 0


def test_asof_rejects_unknown_direction(spark):
    trades, prices = _frames(spark)
    with pytest.raises(ValueError):
        asof_join(trades, prices, by=("sym",), direction="nearest")


def test_asof_duplicate_right_ts_resolves_deterministically(spark):
    trades = spark.createDataFrame([Row(sym="A", ts=15, qty=1)])
    prices = spark.createDataFrame(
        [Row(sym="A", ts=10, px=1.0), Row(sym="A", ts=10, px=9.9)]
    )
    for _ in range(3):
        r = asof_join(
            trades, prices, by=("sym",), value_cols=("px",)
        ).collect()[0]
        assert (r["ts_right"], r["px_right"]) == (10, 9.9)  # greatest tuple


def test_asof_rejects_on_in_value_cols(spark):
    trades, prices = _frames(spark)
    with pytest.raises(ValueError):
        asof_join(trades, prices, by=("sym",), value_cols=("ts",))
