"""Generic as-of join operator (operators/timeseries.py): directions,
ties, missing keys, tolerance, value carrying — hand-checkable fixtures.
The events-scale path is oracle-gated via the `asof_join` driver query."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

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


# ---------------------------------------------------------------- pit_join


def _pit_frames(spark):
    # versions for key A: [10, 20) attr=1, [20, 30) attr=2, [40, None) attr=4
    # — note the GAP [30, 40) between versions 2 and 4.
    dim = spark.createDataFrame(
        [
            Row(k="A", valid_from=10, valid_to=20, attr=1),
            Row(k="A", valid_from=20, valid_to=30, attr=2),
            Row(k="A", valid_from=40, valid_to=None, attr=4),
        ]
    )
    fact = spark.createDataFrame(
        [
            Row(k="A", ts=5, fid=1),    # before first version -> miss
            Row(k="A", ts=10, fid=2),   # valid_from inclusive
            Row(k="A", ts=20, fid=3),   # boundary: v1 excl, v2 incl
            Row(k="A", ts=35, fid=4),   # inside the gap -> miss (not as-of!)
            Row(k="A", ts=99, fid=5),   # open-ended current version
            Row(k="B", ts=15, fid=6),   # key with no history
        ]
    )
    return fact, dim


def test_pit_join_interval_semantics_and_gaps(spark):
    from database_collector_spark.operators.timeseries import pit_join

    fact, dim = _pit_frames(spark)
    out = pit_join(fact, dim, keys=("k",), ts_col="ts", value_cols=("attr",))
    got = {r["fid"]: r["attr"] for r in out.collect()}
    assert got == {1: None, 2: 1, 3: 2, 4: None, 5: 4, 6: None}
    # left outer: every fact row survives exactly once (SCD-2 non-overlap)
    assert out.count() == fact.count()


def test_pit_join_inner_drops_misses(spark):
    from database_collector_spark.operators.timeseries import pit_join

    fact, dim = _pit_frames(spark)
    out = pit_join(
        fact, dim, keys=("k",), ts_col="ts", value_cols=("attr",), how="inner"
    )
    assert sorted(r["fid"] for r in out.collect()) == [2, 3, 5]


def test_pit_join_rejects_unknown_how(spark):
    from database_collector_spark.operators.timeseries import pit_join

    fact, dim = _pit_frames(spark)
    with pytest.raises(ValueError):
        pit_join(fact, dim, keys=("k",), how="full")


def test_pit_join_output_has_no_duplicate_columns_and_rejects_clashes(spark):
    from database_collector_spark.operators.timeseries import pit_join

    fact, dim = _pit_frames(spark)
    out = pit_join(fact, dim, keys=("k",), ts_col="ts", value_cols=("attr",))
    # every output column name unique — downstream selects never ambiguous
    assert len(out.columns) == len(set(out.columns))
    assert out.columns == ["k", "ts", "fid", "valid_from", "valid_to", "attr"]
    # dim interval columns come through and are selectable by bare name
    vf = {r["fid"]: r["valid_from"] for r in out.collect()}
    assert vf[2] == 10 and vf[5] == 40 and vf[4] is None

    # a fact that ALREADY carries a payload/interval column name is a
    # loud error, not a silently ambiguous join output
    fact_clash = fact.withColumn("attr", F.lit(0))
    with pytest.raises(ValueError, match="attr"):
        pit_join(fact_clash, dim, keys=("k",), ts_col="ts", value_cols=("attr",))


def test_pit_join_plans_as_equi_join_not_nested_loop(spark):
    from database_collector_spark.operators.timeseries import pit_join

    fact, dim = _pit_frames(spark)
    plan = (
        pit_join(fact, dim, keys=("k",), value_cols=("attr",))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan


# ------------------------------------------------------- time_weighted_avg


def test_time_weighted_avg_trapezoid_hand_fixture(spark):
    import datetime as dt

    from database_collector_spark.operators.timeseries import time_weighted_avg

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # series "a": 1.00 held 10s, then 3.00 held 30s, end 3.00
        Row(g="a", ts=t0, v=1.0, i=1),
        Row(g="a", ts=t0 + dt.timedelta(seconds=10), v=3.0, i=2),
        Row(g="a", ts=t0 + dt.timedelta(seconds=40), v=3.0, i=3),
        # series "b": a single point -> no interval, twa NULL
        Row(g="b", ts=t0, v=7.0, i=4),
    ]
    out = time_weighted_avg(
        spark.createDataFrame(rows),
        by=("g",),
        on="ts",
        value_col="v",
        scale=100,
        tiebreak=("i",),
    ).collect()
    got = {r["g"]: r for r in out}
    # trapezoids: (100+300)/2*10s + (300+300)/2*30s = 2000 + 9000 = 11000
    # cents*sec over 40s -> 275 cents = 2.75
    assert got["a"]["n_points"] == 3
    assert got["a"]["twa"] == pytest.approx(2.75)
    assert got["a"]["twa_numer"] == (100 + 300) * 10_000_000 + (300 + 300) * 30_000_000
    assert got["a"]["twa_denom"] == 2 * 40_000_000
    assert got["b"]["twa"] is None and got["b"]["twa_numer"] is None


# ------------------------------------------------------ coalesce_intervals


def test_coalesce_intervals_islands_and_touching(spark):
    from database_collector_spark.operators.timeseries import coalesce_intervals

    iv = spark.createDataFrame(
        [
            # key A: [0,10] + [5,8] (contained) + [10,20] (touching -> merges)
            Row(k="A", start=0, end=10),
            Row(k="A", start=5, end=8),
            Row(k="A", start=10, end=20),
            # gap, then a second island
            Row(k="A", start=25, end=30),
            # key B: earlier LONG interval swallows a later short one whose
            # predecessor-by-start ended sooner (needs running MAX, not lag)
            Row(k="B", start=0, end=100),
            Row(k="B", start=10, end=20),
            Row(k="B", start=30, end=40),
            Row(k="B", start=150, end=160),
        ]
    )
    got = {
        (r["k"], r["island"]): (r["start"], r["end"], r["n_intervals"])
        for r in coalesce_intervals(iv, by=("k",)).collect()
    }
    assert got == {
        ("A", 0): (0, 20, 3),
        ("A", 1): (25, 30, 1),
        ("B", 0): (0, 100, 3),
        ("B", 1): (150, 160, 1),
    }


def test_coalesce_intervals_single_shuffle(spark):
    from database_collector_spark.operators.timeseries import coalesce_intervals

    iv = spark.createDataFrame([Row(k="A", start=0, end=1)])
    plan = (
        coalesce_intervals(iv, by=("k",))
        ._jdf.queryExecution().executedPlan().toString()
    )
    import re

    # one exchange on the key feeds both windows AND the island aggregate
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "Join" not in plan


# ----------------------------------------------------------- prorate_daily


def test_prorate_daily_midnight_split_and_dust(spark):
    from database_collector_spark.operators.timeseries import prorate_daily

    day = 86_400_000_000
    iv = spark.createDataFrame(
        [
            # 23:59:50 -> 00:00:10 next day: 10s + 10s split, amount 100
            Row(rid=1, start_us=day - 10_000_000, end_us=day + 10_000_000, cents=100),
            # entirely inside day 5
            Row(rid=2, start_us=5 * day + 7, end_us=5 * day + 1_000_007, cents=30),
            # zero-length: dropped
            Row(rid=3, start_us=day, end_us=day, cents=999),
            # thirds: 3 cents over 3 us spanning one day -> floor dust
            Row(rid=4, start_us=0, end_us=3, cents=1),
        ]
    )
    got = {
        (r["rid"], r["day_idx"]): (r["overlap_us"], r["share_micro"])
        for r in prorate_daily(iv, id_cols=("rid",)).collect()
    }
    assert got == {
        (1, 0): (10_000_000, 50_000_000),
        (1, 1): (10_000_000, 50_000_000),
        (2, 5): (1_000_000, 30_000_000),
        (4, 0): (3, 1_000_000),
    }
    # no rows for the zero-length interval
    assert not any(rid == 3 for rid, _ in got)


# ---------------------------------------------------------- interval_subtract


def test_interval_subtract_base_minus_holes(spark):
    from database_collector_spark.operators.timeseries import interval_subtract

    base = spark.createDataFrame(
        [
            Row(k="A", start=0, end=100),
            Row(k="A", start=120, end=140),
            Row(k="B", start=0, end=10),
        ]
    )
    holes = spark.createDataFrame(
        [
            Row(k="A", start=10, end=20),   # punches a hole
            Row(k="A", start=15, end=30),   # overlaps the first hole
            Row(k="A", start=90, end=130),  # spans across two base islands
            Row(k="B", start=0, end=10),    # covers B fully
            Row(k="C", start=0, end=5),     # hole with no base: ignored
        ]
    )
    out = sorted(
        (r["k"], r["start"], r["end"])
        for r in interval_subtract(base, holes, by=("k",)).collect()
    )
    assert out == [("A", 0, 10), ("A", 30, 90), ("A", 130, 140)]


def test_interval_subtract_no_holes_returns_coalesced_base(spark):
    from database_collector_spark.operators.timeseries import interval_subtract

    base = spark.createDataFrame(
        [Row(k="A", start=0, end=5), Row(k="A", start=5, end=9)]
    )
    holes = spark.createDataFrame([Row(k="Z", start=0, end=1)])
    out = [
        (r["k"], r["start"], r["end"])
        for r in interval_subtract(base, holes, by=("k",)).collect()
    ]
    assert out == [("A", 0, 9)]


def test_interval_subtract_hole_splitting_base_boundary_inside_gap(spark):
    from database_collector_spark.operators.timeseries import interval_subtract

    # two touching base islands with a hole strictly inside the first:
    # the uncovered stretch crosses the internal base boundary and must
    # come back as ONE maximal interval
    base = spark.createDataFrame(
        [Row(k="A", start=0, end=50), Row(k="A", start=50, end=80)]
    )
    holes = spark.createDataFrame([Row(k="A", start=10, end=20)])
    out = sorted(
        (r["start"], r["end"])
        for r in interval_subtract(base, holes, by=("k",)).collect()
    )
    assert out == [(0, 10), (20, 80)]
