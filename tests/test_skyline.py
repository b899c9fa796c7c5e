"""2-D skyline operator (operators/skyline.py): dominance semantics on
hand-checkable point sets; the linear sweep is differentially pinned
against the NOT EXISTS oracle by the `skyline_orders` gate."""

from __future__ import annotations

from pyspark.sql import Row

from database_collector_spark.operators.skyline import skyline_2d


def _sky(spark, pts, by=()):
    rows = [Row(g="_", x=x, y=y) for x, y in pts]
    out = skyline_2d(spark.createDataFrame(rows), by=by or ("g",))
    return sorted((r["x"], r["y"], r["n_rows"]) for r in out.collect())


def test_skyline_basic_frontier(spark):
    # minimize x, maximize y: (1,5) and (3,7) survive; (2,4) dominated by
    # (1,5); (4,7) dominated by (3,7); (5,1) dominated by everything
    pts = [(1, 5), (2, 4), (3, 7), (4, 7), (5, 1)]
    assert _sky(spark, pts) == [(1, 5, 1), (3, 7, 1)]


def test_skyline_same_x_keeps_only_best_y(spark):
    assert _sky(spark, [(1, 5), (1, 9), (1, 2)]) == [(1, 9, 1)]


def test_skyline_same_y_keeps_only_best_x(spark):
    assert _sky(spark, [(3, 5), (1, 5), (2, 5)]) == [(1, 5, 1)]


def test_skyline_duplicates_collapse_with_count(spark):
    assert _sky(spark, [(1, 5), (1, 5), (2, 6)]) == [(1, 5, 2), (2, 6, 1)]


def test_skyline_groups_are_independent(spark):
    rows = [
        Row(g="a", x=1, y=5),
        Row(g="a", x=2, y=4),
        Row(g="b", x=2, y=4),  # dominated in a's world, frontier in b's
    ]
    out = skyline_2d(spark.createDataFrame(rows), by=("g",))
    got = sorted((r["g"], r["x"], r["y"]) for r in out.collect())
    assert got == [("a", 1, 5), ("b", 2, 4)]


def test_skyline_single_window_no_join(spark):
    rows = [Row(g="a", x=1, y=5)]
    plan = (
        skyline_2d(spark.createDataFrame(rows), by=("g",))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan and "Cartesian" not in plan
