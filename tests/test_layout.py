"""Z-order layout (operators/layout.py): bit-interleave correctness vs
a Python reference, locality of the clustered layout, and the
range-partitioned write plan."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from database_collector_spark.operators import layout


def _py_morton(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_python(spark):
    rows = [Row(x=i * 13 % 251, y=i * 7 % 199) for i in range(300)]
    df = spark.createDataFrame(rows)
    got = df.select(
        "x", "y", layout.zorder_key(F.col("x"), F.col("y")).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == _py_morton(r["x"], r["y"])


def test_zorder_clusters_both_dims(spark):
    # 64x64 grid: fixed-width z-ranges must cover small rectangles —
    # every bucket's per-dim extent stays well under the global 64.
    rows = [Row(x=i % 64, y=i // 64) for i in range(64 * 64)]
    df = spark.createDataFrame(rows)
    stats = layout.cluster_stats(
        df, F.col("x"), F.col("y"), n_buckets=16, bits=8
    ).collect()
    assert sum(r["n"] for r in stats) == 64 * 64
    for r in stats:
        assert r["x_max"] - r["x_min"] <= 16
        assert r["y_max"] - r["y_min"] <= 16


def test_zorder_repartition_plan_is_range_partitioned(spark):
    df = spark.createDataFrame([Row(x=i % 10, y=i // 10) for i in range(100)])
    out = layout.zorder_repartition(df, F.col("x"), F.col("y"), n_files=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    assert "Sort" in plan
    # whole pipeline stays JVM-side
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
