"""Skyline (Pareto frontier) operator.

The reference has no multi-criteria surface (its exporters emit flat
gauges; SURVEY §2.5); a skyline — the set of rows no other row is at
least as good on every criterion and strictly better on one — is the
standard way an analytics engine answers "best trade-offs" questions
(cheapest-and-freshest, smallest-and-fastest) without a scoring
function.

The naive formulation is the NOT EXISTS dominance self-join — O(n²) per
group and exactly what the differential oracle runs. The engine plan
here is the classic 2-D sweep instead: sort each group once by
(x asc, y desc); a point is on the frontier iff its y strictly exceeds
the running max y of all earlier points (earlier = better-or-equal x;
the y-desc tiebreak makes same-x dominance fall out of the same
compare). ONE window sort per group, linear in |points| — the
self-join never appears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def skyline_2d(
    df: DataFrame,
    *,
    by: tuple[str, ...] = (),
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Per-group 2-D skyline MINIMIZING ``x_col`` and MAXIMIZING
    ``y_col`` (flip a sign upstream for other orientations).

    Duplicate (x, y) points collapse first (they dominate each other
    only non-strictly, so the point survives once, with ``n_rows``
    carrying its multiplicity). Output: (by..., x, y, n_rows) — frontier
    points only, exact input values.
    """
    pts = (
        df.groupBy(*by, F.col(x_col).alias("x"), F.col(y_col).alias("y"))
        .agg(F.count("*").alias("n_rows"))
    )
    w_prev = (
        Window.partitionBy(*by)
        .orderBy(F.asc("x"), F.desc("y"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        pts.withColumn("__max_prev_y", F.max("y").over(w_prev))
        .where(F.col("__max_prev_y").isNull() | (F.col("__max_prev_y") < F.col("y")))
        .drop("__max_prev_y")
    )
