"""Sketch-only production aggregates (extension surface).

The driver gates ``approx_distinct`` / ``approx_quantiles``
(workloads_ts.py) pair each sketch with its EXACT twin so the result is
oracle-hashable — right for a correctness gate, wrong for production: the
exact side is the expensive part (count-distinct shuffles every distinct
value; exact percentiles sort every group). These helpers are the
production-shape API: sketch ONLY, collect-free, exact-agg-free.

100 TB cost model: both sketches are algebraic aggregates — each input
partition folds into a fixed-size sketch (HLL++ registers / GK summary)
map-side, and the shuffle moves ONE sketch per (group x partition), not
rows. That is the whole point: the network cost is O(groups x
sketch_size), independent of row count, and there is no sort anywhere in
the plan (pinned by tests/test_plan_quality.py). Mergeability is also
what makes the same calls valid under Structured Streaming — partial
sketches merge across micro-batches like any other partial aggregate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    *,
    rsd: float = 0.02,
) -> DataFrame:
    """Per-group HLL++ approximate count-distinct of ``value_col``.

    ``rsd`` is the target relative standard deviation (0.02 => ~4k
    registers, measured within 5% of exact on every fixture SF — see the
    q_approx_distinct gate, which pins that band against an exact oracle
    so this helper's precision claim stays evidence-backed).

    Output: group columns + ``approx_<value_col>`` (long).
    """
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(value_col, rsd=rsd).alias(f"approx_{value_col}")
    )


def approx_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    *,
    probabilities: Sequence[float] = (0.5, 0.9, 0.99),
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group GK-sketch quantiles of ``value_col`` at the given
    probabilities — rank error <= 1/accuracy, never a sort.

    Output: group columns + one ``q<pct>`` double column per probability
    (q50, q90, q99 by default; fractional percents get the dot kept,
    e.g. q99.9).
    """

    def _name(p: float) -> str:
        pct = p * 100
        return f"q{pct:g}"

    aggs = [
        F.percentile_approx(value_col, F.lit(p), F.lit(accuracy))
        .cast("double")
        .alias(_name(p))
        for p in probabilities
    ]
    return df.groupBy(*group_cols).agg(*aggs)
