"""Incremental aggregate maintenance (extension surface) — keep a
pre-aggregated table current as delta rows arrive, WITHOUT rescanning the
base fact data.

The materialized-view maintenance identity for algebraic aggregates:
count/sum (and anything derivable from them — avg, rates, shares) are
additive, so

    agg(base_rows UNION delta_rows)
  = re_agg(agg(base_rows) UNION agg(delta_rows))

The left side rescans 100 TB every tick; the right side touches only the
delta and the (groups-sized) aggregate table. The plan is: partial-agg
the delta (one shuffle of delta-cardinality data), union with the stored
aggregate, re-aggregate group-wise — the same fold a streaming
aggregation's state-store update performs, expressed as a batch merge.

Retractions need no special machinery: a correction/delete is a delta
row with negated measures (count -1, negated sum contribution) — the
additive fold absorbs it. min/max are NOT maintainable this way
(deleting the current max needs the full history); keep those in the
sketch tier (operators/sketches.py) or recompute from base.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def delta_agg(
    delta: DataFrame,
    *,
    group_cols: Sequence[str],
    count_col: str = "n",
    sum_cols: Mapping[str, str] | None = None,
) -> DataFrame:
    """Fold raw delta rows into the aggregate-table schema:
    group columns + ``count_col`` + one summed column per
    ``{input_col: output_col}`` entry."""
    sums = sum_cols or {}
    return delta.groupBy(*group_cols).agg(
        F.count("*").alias(count_col),
        *[F.sum(src).alias(dst) for src, dst in sums.items()],
    )


def merge_agg(
    base_agg: DataFrame,
    delta: DataFrame,
    *,
    group_cols: Sequence[str],
    count_col: str = "n",
    sum_cols: Mapping[str, str] | None = None,
) -> DataFrame:
    """Merge raw ``delta`` rows into ``base_agg`` (a table already in the
    ``delta_agg`` output schema). Returns the refreshed aggregate —
    identical to re-aggregating base+delta from scratch (which is what
    the incremental_agg gate's oracle computes), at delta cost.

    Groups whose maintained count reaches 0 (full retraction) are
    dropped, matching the from-scratch answer."""
    sums = sum_cols or {}
    measure_cols = [count_col, *sums.values()]
    fresh = delta_agg(
        delta, group_cols=group_cols, count_col=count_col, sum_cols=sums
    )
    return (
        base_agg.unionByName(fresh)
        .groupBy(*group_cols)
        .agg(*[F.sum(c).alias(c) for c in measure_cols])
        .filter(F.col(count_col) != 0)
    )
