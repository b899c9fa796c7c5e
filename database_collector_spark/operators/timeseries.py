"""Time-series alignment operators (extension surface).

The reference aligns metric samples to wall-clock implicitly (each scrape
stamps now(); SURVEY §2.3 notes there are no joins at all). A real
time-series engine needs explicit alignment: ``asof_join`` attaches to
every left row the temporally nearest right row per key — the canonical
"align metrics to the latest preceding config/scrape/price" operation.

Spark lacks a native ASOF JOIN. The scalable formulation here is
union + ONE window sort per call (one shuffle keyed on ``by``), NOT a
range join: interleave both sides in time order and carry the last
right-side values forward (backward direction) or backward (forward
direction). A range-join formulation either needs bucketing tricks or
degenerates to a nested loop; the union-sort plan is linear in
|left| + |right| and partitions perfectly by key at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str = "ts",
    by: tuple[str, ...] = (),
    value_cols: tuple[str, ...] = (),
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Attach the temporally nearest right-side row to every left row.

    ``direction='backward'`` (default): latest right row with
    ``right.on <= left.on`` (ties match — the pandas ``merge_asof``
    convention). ``'forward'``: earliest right row with
    ``right.on >= left.on``.

    ``value_cols`` are the right-side columns to carry; the matched right
    timestamp arrives as ``{on}{suffix}``. Left rows with no match (or
    outside ``tolerance_seconds``) keep NULLs — a left outer as-of.

    One shuffle total: both sides union into a single per-key window
    sort; at equal timestamps the right row orders first so ties are
    inclusive in both directions. If several RIGHT rows share the same
    (by, on), the carried values come deterministically from the one
    with the greatest ``value_cols`` tuple (a total order — never
    whichever duplicate a shuffle happened to emit last).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"unknown direction {direction!r}: expected 'backward' or 'forward'"
        )
    if on in value_cols:
        raise ValueError(
            f"on={on!r} is carried automatically as '{on}{suffix}'; "
            "listing it in value_cols would emit a duplicate column"
        )
    lcols = left.columns
    l_side = left.select(
        *by,
        F.col(on).alias("__ts"),
        F.lit(1).alias("__kind"),
        F.struct(*lcols).alias("__row"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}") for c in value_cols],
    )
    row_type = l_side.schema["__row"].dataType
    r_side = right.select(
        *by,
        F.col(on).alias("__ts"),
        F.lit(0).alias("__kind"),
        F.lit(None).cast(row_type).alias("__row"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    merged = l_side.unionByName(r_side)

    ts_order = F.asc("__ts") if direction == "backward" else F.desc("__ts")
    # the trailing value-struct ordering totalizes ties among right rows
    # sharing (by, on): the carried last() deterministically picks the
    # GREATEST value tuple, instead of whichever duplicate the shuffle
    # happened to order last
    tiebreak = (
        [F.asc(F.struct(*[F.col(f"__v_{c}") for c in value_cols]))]
        if value_cols
        else []
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(ts_order, F.asc("__kind"), *tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.withColumn(
        "__m_ts",
        F.last(
            F.when(F.col("__kind") == 0, F.col("__ts")), ignorenulls=True
        ).over(w),
    )
    for c in value_cols:
        carried = carried.withColumn(
            f"__m_{c}",
            F.last(
                F.when(F.col("__kind") == 0, F.col(f"__v_{c}")), ignorenulls=True
            ).over(w),
        )

    out = carried.filter(F.col("__kind") == 1)
    if tolerance_seconds is not None:
        gap = F.abs(
            F.col("__ts").cast("double") - F.col("__m_ts").cast("double")
        )
        in_tol = F.col("__m_ts").isNotNull() & (gap <= tolerance_seconds)
        out = out.withColumn("__m_ts", F.when(in_tol, F.col("__m_ts")))
        for c in value_cols:
            out = out.withColumn(f"__m_{c}", F.when(in_tol, F.col(f"__m_{c}")))
    return out.select(
        *[F.col("__row")[c].alias(c) for c in lcols],
        F.col("__m_ts").alias(f"{on}{suffix}"),
        *[F.col(f"__m_{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
