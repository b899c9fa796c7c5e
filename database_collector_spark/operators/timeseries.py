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


def pit_join(
    fact: DataFrame,
    dim: DataFrame,
    *,
    keys: tuple[str, ...],
    ts_col: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    value_cols: tuple[str, ...] = (),
    how: str = "left",
) -> DataFrame:
    """Point-in-time (temporal) join: attach to every fact row the
    dimension VERSION whose validity interval covers the fact timestamp —
    the standard fact→SCD-2 lookup (``operators/merge.py::scd2_merge``
    produces exactly this interval shape; this operator consumes it).

    Interval semantics are half-open ``[valid_from, valid_to)`` with
    NULL ``valid_to`` = current/open-ended. Contract: versions of one key
    must not overlap (the SCD-2 invariant) — then every fact matches at
    most one version; facts in a coverage GAP (e.g. before the first
    version) keep NULLs under ``how='left'``. This differs from
    ``asof_join`` on purpose: as-of carries the nearest EARLIER row no
    matter how stale, a PIT join respects the history's own validity
    bounds and reports gaps as misses.

    Plan shape, and why it holds at 100 TB: this is an EQUI-join on
    ``keys`` (one shuffle per side, or zero with bucketed tables) with
    the interval test as a residual filter inside each key group — never
    a range/theta join. Per-key cost is |facts_k| x |versions_k|
    candidate pairs; version counts per key are small by construction
    (a dimension history, not an event stream). If a pathological key
    accumulates millions of versions, fall back to the union-window
    ``asof_join`` form, which is linear — valid whenever the history
    tiles time with no gaps.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"unknown how {how!r}: expected 'left' or 'inner'")
    clash = sorted(
        set(fact.columns) & ({valid_from, valid_to} | set(value_cols))
    )
    if clash:
        raise ValueError(
            f"pit_join: fact already has column(s) {clash}; rename them or "
            f"the dim payload columns — the joined output would be ambiguous"
        )
    # alias EVERY dim-side column (keys and payload) so the join output
    # never carries duplicate names regardless of fact's schema
    d = dim.select(
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        F.col(valid_from).alias(f"__d_{valid_from}"),
        F.col(valid_to).alias(f"__d_{valid_to}"),
        *[F.col(c).alias(f"__d_{c}") for c in value_cols],
    )
    cond = fact[ts_col] >= d[f"__d_{valid_from}"]
    cond = cond & (
        d[f"__d_{valid_to}"].isNull() | (fact[ts_col] < d[f"__d_{valid_to}"])
    )
    for k in keys:
        cond = (fact[k] == d[f"__k_{k}"]) & cond
    joined = fact.join(d, on=cond, how=how)
    return joined.select(
        *[F.col(c) for c in fact.columns],
        F.col(f"__d_{valid_from}").alias(valid_from),
        F.col(f"__d_{valid_to}").alias(valid_to),
        *[F.col(f"__d_{c}").alias(c) for c in value_cols],
    )


def time_weighted_avg(
    df: DataFrame,
    *,
    by: tuple[str, ...],
    on: str = "ts",
    value_col: str = "value",
    scale: int = 100,
    tiebreak: tuple[str, ...] = (),
) -> DataFrame:
    """Trapezoidal time-weighted average per series — the irregular-
    sampling mean (TimescaleDB's ``time_weight('Linear')``): each
    consecutive sample pair contributes ``(v_i + v_{i+1})/2 * dt``, so a
    value held for an hour counts 3600x a value held for a second,
    which a plain AVG gets wrong on irregular series.

    Exactness: values are scaled to integers (``round(value*scale)``)
    and timestamps to epoch microseconds, so the accumulated numerator
    ``sum((cv_i + cv_{i+1}) * dt_us)`` and denominator ``2 * sum(dt_us)``
    are exact BIGINTs in any summation order (bound: with cents and a
    30-day span, numerator <= ~3e17, far inside int64). The final
    ``twa`` is one correctly-rounded int64→double divide — bit-identical
    across engines. Series with <2 samples report NULL twa (no interval
    to integrate).

    Plan: ONE shuffle — a per-key window sort feeding lead(); the
    aggregate reuses the same partitioning (partial agg map-side). At
    100 TB this is the minimal plan for any consecutive-pair statistic.
    """
    cv = F.round(F.col(value_col) * scale).cast("long")
    # epoch micros via LTZ: NTZ->LTZ reads the naive value in the session
    # tz (UTC in this engine), and unix_micros is only legal on LTZ
    tus = F.unix_micros(F.col(on).cast("timestamp_ltz"))
    w = Window.partitionBy(*by).orderBy(on, *tiebreak)
    s = df.select(
        *by,
        cv.alias("__cv"),
        tus.alias("__tus"),
        F.lead(cv).over(w).alias("__cv2"),
        F.lead(tus).over(w).alias("__tus2"),
    )
    numer = F.sum((F.col("__cv") + F.col("__cv2")) * (F.col("__tus2") - F.col("__tus")))
    denom = F.lit(2) * F.sum(F.col("__tus2") - F.col("__tus"))
    return s.groupBy(*by).agg(
        F.count("*").alias("n_points"),
        numer.alias("twa_numer"),
        denom.cast("long").alias("twa_denom"),
        F.when(
            denom > 0,
            numer.cast("double") / denom.cast("double") / scale,
        ).alias("twa"),
    )


def coalesce_intervals(
    df: DataFrame,
    *,
    by: tuple[str, ...],
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """Merge overlapping/touching intervals per key into maximal disjoint
    intervals — the gaps-and-islands union (availability windows, session
    stitching, outage consolidation). An interval starts a new island iff
    its start exceeds the running max end of every earlier interval
    (ordered by (start, end); touching intervals, start == prev end,
    merge — half-open callers should pre-shrink ends by one tick).

    Plan: ONE shuffle — a per-key window sort computes the break flag
    (running max over the preceding frame) and the island id (running sum
    of breaks) on the SAME sort; the island aggregate reuses the key
    partitioning. Never an interval self-join: the sweep is linear in
    |intervals| at any scale, the island id is computed without comparing
    pairs. Ties are safe: equal (start, end) rows see identical preceding
    multisets, so island assignment is order-stable under shuffle
    nondeterminism.

    Output: (by..., island, start, end, n_intervals) with island numbered
    from 0 in time order per key.
    """
    w_prev = (
        Window.partitionBy(*by)
        .orderBy(start_col, end_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(*by)
        .orderBy(start_col, end_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    brk = F.when(
        F.col(start_col) > F.max(end_col).over(w_prev), F.lit(1)
    ).otherwise(F.lit(0))
    islands = df.withColumn("__brk", brk).withColumn(
        "island", F.sum("__brk").over(w_run).cast("long")
    )
    return islands.groupBy(*by, "island").agg(
        F.min(start_col).alias("start"),
        F.max(end_col).alias("end"),
        F.count("*").alias("n_intervals"),
    )


def prorate_daily(
    df: DataFrame,
    *,
    start_us: str = "start_us",
    end_us: str = "end_us",
    amount_col: str = "cents",
    id_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Calendarize intervals: split each [start, end) interval's amount
    across the UTC days it covers, proportional to overlap duration —
    the revenue-recognition / capacity-accounting proration every
    billing warehouse runs.

    Exactness: the per-(row, day) share is floor(amount · 1e6 ·
    overlap_us / total_us) micro-units, computed with DECIMAL(38,0)
    products and an exact floor-div (the raw product overflows int64 at
    day-scale intervals), so shares are identical integers on any
    engine; the <= 1e6·amount truncation dust per row is the documented
    cost of integer determinism (largest-remainder redistribution is a
    window away if a caller needs shares to sum exactly).

    Plan: pure map-side expansion — day indices come from integer
    division of the epoch bounds and a `sequence()` explode (an interval
    touching k days emits k rows; no join, no shuffle); the usual
    per-day rollup then aggregates on the day key. Zero-length
    intervals (end == start) have no duration to prorate and are
    dropped.

    Output: (id_cols..., day_idx, overlap_us, share_micro) with day_idx
    = days since 1970-01-01 UTC.
    """
    day_us = 86_400_000_000
    s, e = F.col(start_us), F.col(end_us)
    d0 = F.floor(s / day_us)
    d1 = F.floor((e - 1) / day_us)
    rows = (
        df.where(e > s)
        .select(
            *id_cols,
            s.alias("__s"),
            e.alias("__e"),
            F.col(amount_col).alias("__amt"),
            F.explode(F.sequence(d0, d1)).alias("day_idx"),
        )
    )
    ov = F.least(F.col("__e"), (F.col("day_idx") + 1) * day_us) - F.greatest(
        F.col("__s"), F.col("day_idx") * day_us
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    num = dec(F.col("__amt")) * F.lit(1_000_000).cast("decimal(38,0)") * dec(ov)
    den = dec(F.col("__e") - F.col("__s"))
    return rows.select(
        *id_cols,
        "day_idx",
        ov.alias("overlap_us"),
        ((num - num % den) / den).cast("long").alias("share_micro"),
    )


def interval_subtract(
    base: DataFrame,
    holes: DataFrame,
    *,
    by: tuple[str, ...],
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """Per-key interval-set DIFFERENCE base − holes: the parts of each
    base interval NOT covered by any hole interval (expected-uptime
    minus observed-heartbeats = outage windows; licensed-range minus
    embargoes = servable ranges). Half-open [start, end) semantics;
    empty results (fully covered keys) simply emit nothing.

    Plan: both sides collapse through :func:`coalesce_intervals` (one
    keyed window each), then ONE sweep: the union of boundary events is
    window-sorted per key, running coverage counters for base/hole
    decide for every elementary segment whether base is active and no
    hole is — linear in |boundaries|, never a base×holes interval join
    (which is quadratic per key and unbounded under overlap). The same
    keyed (partition, order) pair carries the whole sweep: one shuffle
    per side + one for the union.
    """
    # Empty/inverted intervals (end <= start) are meaningless under
    # half-open semantics but would survive coalesce_intervals and emit
    # their -1 boundary event BEFORE their +1 in the sweep, corrupting
    # the running coverage counters (a covered segment could be emitted
    # as uncovered). Drop them up front; the SQL oracles mirror this.
    base = base.where(F.col(end_col) > F.col(start_col))
    holes = holes.where(F.col(end_col) > F.col(start_col))
    b = coalesce_intervals(base, by=by, start_col=start_col, end_col=end_col)
    h = coalesce_intervals(holes, by=by, start_col=start_col, end_col=end_col)

    def events(df: DataFrame, delta_col: str, other: str) -> DataFrame:
        return df.select(
            *by,
            F.explode(
                F.array(
                    F.struct(
                        F.col("start").alias("t"), F.lit(1).alias(delta_col),
                        F.lit(0).alias(other),
                    ),
                    F.struct(
                        F.col("end").alias("t"), F.lit(-1).alias(delta_col),
                        F.lit(0).alias(other),
                    ),
                )
            ).alias("e"),
        ).select(*by, "e.t", f"e.{delta_col}", f"e.{other}")

    ev = events(b, "db", "dh").unionByName(events(h, "dh", "db"))
    # at one timestamp: apply hole-opens and base-opens before closes is
    # unnecessary after coalescing (no zero-length islands), but the sum
    # over ALL events at time t must be complete before the segment
    # [t, next_t) is classified — hence range frame on t, not row frame
    w_cum = (
        Window.partitionBy(*by)
        .orderBy("t")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = Window.partitionBy(*by).orderBy("t")
    seg = (
        ev.groupBy(*by, "t")
        .agg(F.sum("db").alias("db"), F.sum("dh").alias("dh"))
        .select(
            *by,
            "t",
            F.sum("db").over(w_cum).alias("n_base"),
            F.sum("dh").over(w_cum).alias("n_hole"),
        )
        .withColumn("t_next", F.lead("t").over(w_next))
    )
    kept = seg.filter(
        (F.col("n_base") > 0)
        & (F.col("n_hole") == 0)
        & F.col("t_next").isNotNull()
        & (F.col("t_next") > F.col("t"))
    ).select(*by, F.col("t").alias("start"), F.col("t_next").alias("end"))
    # adjacent kept segments can touch (a hole ended exactly where
    # another began is impossible post-coalesce, but a base boundary
    # inside an uncovered stretch splits segments) — re-coalesce to
    # maximal intervals
    return coalesce_intervals(
        kept, by=by, start_col="start", end_col="end"
    ).select(*by, "start", "end")
