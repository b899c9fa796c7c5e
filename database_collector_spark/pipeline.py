"""Batch collection lifecycle — the §3.1 equivalent, Spark-first.

Reference flow (collector/cmd/collector/database-collector.go:239-287):
cron tick -> list secrets -> per-target goroutine -> scrape -> convert ->
remote-write. Spark flow: registry DataFrame -> discover() -> per-target
scrape (JDBC pushdown, or pre-scraped fixture frames in tests) -> declarative
metric-config melt -> enrich() -> union -> sink. The driver loop below is
the cron stand-in (CRON_SCHEDULE / @every 5m semantics,
database-collector.go:268-280); each tick is one self-contained Spark batch,
which is exactly what a Lambda-triggered run is too (§3.2 —
``run_once`` == one invocation).

Credentials are re-read from the registry row every tick (rotation-safe,
database-collector.go:207-212) and never appear in plans or logs.
"""

from __future__ import annotations

import time
import warnings
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from database_collector_spark.operators.enrich import enrich
from database_collector_spark.plans.metric_config import load_specs, melt_to_samples
from database_collector_spark.sources.registry import (
    MAX_TARGETS,
    discover,
    overflow_count,
)


@dataclass
class CollectResult:
    target: str
    engine: str
    n_series: int
    error: str | None = None  # fail-soft: set when this target's scrape failed


def collect_target(
    spark: SparkSession,
    target_row: dict,
    config_toml: str,
    scrape_fn: Callable[[SparkSession, dict, str], DataFrame],
    *,
    region: str,
    account_id: str,
    anchor_ts: str | None = None,
    compat_flatten_histograms: bool = False,
) -> DataFrame:
    """One target, one tick: run every metric spec's request through
    ``scrape_fn`` (JDBC pushdown in production, fixture lookup in tests),
    melt to long-format samples, enrich with the five pipeline labels."""
    frames = []
    for spec in load_specs(config_toml):
        result = scrape_fn(spark, target_row, spec.request)
        frames.append(melt_to_samples(result, spec))
    samples = frames[0]
    for f in frames[1:]:
        samples = samples.unionByName(f)
    return enrich(
        samples,
        host=target_row["host"],
        engine=target_row["route"],
        region=region,
        account_id=account_id,
        anchor_ts=anchor_ts,
        compat_flatten_histograms=compat_flatten_histograms,
    )


def run_once(
    spark: SparkSession,
    registry: DataFrame,
    config_by_engine: dict[str, str],
    scrape_fn: Callable[[SparkSession, dict, str], DataFrame],
    sink_fn: Callable[[DataFrame], None],
    *,
    region: str = "us-west-2",
    account_id: str = "000000000000",
    anchor_ts: str | None = None,
) -> list[CollectResult]:
    """One collection tick over the whole registry.

    Targets fan out as independent Spark jobs (the scheduler interleaves
    them — the goroutine-per-target analog); the per-target frames union
    into one sink write so the remote-write POSTs batch per partition, not
    per target.

    Per-target failures are FAIL-SOFT, matching the reference (a broken
    target logs and the loop continues to the next one,
    collector/cmd/collector/database-collector.go:214-222): the failing
    target's CollectResult carries the error and its frame is excluded
    from the union. JDBC failures surface here because Spark's jdbc
    reader connects eagerly at load() to resolve the schema — the same
    point the reference's sql.Open/Ping fails.
    """
    targets = [r.asDict() for r in discover(registry).collect()]
    # the driver-side target list is bounded by discover()'s page cap
    # (reference parity, MaxResults=100) — but a larger registry must not
    # TRUNCATE silently: when the capped listing comes back full, count
    # the uncapped eligibles and warn about the dropped remainder
    if len(targets) >= MAX_TARGETS:
        dropped = overflow_count(registry)
        if dropped:
            warnings.warn(
                f"registry holds {MAX_TARGETS + dropped} enabled targets; "
                f"page cap {MAX_TARGETS} drops {dropped} this tick (first "
                f"{MAX_TARGETS} by secret_name collected). Raise "
                "discover(max_targets=...) or shard the registry.",
                RuntimeWarning,
                stacklevel=2,
            )
    results: list[CollectResult] = []
    union_df: DataFrame | None = None
    for t in targets:
        config = config_by_engine.get(t["route"])
        if config is None:
            continue
        try:
            df = collect_target(
                spark,
                t,
                config,
                scrape_fn,
                region=region,
                account_id=account_id,
                anchor_ts=anchor_ts,
            )
        except Exception as exc:  # noqa: BLE001 — any one target must not kill the tick
            results.append(
                CollectResult(
                    t["secret_name"],
                    t["route"],
                    -1,
                    error=f"{type(exc).__name__}: {exc}",
                )
            )
            continue
        results.append(CollectResult(t["secret_name"], t["route"], -1))
        union_df = df if union_df is None else union_df.unionByName(df)
    if union_df is not None:
        sink_fn(union_df)
    return results


def run_loop(
    tick_fn: Callable[[], None],
    *,
    interval_s: float = 300.0,
    max_ticks: int | None = None,
    sleep=time.sleep,
) -> int:
    """The cron stand-in: @every 5m default (database-collector.go:271).
    ``max_ticks`` bounds test runs; production passes None and stops on
    signal."""
    ticks = 0
    while max_ticks is None or ticks < max_ticks:
        tick_fn()
        ticks += 1
        if max_ticks is not None and ticks >= max_ticks:
            break
        sleep(interval_s)
    return ticks
