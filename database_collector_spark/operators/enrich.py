"""Label enrichment — the reference's central transform (SURVEY.md §2.4).

Re-expresses ConvertMetricFamilyToTimeSeries (reference
collector/internal/utils/prometheus.go:22-120) as a narrow, shuffle-free
DataFrame transform:

1. carry the metric name as ``__name__`` (prometheus.go:36-39),
2. keep all source labels (prometheus.go:40-45),
3. append the 5 pipeline labels (prometheus.go:46-65):
   identifier = host truncated at the first '.', job, region, accountId,
   engine,
4. resolve value by metric type (prometheus.go:69-99),
5. stamp now() (or a supplied anchor) when ts is NULL (prometheus.go:27-32).

Histogram/summary handling is dual-mode (SURVEY §2.6): the reference
*flattens* histograms/summaries to a single sample_sum sample (its bucket
loop at prometheus.go:82-87 is overwritten at :101-107); correct mode
explodes buckets into per-`le` series the way a live Prometheus would
scrape them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PIPELINE_JOB = "database-collector"

# Label names the pipeline itself stamps. A scraped/source label with one
# of these names (a TOML spec can declare e.g. an 'engine' label) is
# dropped before the merge: Spark's default mapKeyDedupPolicy=EXCEPTION
# would otherwise abort the whole enrichment batch with
# DUPLICATED_MAP_KEY, and the precedence choice — pipeline identity wins
# over source-declared collisions — must be deliberate, not a session
# config accident. (The reference appends the duplicate label,
# prometheus.go:40-65, producing an invalid duplicate-label series.)
RESERVED_LABELS = ("__name__", "identifier", "job", "region", "accountId", "engine")


def identifier_from_host(host: Column) -> Column:
    """host truncated at the first '.' (prometheus.go:48) — RDS hostname ->
    instance id."""
    return F.split(host, "\\.").getItem(0)


def _source_labels(*also_reserved: str) -> Column:
    """Source label map, null-safe, with reserved (and per-series extra,
    e.g. 'le'/'quantile') keys stripped so map_concat never sees a
    duplicate."""
    reserved = list(RESERVED_LABELS) + list(also_reserved)
    m = F.coalesce(F.col("labels"), F.create_map().cast("map<string,string>"))
    return F.map_filter(m, lambda k, _v: ~k.isin(*reserved))


def enrich(
    samples: DataFrame,
    *,
    host: str,
    engine: str,
    region: str,
    account_id: str,
    job: str = PIPELINE_JOB,
    anchor_ts: str | None = None,
    compat_flatten_histograms: bool = False,
) -> DataFrame:
    """metric samples -> enriched TimeSeries rows (labels, value, ts).

    Input must follow METRIC_SAMPLE_SCHEMA. Pure projection + (in correct
    mode) a generator expression — no shuffle, fully pipelined by
    whole-stage codegen at any scale.

    ``anchor_ts`` pins the now() fallback for deterministic tests; None uses
    current_timestamp() like the reference (prometheus.go:31).
    """
    now = F.lit(anchor_ts).cast("timestamp") if anchor_ts else F.current_timestamp()

    # tolerate scalar-only inputs (e.g. the metric-config compiler emits no
    # histogram columns): absent optional columns become typed NULLs
    optional = {
        "metric_type": "string",
        "buckets": "array<struct<le:double,cumulative_count:bigint>>",
        "quantiles": "array<struct<q:double,value:double>>",
        "sample_sum": "double",
        "sample_count": "bigint",
    }
    for col_name, col_type in optional.items():
        if col_name not in samples.columns:
            samples = samples.withColumn(col_name, F.lit(None).cast(col_type))

    pipeline_labels = F.create_map(
        F.lit("__name__"), F.col("name"),
        F.lit("identifier"), identifier_from_host(F.lit(host)),
        F.lit("job"), F.lit(job),
        F.lit("region"), F.lit(region),
        F.lit("accountId"), F.lit(account_id),
        F.lit("engine"), F.lit(engine),
    )

    scalar_types = ("COUNTER", "GAUGE", "UNTYPED")
    is_scalar = F.upper(F.coalesce(F.col("metric_type"), F.lit("UNTYPED"))).isin(
        *scalar_types
    )

    base = samples.withColumn("__ts", F.coalesce(F.col("ts"), now))

    if compat_flatten_histograms:
        # Reference behavior (prometheus.go:101-107): histograms/summaries
        # emit ONE sample under the bare name with value = sample_sum.
        value = F.when(is_scalar, F.col("value")).otherwise(F.col("sample_sum"))
        return base.select(
            F.map_concat(_source_labels(), pipeline_labels).alias("labels"),
            value.alias("value"),
            F.col("__ts").alias("ts"),
        )

    # Correct mode: scalar samples pass through; histograms explode into
    # `<name>_bucket{le=...}` series plus `_sum`/`_count`; summaries into
    # `{quantile=...}` plus `_sum`/`_count`.
    scalars = base.filter(is_scalar).select(
        F.map_concat(_source_labels(), pipeline_labels).alias("labels"),
        F.col("value"),
        F.col("__ts").alias("ts"),
    )

    def _with_name_and_extra(name_col: Column, extra_key: str | None, extra_val: Column | None) -> Column:
        m = F.map_concat(
            _source_labels(*([extra_key] if extra_key is not None else [])),
            F.create_map(
                F.lit("__name__"), name_col,
                F.lit("identifier"), identifier_from_host(F.lit(host)),
                F.lit("job"), F.lit(job),
                F.lit("region"), F.lit(region),
                F.lit("accountId"), F.lit(account_id),
                F.lit("engine"), F.lit(engine),
            ),
        )
        if extra_key is not None:
            m = F.map_concat(m, F.create_map(F.lit(extra_key), extra_val))
        return m

    hist = base.filter(
        F.upper(F.coalesce(F.col("metric_type"), F.lit(""))) == "HISTOGRAM"
    )
    hist_buckets = hist.select(
        F.explode("buckets").alias("b"), "labels", "__ts", "name"
    ).select(
        _with_name_and_extra(
            F.concat(F.col("name"), F.lit("_bucket")),
            "le",
            F.when(F.col("b.le") == float("inf"), F.lit("+Inf")).otherwise(
                F.col("b.le").cast("string")
            ),
        ).alias("labels"),
        F.col("b.cumulative_count").cast("double").alias("value"),
        F.col("__ts").alias("ts"),
    )
    hist_sum = hist.select(
        _with_name_and_extra(F.concat(F.col("name"), F.lit("_sum")), None, None).alias("labels"),
        F.col("sample_sum").alias("value"),
        F.col("__ts").alias("ts"),
    )
    hist_count = hist.select(
        _with_name_and_extra(F.concat(F.col("name"), F.lit("_count")), None, None).alias("labels"),
        F.col("sample_count").cast("double").alias("value"),
        F.col("__ts").alias("ts"),
    )

    summ = base.filter(
        F.upper(F.coalesce(F.col("metric_type"), F.lit(""))) == "SUMMARY"
    )
    summ_q = summ.select(
        F.explode("quantiles").alias("q"), "labels", "__ts", "name"
    ).select(
        _with_name_and_extra(
            F.col("name"), "quantile", F.col("q.q").cast("string")
        ).alias("labels"),
        F.col("q.value").alias("value"),
        F.col("__ts").alias("ts"),
    )
    summ_sum = summ.select(
        _with_name_and_extra(F.concat(F.col("name"), F.lit("_sum")), None, None).alias("labels"),
        F.col("sample_sum").alias("value"),
        F.col("__ts").alias("ts"),
    )
    summ_count = summ.select(
        _with_name_and_extra(F.concat(F.col("name"), F.lit("_count")), None, None).alias("labels"),
        F.col("sample_count").cast("double").alias("value"),
        F.col("__ts").alias("ts"),
    )

    return (
        scalars.unionByName(hist_buckets)
        .unionByName(hist_sum)
        .unionByName(hist_count)
        .unionByName(summ_q)
        .unionByName(summ_sum)
        .unionByName(summ_count)
    )
