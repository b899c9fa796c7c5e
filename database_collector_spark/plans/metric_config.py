"""Declarative metric config -> DataFrame pipeline (SURVEY.md §2.11, §7.1#4).

The reference's only extension point is the Oracle custom-metrics TOML
(collector/exporters/oracle/custom-metrics.toml, wired at
oracle-exporter.go:23): *"run this SQL, expose these columns as labels,
these as values."* Fields: ``context`` (metric prefix), ``metricsdesc``
(value column -> help text), ``request`` (SQL), ``labels`` (label columns),
optional ``metricstype``.

This compiler subsumes every scraper in SURVEY §2.1: each catalog query is
an entry whose request runs via JDBC pushdown (or against a registered view
in tests), and whose result is melted into the canonical long-format metric
frame — one row per (label-tuple, value-column).
"""

from __future__ import annotations

import tomllib
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class MetricSpec:
    context: str
    request: str
    metricsdesc: dict[str, str]
    labels: list[str] = field(default_factory=list)
    metricstype: dict[str, str] = field(default_factory=dict)

    def metric_name(self, value_col: str) -> str:
        # '<context>_<valuecol>' — e.g. long_running_sessions_session_duration_hours
        return f"{self.context}_{value_col.lower()}"


def load_specs(toml_text: str) -> list[MetricSpec]:
    doc = tomllib.loads(toml_text)
    specs = []
    for entry in doc.get("metric", []):
        specs.append(
            MetricSpec(
                context=entry["context"],
                request=entry["request"],
                metricsdesc=dict(entry.get("metricsdesc", {})),
                labels=list(entry.get("labels", [])),
                metricstype=dict(entry.get("metricstype", {})),
            )
        )
    return specs


def load_specs_file(path: str) -> list[MetricSpec]:
    with open(path, "r", encoding="utf-8") as f:
        return load_specs(f.read())


def melt_to_samples(result: DataFrame, spec: MetricSpec) -> DataFrame:
    """Query result -> one sample row per (row, value column).

    The melt is a union of narrow projections: one pass over the query
    result per value column, no shuffle, no UDF.
    """
    label_map = (
        F.create_map(
            *[
                x
                for lbl in spec.labels
                for x in (F.lit(lbl), F.col(lbl).cast("string"))
            ]
        )
        if spec.labels
        else F.create_map().cast("map<string,string>")
    )
    parts = []
    for value_col in spec.metricsdesc:
        mtype = spec.metricstype.get(value_col, "gauge").upper()
        parts.append(
            result.select(
                F.lit(spec.metric_name(value_col)).alias("name"),
                F.lit(mtype).alias("metric_type"),
                label_map.alias("labels"),
                F.col(value_col).cast("double").alias("value"),
                F.lit(None).cast("timestamp").alias("ts"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def run_config(
    spark: SparkSession,
    toml_text: str,
    sources: dict[str, DataFrame],
) -> DataFrame:
    """All specs in a config -> one long-format frame.

    ``sources`` maps view-name -> input DataFrame (scraped or fixture);
    each spec's ``request`` references those view names. Mirrors the
    reference lifecycle: each spec's request is one catalog query; results
    are unioned into the per-target scrape payload.
    """
    for view, df in sources.items():
        df.createOrReplaceTempView(view)
    frames = []
    for spec in load_specs(toml_text):
        result = spark.sql(spec.request)
        frames.append(melt_to_samples(result, spec))
    out = frames[0]
    for f_ in frames[1:]:
        out = out.unionByName(f_)
    return out
