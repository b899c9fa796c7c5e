"""Parquet/table sink for enriched time-series (testing + lake landing).

The reference only ships to Prometheus remote-write; a Spark-native engine
also lands the long-format frame in columnar storage. Partitioning policy
for 100 TB of metrics: partition by event date (low cardinality, prunes
time-range queries), never by metric name or label values (unbounded
cardinality -> small-file explosion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_timeseries(
    df: DataFrame,
    path: str,
    *,
    mode: str = "append",
    partition_by_date: bool = True,
) -> None:
    out = df
    writer = None
    if partition_by_date:
        out = df.withColumn("ds", F.to_date("ts"))
        writer = out.write.partitionBy("ds")
    else:
        writer = out.write
    writer.mode(mode).parquet(path)


def read_timeseries(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)
