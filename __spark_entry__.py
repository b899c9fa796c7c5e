"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementations live in ``database_collector_spark.workloads`` (and the
operator modules it calls); this file is the thin driver-facing shim.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from database_collector_spark import (
    workloads,
    workloads2,
    workloads3,
    workloads4,
    workloads5,
    workloads_ext,
    workloads_ts,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return workloads.q_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 + extensions."""
    return {
        **workloads.QUERIES,
        **workloads2.QUERIES2,
        **workloads3.QUERIES3,
        **workloads4.QUERIES4,
        **workloads5.QUERIES5,
        **workloads_ext.QUERIES_EXT,
        **workloads_ts.QUERIES_TS,
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each ``queries()`` entry."""
    return {
        **workloads.ORACLES,
        **workloads2.ORACLES2,
        **workloads3.ORACLES3,
        **workloads4.ORACLES4,
        **workloads5.ORACLES5,
        **workloads_ext.ORACLES_EXT,
        **workloads_ts.ORACLES_TS,
    }
