"""K/V catalog-row operators (SURVEY.md §1.1, §2.1 S3).

The MySQL scrapers the reference enables (collector/exporters/mysql/
mysql-exporter.go:13-14) consume SHOW GLOBAL STATUS / VARIABLES rows:
``(variable_name, variable_value)`` with dynamically-typed string values.
Upstream mysqld_exporter's public behavior: attempt numeric parse; map
a known set of state words (ON/OFF/Yes/No/...) to 0/1; drop the rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Public mysqld_exporter state-word mapping (upstream behavior; the
# reference pins v0.16.0 at collector/go.mod:20). Note 'connecting' maps
# to 0: upstream treats Slave_IO_Running='Connecting' as NOT running —
# replication health must not read healthy while the IO thread is still
# trying to reach the primary.
_TRUTHY = ("on", "yes", "true", "primary")
_FALSY = ("off", "no", "false", "null", "-1", "disabled", "connecting")


def parse_numeric(kv: DataFrame, *, name_prefix: str = "mysql_global_status_") -> DataFrame:
    """K/V rows -> long-format metric samples; non-numeric rows dropped.

    try_cast (not cast) because ANSI mode must not abort the scrape on the
    TLS-key-style junk values a real catalog contains.
    """
    lv = F.lower(F.col("variable_value"))
    value = (
        F.when(lv.isin(*_TRUTHY), F.lit(1.0))
        .when(lv.isin(*_FALSY), F.lit(0.0))
        .otherwise(F.col("variable_value").try_cast("double"))
    )
    return (
        kv.select(
            F.concat(F.lit(name_prefix), F.lower(F.col("variable_name"))).alias("name"),
            value.alias("value"),
        )
        .filter(F.col("value").isNotNull())
    )


def pivot_wide(kv: DataFrame, names: list[str]) -> DataFrame:
    """Long K/V -> one wide row (the SHOW SLAVE STATUS shape, F3).

    ``names`` must be the explicit pivot list: at 100 TB an implicit pivot
    would first run a distinct-values job over the whole input; pinning the
    columns keeps this a single pass.

    The cell aggregate is MIN, not first(): first() is whichever partition
    reports first, so duplicate variable_name rows (e.g. a unioned
    multi-source scrape) would make repeated runs disagree and break any
    differential hash downstream.
    """
    return (
        kv.groupBy()
        .pivot("variable_name", names)
        .agg(F.min("variable_value"))
    )
