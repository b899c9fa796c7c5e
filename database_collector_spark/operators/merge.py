"""Latest-wins merge (SCD type 1 upsert) — the MERGE INTO shape a
mutable-snapshot pipeline needs, expressed without a lake format.

The reference re-reads its whole registry every tick (SURVEY.md §2.2
immutable-snapshot model); a 100 TB lake cannot — it merges deltas. The
canonical Spark-native form is NOT a full-outer join (two sorted sides +
null-merging logic): union the base and the delta with a source flag and
elect one winner per key with a row_number window — ONE shuffle on the
key, winner = highest version, delta beating base on ties. The same
partitioning feeds a partitioned-overwrite sink (sinks/parquet.py), which
is exactly how MERGE INTO compiles in Delta/Iceberg's copy-on-write mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd1_merge(
    base: DataFrame,
    delta: DataFrame,
    *,
    key: str,
    version_col: str,
) -> DataFrame:
    """Upsert ``delta`` into ``base``: per key, keep the row with the
    highest ``version_col``; on version ties the delta row wins (the
    re-delivered-update idempotency rule). Columns must match
    (unionByName). Output schema = input schema.

    The tag/rank helper columns use reserved ``__scd_*__`` names and are
    asserted absent from the input — ``withColumn`` silently REPLACES an
    existing column, so a bare ``_src``/``_rn`` would corrupt user data
    carrying those names before the final drop."""
    src_tag, rank = "__scd_src__", "__scd_rn__"
    clash = {src_tag, rank} & set(base.columns) | {src_tag, rank} & set(
        delta.columns
    )
    assert not clash, f"reserved merge helper column(s) present in input: {clash}"
    tagged = base.withColumn(src_tag, F.lit(0)).unionByName(
        delta.withColumn(src_tag, F.lit(1))
    )
    w = Window.partitionBy(key).orderBy(
        F.col(version_col).desc(), F.col(src_tag).desc()
    )
    return (
        tagged.withColumn(rank, F.row_number().over(w))
        .filter(F.col(rank) == 1)
        .drop(rank, src_tag)
    )
