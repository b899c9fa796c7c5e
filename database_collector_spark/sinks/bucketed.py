"""Bucketed-table sink: shuffle-free co-located joins at rest.

At 100 TB the dominant recurring cost of a star-join pipeline is
re-shuffling the fact table on the join key every run. Bucketing spends
that shuffle ONCE at write time: both sides stored bucketed (and
sort-bucketed) on the key into the same bucket count join with zero
Exchange — each task zips bucket i with bucket i. This module is the
write-side half; the plan assertion lives in
tests/test_bucketed.py::test_bucketed_join_has_no_exchange.

Bucket-count choice is a contract, not a tunable: both sides must agree,
and the count bounds write parallelism (one file per bucket per writing
task) — pick ~(table size / target partition size) rounded to a power of
two, and keep it stable across runs or every reader falls back to a
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_col: str,
    n_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed+sorted managed table on ``bucket_col``.

    sortBy matters as much as bucketBy: bucketed-and-sorted sides let
    Catalyst pick sort-merge join with BOTH the Exchange and the Sort
    elided — the read side streams pre-sorted bucket files.

    The pre-write repartition onto the bucket key is load-bearing: sort
    elision requires ONE file per bucket (multiple writer tasks touching
    a bucket each leave their own file, and the reader cannot assume a
    global order across files, so it re-sorts). repartition and bucketBy
    share Spark's Murmur3 hash partitioning, so with n_buckets write
    partitions every task owns exactly one whole bucket — which also
    caps the file count at n_buckets instead of tasks x buckets.

    Read side: Exchange elision is automatic; Sort elision additionally
    needs ``spark.sql.legacy.bucketedTableScan.outputOrdering=true``
    (since Spark 3.0 scans hide their sort order by default, because a
    many-files-per-bucket table would serialize its scan to honor it —
    the one-file-per-bucket layout written here is the case the flag is
    for)."""
    from pyspark.sql import functions as F

    (
        df.repartition(n_buckets, F.col(bucket_col))
        .write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
