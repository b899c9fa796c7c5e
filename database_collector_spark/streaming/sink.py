"""Exactly-once-effect streaming sink via foreachBatch + batch-id
partition overwrite.

Structured Streaming's foreachBatch gives AT-LEAST-ONCE: after a crash
between sink write and checkpoint commit, the SAME micro-batch (same
``batch_id``) is delivered again. The standard recipe for an
idempotent-by-construction parquet sink is to make the batch id a
partition column and dynamically overwrite it: a replayed batch
overwrites exactly its own partition — duplicate delivery converges to
one copy, while other batches' partitions are untouched (the same
dynamic-overwrite contract as sinks/parquet.py, keyed by epoch instead
of date).

At 100 TB this also solves the operational half: per-batch partitions
are append-only units that compaction (sinks/parquet.py::
compact_partitions) can later fold, and a poisoned batch is removable by
dropping one directory.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BATCH_COL = "_batch_id"


def idempotent_parquet_sink(path: str) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch`` function writing each micro-batch to
    ``path`` partitioned by batch id with dynamic partition overwrite —
    replay-safe: re-delivering batch N replaces partition N in place."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn(BATCH_COL, F.lit(int(batch_id)))
            .write.partitionBy(BATCH_COL)
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(path)
        )

    return _sink
