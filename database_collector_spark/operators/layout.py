"""Z-order (Morton) data layout keys for multi-dimensional data skipping.

The 100 TB problem this solves: a table queried by BOTH user and time
can only be range-partitioned on one of them — the other dimension's
min/max footer stats are useless (every file spans the full range).
Sorting by the bit-interleaved Morton key clusters BOTH dimensions at
once: every contiguous key range (= every file written from a
range-partitioned sort) covers a small rectangle of (x, y) space, so
parquet min/max stats prune scans on either predicate. This is the
standard lakehouse OPTIMIZE ZORDER BY technique, expressed as plain
Catalyst bit arithmetic — map-side, codegen'd, no UDF.

The key is exact integer bit-interleaving: bit i of x lands at position
2i, bit i of y at 2i+1 — unrolled into a fixed OR-chain of shift/mask
terms so the whole expression stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of two non-negative ints
    into a single long (x even positions, y odd)."""
    acc = F.lit(0).cast("long")
    xl, yl = x.cast("long"), y.cast("long")
    for i in range(bits):
        acc = acc.bitwiseOR(
            F.shiftleft(F.shiftright(xl, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(yl, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return acc


def zorder_repartition(
    df: DataFrame, x: Column, y: Column, n_files: int, bits: int = 16
) -> DataFrame:
    """The write-path layout: range-partition by the Morton key and sort
    within partitions, so each output file covers one contiguous z-range
    (= one small (x, y) rectangle). Follow with ``.write.parquet`` —
    the per-file min/max stats then skip on either dimension."""
    keyed = df.withColumn("_zkey", zorder_key(x, y, bits))
    return keyed.repartitionByRange(n_files, "_zkey").sortWithinPartitions("_zkey")


def cluster_stats(
    df: DataFrame,
    x: Column,
    y: Column,
    n_buckets: int = 16,
    bits: int = 16,
) -> DataFrame:
    """Locality report for a z-ordered layout: cut the key space into
    ``n_buckets`` fixed-width ranges (a deterministic stand-in for range
    partition boundaries) and report each bucket's row count and per-
    dimension min/max — exactly the footer stats data skipping would
    use. All integer arithmetic; the single one-row max() broadcasts."""
    keyed = df.select(
        x.cast("long").alias("x"), y.cast("long").alias("y")
    ).withColumn("zkey", zorder_key(F.col("x"), F.col("y"), bits))
    zmax = keyed.agg(F.max("zkey").alias("zmax"))
    return (
        keyed.crossJoin(F.broadcast(zmax))
        .withColumn(
            # floor over double is exact here: zkey*n_buckets < 2^53 for
            # bits <= 24, so the double quotient floors identically to
            # integer division in any engine.
            "bucket",
            F.floor(F.col("zkey") * n_buckets / (F.col("zmax") + 1)).cast("long"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
    )
