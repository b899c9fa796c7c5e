"""SparkSession factory tuned for this engine.

Local testing runs on local[N]; the same settings are what we would ship to a
1000-executor cluster, minus the memory knobs: AQE on (runtime re-planning,
skew-join splitting, partition coalescing), shuffle partitions sized to the
cluster, Arrow enabled for the pandas-UDF slow path, UTC session timezone so
timestamp semantics are engine-independent.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "database-collector-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    At 100 TB, ``spark.sql.shuffle.partitions`` should be ~2-3x total cores
    and AQE coalesces the tail; locally we match core count so small-SF tests
    don't pay 200-partition scheduling overhead.

    Cluster-side knobs deliberately NOT set here (no-ops at fixture
    scale, so any local "win" from them would be untestable): raise
    ``spark.sql.files.maxPartitionBytes`` toward 512m-1g for large
    sequential parquet scans (fewer map tasks feeding each shuffle) and
    consider ``spark.io.compression.codec=zstd`` for shuffle-heavy jobs
    (better ratio than lz4 for a bit more CPU — measure shuffle bytes
    vs stage time on the real corpus first). Pass them via
    ``extra_conf`` in a cluster deployment.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # InferFiltersFromGenerate substitutes the full generator expression
        # into an inferred size()>0 predicate and pushes it below exchanges —
        # for the shingle pipeline that re-evaluates the whole
        # transform/array_distinct chain at scan parallelism (measured 6.7 s
        # of an 8 s explode stage at sf0.1; see operators/dedup.py). Every
        # explode in this engine already guards its input explicitly, so the
        # inferred predicate is redundant here. Set at session build (not
        # per-query) because optimizer rules apply at ACTION time — a
        # save-and-restore around lazy plan construction would not govern
        # execution, and a hidden per-operator setter would make unrelated
        # plans order-dependent.
        .config("spark.sql.optimizer.excludedRules",
                "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
        # Some events.parquet fixture generations carry TIMESTAMP(NANOS),
        # which Spark only reads with this flag (surfaced as long; the
        # reader in workloads._t converts back to a timestamp). Harmless
        # for MICROS files — set once here instead of mutating session
        # conf inside a table reader (hidden side effect, not thread-safe).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Python DataSource filter pushdown (sources/prom_source.py
        # consumes EqualTo('name') at parse time)
        .config("spark.sql.python.filterPushdown.enabled", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...]) -> dict:
    """Read the driver-generated parquet tables for a scale factor."""
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}
