"""Per-target JDBC catalog readers (SURVEY.md §2.1 S3-S5, §2.10 fan-out).

The reference opens one DB connection per target and ships scraper SQL
verbatim (goroutine per (secret, engine), database-collector.go:201-226;
Oracle pool clamped to 1 connection, oracle-exporter.go:19-21). The Spark
shape: one ``spark.read.jdbc`` per (target, scraper) with full-query
pushdown — the remote database plans the query, Spark just fetches — and a
driver-side thread pool to overlap the per-target reads, since each
catalog result is tiny and network-latency-bound.

Credentials never appear in plans or logs: they ride in reader options
(redacted by Spark) and are re-resolved from the registry row on every
batch, preserving the reference's rotation-safe per-scrape re-fetch
(database-collector.go:207-212).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from functools import reduce

from pyspark.sql import DataFrame, SparkSession

from database_collector_spark.sources.catalog_queries import select_scrapers

JDBC_URL_TEMPLATES = {
    # DSN shapes from mysql-exporter.go:87, postgres-exporter.go:21,
    # oracle-exporter.go:14 — TLS surfaced as config (default secure; the
    # reference hard-codes sslmode=disable, SURVEY §2.6).
    "mysql": "jdbc:mysql://{host}:{port}/",
    "postgres": "jdbc:postgresql://{host}:{port}/{dbname}",
    "oracle": "jdbc:oracle:thin:@//{host}:{port}/{dbname}",
}


def jdbc_url(engine: str, host: str, port: int, dbname: str | None = None) -> str:
    return JDBC_URL_TEMPLATES[engine].format(host=host, port=port, dbname=dbname or "")


def read_catalog_query(
    spark: SparkSession,
    *,
    engine: str,
    host: str | None = None,
    port: int | None = None,
    username: str,
    password: str,
    dbname: str | None = None,
    query: str,
    query_timeout: int = 10,
    url: str | None = None,
    driver: str | None = None,
) -> DataFrame:
    """One scraper read: full-query pushdown, single partition.

    Catalog results are 10^2-10^4 rows — numPartitions=1 mirrors the
    reference's 1-connection budget and avoids pointless range-splitting;
    queryTimeout mirrors oracle-exporter.go:21.

    ``url`` overrides the engine DSN template for endpoints needing
    custom connection properties (or an embedded engine in tests);
    ``driver`` pins the JDBC driver class when the URL prefix isn't
    auto-registered with java.sql.DriverManager.
    """
    if url is None and (host is None or port is None):
        # fail at the call site, not as an opaque JDBC error against
        # host "None" at .load() time
        raise ValueError("read_catalog_query needs either url or host+port")
    reader = (
        spark.read.format("jdbc")
        .option("url", url or jdbc_url(engine, host, port, dbname))
        .option("query", query)
        .option("user", username)
        .option("password", password)
        .option("numPartitions", 1)
        .option("queryTimeout", query_timeout)
    )
    if driver is not None:
        reader = reader.option("driver", driver)
    return reader.load()


def read_table_partitioned(
    spark: SparkSession,
    *,
    engine: str,
    host: str,
    port: int,
    username: str,
    password: str,
    dbname: str | None,
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int = 32,
    fetchsize: int = 10_000,
    predicate: str | None = None,
) -> DataFrame:
    """Range-partitioned parallel JDBC ingest — the scale path the tiny
    catalog scrapers (read_catalog_query) deliberately avoid.

    Spark splits [lower_bound, upper_bound] on ``partition_column`` into
    ``num_partitions`` stride ranges and opens that many concurrent
    connections, each issuing ``WHERE pc >= lo AND pc < hi`` — so the
    remote database does a clustered range scan per worker instead of
    one connection streaming the whole table through the driver's
    bandwidth. Caveats that matter at scale, encoded here as the
    argument contract:

    * partition_column must be indexed/clustered and roughly uniform —
      bounds come from ``SELECT min(pc), max(pc)`` (run it first; a
      stale upper_bound silently drops no rows but skews the last
      stride with everything above it);
    * num_partitions is simultaneously the remote connection count —
      size it against the database's connection budget, not the
      cluster's core count;
    * ``predicate`` pushes an extra WHERE verbatim into every range
      query (partition pruning at the source, e.g. an updated_at
      incremental bound).
    """
    src = f"(SELECT * FROM {table} WHERE {predicate}) sub" if predicate else table
    return (
        spark.read.format("jdbc")
        .option("url", jdbc_url(engine, host, port, dbname))
        .option("dbtable", src)
        .option("user", username)
        .option("password", password)
        .option("partitionColumn", partition_column)
        .option("lowerBound", lower_bound)
        .option("upperBound", upper_bound)
        .option("numPartitions", num_partitions)
        .option("fetchsize", fetchsize)
        .load()
    )


def scrape_target(
    spark: SparkSession,
    target: dict,
    requested: list[str] | None = None,
) -> dict[str, DataFrame]:
    """All enabled scrapers for one registry row -> {scraper: DataFrame}."""
    engine = target["route"]
    return {
        name: read_catalog_query(
            spark,
            engine=engine,
            host=target["host"],
            port=target["port"],
            username=target["username"],
            password=target["password"],
            dbname=target.get("dbname"),
            query=sql,
        )
        for name, sql in select_scrapers(engine, requested).items()
    }


def union_all(frames: list[DataFrame]) -> DataFrame:
    """unionByName fold for per-target frames of identical schema."""
    return reduce(lambda a, b: a.unionByName(b), frames)


def parallel_collect_counts(frames: dict[str, DataFrame], max_workers: int = 8) -> dict[str, int]:
    """Driver-side thread pool to overlap latency-bound JDBC reads —
    the Spark analog of the reference's goroutine-per-target fan-out
    (database-collector.go:190-230). Each submitted action is an
    independent Spark job; the scheduler interleaves them."""
    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        futs = {name: ex.submit(df.count) for name, df in frames.items()}
        return {name: f.result() for name, f in futs.items()}
