"""Live JDBC round-trip for the catalog-scraper reader (SURVEY.md §2.1).

The reference's scrapers run real SQL over a real connection
(collector/exporters/mysql/mysql-exporter.go:72-92); the sandbox has no
MySQL/Postgres/Oracle server, so this exercises the identical Spark code
path — spark.read.format("jdbc") with full-query pushdown, single
partition, credential options — against the Derby embedded engine that
ships on Spark's own classpath (derby*.jar, bundled for the Hive
metastore). In local mode the in-memory database lives in the same JVM
the executor threads share, so the read is a genuine JDBC fetch through
java.sql.DriverManager, not a mock.
"""

from __future__ import annotations

import glob
import os

import pytest
import pyspark

from database_collector_spark.sources.jdbc import read_catalog_query

DERBY_URL = "jdbc:derby:memory:catalogdb;create=true"

_has_derby = bool(
    glob.glob(os.path.join(os.path.dirname(pyspark.__file__), "jars", "derby-*.jar"))
)
pytestmark = pytest.mark.skipif(not _has_derby, reason="no derby jar on classpath")


def _seed(spark):
    """Create a K/V status table shaped like SHOW GLOBAL STATUS output."""
    jvm = spark.sparkContext._jvm
    conn = jvm.java.sql.DriverManager.getConnection(DERBY_URL)
    st = conn.createStatement()
    try:
        st.executeUpdate(
            "CREATE TABLE global_status "
            "(variable_name VARCHAR(64), variable_value VARCHAR(1024))"
        )
    except Exception:
        pass  # already seeded by a previous test in this JVM
    else:
        for name, value in [
            ("Threads_connected", "42"),
            ("Uptime", "123456"),
            ("Slave_running", "ON"),
            ("Rsa_public_key", "-----BEGIN PUBLIC KEY-----"),
        ]:
            st.executeUpdate(
                f"INSERT INTO global_status VALUES ('{name}', '{value}')"
            )
    st.close()
    conn.close()


def test_catalog_query_round_trip(spark):
    _seed(spark)
    df = read_catalog_query(
        spark,
        engine="derby",
        username="app",
        password="",
        query="SELECT variable_name, variable_value FROM global_status",
        url=DERBY_URL,
    )
    got = {r["VARIABLE_NAME"]: r["VARIABLE_VALUE"] for r in df.collect()}
    assert got["Threads_connected"] == "42"
    assert got["Rsa_public_key"].startswith("-----BEGIN")
    assert df.rdd.getNumPartitions() == 1  # the 1-connection budget


def test_catalog_query_pushdown_filters_remotely(spark):
    _seed(spark)
    df = read_catalog_query(
        spark,
        engine="derby",
        username="app",
        password="",
        query=(
            "SELECT variable_name, variable_value FROM global_status "
            "WHERE variable_name LIKE 'Threads%'"
        ),
        url=DERBY_URL,
    )
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["VARIABLE_NAME"] == "Threads_connected"


def test_run_once_derby_fanout_fail_soft(spark):
    """Full multi-target tick over LIVE JDBC: three targets, each its own
    in-memory Derby database, one with an unreachable URL. The healthy
    targets' frames union into the sink (per-target isolation: each row
    carries its own identifier label) and the broken target fail-softs
    into a CollectResult.error instead of killing the tick — the
    goroutine-per-target + continue-on-error shape of the reference
    (database-collector.go:214-222)."""
    from pyspark.sql import Row

    from database_collector_spark.model.schemas import SOURCES_REGISTRY_SCHEMA
    from database_collector_spark.pipeline import run_once

    jvm = spark.sparkContext._jvm
    for host, statuses in [("fan1", ["ACTIVE", "ACTIVE", "IDLE"]), ("fan3", ["IDLE"])]:
        conn = jvm.java.sql.DriverManager.getConnection(
            f"jdbc:derby:memory:{host};create=true"
        )
        st = conn.createStatement()
        try:
            st.executeUpdate("CREATE TABLE scrape (status VARCHAR(16))")
        except Exception:
            pass
        else:
            for s in statuses:
                st.executeUpdate(f"INSERT INTO scrape VALUES ('{s}')")
        st.close()
        conn.close()

    registry = spark.createDataFrame(
        [
            Row(
                secret_name=f"db-{h}",
                engine="mysql",
                host=h,
                port=5432,
                # Derby resolves the connection's username as the default
                # schema; "app" matches the APP schema the seeder wrote to
                username="app",
                password="",
                dbname="d",
                tags={"database-collector:enabled": "true"},
            )
            # fan2 was never created and its URL has no ;create=true ->
            # DriverManager raises at load() time (schema resolution)
            for h in ("fan1", "fan2", "fan3")
        ],
        SOURCES_REGISTRY_SCHEMA,
    )

    config = """
[[metric]]
context = "sessions"
labels = ["status"]
metricsdesc = { active = "sessions by status" }
request = "SELECT status, CAST(COUNT(*) AS DOUBLE) AS active FROM scrape GROUP BY status"
"""

    def scrape_fn(spark_, target, request):
        df = read_catalog_query(
            spark_,
            engine="derby",
            username=target["username"],
            password=target["password"],
            query=request,
            url=f"jdbc:derby:memory:{target['host']}",
        )
        return df.toDF(*[c.lower() for c in df.columns])

    collected = []
    results = run_once(
        spark,
        registry,
        {"mysql": config},
        scrape_fn,
        sink_fn=lambda df: collected.extend(df.collect()),
        anchor_ts="2024-06-01 00:00:00",
    )

    by_target = {r.target: r for r in results}
    assert set(by_target) == {"db-fan1", "db-fan2", "db-fan3"}
    assert by_target["db-fan2"].error is not None  # fail-soft, not fatal
    assert by_target["db-fan1"].error is None and by_target["db-fan3"].error is None
    # healthy targets only, each row tagged with its own identifier
    idents = {r["labels"]["identifier"] for r in collected}
    assert idents == {"fan1", "fan3"}
    # fan1: ACTIVE + IDLE groups; fan3: IDLE only
    vals = {
        (r["labels"]["identifier"], r["labels"]["status"]): r["value"]
        for r in collected
    }
    assert vals[("fan1", "ACTIVE")] == 2.0
    assert vals[("fan1", "IDLE")] == 1.0
    assert vals[("fan3", "IDLE")] == 1.0
    assert len(collected) == 3


def test_kv_parse_over_live_jdbc(spark):
    """The full scraper path: live JDBC fetch -> numeric K/V parse."""
    from pyspark.sql import functions as F

    from database_collector_spark.operators.kv import parse_numeric

    _seed(spark)
    kv = read_catalog_query(
        spark,
        engine="derby",
        username="app",
        password="",
        query="SELECT variable_name, variable_value FROM global_status",
        url=DERBY_URL,
    ).select(
        F.col("VARIABLE_NAME").alias("variable_name"),
        F.col("VARIABLE_VALUE").alias("variable_value"),
    )
    out = {r["name"]: r["value"] for r in parse_numeric(kv).collect()}
    assert out["mysql_global_status_threads_connected"] == 42.0
    assert out["mysql_global_status_slave_running"] == 1.0
    assert "mysql_global_status_rsa_public_key" not in out
