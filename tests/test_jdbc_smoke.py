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
