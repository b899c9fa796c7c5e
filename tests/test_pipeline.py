"""End-to-end batch lifecycle (§3.1 analog) + stateful streaming op."""

from __future__ import annotations

import datetime as dt
import json
import tempfile

from pyspark.sql import Row
from pyspark.sql import functions as F

from database_collector_spark.model.schemas import SOURCES_REGISTRY_SCHEMA
from database_collector_spark.pipeline import run_loop, run_once

CONFIG = """
[[metric]]
context = "sessions"
labels = ["status"]
metricsdesc = { active = "sessions by status" }
request = "SELECT status, CAST(COUNT(*) AS DOUBLE) AS active FROM scrape GROUP BY status"
"""


def _registry(spark):
    rows = [
        Row(
            secret_name=f"db-{e}",
            engine=e,
            host=f"{e}-host.cluster.rds.amazonaws.com",
            port=5432,
            username="u",
            password="p",
            dbname="d",
            tags={"database-collector:enabled": "true"},
        )
        for e in ("mysql", "postgres", "oracle-ee")
    ]
    return spark.createDataFrame(rows, SOURCES_REGISTRY_SCHEMA)


def test_run_once_scrapes_all_targets(spark):
    def scrape_fn(spark_, target, request):
        fixture = spark_.createDataFrame(
            [Row(status="ACTIVE"), Row(status="ACTIVE"), Row(status="IDLE")]
        )
        fixture.createOrReplaceTempView("scrape")
        return spark_.sql(request)

    collected = []

    results = run_once(
        spark,
        _registry(spark),
        {e: CONFIG for e in ("mysql", "postgres", "oracle")},
        scrape_fn,
        sink_fn=lambda df: collected.extend(df.collect()),
        anchor_ts="2024-06-01 00:00:00",
    )
    assert {r.target for r in results} == {"db-mysql", "db-postgres", "db-oracle-ee"}
    # 3 targets x 2 status groups
    assert len(collected) == 6
    engines = {r["labels"]["engine"] for r in collected}
    assert engines == {"mysql", "postgres", "oracle"}  # alias normalized
    idents = {r["labels"]["identifier"] for r in collected}
    assert idents == {"mysql-host", "postgres-host", "oracle-ee-host"}
    assert all(
        r["labels"]["__name__"] == "sessions_active" for r in collected
    )


def test_run_loop_ticks_bounded():
    ticks = []
    slept = []
    n = run_loop(
        lambda: ticks.append(1),
        interval_s=300,
        max_ticks=3,
        sleep=lambda s: slept.append(s),
    )
    assert n == 3 and len(ticks) == 3
    assert slept == [300, 300]  # no sleep after the final tick


def test_stateful_running_counts_with_ttl(spark):
    from database_collector_spark.streaming.stateful import running_counts_with_ttl

    with tempfile.TemporaryDirectory() as tmp:
        import os

        src = f"{tmp}/in"
        os.makedirs(src)
        with open(f"{src}/b1.json", "w") as f:
            f.write(
                "\n".join(
                    json.dumps({"event_id_label": x})
                    for x in ["A", "A", "B"]
                )
            )
        stream = (
            spark.readStream.schema("event_id_label string").json(src)
        )
        q = (
            running_counts_with_ttl(stream)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("ttl_counts")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .start()
        )
        try:
            q.processAllAvailable()
            got = {
                (r["event_id_label"], r["rds_events_total"], r["expired"])
                for r in spark.sql("SELECT * FROM ttl_counts").collect()
            }
            assert got == {("A", 2, False), ("B", 1, False)}
            with open(f"{src}/b2.json", "w") as f:
                f.write(json.dumps({"event_id_label": "A"}))
            q.processAllAvailable()
            got = {
                (r["event_id_label"], r["rds_events_total"])
                for r in spark.sql(
                    "SELECT * FROM ttl_counts WHERE expired = false"
                ).collect()
            }
            assert ("A", 3) in got  # running count accumulated across batches
        finally:
            q.stop()


def test_parquet_sink_partitioned(spark):
    from database_collector_spark.sinks.parquet import read_timeseries, write_timeseries

    df = spark.createDataFrame(
        [
            Row(labels={"__name__": "m"}, value=1.0, ts=dt.datetime(2024, 6, 1, 10)),
            Row(labels={"__name__": "m"}, value=2.0, ts=dt.datetime(2024, 6, 2, 10)),
        ]
    )
    with tempfile.TemporaryDirectory() as tmp:
        write_timeseries(df, f"{tmp}/ts")
        back = read_timeseries(spark, f"{tmp}/ts")
        assert back.count() == 2
        assert sorted(r["ds"] for r in back.select("ds").collect()) == [
            "2024-06-01",
            "2024-06-02",
        ]
        # date partition prunes: filtered read touches one partition
        one = back.filter(F.col("ds") == "2024-06-01")
        assert one.count() == 1
