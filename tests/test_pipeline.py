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
    # Each ingest runs as a bounded availableNow pass restarting from the
    # same checkpoint (an always-on query with state timeouts never goes
    # idle, so processAllAvailable would hang). Event-time TTL makes
    # eviction deterministic: it fires when the *watermark* passes
    # last-seen-ts + 1h, regardless of wall clock.
    from database_collector_spark.streaming.stateful import running_counts_with_ttl

    with tempfile.TemporaryDirectory() as tmp:
        import os

        src = f"{tmp}/in"
        os.makedirs(src)

        def run_pass() -> set:
            # memory sink can't recover from a checkpoint; foreachBatch can
            emitted: set = set()

            def sink(batch_df, _batch_id):
                emitted.update(
                    (r["event_id_label"], r["rds_events_total"], r["expired"])
                    for r in batch_df.collect()
                )

            stream = spark.readStream.schema(
                "event_id_label string, ts timestamp"
            ).json(src)
            q = (
                running_counts_with_ttl(stream)
                .writeStream.outputMode("update")
                .foreachBatch(sink)
                .option("checkpointLocation", f"{tmp}/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            try:
                assert q.awaitTermination(120), "stream pass did not finish"
            finally:
                q.stop()
            return emitted

        def write_batch(fname: str, rows: list[tuple[str, str]]) -> None:
            with open(f"{src}/{fname}", "w") as f:
                f.write(
                    "\n".join(
                        json.dumps({"event_id_label": k, "ts": ts})
                        for k, ts in rows
                    )
                )

        write_batch(
            "b1.json",
            [("A", "2024-06-01T10:00:00"), ("A", "2024-06-01T10:01:00"),
             ("B", "2024-06-01T10:02:00")],
        )
        assert run_pass() == {("A", 2, False), ("B", 1, False)}

        # pass 2: A updates (recovered state: 2 + 1), and once the
        # watermark reaches 12:00 the engine's follow-up batch fires B's
        # 11:02 timeout -> tombstone with its final total
        write_batch("b2.json", [("A", "2024-06-01T12:00:00")])
        assert run_pass() == {("A", 3, False), ("B", 1, True)}

        # pass 3: B is gone; only the new key C appears
        write_batch("b3.json", [("C", "2024-06-01T12:30:00")])
        assert run_pass() == {("C", 1, False)}


def test_ttl_batch_twin_matches_streaming_end_state(spark):
    # the batch twin (ttl_final_state) must reproduce the streaming
    # operator's observable end state on the same rows: per-key final
    # totals, with expired=True exactly for the keys whose tombstone the
    # stream emitted. Fixture = the b1+b2 rows from the streaming test
    # above, whose end state is A: 3 alive, B: 1 expired (stream end
    # 12:00, B last seen 10:02, TTL 1h).
    from database_collector_spark.streaming.stateful import ttl_final_state

    rows = [
        ("A", "2024-06-01T10:00:00"),
        ("A", "2024-06-01T10:01:00"),
        ("B", "2024-06-01T10:02:00"),
        ("A", "2024-06-01T12:00:00"),
    ]
    df = spark.createDataFrame(
        [(k, ts) for k, ts in rows], "event_id_label string, ts string"
    ).selectExpr("event_id_label", "CAST(ts AS TIMESTAMP) AS ts")
    got = {
        (r["event_id_label"], r["rds_events_total"], r["expired"])
        for r in ttl_final_state(df).collect()
    }
    assert got == {("A", 3, False), ("B", 1, True)}


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
        assert sorted(str(r["ds"]) for r in back.select("ds").collect()) == [
            "2024-06-01",
            "2024-06-02",
        ]
        # date partition prunes: filtered read touches one partition
        one = back.filter(F.col("ds") == "2024-06-01")
        assert one.count() == 1


def test_overwrite_partitions_is_idempotent(spark):
    from database_collector_spark.sinks.parquet import (
        overwrite_partitions,
        read_timeseries,
        write_timeseries,
    )

    d1 = dt.datetime(2024, 6, 1, 10)
    d2 = dt.datetime(2024, 6, 2, 10)
    base = spark.createDataFrame(
        [
            Row(labels={"__name__": "m"}, value=1.0, ts=d1),
            Row(labels={"__name__": "m"}, value=2.0, ts=d2),
        ]
    )
    with tempfile.TemporaryDirectory() as tmp:
        write_timeseries(base, f"{tmp}/ts")
        # re-run of day 2's tick with a corrected value: only day 2 replaced
        rerun = spark.createDataFrame(
            [Row(labels={"__name__": "m"}, value=20.0, ts=d2)]
        )
        overwrite_partitions(rerun, f"{tmp}/ts")
        got = {
            str(r["ds"]): r["value"]
            for r in read_timeseries(spark, f"{tmp}/ts").collect()
        }
        assert got == {"2024-06-01": 1.0, "2024-06-02": 20.0}
        # running the same re-run again changes nothing (idempotent)
        overwrite_partitions(rerun, f"{tmp}/ts")
        assert read_timeseries(spark, f"{tmp}/ts").count() == 2
        # the per-write conf override did not leak into the session
        assert (
            spark.conf.get("spark.sql.sources.partitionOverwriteMode")
            == "static"
        )


def test_compact_partitions_one_file_per_date(spark):
    import glob

    from database_collector_spark.sinks.parquet import (
        compact_partitions,
        read_timeseries,
        write_timeseries,
    )

    with tempfile.TemporaryDirectory() as tmp:
        # three appends -> several files per date partition
        for v in (1.0, 2.0, 3.0):
            df = spark.createDataFrame(
                [
                    Row(labels={"m": "x"}, value=v, ts=dt.datetime(2024, 6, 1, 10)),
                    Row(labels={"m": "x"}, value=v, ts=dt.datetime(2024, 6, 2, 10)),
                ]
            )
            write_timeseries(df, f"{tmp}/ts")
        assert len(glob.glob(f"{tmp}/ts/ds=2024-06-01/*.parquet")) >= 3
        compact_partitions(spark, f"{tmp}/ts")
        for ds in ("2024-06-01", "2024-06-02"):
            assert len(glob.glob(f"{tmp}/ts/ds={ds}/*.parquet")) == 1
        # content survives byte-for-byte in row terms
        assert read_timeseries(spark, f"{tmp}/ts").count() == 6


def test_run_once_warns_on_registry_overflow(spark):
    # >MAX_TARGETS enabled targets: the tick still runs (capped at 100 by
    # secret_name) but truncation is WARNED, never silent
    import warnings as _warnings

    from database_collector_spark.pipeline import run_once

    rows = [
        Row(
            secret_name=f"db-{i:04d}",
            engine="postgres",
            host="h",
            port=5432,
            username="u",
            password="p",
            dbname="d",
            tags={"database-collector:enabled": "true"},
        )
        for i in range(120)
    ]
    registry = spark.createDataFrame(rows, SOURCES_REGISTRY_SCHEMA)
    seen = []

    def scrape(spark_, target, config):
        raise RuntimeError("fail-soft")

    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        results = run_once(
            spark, registry, {"postgres": "x"}, scrape, lambda df: seen.append(df)
        )
    assert len(results) == 100  # capped
    msgs = [str(w.message) for w in caught]
    assert any("drops 20" in m and "page cap 100" in m for m in msgs)
