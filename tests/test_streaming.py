"""Streaming events path (SURVEY.md §3.3; FIXTURES.md F7).

Feeds fixture RDS events through Structured Streaming with a memory sink
and asserts the grouped running counts, including the len==1 -> 'none'
quirk (events-collector.go:43-47), plus compat per-batch counts and the
watermarked window variant on the batch API.
"""

from __future__ import annotations

import json
import tempfile

from pyspark.sql import Row
from pyspark.sql import functions as F

from database_collector_spark.streaming.events import (
    counted,
    event_label,
    parse_events,
    stream_pipeline,
    windowed_counts,
)


def _event(event_id, message="backup started", source="db-1"):
    return json.dumps(
        {
            "EventCategories": ["backup"],
            "SourceType": "DB_INSTANCE",
            "SourceArn": "arn:aws:rds:us-west-2:123:db:db-1",
            "Date": "2024-06-01T00:00:00Z",
            "SourceIdentifier": source,
            "Message": message,
            "EventID": event_id,
        }
    )


def test_parse_and_quirk_batch(spark):
    raw = spark.createDataFrame(
        [
            Row(value=_event("RDS-EVENT-0005")),
            Row(value=_event("-")),           # placeholder -> 'none'
            Row(value=_event("-")),
            Row(value="{not json at all"),    # malformed -> NULL struct, kept parseable
        ]
    )
    events = parse_events(raw)
    labeled = event_label(events)
    got = {r["event_id"]: r["event_id_label"] for r in labeled.collect() if r["event_id"]}
    assert got == {"RDS-EVENT-0005": "RDS-EVENT-0005", "-": "none"}
    assert labeled.filter(F.col("event_id").isNull()).count() == 1


def test_streaming_running_counts(spark):
    with tempfile.TemporaryDirectory() as tmp:
        src_dir = f"{tmp}/in"
        import os

        os.makedirs(src_dir)
        with open(f"{src_dir}/batch1.json", "w") as f:
            f.write(
                "\n".join(
                    [
                        _event("RDS-EVENT-0005"),
                        _event("RDS-EVENT-0005"),
                        _event("-"),
                    ]
                )
            )
        raw = (
            spark.readStream.format("text")
            .schema("value string")
            .load(src_dir)
        )
        q = stream_pipeline(
            raw, checkpoint_dir=f"{tmp}/ckpt", queryName="t_counts"
        )
        try:
            q.processAllAvailable()
            got = {
                (r["event_id_label"], r["rds_events_total"])
                for r in spark.sql("SELECT * FROM t_counts").collect()
            }
            assert got == {("RDS-EVENT-0005", 2), ("none", 1)}
            # second micro-batch: running count accumulates (correct mode,
            # unlike the reference's cold-start state loss)
            with open(f"{src_dir}/batch2.json", "w") as f:
                f.write(_event("RDS-EVENT-0005"))
            q.processAllAvailable()
            got = {
                (r["event_id_label"], r["rds_events_total"])
                for r in spark.sql("SELECT * FROM t_counts").collect()
            }
            assert got == {("RDS-EVENT-0005", 3), ("none", 1)}
        finally:
            q.stop()


def test_streaming_compat_per_batch_counts(spark):
    """Reference-faithful mode: counter registry is rebuilt per invocation
    (events-collector.go:31-34), so each batch reports only its own rows."""
    with tempfile.TemporaryDirectory() as tmp:
        src_dir = f"{tmp}/in"
        import os

        os.makedirs(src_dir)
        with open(f"{src_dir}/b1.json", "w") as f:
            f.write("\n".join([_event("RDS-EVENT-0005"), _event("RDS-EVENT-0005")]))
        seen = []
        raw = spark.readStream.format("text").schema("value string").load(src_dir)
        q = stream_pipeline(
            raw,
            checkpoint_dir=f"{tmp}/ckpt",
            queryName="t_compat",
            compat_per_batch=True,
            sink_fn=lambda bdf, bid: seen.append(
                {(r["event_id_label"], r["rds_events_total"]) for r in bdf.collect()}
            ),
        )
        try:
            q.processAllAvailable()
            with open(f"{src_dir}/b2.json", "w") as f:
                f.write(_event("RDS-EVENT-0005"))
            q.processAllAvailable()
        finally:
            q.stop()
        non_empty = [s for s in seen if s]
        assert non_empty == [
            {("RDS-EVENT-0005", 2)},
            {("RDS-EVENT-0005", 1)},  # per-batch, not running: compat parity
        ]


def test_windowed_counts_batch_semantics(spark):
    import datetime as dt

    base = dt.datetime(2024, 6, 1, 0, 0, 0)
    rows = [
        Row(event_id="RDS-EVENT-0005", message="m", source_identifier="db-1",
            event_ts=base + dt.timedelta(minutes=m))
        for m in (0, 1, 6)
    ] + [
        Row(event_id="-", message="m", source_identifier="db-1",
            event_ts=base + dt.timedelta(minutes=2))
    ]
    out = windowed_counts(spark.createDataFrame(rows)).collect()
    got = {
        (r["window_start"].minute, r["event_id_label"], r["rds_events_total"])
        for r in out
    }
    assert got == {
        (0, "RDS-EVENT-0005", 2),
        (5, "RDS-EVENT-0005", 1),
        (0, "none", 1),
    }


def test_sliding_windowed_counts_stream_matches_batch(spark):
    # the SAME windowed_counts definition with a slide, run (a) under
    # readStream via a file source + complete-mode memory sink and (b) on
    # the batch API over identical rows — emitted window rows must match
    # exactly (batch/stream parity is the contract events_sliding's gate
    # leans on)
    import datetime as dt
    import os

    base = dt.datetime(2024, 6, 1, 0, 0, 0)
    rows = [("RDS-EVENT-0005", 0), ("RDS-EVENT-0005", 6), ("-", 2), ("RDS-EVENT-0005", 11)]
    schema = (
        "event_id string, message string, source_identifier string, "
        "event_ts timestamp"
    )

    def frame_rows():
        return [
            Row(
                event_id=e,
                message="m",
                source_identifier="db-1",
                event_ts=base + dt.timedelta(minutes=m),
            )
            for e, m in rows
        ]

    expected = {
        (r["window_start"], r["event_id_label"], r["rds_events_total"])
        for r in windowed_counts(
            spark.createDataFrame(frame_rows()),
            window="10 minutes",
            slide="5 minutes",
        ).collect()
    }
    assert expected  # hop factor: each event lands in 2 windows

    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/in"
        os.makedirs(src)
        with open(f"{src}/b1.json", "w") as f:
            f.write(
                "\n".join(
                    json.dumps(
                        {
                            "event_id": e,
                            "message": "m",
                            "source_identifier": "db-1",
                            "event_ts": (base + dt.timedelta(minutes=m)).isoformat(),
                        }
                    )
                    for e, m in rows
                )
            )
        stream = spark.readStream.schema(schema).json(src)
        q = (
            windowed_counts(stream, window="10 minutes", slide="5 minutes")
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName("sliding_counts")
            .trigger(availableNow=True)
            .start()
        )
        try:
            assert q.awaitTermination(120), "stream pass did not finish"
        finally:
            q.stop()
        got = {
            (r["window_start"], r["event_id_label"], r["rds_events_total"])
            for r in spark.sql("SELECT * FROM sliding_counts").collect()
        }
    assert got == expected
