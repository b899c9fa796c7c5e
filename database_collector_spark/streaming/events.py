"""RDS events streaming path (SURVEY.md §2.10, §3.3).

Reference: EventBridge pushes one RDS event per Lambda invocation
(collector/cmd/events-collector/events-collector.go:30-59); the handler
JSON-parses the event, bumps a counter keyed by (event_id, message,
source), and remote-writes the gathered family. Counter state is lost per
cold start (events-collector.go:31-34), so the reference effectively emits
per-invocation counts.

Spark-first shape: Structured Streaming over any micro-batch source
(file/Kafka/Kinesis of event JSON) -> from_json with the explicit struct ->
the P7 presence quirk -> stateful groupBy().count() with checkpointing.
Two modes:

* correct (default): running counts, outputMode('update'), checkpointed —
  what the reference *intends*;
* compat: per-batch counts via foreachBatch aggregation — what the
  reference *does* under cold starts.

A watermarked tumbling-window variant covers late data for the extension
engine (the reference counts at arrival time, SURVEY §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from database_collector_spark.model.schemas import RDS_EVENT_SCHEMA


def parse_events(raw_json: DataFrame, json_col: str = "value") -> DataFrame:
    """JSON strings -> typed event rows (events-collector.go:35-41).

    Permissive from_json: malformed events become NULL structs rather than
    aborting the stream (the Go handler returns an error per event; a
    100 TB stream cannot stop for one bad record — malformed rows are
    filterable via ``event_id IS NULL``).
    """
    parsed = raw_json.select(
        F.from_json(F.col(json_col).cast("string"), RDS_EVENT_SCHEMA).alias("e")
    )
    return parsed.select(
        F.col("e.EventCategories").alias("event_categories"),
        F.col("e.SourceType").alias("source_type"),
        F.col("e.SourceArn").alias("source_arn"),
        F.col("e.Date").alias("date"),
        F.col("e.SourceIdentifier").alias("source_identifier"),
        F.col("e.Message").alias("message"),
        F.col("e.EventID").alias("event_id"),
    )


def event_label(df: DataFrame) -> DataFrame:
    """P7 quirk (events-collector.go:43-47): a 1-char EventID (the '-'
    placeholder) is labeled 'none'."""
    return df.withColumn(
        "event_id_label",
        F.when(F.length(F.col("event_id")) == 1, F.lit("none")).otherwise(
            F.col("event_id")
        ),
    )


def counted(df: DataFrame) -> DataFrame:
    """The counter aggregation (events-collector.go:22-28): grouped count
    keyed by (event id label, message, source identifier). Works for both
    batch frames and streaming frames (update mode)."""
    return event_label(df).groupBy(
        "event_id_label", "message", "source_identifier"
    ).agg(F.count("*").alias("rds_events_total"))


def windowed_counts(
    df: DataFrame,
    *,
    ts_col: str = "event_ts",
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Extension: watermarked tumbling (or, with ``slide``, hopping)
    window counts for late data.

    The watermark bounds state: at 100 TB/day the unbounded running count
    would grow state per distinct key forever; windows + watermark let the
    state store evict closed windows. A slide multiplies state and output
    by window/slide hops — the same factor the batch twin
    (workloads_ts.q_events_sliding) pays in its partial aggregate.
    """
    win = (
        F.window(F.col(ts_col), window, slide)
        if slide
        else F.window(F.col(ts_col), window)
    )
    return (
        event_label(df)
        .withWatermark(ts_col, watermark)
        .groupBy(
            win.alias("w"),
            F.col("event_id_label"),
        )
        .agg(F.count("*").alias("rds_events_total"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_id_label",
            "rds_events_total",
        )
    )


def stream_pipeline(
    raw_stream: DataFrame,
    *,
    checkpoint_dir: str,
    queryName: str = "rds_events_counts",
    compat_per_batch: bool = False,
    sink_fn=None,
):
    """readStream frame -> running counts -> sink.

    ``sink_fn(batch_df, batch_id)`` defaults to an in-memory table for
    tests; in production pass a RemoteWriteSink-backed foreachBatch.
    """
    events = parse_events(raw_stream)
    if compat_per_batch:
        # reference-faithful: counts reset every (micro)batch, like the
        # Lambda registry reset at events-collector.go:31-34
        writer = (
            events.writeStream.outputMode("append")
            .foreachBatch(
                lambda bdf, bid: sink_fn(counted(bdf), bid) if sink_fn else None
            )
            .option("checkpointLocation", checkpoint_dir)
            .queryName(queryName)
        )
        return writer.start()
    counts = counted(events)
    if sink_fn is not None:
        writer = (
            counts.writeStream.outputMode("update")
            .foreachBatch(sink_fn)
            .option("checkpointLocation", checkpoint_dir)
            .queryName(queryName)
        )
    else:
        writer = (
            counts.writeStream.outputMode("complete")
            .format("memory")
            .option("checkpointLocation", checkpoint_dir)
            .queryName(queryName)
        )
    return writer.start()
