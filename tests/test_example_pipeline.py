"""End-to-end composition test: the examples/full_pipeline.py flow over
sf0.001 — quality+entropy filters, dedup, leakage-safe split, BPE,
chunking, z-ordered write — all through the public operator API."""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def test_full_pipeline_end_to_end(spark):
    from examples.full_pipeline import run_pipeline

    with tempfile.TemporaryDirectory() as out:
        stats = run_pipeline(spark, SF, out)
        assert stats["n_raw"] > 0
        assert 0 < stats["n_kept"] <= stats["n_raw"]
        assert stats["n_chunks"] >= stats["n_kept"]
        assert stats["n_merges"] == 8
        assert set(stats["splits"]) <= {"train", "val", "test"}
        assert sum(stats["splits"].values()) == stats["n_kept"]
        assert 0.0 <= stats["clf_keep_frac"] <= 1.0
        assert stats["mixture_oversample"] and all(
            v > 0 for v in stats["mixture_oversample"].values()
        )
        # artifacts on disk, readable, with the expected columns
        curated = spark.read.parquet(f"{out}/curated")
        assert {"doc_id", "split", "n_bpe_tokens", "_zkey"} <= set(curated.columns)
        assert curated.count() == stats["n_kept"]
        chunks = spark.read.parquet(f"{out}/chunks")
        assert {"doc_id", "chunk_idx", "chunk_text", "chunk_len"} <= set(
            chunks.columns
        )


def test_examples_dir_importable_without_side_effects():
    import importlib

    mod = importlib.import_module("examples.full_pipeline")
    assert callable(mod.run_pipeline)


def test_collector_pipeline_example_runs(spark, capsys):
    from examples import collector_pipeline

    def scrape_fn(spark_, target, request):
        from pyspark.sql import Row

        fixture = spark_.createDataFrame(
            [Row(status="ACTIVE"), Row(status="IDLE")]
        )
        fixture.createOrReplaceTempView("scrape")
        return spark_.sql(request)

    from database_collector_spark.pipeline import run_once
    from database_collector_spark.sinks.cloudwatch import to_datum
    from database_collector_spark.sinks.remote_write import encode_write_request

    samples = []
    results = run_once(
        spark,
        collector_pipeline._registry(spark),
        {e: collector_pipeline.CONFIG for e in ("mysql", "postgres", "oracle")},
        scrape_fn,
        sink_fn=lambda df: samples.extend(df.collect()),
        anchor_ts="2024-06-01 00:00:00",
    )
    assert len(results) == 3 and len(samples) == 6
    series = [(dict(r["labels"]), float(r["value"]), r["ts"]) for r in samples]
    prompb = encode_write_request(
        [(l, v, int(ts.timestamp() * 1000)) for l, v, ts in series]
    )
    assert len(prompb) > 0
    datums = [d for d in (to_datum(l, v, ts) for l, v, ts in series) if d]
    assert len(datums) == 6
    assert all(d["MetricName"] == "sessions_active" for d in datums)
