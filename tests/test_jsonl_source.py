"""JSONL document ingestion: explicit schema + corrupt-line quarantine."""

from __future__ import annotations

import json
import os
import tempfile

from database_collector_spark.sources.jsonl import JSONL_DOC_SCHEMA, read_jsonl


def _write_shard(path, lines):
    with open(path, "w") as f:
        f.write("\n".join(lines))


def test_jsonl_good_and_quarantine_split(spark):
    with tempfile.TemporaryDirectory() as tmp:
        _write_shard(
            f"{tmp}/shard-0.jsonl",
            [
                json.dumps({"doc_id": 1, "text": "hello world", "lang": "en", "source": "web"}),
                '{"doc_id": 2, "text": "truncated...',  # broken JSON
                json.dumps({"doc_id": 3, "text": "bonjour", "lang": "fr", "source": "web"}),
            ],
        )
        good, quarantine = read_jsonl(spark, tmp)
        rows = {r["doc_id"]: r for r in good.collect()}
        assert set(rows) == {1, 3}
        assert rows[1]["text"] == "hello world" and rows[3]["lang"] == "fr"
        assert good.schema == JSONL_DOC_SCHEMA
        bad = quarantine.collect()
        assert len(bad) == 1
        assert bad[0]["corrupt_line"].startswith('{"doc_id": 2')


def test_jsonl_schema_is_contract_not_inference(spark):
    # extra fields are ignored, missing fields are null — the explicit
    # schema governs; drifting shards cannot widen the frame
    with tempfile.TemporaryDirectory() as tmp:
        _write_shard(
            f"{tmp}/shard-0.jsonl",
            [json.dumps({"doc_id": 9, "text": "t", "extra_field": 42})],
        )
        good, quarantine = read_jsonl(spark, tmp)
        row = good.collect()[0]
        assert row["doc_id"] == 9 and row["lang"] is None
        assert "extra_field" not in good.columns
        assert quarantine.count() == 0


def test_jsonl_feeds_downstream_operators(spark):
    # the ingested frame drops straight into the dedup tier (contract
    # parity with the documents table)
    from database_collector_spark.operators.dedup import exact_dedup

    with tempfile.TemporaryDirectory() as tmp:
        _write_shard(
            f"{tmp}/shard-0.jsonl",
            [
                json.dumps({"doc_id": i, "text": t, "lang": "en", "source": "s"})
                for i, t in [(1, "same"), (2, "same"), (3, "other")]
            ],
        )
        good, _ = read_jsonl(spark, tmp)
        groups = {r["canonical_doc_id"]: r["n_docs"] for r in exact_dedup(good).collect()}
        assert groups == {1: 2, 3: 1}


def test_jsonl_blank_lines_quarantined_not_null_rows(spark):
    # blank / whitespace-only lines make from_json return a NULL struct
    # (no corrupt-record marker), which previously surfaced as all-null
    # "good" rows — they must quarantine instead
    with tempfile.TemporaryDirectory() as tmp:
        _write_shard(
            f"{tmp}/shard-0.jsonl",
            [
                json.dumps({"doc_id": 1, "text": "x", "lang": "en", "source": "s"}),
                "",
                "   \t ",
                json.dumps({"doc_id": 2, "text": "y", "lang": "en", "source": "s"}),
            ],
        )
        good, quarantine = read_jsonl(spark, tmp)
        assert {r["doc_id"] for r in good.collect()} == {1, 2}
        assert all(r["doc_id"] is not None for r in good.collect())
        bad = [r["corrupt_line"] for r in quarantine.collect()]
        assert sorted(bad) == ["", "   \t "]
