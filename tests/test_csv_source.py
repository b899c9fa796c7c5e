"""CSV corpus ingestion (sources/csv.py): explicit schema, quarantine,
distributed-safe header handling."""

from __future__ import annotations

import tempfile

from database_collector_spark.sources.csv import CSV_DOC_SCHEMA, read_csv


def _write(path, lines):
    with open(path, "w") as f:
        f.write("\n".join(lines))


def test_csv_good_and_quarantine_split(spark):
    with tempfile.TemporaryDirectory() as tmp:
        _write(
            f"{tmp}/shard-0.csv",
            [
                "1,hello world,en,web",
                "not-a-number,boom,en,web",   # doc_id fails the long type
                "",                            # blank mid-file -> quarantine
                "2,bonjour,fr,web",
            ],
        )
        good, quarantine = read_csv(spark, tmp)
        rows = {r["doc_id"]: r for r in good.collect()}
        assert set(rows) == {1, 2}
        assert rows[2]["lang"] == "fr"
        assert good.schema == CSV_DOC_SCHEMA
        bad = sorted(r["corrupt_line"] for r in quarantine.collect())
        assert bad == ["", "not-a-number,boom,en,web"]


def test_csv_header_dropped_everywhere_even_mid_file(spark):
    # concatenated shards re-embed the header mid-stream; every copy drops
    with tempfile.TemporaryDirectory() as tmp:
        _write(
            f"{tmp}/cat.csv",
            [
                "doc_id,text,lang,source",
                "1,a,en,s",
                "doc_id,text,lang,source",   # second shard's header
                "2,b,en,s",
            ],
        )
        good, quarantine = read_csv(spark, tmp, header=True)
        assert {r["doc_id"] for r in good.collect()} == {1, 2}
        assert quarantine.count() == 0


def test_csv_feeds_downstream_operators(spark):
    from database_collector_spark.operators.dedup import exact_dedup

    with tempfile.TemporaryDirectory() as tmp:
        _write(
            f"{tmp}/shard-0.csv",
            ["1,same,en,s", "2,same,en,s", "3,other,en,s"],
        )
        good, _ = read_csv(spark, tmp)
        groups = {r["canonical_doc_id"]: r["n_docs"] for r in exact_dedup(good).collect()}
        assert groups == {1: 2, 3: 1}


def test_csv_quoted_fields_with_embedded_separators(spark):
    # from_csv honors standard double-quoting: embedded commas and
    # escaped quotes stay inside one field
    with tempfile.TemporaryDirectory() as tmp:
        _write(
            f"{tmp}/shard-0.csv",
            [
                '5,"hello, world",en,web',
                '6,"she said ""hi""",en,web',
            ],
        )
        good, quarantine = read_csv(spark, tmp)
        rows = {r["doc_id"]: r["text"] for r in good.collect()}
        assert rows == {5: "hello, world", 6: 'she said "hi"'}
        assert quarantine.count() == 0
