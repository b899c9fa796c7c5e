"""XML document ingestion: explicit schema + corrupt-record quarantine
over the Spark 4 native xml source."""

from __future__ import annotations

import tempfile

from database_collector_spark.sources.xml import read_xml


def _doc(doc_id, text, lang="en", source="web"):
    return (
        f"<doc><doc_id>{doc_id}</doc_id><text>{text}</text>"
        f"<lang>{lang}</lang><source>{source}</source></doc>"
    )


def test_xml_good_and_quarantine_split(spark):
    with tempfile.TemporaryDirectory() as tmp:
        with open(f"{tmp}/shard-0.xml", "w") as f:
            f.write(
                "<docs>"
                + _doc(1, "hello world")
                + "<doc><doc_id>not_a_number</doc_id><text>bad id</text>"
                "<lang>en</lang><source>web</source></doc>"
                + _doc(3, "bonjour", lang="fr")
                + "</docs>"
            )
        good, quarantine = read_xml(spark, tmp, row_tag="doc")
        rows = {r["doc_id"]: r for r in good.collect()}
        assert set(rows) == {1, 3}
        assert rows[1]["text"] == "hello world" and rows[3]["lang"] == "fr"
        q = quarantine.collect()
        assert len(q) == 1
        # the native reader records file-level text as the corrupt
        # payload; the offending value is in there
        assert "not_a_number" in q[0]["corrupt_record"]
        assert q[0]["doc_id"] is None  # the field that failed to map


def test_xml_schema_is_contract_not_inference(spark):
    # extra elements are ignored, missing ones are NULL — the schema is
    # the caller's contract, not whatever the shard happens to contain
    with tempfile.TemporaryDirectory() as tmp:
        with open(f"{tmp}/shard-0.xml", "w") as f:
            f.write(
                "<docs><doc><doc_id>7</doc_id><text>t</text>"
                "<extra_field>ignored</extra_field></doc></docs>"
            )
        good, quarantine = read_xml(spark, tmp)
        r = good.collect()[0]
        assert r["doc_id"] == 7 and r["lang"] is None
        assert "extra_field" not in good.columns
        assert quarantine.count() == 0


def test_xml_structural_malformation_bounds_blast_radius_to_the_file(spark):
    # an unclosed tag aborts demarcation for the REST of its file: one
    # corrupt row marks it, later records in that file are lost, and
    # other shards are untouched — the measured native-reader contract
    # the module docstring documents
    with tempfile.TemporaryDirectory() as tmp:
        with open(f"{tmp}/bad.xml", "w") as f:
            f.write(
                "<docs>"
                + _doc(1, "a")
                + "<doc><doc_id>2</doc_id><text>unclosed</doc>"
                + _doc(3, "lost")
                + "</docs>"
            )
        with open(f"{tmp}/good.xml", "w") as f:
            f.write("<docs>" + _doc(10, "intact") + "</docs>")
        good, quarantine = read_xml(spark, tmp)
        ids = {r["doc_id"] for r in good.collect()}
        assert 10 in ids and 1 in ids  # other shard + pre-breakage record
        assert 3 not in ids  # post-breakage record in the bad shard: lost
        assert quarantine.count() == 1


def test_xml_feeds_downstream_operators(spark):
    from database_collector_spark.operators import text as text_ops

    with tempfile.TemporaryDirectory() as tmp:
        with open(f"{tmp}/s.xml", "w") as f:
            f.write(
                "<docs>" + "".join(_doc(i, f"word{i} common text") for i in range(4)) + "</docs>"
            )
        good, _ = read_xml(spark, tmp)
        stats = text_ops.token_stats(good)
        got = {r["doc_id"]: r["n_tokens"] for r in stats.collect()}
        assert got == {0: 3, 1: 3, 2: 3, 3: 3}
