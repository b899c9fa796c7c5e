"""XML document ingestion (Spark 4 native ``xml`` data source).

Web-archive and publisher corpora still ship as XML (MediaWiki dumps,
PubMed, TEI, sitemap-shaped crawls). Spark 4 merged the xml reader into
core (SPARK-44265 umbrella — no external package), so the engine can
offer the same explicit-schema + quarantine ingest contract as
sources/jsonl.py / sources/csv.py over ``rowTag``-delimited records.

Contract, identical to the sibling sources:

* **Explicit schema, never inference** — inference would scan the corpus
  twice and silently union drifting shard schemas.
* **Malformed records quarantine, not crash** — PERMISSIVE mode routes
  records the parser cannot map into a corrupt-record column carried in
  the read schema; one truncated shard never kills the job. Unlike the
  JSONL path (line-oriented, so we parse via from_json over a text
  scan), XML records span lines and MUST be demarcated by the reader
  itself, so the corrupt column comes from the xml source directly.
  Measured granularity of the native reader (pinned in tests): a record
  whose VALUES cannot map to the schema quarantines per-record, but a
  STRUCTURALLY malformed record (unclosed tag) aborts demarcation for
  the remainder of its file — one corrupt row marks it and later
  records in that file are lost. Shard-per-file corpora (the standard
  dump layout) bound the blast radius to one shard either way.
* **Parallelism from the file layout** — the native reader splits by
  file; shard-per-file corpora scale with file count (the standard XML
  dump layout). A single multi-TB XML file does NOT split — re-shard
  such inputs upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from database_collector_spark.sources.jsonl import JSONL_DOC_SCHEMA

XML_DOC_SCHEMA = JSONL_DOC_SCHEMA  # same documents-table contract


def read_xml(
    spark: SparkSession,
    path: str,
    *,
    row_tag: str = "doc",
    schema: T.StructType = XML_DOC_SCHEMA,
) -> tuple[DataFrame, DataFrame]:
    """Read ``rowTag``-delimited XML with an explicit schema; returns
    ``(good, quarantine)``.

    ``good`` carries exactly the caller's schema; ``quarantine`` carries
    the parsed-as-far-as-possible schema fields PLUS the raw corrupt
    payload (``corrupt_record`` — the native reader records file-level
    text for it, see module docstring). Both are lazy views over ONE
    xml scan: the corrupt-record column rides in the read schema
    (PERMISSIVE mode) and is non-null iff the record failed to map.
    The quarantine side must project at least one schema field next to
    the corrupt column — Spark disallows plans that read ONLY the
    corrupt column from a raw file scan (QUERY_ONLY_CORRUPT_RECORD_
    COLUMN), and the partially-parsed fields are diagnostic anyway."""
    corrupt = "_corrupt_record"
    full = T.StructType(
        list(schema.fields) + [T.StructField(corrupt, T.StringType(), True)]
    )
    parsed = (
        spark.read.format("xml")
        .option("rowTag", row_tag)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt)
        .schema(full)
        .load(path)
    )
    good = parsed.filter(F.col(corrupt).isNull()).drop(corrupt)
    # the quarantine filter must keep at least one SCHEMA field in the
    # scan even under column pruning (a pruned-to-corrupt-only plan —
    # e.g. quarantine.count() — hits QUERY_ONLY_CORRUPT_RECORD_COLUMN).
    # The probe is semantically always-false (xxhash64(x) % 2 is in
    # [-1, 1], never > 2, and xxhash64 is never null) but Spark does no
    # value-range analysis, so unlike a *0 form (which constant-folds
    # away) the anchored field survives optimization and pruning.
    anchor = schema.fields[0].name
    probe = (F.xxhash64(F.col(anchor)) % 2) > F.lit(2)
    quarantine = parsed.filter(F.col(corrupt).isNotNull() | probe).select(
        *[f.name for f in schema.fields], F.col(corrupt).alias("corrupt_record")
    )
    return good, quarantine
