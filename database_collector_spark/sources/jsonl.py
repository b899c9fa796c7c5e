"""Newline-delimited JSON (JSONL) document ingestion.

Training corpora overwhelmingly arrive as JSONL shards (one document
object per line, thousands of files). The reference has no file-ingest
surface (its sources are JDBC catalogs and AWS APIs, SURVEY.md §2.1);
this is pure extension sized for the 100 TB path:

* **Explicit schema, never inference** — schema inference scans the data
  once before the real read (2x I/O at corpus scale) and silently unions
  drifting shard schemas; here the caller's contract is the only schema.
* **Corrupt lines quarantine, not crash** — lines are read as text and
  parsed with ``from_json`` (codegen): malformed JSON yields a null
  struct, which splits into a quarantine frame carrying the raw line,
  so one truncated shard can't kill a 100 TB job (the data-plane analog
  of the collector's per-target fail-soft). This also avoids the json
  reader's internal corrupt-record column, which Spark refuses to query
  in isolation.
* **Parallelism from the file layout** — Spark splits JSONL by
  `maxPartitionBytes` (newlines are split-safe), so scan parallelism
  scales with bytes, no repartition needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the documents-table contract (FIXTURES.md): the shape every downstream
# text/dedup/curation operator consumes
JSONL_DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = JSONL_DOC_SCHEMA,
) -> tuple[DataFrame, DataFrame]:
    """Read JSONL with an explicit schema; returns ``(good, quarantine)``.

    ``good`` carries exactly the caller's schema; ``quarantine`` carries
    the raw offending lines (``corrupt_line``). Both are lazy views over
    ONE text scan — the same ``from_json`` pass that parses a line also
    classifies it: the corrupt-record column rides INSIDE the struct
    schema (a regular field, so none of the json reader's internal-
    column query restrictions apply) and is non-null iff the line failed
    to parse. Blank / whitespace-only lines are a third class:
    ``from_json`` returns a NULL struct for them (no corrupt-record
    marker at all), so ``good`` additionally requires the struct itself
    to be non-null and such lines land in ``quarantine`` — without this
    they would silently surface as all-null "good" rows.
    """
    corrupt = "_corrupt_record"
    full = T.StructType(
        list(schema.fields) + [T.StructField(corrupt, T.StringType(), True)]
    )
    parsed = spark.read.text(path).select(
        F.col("value"),
        F.from_json(
            "value",
            full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt},
        ).alias("j"),
    )
    ok = F.col("j").isNotNull() & F.col(f"j.{corrupt}").isNull()
    good = parsed.filter(ok).select("j.*").drop(corrupt)
    quarantine = parsed.filter(~ok).select(F.col("value").alias("corrupt_line"))
    return good, quarantine
