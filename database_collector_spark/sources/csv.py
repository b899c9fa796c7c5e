"""CSV corpus ingestion with corrupt-line quarantine — the delimited
sibling of sources/jsonl.py (same contract, same 100 TB rationale:
explicit schema so no inference pre-scan, one text scan splitting into
good + quarantine, parallelism from newline-splittable file layout).

``from_csv`` (codegen, like ``from_json``) parses each line against the
caller's schema with the corrupt-record column riding INSIDE the struct:
a line whose tokens can't satisfy the schema (bad numeric, wrong arity
overflowing into a type error) lands in quarantine with its raw text
instead of killing the job or silently null-filling.

Header handling is distributed-safe: with ``header=True`` every line
byte-identical to the header line is dropped — a filter, not a
"first line of the file" rule, because after splitting a 100 TB input
into tasks no worker knows file offsets; shard-concatenated corpora
(cat a.csv b.csv) shed ALL embedded header copies this way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from database_collector_spark.sources.jsonl import JSONL_DOC_SCHEMA

CSV_DOC_SCHEMA = JSONL_DOC_SCHEMA  # same documents-table contract


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType = CSV_DOC_SCHEMA,
    *,
    sep: str = ",",
    header: bool = False,
    header_line: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Read delimited text with an explicit schema; returns
    ``(good, quarantine)`` — ``good`` in exactly the caller's schema,
    ``quarantine`` the raw offending lines (``corrupt_line``).

    ``header=True`` drops lines equal to ``header_line`` (defaults to
    the schema's field names joined by ``sep``). Blank/whitespace-only
    lines quarantine — NOT via the parser (from_csv marks whitespace as
    corrupt but parses the EMPTY string to an all-null struct with no
    corrupt marker, unlike from_json's null struct), so an explicit
    blank-line predicate closes that hole.
    """
    corrupt = "_corrupt_record"
    full = T.StructType(
        list(schema.fields) + [T.StructField(corrupt, T.StringType(), True)]
    )
    lines = spark.read.text(path)
    if header:
        hdr = header_line if header_line is not None else sep.join(
            f.name for f in schema.fields
        )
        lines = lines.filter(F.col("value") != hdr)
    parsed = lines.select(
        F.col("value"),
        F.from_csv(
            "value",
            # from_csv takes a DDL string, not a StructType (unlike
            # from_json); simpleString() is the session-free conversion
            full.simpleString(),
            {
                "mode": "PERMISSIVE",
                "columnNameOfCorruptRecord": corrupt,
                "sep": sep,
                # RFC-4180 quoting: "" escapes a quote inside a quoted
                # field (Spark's default escape is backslash)
                "escape": '"',
            },
        ).alias("c"),
    )
    ok = (
        (F.trim(F.col("value")) != "")
        & F.col("c").isNotNull()
        & F.col(f"c.{corrupt}").isNull()
    )
    good = parsed.filter(ok).select("c.*").drop(corrupt)
    quarantine = parsed.filter(~ok).select(F.col("value").alias("corrupt_line"))
    return good, quarantine
