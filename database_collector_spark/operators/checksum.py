"""Order-insensitive table content checksum.

The collector's push path re-sends whatever it scraped (SURVEY §2.1);
any pipeline that REPLICATES tables (JDBC ingest → parquet, CDC apply,
generation-directory upserts) needs a cheap answer to "are these two
copies identical?" without sorting or shipping either side. The
standard primitive is a commutative fold of per-row hashes: identical
multisets of rows ⇒ identical checksum, regardless of partitioning,
file order, or engine.

Design: md5 over a caller-canonicalized row string, split into four
32-bit words, each SUMmed independently (sums commute — the shuffle
carries 5 numbers total). Four independent 32-bit sums make silent
collision on a real diff vanishingly unlikely while keeping every
intermediate an exact int64 (4.3e9 × row-count; past ~2e9 rows move
the sums to DECIMAL). md5 — not the engines' built-in hash() — because
both Spark and DuckDB (and most engines) agree on it byte-for-byte, so
the checksum is comparable ACROSS engines, which is the point.

Caller contract: pass columns already cast to engine-stable strings
(integers, strings, epoch longs — never raw floats/timestamps, whose
string forms differ across engines). NULLs are folded to a sentinel
that cannot collide with the empty string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NULL = "\x00null\x00"


def table_checksum(df: DataFrame, cols: tuple[str, ...]) -> DataFrame:
    """One-row DataFrame (n_rows, sum_h1..sum_h4): the order-insensitive
    content checksum of ``df[cols]``. Equal multisets of rows give equal
    checksums on any engine that agrees on md5."""
    row_hex = F.md5(
        F.concat_ws(
            "|",
            *[F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols],
        )
    )
    chunks = [
        F.conv(F.substring(row_hex, 1 + 8 * k, 8), 16, 10).cast("long")
        for k in range(4)
    ]
    return df.agg(
        F.count("*").alias("n_rows"),
        *[F.sum(chunks[k]).alias(f"sum_h{k + 1}") for k in range(4)],
    )
