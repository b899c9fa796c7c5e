"""Oracle-portability meta-guard.

The driver canonicalizes DuckDB oracle results through Arrow/pandas, which
has no int128: a final column DuckDB types HUGEINT (e.g. any expression
over a SUM(BIGINT) CTE column) silently becomes float64 and hash-mismatches
Spark's int64 even when every value is identical (round-7 `map_funcs`).
This test prepares every registered oracle with LIMIT 0 and asserts no
final column is HUGEINT/UHUGEINT — catching the whole class before any
driver row exists.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

BANNED = {
    "HUGEINT",
    "UHUGEINT",
    # Round-8 second instance of the class: DuckDB to_timestamp() returns
    # TIMESTAMPTZ while Spark window().start is naive TIMESTAMP; the
    # driver's Arrow dtype compare sees datetime64[ns, UTC] vs
    # datetime64[ns] -> schema+hash red with rows green
    # (sliding_unique_users / sliding_unique_approx). Cast to TIMESTAMP.
    "TIMESTAMP WITH TIME ZONE",
    "TIME WITH TIME ZONE",
}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield c
    c.close()


def test_no_oracle_final_column_is_int128(con):
    bad: list[str] = []
    errs: list[str] = []
    for name, sql in entrymod.oracle_sql().items():
        try:
            rel = con.sql(f"SELECT * FROM ({sql}) __q LIMIT 0")
        except Exception as e:  # an unparseable oracle is its own failure
            errs.append(f"{name}: {e}")
            continue
        for col, typ in zip(rel.columns, rel.types):
            if str(typ).upper() in BANNED:
                bad.append(f"{name}.{col}: {typ}")
    assert not errs, "oracles failed to prepare:\n" + "\n".join(errs)
    assert not bad, (
        "oracle final columns with Arrow-unportable int128 types "
        "(cast to BIGINT in the SQL):\n" + "\n".join(bad)
    )
