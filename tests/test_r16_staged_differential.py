"""Differential verification of the STAGED r16 gates (workloads_r16.py)
against their DuckDB oracles — the exact comparison tools/check.py (and
the external driver) runs: row count, sorted column names,
order-insensitive canonical value hash, at sf0.001; the staging rounds
re-run at sf0.01/sf0.1 through `tools/check.py --staged`.

Also LIMIT-0-sweeps the staged oracles through the shared portability
predicate and applies the blanket no-Python-UDF / no-CartesianProduct
plan invariant at staging time.
"""

from __future__ import annotations

import importlib.util

import duckdb
import pytest

from database_collector_spark import workloads_r16

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

_spec = importlib.util.spec_from_file_location("check", "/root/repo/tools/check.py")
check = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(check)


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def test_staged_sets_are_one_to_one():
    assert set(workloads_r16.QUERIES_R16) == set(workloads_r16.ORACLES_R16)


def test_staged_cohort_respects_saturation_cap():
    """Post-saturation (see the __spark_entry__ directive), the r16
    cohort can only register through deliberate 1-for-1 retirement
    swaps — keep it small enough that staged-green stays a reviewable
    evidence tier."""
    assert len(workloads_r16.QUERIES_R16) <= 3


def test_staged_oracles_have_no_arrow_unportable_columns(con):
    for name, sql in workloads_r16.ORACLES_R16.items():
        rel = con.sql(f"SELECT * FROM ({sql}) q LIMIT 0")
        for col, typ in zip(rel.columns, map(str, rel.types)):
            reason = check.unportable_type(typ)
            assert reason is None, f"{name}.{col}: {reason}"


@pytest.mark.parametrize("name", sorted(workloads_r16.QUERIES_R16))
def test_staged_gate_matches_oracle(spark, con, name):
    sdf = workloads_r16.QUERIES_R16[name](spark, SF)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    res = con.sql(workloads_r16.ORACLES_R16[name])
    o_cols = res.columns
    o_rows = res.fetchall()
    assert len(s_rows) == len(o_rows), f"{name}: rows {len(s_rows)} vs {len(o_rows)}"
    assert len(s_rows) > 0, f"{name}: trivially-empty gate"
    sc, s_canon = check.canon_rows(s_cols, s_rows)
    oc, o_canon = check.canon_rows(o_cols, o_rows)
    assert sc == oc, f"{name}: columns {sc} vs {oc}"
    assert check.value_hash(s_canon) == check.value_hash(o_canon), (
        f"{name}: value hash mismatch; first spark={s_canon[:2]} oracle={o_canon[:2]}"
    )


def test_staged_plans_have_no_python_udfs_or_cartesians(spark):
    for name, fn in workloads_r16.QUERIES_R16.items():
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
        assert "CartesianProduct" not in plan, f"{name}: cartesian product"


def test_embedding_drift_halves_really_differ(spark):
    """The gate exists to measure MOVEMENT — if a fixture change ever
    made the parity halves identical, every centroid_l2 would be 0 and
    the gate would pin nothing; require at least one label to drift."""
    rows = workloads_r16.q_embedding_drift(spark, SF).collect()
    assert any(r["centroid_l2"] > 0 for r in rows), (
        "all parity-half centroids coincide — the drift scenario is gone"
    )


def test_zipf_head_fit_slopes_are_negative_at_fixture_scale(spark):
    """Counts in the head strictly decrease with rank by construction,
    so every language's fitted slope must be negative (a zero/positive
    slope would mean a degenerate all-equal head — worth noticing)."""
    rows = workloads_r16.q_zipf_head_fit(spark, SF).collect()
    assert rows and all(
        r["slope"] is None or r["slope"] < 0 for r in rows
    )
    assert any(r["slope"] is not None for r in rows)
