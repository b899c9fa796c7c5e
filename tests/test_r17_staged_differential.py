"""Differential verification of the STAGED r17 gates (workloads_r17.py)
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

from database_collector_spark import workloads_r17

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
    assert set(workloads_r17.QUERIES_R17) == set(workloads_r17.ORACLES_R17)


def test_staged_cohort_respects_saturation_cap():
    """Post-saturation (see the __spark_entry__ directive), the r17
    cohort can only register through deliberate 1-for-1 retirement
    swaps — keep it small enough that staged-green stays a reviewable
    evidence tier."""
    assert len(workloads_r17.QUERIES_R17) <= 3


def test_staged_oracles_have_no_arrow_unportable_columns(con):
    for name, sql in workloads_r17.ORACLES_R17.items():
        rel = con.sql(f"SELECT * FROM ({sql}) q LIMIT 0")
        for col, typ in zip(rel.columns, map(str, rel.types)):
            reason = check.unportable_type(typ)
            assert reason is None, f"{name}.{col}: {reason}"


@pytest.mark.parametrize("name", sorted(workloads_r17.QUERIES_R17))
def test_staged_gate_matches_oracle(spark, con, name):
    sdf = workloads_r17.QUERIES_R17[name](spark, SF)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    res = con.sql(workloads_r17.ORACLES_R17[name])
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
    for name, fn in workloads_r17.QUERIES_R17.items():
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
        assert "CartesianProduct" not in plan, f"{name}: cartesian product"


def test_table_profile_is_one_scan_one_expand(spark):
    """The profile's 100 TB contract: EVERY column's count/distinct
    rides ONE pass — one scan of orders, the multi-distinct Expand, and
    no per-column re-aggregation chain (adding a column must never add
    a pass)."""
    plan = (
        workloads_r17.q_table_profile(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") + plan.count("FileScan") >= 1
    # exactly one scan: a per-column loop would show one per column
    assert plan.count("orders.parquet") == 1, plan[:2000]
    assert "Expand" in plan


def test_fk_orphan_report_joins_compressed_keys_not_fact_rows(spark):
    """The anti join must consume the DISTINCT-key compressions: both
    join inputs are aggregates, so no plan path joins raw fact rows."""
    plan = (
        workloads_r17.q_fk_orphan_report(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftAnti" in plan
    assert "BatchEvalPython" not in plan
    # scalar totals attach via bounded single-row joins, and the only
    # cartesian-free mechanism for those is broadcast
    assert "CartesianProduct" not in plan


def test_key_uniqueness_verdicts_and_conservation(spark):
    """The fixture exercises both verdicts: doc_id is a key,
    (lang, source) is the deliberate non-key. content_md5 is
    SF-dependent (exact text duplicates exist at sf0.1 but not
    sf0.001), so only its self-consistency is pinned here — each dup
    key contributes at least 2 dup rows."""
    rows = {
        r["key_name"]: r
        for r in workloads_r17.q_key_uniqueness(spark, SF).collect()
    }
    assert rows["doc_id"]["is_unique"] is True
    assert rows["doc_id"]["n_dup_rows"] == 0
    assert rows["lang_source"]["is_unique"] is False
    assert rows["lang_source"]["n_dup_rows"] > rows["lang_source"]["n_dup_keys"]
    cm = rows["content_md5"]
    assert cm["n_dup_rows"] >= 2 * cm["n_dup_keys"]
    assert cm["is_unique"] is (cm["n_dup_keys"] == 0)
    # conservation: every key set partitions the same row count
    n = {r["n_rows"] for r in rows.values()}
    assert len(n) == 1
