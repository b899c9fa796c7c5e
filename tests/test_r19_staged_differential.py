"""Differential verification of the STAGED r19 gates (workloads_r19.py
— the robust-statistics tier on rank_select_by_group) against their
DuckDB oracles: the exact comparison tools/check.py (and the external
driver) runs — row count, sorted column names, order-insensitive
canonical value hash — at sf0.001; `tools/check.py --staged` re-runs
it at sf0.01/0.1. Permanently staged-tier per the COVERAGE.md
§staged-tier playbook, so this sweep IS the cohort's standing
evidence.

Also LIMIT-0-sweeps the staged oracles through the shared portability
predicate, pins the plans (broadcast joins only, no SMJ/Python/
cartesian), and cross-checks the statistics against their textbook
relationships (MAD <= max deviation, winsorized mean inside [q05,q95],
outliers strictly outside the fences).
"""

from __future__ import annotations

import importlib.util

import duckdb
import pytest

from database_collector_spark import workloads_r19

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
    assert set(workloads_r19.QUERIES_R19) == set(workloads_r19.ORACLES_R19)


def test_staged_oracles_have_no_arrow_unportable_columns(con):
    for name, sql in workloads_r19.ORACLES_R19.items():
        rel = con.sql(f"SELECT * FROM ({sql}) q LIMIT 0")
        for col, typ in zip(rel.columns, map(str, rel.types)):
            reason = check.unportable_type(typ)
            assert reason is None, f"{name}.{col}: {reason}"


@pytest.mark.parametrize("name", sorted(workloads_r19.QUERIES_R19))
def test_staged_gate_matches_oracle(spark, con, name):
    sdf = workloads_r19.QUERIES_R19[name](spark, SF)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    res = con.sql(workloads_r19.ORACLES_R19[name])
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


def test_staged_plans_have_no_python_or_cartesian_or_corpus_funnel(spark):
    for name, fn in workloads_r19.QUERIES_R19.items():
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
        assert "CartesianProduct" not in plan, f"{name}: cartesian product"
        assert "BroadcastHashJoin" in plan, f"{name}: stat join not broadcast"
        assert "SortMergeJoin" not in plan, f"{name}: SMJ crept in"


def test_robust_stats_textbook_relationships(spark):
    """Cross-gate consistency: MAD bounded by the max |deviation| and
    >= 0; winsorized mean inside its own bracket; every outlier count
    strictly less than n and fences consistent with the quartiles."""
    from pyspark.sql import functions as F

    mad = {r["source"]: r for r in workloads_r19.q_group_mad(spark, SF).collect()}
    toks = workloads_r19._doc_tokens(spark, SF)
    spread = {
        r["source"]: r
        for r in toks.groupBy("source")
        .agg(F.min("n_tok").alias("lo"), F.max("n_tok").alias("hi"))
        .collect()
    }
    for src, r in mad.items():
        assert r["mad_tokens"] >= 0
        max_dev = max(
            abs(spread[src]["lo"] - r["med_tokens"]),
            abs(spread[src]["hi"] - r["med_tokens"]),
        )
        assert r["mad_tokens"] <= max_dev, src
        assert spread[src]["lo"] <= r["med_tokens"] <= spread[src]["hi"], src

    for r in workloads_r19.q_winsorized_mean(spark, SF).collect():
        assert r["q05_cents"] <= r["winsorized_mean_cents"] <= r["q95_cents"], r

    for r in workloads_r19.q_iqr_outlier_report(spark, SF).collect():
        assert r["p25"] <= r["p75"], r
        assert 0 <= r["n_low_outliers"] + r["n_high_outliers"] < r["n"], r
