"""Differential verification of the STAGED r11 gates (workloads_r11.py)
against their DuckDB oracles — the exact comparison tools/check.py (and
the external driver) runs: row count, sorted column names,
order-insensitive canonical value hash. Run at sf0.001 so the suite
stays fast; the registration round re-runs everything at sf0.01 through
the normal harness (`tools/check.py --staged` does it today).

Also LIMIT-0-sweeps the staged oracles through the WIDENED portability
predicate (tools/check.py::unportable_type — HUGEINT/TIMESTAMPTZ scalar
classes AND any nested []/STRUCT/MAP/UNION final type, the r9
jl_projection class) so the staged twins enter r11 already clean.
"""

from __future__ import annotations

import importlib.util

import duckdb
import pytest

from database_collector_spark import workloads_r11

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
    assert set(workloads_r11.QUERIES_R11) == set(workloads_r11.ORACLES_R11)


def test_staged_oracles_have_no_arrow_unportable_columns(con):
    for name, sql in workloads_r11.ORACLES_R11.items():
        rel = con.sql(f"SELECT * FROM ({sql}) q LIMIT 0")
        for col, typ in zip(rel.columns, map(str, rel.types)):
            reason = check.unportable_type(typ)
            assert reason is None, f"{name}.{col}: {reason}"


@pytest.mark.parametrize("name", sorted(workloads_r11.QUERIES_R11))
def test_staged_gate_matches_oracle(spark, con, name):
    sdf = workloads_r11.QUERIES_R11[name](spark, SF)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    res = con.sql(workloads_r11.ORACLES_R11[name])
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
    """The blanket plan invariant the registered gates get from
    test_plan_quality.py, applied at staging time: nothing in the r11
    tier may fall back to row-at-a-time Python eval or an unbroadcast
    cartesian product."""
    for name, fn in workloads_r11.QUERIES_R11.items():
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
        assert "CartesianProduct" not in plan, f"{name}: cartesian product"


def test_every_staged_gate_is_documented_and_window_headed():
    # the r11 cohort REGISTERED in round 11: every gate must either sit
    # in the live check window (awaiting its driver row) or already
    # carry one from a past round — the rotation-proof form (the
    # window-membership-only assertion broke the moment the r10 cohort
    # rotated out) — and have a REGISTERED r11 COVERAGE row naming it
    import glob
    import json

    import __spark_entry__ as entrymod

    seen: set[str] = set()
    for f in glob.glob("/root/repo/CORRECTNESS_r*.json"):
        with open(f) as fh:
            seen |= set(json.load(fh))
    cov = open("/root/repo/COVERAGE.md").read()
    for name in workloads_r11.QUERIES_R11:
        assert name in seen or name in entrymod._CHECK_FIRST, (
            f"{name}: no driver row and not in the current window"
        )
        assert f"`{name}`" in cov, f"{name} missing a COVERAGE row"
    assert cov.count("REGISTERED r11") == len(workloads_r11.QUERIES_R11), (
        "REGISTERED r11 COVERAGE rows must be 1:1 with the r11 cohort"
    )


def test_r11_cohort_is_fully_registered():
    # the inverse of the pre-registration shadow check: since round 11
    # every r11 name must resolve in the REGISTERED surface with the
    # module's own callable/SQL (the _ordered merge must not have
    # dropped or shadowed any)
    import __spark_entry__ as entrymod

    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    for name in workloads_r11.QUERIES_R11:
        assert qs[name] is workloads_r11.QUERIES_R11[name], name
        assert os_[name] == workloads_r11.ORACLES_R11[name], name


def test_r11_registration_dry_run_composes(spark):
    """Simulate the r11 registration: merging QUERIES_R11/ORACLES_R11
    into the registered dicts must yield a 1:1 query/oracle surface
    where every staged name resolves."""
    import __spark_entry__ as entrymod

    q = {**entrymod.queries(), **workloads_r11.QUERIES_R11}
    o = {**entrymod.oracle_sql(), **workloads_r11.ORACLES_R11}
    assert set(q) == set(o)
    for name in workloads_r11.QUERIES_R11:
        assert callable(q[name]) and isinstance(o[name], str)


def test_semdedup_prune_is_nontrivial(spark):
    """The gate must actually DROP something at the fixture SFs — a
    threshold that never fires would pass the differential trivially
    (every row dropped=false)."""
    out = workloads_r11.QUERIES_R11["semdedup_prune"](spark, SF)
    n_dropped = out.filter("dropped").count()
    assert n_dropped > 0


def test_substring_spans_are_maximal_and_covered(spark):
    """Span contract: spans are >= k tokens, starts positive, and no two
    spans of one doc overlap or touch (maximality: touching spans would
    have merged)."""
    rows = (
        workloads_r11.QUERIES_R11["substring_dedup"](spark, SF)
        .orderBy("doc_id", "span_start")
        .collect()
    )
    assert rows
    k = workloads_r11._SUBSTR_K
    prev = {}
    for r in rows:
        assert r["span_tokens"] >= k
        assert r["span_start"] >= 1
        assert r["span_end"] == r["span_start"] + r["span_tokens"] - 1
        if r["doc_id"] in prev:
            # islands split only when the position gap exceeds k, so
            # distinct spans never overlap or touch (start >= prev
            # end + 2); touching spans would have merged
            assert r["span_start"] > prev[r["doc_id"]] + 1
        prev[r["doc_id"]] = r["span_end"]
