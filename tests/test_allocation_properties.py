"""Property-based invariants for curation.token_budget_allocation:
the Spark largest-remainder apportionment must agree with a plain-Python
reference on ARBITRARY per-source token tables (zeros, ties, single
source, huge counts), and its quotas must always sum exactly to the
budget. Spark-backed — modest example counts, each example is a job."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from database_collector_spark.curation import token_budget_allocation


def _ref_alloc(pairs: list[tuple[str, int]], budget: int) -> dict:
    rows = []
    for s, n in pairs:
        wt = math.floor(math.sqrt(n))
        rows.append([s, n, wt])
    tot = sum(r[2] for r in rows)
    if tot <= 0:
        return {}
    out = []
    for s, n, wt in rows:
        out.append([s, n, wt, (budget * wt) // tot, (budget * wt) % tot])
    leftover = budget - sum(r[3] for r in out)
    bump = {
        r[0] for r in sorted(out, key=lambda r: (-r[4], r[0]))[:leftover]
    }
    return {r[0]: (r[1], r[2], r[3] + (1 if r[0] in bump else 0)) for r in out}


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ns=st.lists(st.integers(0, 10**12), min_size=1, max_size=12),
    budget=st.sampled_from([1, 17, 1000, 1_000_000]),
)
def test_allocation_matches_python_reference(spark, ns, budget):
    pairs = [(f"s{i:02d}", n) for i, n in enumerate(ns)]
    per = spark.createDataFrame(pairs, "source string, n_toks long")
    got = {
        r["source"]: (r["n_toks"], r["wt"], r["quota"])
        for r in token_budget_allocation(per, budget).collect()
    }
    want = _ref_alloc(pairs, budget)
    assert got == want
    if want:
        assert sum(q for _, _, q in got.values()) == budget
