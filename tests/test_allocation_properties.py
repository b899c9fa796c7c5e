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


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sizes=st.lists(st.integers(1, 40), min_size=1, max_size=5),
    cut_pct=st.sampled_from([10, 25, 40, 50, 90]),
    seed=st.integers(0, 2**31),
)
def test_percentile_filter_keep_counts_on_arbitrary_groups(
    spark, sizes, cut_pct, seed
):
    # per-group keep count must be exactly n - floor(cut * n) on
    # ARBITRARY group sizes and scores (ties included — the (score, id)
    # order is what makes cume_dist tie-free)
    import math
    import random

    from database_collector_spark.curation import relative_percentile_filter

    rng = random.Random(seed)
    rows, idc = [], 0
    for g, n in enumerate(sizes):
        for _ in range(n):
            rows.append((idc, f"g{g}", rng.randint(0, 5)))  # heavy ties
            idc += 1
    df = spark.createDataFrame(rows, "doc_id long, source string, score long")
    cut = cut_pct / 100.0
    kept = relative_percentile_filter(df, cut=cut).groupBy("source").count()
    got = {r["source"]: r["count"] for r in kept.collect()}
    want = {f"g{g}": n - math.floor(cut * n) for g, n in enumerate(sizes)}
    want = {k: v for k, v in want.items() if v > 0}
    assert got == want


def test_allocation_rejects_float_budget_and_sums_duplicate_sources(spark):
    import pytest as _pytest

    per = spark.createDataFrame(
        [("a", 100), ("a", 44), ("b", 400)], "source string, n_toks long"
    )
    with _pytest.raises(ValueError, match="non-negative int"):
        token_budget_allocation(per, 1e6)
    # duplicate source rows are summed BEFORE weighting: wt(a) =
    # floor(sqrt(144)) = 12, not sqrt(100)+sqrt(44)
    rows = {r["source"]: r for r in token_budget_allocation(per, 100).collect()}
    assert rows["a"]["n_toks"] == 144 and rows["a"]["wt"] == 12
    assert rows["b"]["wt"] == 20
    assert rows["a"]["quota"] + rows["b"]["quota"] == 100


def test_percentile_filter_rejects_reserved_columns(spark):
    import pytest as _pytest

    from database_collector_spark.curation import relative_percentile_filter

    df = spark.createDataFrame(
        [(1, "g", 5, 0.5)], "doc_id long, source string, score long, pct double"
    )
    with _pytest.raises(ValueError, match="would be overwritten"):
        relative_percentile_filter(df)
