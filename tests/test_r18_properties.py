"""Property-based invariants for the r18 order-statistics tier:
rank_select_by_group (unweighted and weighted) fuzzed against a
brute-force sorted/cumulative-weight reference over adversarial value
domains — tie-heavy multisets, negative values, wide magnitude spreads
(cells on both sides of zero), zero weights, and single-value
degenerates (everything in one log-cell). Spark-backed — modest example
counts, each example is a job.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from database_collector_spark.operators.ranking import rank_select_by_group

from rankrefs import rank_ref, wrank_ref

_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# tie-heavy: small value pool; wide: magnitudes spanning many cells
_values = st.one_of(
    st.integers(min_value=-3, max_value=3),
    st.integers(min_value=-(10**9), max_value=10**9),
)


@_settings
@given(
    groups=st.dictionaries(
        st.sampled_from(["a", "b", "c"]),
        st.lists(_values, min_size=1, max_size=25),
        min_size=1,
        max_size=3,
    )
)
def test_rank_select_fuzz_matches_sorted_reference(spark, groups):
    rows = [Row(g=g, v=v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        r["g"]: r.asDict()
        for r in rank_select_by_group(
            df,
            "g",
            "v",
            {"lo": "1", "q1": "(n + 3) div 4", "med": "(n + 1) div 2", "hi": "n"},
        ).collect()
    }
    assert set(got) == set(groups)
    for g, vs in groups.items():
        n = len(vs)
        assert got[g]["n"] == n
        assert got[g]["lo"] == rank_ref(vs, 1)
        assert got[g]["q1"] == rank_ref(vs, (n + 3) // 4)
        assert got[g]["med"] == rank_ref(vs, (n + 1) // 2)
        assert got[g]["hi"] == rank_ref(vs, n)


@_settings
@given(
    groups=st.dictionaries(
        st.sampled_from(["a", "b"]),
        st.lists(
            st.tuples(_values, st.integers(min_value=0, max_value=9)),
            min_size=1,
            max_size=20,
        ),
        min_size=1,
        max_size=2,
    )
)
def test_rank_select_weighted_fuzz_matches_cumweight_reference(spark, groups):
    rows = [Row(g=g, v=v, w=w) for g, ps in groups.items() for v, w in ps]
    df = spark.createDataFrame(rows, "g string, v long, w long")
    got = {
        r["g"]: r.asDict()
        for r in rank_select_by_group(
            df,
            "g",
            "v",
            {"wmed": "(n + 1) div 2", "wlo": "1", "whi": "n"},
            weight_col="w",
        ).collect()
    }
    assert set(got) == set(groups)
    for g, ps in groups.items():
        total = sum(w for _, w in ps)
        assert got[g]["n"] == total
        assert got[g]["wmed"] == wrank_ref(ps, (total + 1) // 2)
        assert got[g]["wlo"] == wrank_ref(ps, 1)
        assert got[g]["whi"] == wrank_ref(ps, total)
