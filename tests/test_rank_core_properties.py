"""Property-based invariants for the shared rank core
(ranking.prefix_count_below) and its newest consumers — the primitive
under auc_exact, auc_by_group, spearman_by_group, calibration_curve and
quantiles_by_group, fuzzed over ARBITRARY double domains (denormals,
huge outliers, ±Inf, NaN, duplicate-heavy ties) in BOTH bucketing modes:

- below-counts equal a plain-Python strictly-below reference under
  Spark's double ordering (NaN greatest, NaN == NaN);
- refine_narrow_domains=True returns byte-identical counts (bucketing
  must never change results, only partitioning);
- quantiles_by_group equals the sort-and-index type-1 reference;
- banded_kendall_tau equals the all-banded-pairs reference.

Spark-backed — modest example counts, each example is a job.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_vals = st.one_of(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
    st.floats(min_value=-1e-300, max_value=1e-300, allow_nan=False),
    st.sampled_from(
        [0.0, 1e300, -1e300, 5e-324, float("inf"), float("-inf"), float("nan")]
    ),
)


def _below_ref(items: dict[float, int], v: float) -> int:
    if math.isnan(v):
        return sum(c for v2, c in items.items() if not math.isnan(v2))
    return sum(c for v2, c in items.items() if not math.isnan(v2) and v2 < v)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(_vals, min_size=1, max_size=40),
    counts=st.lists(st.integers(min_value=1, max_value=9), min_size=40, max_size=40),
    buckets=st.sampled_from([1, 4, 64]),
)
def test_prefix_count_below_fuzz_both_modes(spark, vals, counts, buckets):
    from database_collector_spark.operators.ranking import prefix_count_below

    items: dict[float, int] = {}
    for v, c in zip(vals, counts):
        k = next((x for x in items if math.isnan(x)), v) if math.isnan(v) else v
        items[k] = items.get(k, 0) + c
    df = spark.createDataFrame(list(items.items()), "v double, c long")
    want = {
        ("nan" if math.isnan(v) else v): _below_ref(items, v) for v in items
    }
    got_modes = []
    for refine in (False, True):
        out = prefix_count_below(
            df, [], "v", "c", coarse_buckets=buckets, refine_narrow_domains=refine
        ).collect()
        got = {
            ("nan" if math.isnan(r["v"]) else r["v"]): r["below"] for r in out
        }
        assert got == want, (refine, buckets)
        got_modes.append(got)
    assert got_modes[0] == got_modes[1]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]), st.integers(min_value=-50, max_value=50)
        ),
        min_size=1,
        max_size=60,
    )
)
def test_quantiles_by_group_fuzz(spark, data):
    from database_collector_spark.operators.ranking import quantiles_by_group

    df = spark.createDataFrame(data, "g string, v long")
    got = {r["g"]: r for r in quantiles_by_group(df, "g", "v").collect()}
    groups: dict[str, list[int]] = {}
    for g, v in data:
        groups.setdefault(g, []).append(v)
    assert set(got) == set(groups)
    for g, vals in groups.items():
        vals.sort()
        n = len(vals)
        exp = tuple(vals[math.ceil(m * n / 4) - 1] for m in (1, 2, 3))
        r = got[g]
        assert (r["n"], r["p25"], r["p50"], r["p75"]) == (n, *exp), g


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=15),  # x (tie-heavy)
            st.integers(min_value=-5, max_value=5),  # y (tie-heavy)
        ),
        min_size=2,
        max_size=25,
    ),
    band=st.sampled_from([1, 3, 7]),
)
def test_banded_kendall_tau_fuzz(spark, pts, band):
    from database_collector_spark.operators.ranking import banded_kendall_tau

    rows = [(1, x, i, y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "g int, x long, id long, y long")
    out = banded_kendall_tau(
        df, "g", x_col="x", y_col="y", id_col="id", band=band
    ).collect()
    assert len(out) == 1
    r = out[0]
    srt = sorted((x, i, y) for (_, x, i, y) in rows)
    pairs = [
        (srt[a], srt[b])
        for a in range(len(srt))
        for b in range(a + 1, min(a + band + 1, len(srt)))
    ]
    c = sum(1 for p, q in pairs if q[0] > p[0] and q[2] > p[2])
    d = sum(1 for p, q in pairs if q[0] > p[0] and q[2] < p[2])
    n0, n1 = len(pairs), sum(1 for p, q in pairs if q[0] == p[0])
    n2 = sum(1 for p, q in pairs if q[2] == p[2])
    assert (r["n_pairs"], r["concordant"], r["discordant"]) == (n0, c, d)
    denom = (n0 - n1) * (n0 - n2)
    if denom > 0:
        assert r["tau_b"] == round((c - d) / math.sqrt(denom), 6)
    else:
        assert r["tau_b"] is None
