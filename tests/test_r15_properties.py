"""Property-based invariants for the round-15 candidate operators —
Krippendorff's alpha, exact Gini, and boundary-splitting packing fuzzed
against plain-Python references over adversarial inputs (uneven panels,
single-vote items, tie-heavy value domains, straddling documents).
Spark-backed — modest example counts, each example is a job.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from database_collector_spark.curation import pack_segments
from database_collector_spark.operators.ranking import (
    gini_by_group,
    krippendorff_alpha,
)

_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _alpha_ref(votes):
    items: dict = {}
    for it, c in votes:
        items.setdefault(it, []).append(c)
    pair = {it: cs for it, cs in items.items() if len(cs) >= 2}
    n_p = sum(len(cs) for cs in pair.values())
    if n_p < 2:
        return None
    cats = sorted({c for cs in pair.values() for c in cs})
    t = {c: sum(cs.count(c) for cs in pair.values()) for c in cats}
    d_e_num = n_p**2 - sum(v**2 for v in t.values())
    if d_e_num == 0:
        return None
    d_o = sum(
        (len(cs) ** 2 - sum(cs.count(c) ** 2 for c in cats)) / (len(cs) - 1)
        for cs in pair.values()
    ) / n_p
    d_e = d_e_num / (n_p * (n_p - 1))
    return 1 - d_o / d_e


@_settings
@given(
    votes=st.lists(
        st.tuples(st.integers(min_value=0, max_value=9), st.integers(0, 3)),
        min_size=1,
        max_size=60,
    )
)
def test_krippendorff_fuzz_matches_reference(spark, votes):
    df = spark.createDataFrame(votes, "item_id int, category int")
    [r] = krippendorff_alpha(df).collect()
    want = _alpha_ref(votes)
    if want is None:
        assert r["alpha"] is None
    else:
        assert r["alpha"] is not None
        assert abs(r["alpha"] - round(want, 6)) <= 2e-6


def _gini_ref(xs):
    # EXACT rational half-up at 6 decimals, all in Python integers —
    # the operator quantizes the same way in-plan ((2e6·num + den) div
    # (2·den) over DECIMAL(38,0)), so the reference asserts the exact
    # mathematical value, not "whatever the engines happen to round"
    # (the r15 midpoint flake: gini([100, 431, 644, 745]) = 2148/7680 =
    # 0.2796875 exactly, where round(double, 6) differs per engine).
    s = sum(xs)
    if s == 0:
        return None
    n = len(xs)
    num = sum(a - b for a in xs for b in xs if a > b)  # = Σ|a−b| / 2
    den = n * s
    return (2_000_000 * num + den) // (2 * den) / 1e6


@_settings
@given(
    xs=st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=60),
    buckets=st.sampled_from([1, 4, 64]),
)
def test_gini_fuzz_matches_reference(spark, xs, buckets):
    df = spark.createDataFrame([(x,) for x in xs], "v long")
    [r] = gini_by_group(df, "v", coarse_buckets=buckets).collect()
    assert (r["n"], r["total"], r["gini"]) == (len(xs), sum(xs), _gini_ref(xs))


@_settings
@given(
    toks=st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=25),
    budget=st.integers(min_value=1, max_value=7),
)
def test_pack_segments_fuzz_invariants(spark, toks, budget):
    """Random per-doc token counts, one stream: segments must cover each
    doc exactly, respect chunk boundaries, and fill every chunk except
    the last to exactly `budget` tokens."""
    rows = [("s", i, " ".join(["t"] * n) if n else "") for i, n in enumerate(toks)]
    df = spark.createDataFrame(rows, "lang string, doc_id int, text string")
    got = pack_segments(
        df, budget_tokens=budget, stream_col="lang", order_col="doc_id"
    ).collect()
    per_doc: dict[int, list] = {}
    per_chunk: dict[int, int] = {}
    for r in got:
        assert 0 <= r["tok_from"] < r["tok_to"] <= r["n_tokens"]
        per_doc.setdefault(r["doc_id"], []).append((r["tok_from"], r["tok_to"]))
        per_chunk[r["chunk_id"]] = per_chunk.get(r["chunk_id"], 0) + (
            r["tok_to"] - r["tok_from"]
        )
    # full per-document coverage, contiguous
    for i, n in enumerate(toks):
        if n == 0:
            assert i not in per_doc
            continue
        segs = sorted(per_doc[i])
        assert segs[0][0] == 0 and segs[-1][1] == n
        for (a, b), (c, d) in zip(segs, segs[1:]):
            assert b == c
    # every chunk except the last is exactly full
    if per_chunk:
        chunks = sorted(per_chunk)
        for c in chunks[:-1]:
            assert per_chunk[c] == budget
        assert sum(per_chunk.values()) == sum(toks)
