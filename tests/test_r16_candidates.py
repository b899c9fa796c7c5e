"""Reference tests for the round-16 gate candidate pre-built in round
12: embedding snapshot drift (centroid L2 + cosine) against a plain-
Python reference — the staging bar every gate candidate clears BEFORE
its oracle twin is written.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from database_collector_spark.operators.similarity import (
    QUANT_SCALE,
    embedding_drift,
)


def _drift_ref(vecs_a, vecs_b):
    """Centroid L2 + cos over the SAME 2^20 quantization the operator
    applies (exact-integer reference, not a float re-derivation)."""
    qa = [[round(x * QUANT_SCALE) for x in v] for v in vecs_a]
    qb = [[round(x * QUANT_SCALE) for x in v] for v in vecs_b]
    dims = len(qa[0])
    sa = [sum(v[d] for v in qa) for d in range(dims)]
    sb = [sum(v[d] for v in qb) for d in range(dims)]
    na, nb = len(qa), len(qb)
    l2num = sum((sa[d] * nb - sb[d] * na) ** 2 for d in range(dims))
    l2 = math.sqrt(l2num) / (na * nb * QUANT_SCALE)
    dot = sum(sa[d] * sb[d] for d in range(dims))
    na2 = sum(x * x for x in sa)
    nb2 = sum(x * x for x in sb)
    cos = (
        dot / (math.sqrt(na2) * math.sqrt(nb2)) if na2 > 0 and nb2 > 0 else None
    )
    return round(l2, 6), (None if cos is None else round(cos, 6))


def test_embedding_drift_matches_python_reference(spark):
    vecs_a = [[0.1, 0.2, -0.3], [0.4, 0.0, 0.1], [0.2, 0.2, 0.2]]
    vecs_b = [[0.5, -0.1, 0.0], [0.3, 0.3, 0.3]]
    a = spark.createDataFrame([(v,) for v in vecs_a], "embedding array<float>")
    b = spark.createDataFrame([(v,) for v in vecs_b], "embedding array<float>")
    [r] = embedding_drift(a, b).collect()
    want_l2, want_cos = _drift_ref(vecs_a, vecs_b)
    assert (r["n_a"], r["n_b"], r["dims"]) == (3, 2, 3)
    assert r["centroid_l2"] == want_l2
    assert r["centroid_cos"] == want_cos


def test_embedding_drift_identical_snapshots_and_zero_centroid(spark):
    vecs = [[0.1, -0.1], [0.2, 0.3]]
    a = spark.createDataFrame([(v,) for v in vecs], "embedding array<float>")
    [r] = embedding_drift(a, a).collect()
    assert r["centroid_l2"] == 0.0 and r["centroid_cos"] == 1.0
    # a zero-centroid side -> NULL cosine, L2 still defined
    zero = spark.createDataFrame(
        [([0.5, -0.5],), ([-0.5, 0.5],)], "embedding array<float>"
    )
    [r] = embedding_drift(a, zero).collect()
    assert r["centroid_cos"] is None and r["centroid_l2"] is not None


def test_embedding_drift_grouped_equals_per_slice(spark):
    rows_a = [("g1", [0.1, 0.2]), ("g1", [0.3, 0.0]), ("g2", [1.0, 1.0])]
    rows_b = [("g1", [0.0, 0.1]), ("g2", [0.9, 1.1]), ("g2", [1.1, 0.9])]
    a = spark.createDataFrame(rows_a, "g string, embedding array<float>")
    b = spark.createDataFrame(rows_b, "g string, embedding array<float>")
    grouped = {
        r["g"]: (r["centroid_l2"], r["centroid_cos"])
        for r in embedding_drift(a, b, group_col="g").collect()
    }
    for g in ("g1", "g2"):
        va = [v for gg, v in rows_a if gg == g]
        vb = [v for gg, v in rows_b if gg == g]
        assert grouped[g] == _drift_ref(va, vb), g


def test_embedding_drift_dim_mismatch_raises(spark):
    a = spark.createDataFrame([([0.1, 0.2],)], "embedding array<float>")
    b = spark.createDataFrame([([0.1, 0.2, 0.3],)], "embedding array<float>")
    with pytest.raises(Exception, match="dimensionalities"):
        embedding_drift(a, b).collect()


def test_embedding_drift_null_rows_excluded(spark):
    a = spark.createDataFrame(
        [([0.1, 0.2],), (None,)], "embedding array<float>"
    )
    b = spark.createDataFrame([([0.2, 0.1],)], "embedding array<float>")
    [r] = embedding_drift(a, b).collect()
    assert r["n_a"] == 1


# ------------------------------------------------------- zipf head fit

def _ols_ref(xy):
    n = len(xy)
    sx = sum(x for x, _ in xy)
    sy = sum(y for _, y in xy)
    sxy = sum(x * y for x, y in xy)
    sxx = sum(x * x for x, _ in xy)
    syy = sum(y * y for _, y in xy)
    dx = n * sxx - sx * sx
    dy = n * syy - sy * sy
    cov = n * sxy - sx * sy
    if dx <= 0:
        return None, None, None
    slope = cov / dx
    intercept = (sy - slope * sx) / n
    r2 = (cov * cov) / (dx * dy) if dy > 0 else None
    return slope, intercept, r2


def test_zipf_head_fit_matches_python_reference(spark):
    from database_collector_spark.operators.text import zipf_head_fit

    docs = [
        # en: zipf-ish counts — "a" x8, "b" x4, "c" x2, "d" x1
        ("en", 1, "a a a a b b c d"),
        ("en", 2, "a a a a b b c"),
        # de: uniform counts -> r2 must be NULL (zero y-variance)
        ("de", 3, "x y z"),
    ]
    df = spark.createDataFrame(docs, "lang string, doc_id int, text string")
    got = {
        r["lang"]: r
        for r in zipf_head_fit(df, k=10, group_col="lang").collect()
    }
    import math

    counts = {"en": [8, 4, 2, 1], "de": [1, 1, 1]}
    for lang, cs in counts.items():
        xy = [
            (math.log10(i + 1), math.log10(c))
            for i, c in enumerate(sorted(cs, reverse=True))
        ]
        slope, intercept, r2 = _ols_ref(xy)
        r = got[lang]
        assert r["n_terms"] == len(cs)
        assert r["slope"] == pytest.approx(slope, abs=2e-6)
        assert r["intercept"] == pytest.approx(intercept, abs=2e-6)
        if r2 is None:
            assert r["r2"] is None
        else:
            assert r["r2"] == pytest.approx(r2, abs=2e-6)


def test_zipf_head_fit_k_truncates_and_single_term_is_null(spark):
    from database_collector_spark.operators.text import zipf_head_fit

    df = spark.createDataFrame(
        [("en", 1, "a a a b b c"), ("fr", 2, "solo solo")],
        "lang string, doc_id int, text string",
    )
    got = {r["lang"]: r for r in zipf_head_fit(df, k=2).collect()}
    # k=2 keeps only the top 2 of en's 3 terms
    assert got["en"]["n_terms"] == 2
    # a 1-term head has no defined slope
    assert got["fr"]["n_terms"] == 1
    assert got["fr"]["slope"] is None and got["fr"]["r2"] is None
    with pytest.raises(ValueError, match="k must be"):
        zipf_head_fit(df, k=0)


def test_zipf_head_fit_r2_is_clamped_to_unit_interval(spark):
    from database_collector_spark.operators.text import zipf_head_fit

    # the r13 ADVICE clamp: with a varying but nearly-log-equal head
    # the cancelled float dy is noise-dominated and the raw
    # cov²/(dx·dy) ratio can leave [0, 1] (or hit Inf/NaN when dy
    # rounds to 0); the reported r2 must stay inside the mathematical
    # range, with NULL still reserved for the EXACT all-counts-equal
    # guard. Counts (5, 4, 4): varying, nearly equal in log space.
    df = spark.createDataFrame(
        [("en", 1, "a a a a b b b b c c c c c")],
        "lang string, doc_id int, text string",
    )
    r = zipf_head_fit(df, k=10).collect()[0]
    assert r["r2"] is not None and 0.0 <= r["r2"] <= 1.0


def test_zipf_head_fit_rank_ties_break_on_token(spark):
    from database_collector_spark.operators.text import zipf_head_fit

    # all counts equal: ranking order comes from the token tie-break,
    # but the FIT is permutation-invariant across equal counts — pin
    # the slope at exactly 0 (horizontal line)
    df = spark.createDataFrame(
        [("en", 1, "b a c")], "lang string, doc_id int, text string"
    )
    [r] = zipf_head_fit(df, k=3).collect()
    assert r["slope"] == 0.0 and r["r2"] is None


# ------------------------------------------- bigram conditional entropy

def _cond_entropy_ref(token_lists):
    import math
    from collections import Counter

    c2: Counter = Counter()
    for toks in token_lists:
        for a, b in zip(toks, toks[1:]):
            c2[(a, b)] += 1
    if not c2:
        return None
    c1: Counter = Counter()
    for (a, _), c in c2.items():
        c1[a] += c
    total = sum(c2.values())
    t1 = sum(c * math.log(c) for c in c1.values())
    t2 = sum(c * math.log(c) for c in c2.values())
    return (t1 - t2) / total


def test_bigram_cond_entropy_matches_python_reference(spark):
    from database_collector_spark.operators.text import bigram_cond_entropy

    docs = [
        ("en", 1, "the cat sat on the mat"),
        ("en", 2, "the cat ran"),
        ("de", 3, "a b a b a"),
        ("de", 4, "a b"),
    ]
    df = spark.createDataFrame(docs, "lang string, doc_id int, text string")
    got = {r["lang"]: r for r in bigram_cond_entropy(df).collect()}
    for lang in ("en", "de"):
        toks = [t.split() for l, _, t in docs if l == lang]
        want = _cond_entropy_ref(toks)
        assert got[lang]["cond_entropy"] == pytest.approx(want, abs=1e-4)
    # de: deterministic continuations (a->b except the final a, b->a)
    assert got["de"]["n_prev"] == 2 and got["de"]["n_pairs"] == 2


def test_bigram_cond_entropy_edge_docs_excluded(spark):
    from database_collector_spark.operators.text import bigram_cond_entropy

    # zero-token, one-token, and whitespace-run docs must not crash or
    # contribute; adjacency is over the FILTERED token list
    df = spark.createDataFrame(
        [("en", 1, ""), ("en", 2, "one"), ("en", 3, "a  b"), (None, 4, "x y")],
        "lang string, doc_id int, text string",
    )
    [r] = bigram_cond_entropy(df).collect()
    assert r["lang"] == "en"
    # the only bigram is (a, b) from the double-space doc
    assert r["n_pairs"] == 1 and r["total_bigrams"] == 1
    assert r["cond_entropy"] == 0.0


def test_bigram_cond_entropy_uniform_vs_deterministic_ordering(spark):
    from database_collector_spark.operators.text import bigram_cond_entropy

    # deterministic continuations -> H = 0; branching -> H > 0
    df = spark.createDataFrame(
        [("det", 1, "a b c a b c a b c"), ("brn", 2, "a x a y a z")],
        "lang string, doc_id int, text string",
    )
    got = {r["lang"]: r["cond_entropy"] for r in bigram_cond_entropy(df).collect()}
    assert got["det"] < got["brn"]
    # a branches 3 ways uniformly, its continuations are deterministic:
    # H = 3·ln(3)/5 ≈ 0.6592
    assert got["brn"] == pytest.approx(3 * math.log(3) / 5, abs=1e-4)
