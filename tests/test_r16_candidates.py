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
