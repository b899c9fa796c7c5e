"""Weighted reservoir sampling (operators/sampling.py): exact key match
vs a Python reference, proportionality sanity, and shuffle-free plan."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from database_collector_spark.operators import sampling


def _py_key(doc_id: int, weight: int, salt: str = "") -> float:
    hx = hashlib.md5(f"{doc_id}{salt}".encode()).hexdigest()
    v = int(hx[:8], 16)
    return -math.log((v + 0.5) / 2**32) / weight


def test_weighted_reservoir_matches_python_keys(spark):
    rows = [Row(doc_id=i, w=1 + (i * 7) % 13) for i in range(200)]
    df = spark.createDataFrame(rows)
    got = sampling.weighted_reservoir(df, k=10, weight_col="w").collect()
    want = sorted(rows, key=lambda r: (_py_key(r.doc_id, r.w), r.doc_id))[:10]
    assert [r["doc_id"] for r in got] == [r.doc_id for r in want]
    for g, w in zip(got, want):
        assert g["sample_key"] == round(_py_key(w.doc_id, w.w), 6)


def test_weighted_reservoir_favors_heavy_items(spark):
    # one item with 10^6 x the weight of 999 others is essentially
    # always sampled: its expected key is ~10^6 smaller.
    rows = [Row(doc_id=i, w=1_000_000 if i == 0 else 1) for i in range(1000)]
    df = spark.createDataFrame(rows)
    got = {r["doc_id"] for r in sampling.weighted_reservoir(df, 5, "w").collect()}
    assert 0 in got


def test_weighted_reservoir_salt_changes_sample(spark):
    rows = [Row(doc_id=i, w=1) for i in range(500)]
    df = spark.createDataFrame(rows)
    a = {r["doc_id"] for r in sampling.weighted_reservoir(df, 20, "w").collect()}
    b = {
        r["doc_id"]
        for r in sampling.weighted_reservoir(df, 20, "w", salt="s2").collect()
    }
    assert a != b


def test_weighted_reservoir_plan_is_take_ordered(spark):
    df = spark.createDataFrame([Row(doc_id=i, w=1 + i % 3) for i in range(100)])
    plan = (
        sampling.weighted_reservoir(df, 5, "w")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_weighted_reservoir_by_matches_global_within_each_group(spark):
    """Per-group selection must equal running the global reservoir on
    each group separately (same keys, same salt) — the stratified form
    changes the plan, never the draw."""
    from pyspark.sql import Row

    from database_collector_spark.operators import sampling

    docs = spark.createDataFrame(
        [
            Row(doc_id=i, lang=("en" if i % 2 == 0 else "de"), w=1 + i % 5)
            for i in range(40)
        ]
    )
    per = sampling.weighted_reservoir_by(
        docs, k=4, weight_col="w", by="lang"
    ).collect()
    assert len(per) == 8
    for lang in ("en", "de"):
        got = sorted(
            (r["draw"], r["doc_id"]) for r in per if r["lang"] == lang
        )
        want_df = sampling.weighted_reservoir(
            docs.where(F.col("lang") == lang), k=4, weight_col="w"
        )
        want = [r["doc_id"] for r in want_df.collect()]
        assert [d for _, d in got] == want
        assert [d for d, _ in got] == [1, 2, 3, 4]
    # deterministic across invocations
    again = sampling.weighted_reservoir_by(
        docs, k=4, weight_col="w", by="lang"
    ).collect()
    assert sorted(map(tuple, per)) == sorted(map(tuple, again))


def test_weighted_reservoir_excludes_nonpositive_weights(spark):
    from pyspark.sql import Row

    from database_collector_spark.operators import sampling

    df = spark.createDataFrame(
        [
            Row(doc_id=1, w=10),
            Row(doc_id=2, w=0),    # zero weight: never drawn, never aborts
            Row(doc_id=3, w=-5),   # negative: same
            Row(doc_id=4, w=3),
        ]
    )
    got = {r["doc_id"] for r in sampling.weighted_reservoir(df, 10, "w").collect()}
    assert got == {1, 4}
    by = spark.createDataFrame(
        [Row(doc_id=1, g="a", w=1), Row(doc_id=2, g="a", w=0)]
    )
    got_by = {
        r["doc_id"]
        for r in sampling.weighted_reservoir_by(by, 5, "w", by="g").collect()
    }
    assert got_by == {1}
