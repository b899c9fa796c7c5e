"""BM25 retrieval scoring (operators/ranking.py): closed-form check
against a plain-Python reference, top-k ordering, and plan shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

from database_collector_spark.operators import ranking

DOCS = [
    Row(doc_id=0, text="hash join hash scan"),
    Row(doc_id=1, text="vector scan scan scan scan scan"),
    Row(doc_id=2, text="merge sort"),
    Row(doc_id=3, text="hash join vector hash join vector"),
]


def _py_bm25(terms, k1=1.2, b=0.75):
    toks = {r.doc_id: r.text.split(" ") for r in DOCS}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {t: sum(1 for d in toks.values() if t in d) for t in terms}
    out = {}
    for doc, words in toks.items():
        score = 0.0
        matched = 0
        for t in sorted(set(terms)):
            tf = words.count(t)
            if tf == 0:
                continue
            matched += 1
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            score += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(words) / avgdl))
        if matched:
            out[doc] = (len(words), matched, round(score, 4))
    return out


def test_bm25_scores_match_python_reference(spark):
    df = spark.createDataFrame(DOCS)
    got = {
        r["doc_id"]: (r["dl"], r["n_matched"], r["score"])
        for r in ranking.bm25_scores(df, ["hash", "join", "vector"]).collect()
    }
    want = _py_bm25(["hash", "join", "vector"])
    assert set(got) == set(want)
    for doc in want:
        assert got[doc][:2] == want[doc][:2]
        assert got[doc][2] == pytest.approx(want[doc][2], abs=1e-4)


def test_bm25_topk_orders_by_score_then_id(spark):
    df = spark.createDataFrame(DOCS)
    rows = ranking.bm25_topk(df, ["hash", "join", "vector"], k=2).collect()
    assert len(rows) == 2
    # doc 3 matches all three terms with the highest tfs -> must rank first
    assert rows[0]["doc_id"] == 3
    assert rows[0]["score"] >= rows[1]["score"]


def test_bm25_plan_stays_jvm_side(spark):
    df = spark.createDataFrame(DOCS)
    plan = ranking.bm25_scores(df, ["hash", "join"])._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # tiny df/stats sides must broadcast, not shuffle
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
