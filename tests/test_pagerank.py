"""PageRank (operators/graph.py): Python-reference equivalence, mass
conservation, dangling redistribution, and the exact-integer variant's
agreement with the double variant."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from database_collector_spark.operators import graph


def _py_pagerank(edges, n_nodes, n_iter, d=0.85):
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    r = {v: 1.0 / n_nodes for v in range(n_nodes)}
    for _ in range(n_iter):
        nxt = {v: 0.0 for v in range(n_nodes)}
        for s, t in edges:
            nxt[t] += r[s] / out[s]
        dangling = sum(r[v] for v in range(n_nodes) if v not in out)
        r = {
            v: (1 - d) / n_nodes + d * (nxt[v] + dangling / n_nodes)
            for v in range(n_nodes)
        }
    return r


EDGES = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 0), (4, 0)]
GRAPH_N = 6  # node 5 has no out-edges -> exercises dangling-mass redistribution


def test_pagerank_matches_python_reference(spark):
    edges = spark.createDataFrame([Row(src=s, dst=t) for s, t in EDGES])
    nodes = spark.createDataFrame([Row(node=v) for v in range(GRAPH_N)])
    got = {r["node"]: r["rank"] for r in graph.pagerank(edges, nodes, n_iter=5).collect()}
    want = _py_pagerank(EDGES, GRAPH_N, 5)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_uniform_exact_agrees_with_double(spark):
    n = 50
    rows = []
    for v in range(n):
        for t in ((2 * v + 1) % n, (3 * v + 7) % n, (5 * v + 11) % n):
            rows.append(Row(src=v, dst=t))
    edges = spark.createDataFrame(rows)
    nodes = spark.createDataFrame([Row(node=v) for v in range(n)])
    exact = {
        r["node"]: r["rank_ppb"] / 1e9
        for r in graph.pagerank_uniform_exact(edges, nodes, n_iter=4, outdeg=3).collect()
    }
    dbl = {
        r["node"]: r["rank"] for r in graph.pagerank(edges, nodes, n_iter=4).collect()
    }
    for v in range(n):
        assert exact[v] == pytest.approx(dbl[v], abs=1e-7)
    assert sum(exact.values()) == pytest.approx(1.0, abs=1e-5)
