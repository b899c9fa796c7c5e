"""Connected-components operator (operators/graph.py): known topologies."""

from __future__ import annotations

from pyspark.sql import Row

from database_collector_spark.operators import graph


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "doc_a long, doc_b long")


def _components(spark, edges, **kw):
    rows = graph.connected_components(_pairs(spark, edges), **kw).collect()
    return {r["node"]: r["component"] for r in rows}


def test_cc_isolated_pairs(spark):
    assert _components(spark, [(1, 2), (3, 4)]) == {1: 1, 2: 1, 3: 3, 4: 3}


def test_cc_chain_converges_past_diameter(spark):
    # 5-node chain: min label must travel the whole diameter
    edges = [(1, 2), (2, 3), (3, 4), (4, 5)]
    assert _components(spark, edges) == {n: 1 for n in range(1, 6)}


def test_cc_clique_and_edge_direction_irrelevant(spark):
    # triangle given with mixed orientation + a reversed pair
    edges = [(7, 6), (6, 8), (8, 7), (10, 9)]
    got = _components(spark, edges)
    assert got == {6: 6, 7: 6, 8: 6, 9: 9, 10: 9}


def test_cc_max_iter_bounds_work(spark):
    # one round is not enough for a chain of 4 -> labels not yet converged,
    # but the operator still returns a full assignment (bounded work) and
    # warns that the fixpoint was not reached
    import warnings

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        # small_graph_threshold=0 forces the distributed loop (the
        # bounded-work/truncation contract under test lives there; the
        # r16 union-find fast path always reaches the exact fixpoint)
        got = _components(
            spark, [(1, 2), (2, 3), (3, 4)], max_iter=1, small_graph_threshold=0
        )
    assert any("max_iter" in str(w.message) for w in caught)
    assert set(got) == {1, 2, 3, 4}
    assert got[2] == 1  # direct neighbor adopted the min


def test_cc_auto_fallback_closes_adversarial_chain(spark):
    # 64-node path, DEFAULT algorithm: minlabel alone would need ~63
    # rounds (> default max_iter=20), but after _STAR_FALLBACK_ROUNDS
    # non-converged rounds the operator escalates to the star variant and
    # must reach the fixpoint with NO truncation warning — adversarial
    # high-diameter inputs converge without user intervention.
    import warnings

    edges = [(i, i + 1) for i in range(1, 64)]
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        # threshold=0: the escalation contract lives in the distributed
        # loop; the default would take the r16 union-find fast path
        got = _components(spark, edges, small_graph_threshold=0)
    assert not any("max_iter" in str(w.message) for w in caught)
    assert got == {i: 1 for i in range(1, 65)}


def test_cc_star_matches_minlabel_on_small_graphs(spark):
    edges = [(1, 2), (3, 4), (7, 6), (6, 8), (8, 7), (10, 9)]
    assert _components(spark, edges, algorithm="star") == _components(spark, edges)


def test_cc_star_long_path_converges_in_log_rounds(spark):
    # 1000-node path graph: diameter 999. minlabel needs ~999 rounds;
    # large-star/small-star halves path lengths per round, so 15 rounds
    # (≈ log2(999) + slack) must reach the fixpoint WITHOUT the
    # truncation warning.
    import warnings

    n = 1000
    edges = [(i, i + 1) for i in range(1, n)]
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        got = _components(spark, edges, algorithm="star", max_iter=15)
    assert not any("max_iter" in str(w.message) for w in caught)
    assert got == {i: 1 for i in range(1, n + 1)}


def test_cc_star_truncation_warns(spark):
    import warnings

    edges = [(i, i + 1) for i in range(1, 64)]
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        got = _components(spark, edges, algorithm="star", max_iter=1)
    assert any("max_iter" in str(w.message) for w in caught)
    assert set(got) == set(range(1, 65))  # full assignment even when truncated


def test_cluster_summary_shapes(spark):
    comp = graph.connected_components(_pairs(spark, [(1, 2), (2, 3), (5, 6)]))
    rows = {
        r["component"]: (r["n_docs"], r["doc_ids"], r["roster_truncated"])
        for r in graph.cluster_summary(comp).collect()
    }
    assert rows == {1: (3, "1,2,3", False), 5: (2, "5,6", False)}


def test_cluster_summary_flags_truncated_roster_and_rejects_bad_head(spark):
    import pytest

    # a 5-member cluster with head=3: roster holds the first 3 ids,
    # n_docs stays exact, and the truncation is FLAGGED per row
    # (r13 ADVICE: the cap was silent)
    comp = graph.connected_components(
        _pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (8, 9)])
    )
    rows = {
        r["component"]: (r["n_docs"], r["doc_ids"], r["roster_truncated"])
        for r in graph.cluster_summary(comp, head=3).collect()
    }
    assert rows == {1: (5, "1,2,3", True), 8: (2, "8,9", False)}
    with pytest.raises(ValueError, match="head must be a positive int"):
        graph.cluster_summary(comp, head=0)


def test_cc_explicit_minlabel_never_escalates(spark):
    # algorithm="minlabel" pins pure min-label propagation: a 64-node
    # chain exhausts the default budget and WARNS instead of silently
    # switching to the star variant (the strictly-predictable-plan choice)
    import warnings

    edges = [(i, i + 1) for i in range(1, 64)]
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        got = _components(spark, edges, algorithm="minlabel")
    assert any("max_iter" in str(w.message) for w in caught)
    assert set(got) == set(range(1, 65))


def test_cc_auto_escalation_spends_only_remaining_budget(spark):
    # max_iter strictly bounds TOTAL rounds: with max_iter=9 on a long
    # chain, escalation fires after 8 minlabel rounds and hands star only
    # 1 remaining round — which cannot close diameter 63, so the star
    # truncation warning must fire (budget was not re-granted in full)
    import warnings

    edges = [(i, i + 1) for i in range(1, 64)]
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        got = _components(
            spark, edges, max_iter=9, small_graph_threshold=0
        )
    assert any("max_iter" in str(w.message) for w in caught)
    assert set(got) == set(range(1, 65))


def test_cc_small_graph_fast_path_matches_distributed(spark):
    # the r16 size-gated union-find fast path must be value-identical to
    # the distributed loop, forced BOTH ways on every topology class:
    # isolated pairs, a clique with mixed orientations, a chain past the
    # default diameter budget, self-loops, and duplicate edges
    topologies = [
        [(1, 2), (3, 4)],
        [(7, 6), (6, 8), (8, 7), (10, 9)],
        [(i, i + 1) for i in range(1, 40)],
        [(5, 5), (5, 6), (2, 2)],
        [(1, 2), (2, 1), (1, 2), (2, 3)],
    ]
    for edges in topologies:
        fast = _components(spark, edges)  # default gate -> fast path
        dist = _components(spark, edges, small_graph_threshold=0)
        assert fast == dist, edges


def test_cc_fast_path_string_ids(spark):
    # the fast path derives its output schema from the node type
    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "doc_a string, doc_b string"
    )
    rows = {r["node"]: r["component"] for r in graph.connected_components(df).collect()}
    assert rows == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_triangle_counts_hand_graph(spark):
    from database_collector_spark.operators.graph import triangle_counts

    # K4 on {1,2,3,4} (four triangles, each node in exactly 3),
    # a square {5,6,7,8} (no triangles), a pendant 9.
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    square = [(5, 6), (6, 7), (7, 8), (8, 5)]
    edges = spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in k4 + square + [(1, 9)]]
    )
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_normalizes_dupes_reversals_loops(spark):
    from database_collector_spark.operators.graph import triangle_counts

    edges = spark.createDataFrame(
        [
            Row(src=1, dst=2),
            Row(src=2, dst=1),  # reversed duplicate
            Row(src=2, dst=3),
            Row(src=2, dst=3),  # exact duplicate
            Row(src=3, dst=1),
            Row(src=3, dst=3),  # self-loop
        ]
    )
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_kcore_peel_labels_rounds_and_preserves_core(spark):
    from pyspark.sql import functions as F

    from database_collector_spark.operators.graph import kcore_peel

    # K5 clique (nodes 0-4) + a degrading tail: 5~{3,4,6}, 6~{4,5,7},
    # 7~{6} — each round the frontier loss drops the next node below k=3
    clique = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    tail = [(3, 5), (4, 5), (5, 6), (4, 6), (6, 7)]
    edges = spark.createDataFrame(clique + tail, "src long, dst long")
    out = {r["node"]: r["peel_round"] for r in kcore_peel(edges, k=3).collect()}
    # k=3: 7 (deg 1) falls round 1; 6 drops to deg 2 -> round 2; then 5
    assert out[7] == 1 and out[6] == 2 and out[5] == 3
    for n in range(5):
        assert out[n] is None, f"clique node {n} must survive the 3-core"

    # non-convergence is loud, never a silent partial peel
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="converge"):
        kcore_peel(edges, k=3, max_iter=2)

    # self-loops are ignored, duplicate/reversed edges deduped
    noisy = spark.createDataFrame(
        clique + tail + [(0, 0), (1, 0), (7, 6)], "src long, dst long"
    )
    out2 = {r["node"]: r["peel_round"] for r in kcore_peel(noisy, k=3).collect()}
    assert out2 == out


def test_bfs_distances_multi_source_min_hops(spark):
    from pyspark.sql import Row

    from database_collector_spark.operators.graph import bfs_distances

    # path 0-1-2-3-4-5 plus a shortcut 0-3; sources {0}
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (0, 3)],
        "src long, dst long",
    )
    srcs = spark.createDataFrame([Row(node=0)])
    got = {r["node"]: r["dist"] for r in bfs_distances(edges, srcs).collect()}
    # the shortcut makes 3 one hop away, 4 two, 5 three
    assert got == {0: 0, 1: 1, 2: 2, 3: 1, 4: 2, 5: 3}

    # multi-source: nearest source wins; hop bound truncates
    srcs2 = spark.createDataFrame([Row(node=0), Row(node=5)])
    got2 = {
        r["node"]: r["dist"]
        for r in bfs_distances(edges, srcs2, max_hops=1).collect()
    }
    assert got2 == {0: 0, 5: 0, 1: 1, 3: 1, 4: 1}

    # directed: only forward edges traversed
    got3 = {
        r["node"]: r["dist"]
        for r in bfs_distances(
            edges, spark.createDataFrame([Row(node=4)]), directed=True
        ).collect()
    }
    assert got3 == {4: 0, 5: 1}
