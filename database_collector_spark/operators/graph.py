"""Graph operators for dedup clustering (extension surface).

Near-dup detection emits PAIRS (dedup.py); a pipeline needs CLUSTERS —
"keep one document per connected component of the similarity graph".
The reference has no graph surface (SURVEY.md §2.3: no joins at all);
this is a pure extension sized for the 100 TB path.

``connected_components`` is iterative min-label propagation expressed as
DataFrame joins: each round every node adopts the minimum label among
itself and its neighbors. Rounds = graph diameter; similarity graphs from
dedup are overwhelmingly tiny cliques/chains (diameter 2-4), so 3-5
rounds close them. Each round is one shuffle join + one aggregation —
the same per-round cost profile GraphX/Pregel would have — and lineage is
truncated per round with ``localCheckpoint`` so the plan does not grow
(an un-checkpointed iterative join re-plans the full chain every action
and eventually overwhelms the optimizer). Convergence is detected by a
changed-label count, one lightweight action per round.

For adversarial high-diameter graphs the alternating large-star/
small-star variant (Kiveris et al., "Connected Components in MapReduce
and Beyond") converges in O(log d) rounds with the same join primitive;
``max_iter`` bounds the work either way and the fixpoint test makes
termination explicit rather than silent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    *,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """Undirected connected components of an edge list.

    Input: a pair DataFrame with two node-id columns (``src``, ``dst``).
    Output: ``(node, component)`` where component = min node id reachable
    — the canonical-representative convention of exact_dedup (min doc_id
    keeps the keep-first policy uniform across dedup tiers).
    """
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # dedup pair graphs are usually tiny relative to the cluster; collapse
    # them to one partition so each fixpoint round is one task, not
    # shuffle-partitions tasks of a few rows each (size-gated: a big graph
    # keeps its parallelism)
    if edges.count() < 100_000:
        edges = edges.coalesce(1)
    # fused round 0: initially every neighbor's label IS its id, so the
    # first propagation needs no join — label = min(node, neighbors)
    # straight off the edge list (one aggregation, one round saved)
    labels = (
        edges.groupBy("u")
        .agg(F.min("v").alias("mnv"))
        .select(
            F.col("u").alias("node"),
            F.least(F.col("u"), F.col("mnv")).alias("component"),
        )
    )
    for _ in range(max_iter):
        # min over own label and every neighbor's label; labels only ever
        # decrease, so "changed" is detectable inside the same pass (a
        # flag column) instead of a separate old-vs-new shuffle join
        neighbor_labels = (
            edges.join(labels, edges["v"] == labels["node"])
            .select(F.col("u").alias("node"), "component")
        )
        mins = (
            labels.union(neighbor_labels)
            .groupBy("node")
            .agg(F.min("component").alias("mn"))
        )
        new_labels = (
            labels.withColumnRenamed("component", "old")
            .join(mins, "node")
            .select(
                "node",
                F.col("mn").alias("component"),
                (F.col("mn") < F.col("old")).alias("chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter("chg").count()  # narrow scan, no shuffle
        labels = new_labels.drop("chg")
        if changed == 0:
            break
    return labels


def cluster_summary(components: DataFrame) -> DataFrame:
    """(component, n_docs, doc_ids sorted) — the dedup-cluster report:
    every doc except the component id itself is a candidate for removal.
    ``doc_ids`` is the numerically-sorted id list joined with ',' — a
    scalar column, so differential harnesses (and lake formats without
    nested-type support) consume it directly."""
    return components.groupBy("component").agg(
        F.count("*").alias("n_docs"),
        F.array_join(
            F.expr("transform(sort_array(collect_list(node)), x -> CAST(x AS STRING))"),
            ",",
        ).alias("doc_ids"),
    )
