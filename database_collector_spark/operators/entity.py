"""Entity resolution: multi-key blocking + union-find over structured
records.

The classic record-linkage pipeline (Fellegi–Sunter blocking stage +
transitive closure): two records are the same real-world entity if they
agree on ANY identifying key after normalization (same phone, same
normalized name, ...). Matching is therefore a union-find over the
bipartite record↔key graph; this module runs it as per-key equi-joins
feeding the repo's connected-components operator.

Scale shape, and why there is no pair explosion: candidate pairs are
generated ONLY within a blocking-key group (an equi-join per key — one
shuffle each, never a cross join). A pathological key shared by k
records contributes k·(k−1)/2 pairs, so hot keys (e.g. a default/empty
phone) must be nulled out by the caller's normalizer — the same
contract as every blocked dedup tier in ``operators/dedup.py``. The CC
fixpoint is O(diameter) rounds and entity clusters are clique-shaped
(diameter ~2), so the whole resolve is a handful of exchanges at any
scale.

The reference has no entity surface (its rows are metric samples;
collector/cmd/collector/database-collector.go processes numeric K/V
only) — this
extends the training-data-pipeline tier (SURVEY §2 extensions), where
cross-source author/record linkage is a standard curation step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from database_collector_spark.operators import graph


def normalize_name(col: F.Column) -> F.Column:
    """lowercase, strip every non-alphanumeric — '' becomes NULL so
    blanks never form a blocking group."""
    n = F.regexp_replace(F.lower(col), "[^a-z0-9]", "")
    return F.when(n != "", n)


def normalize_phone(col: F.Column) -> F.Column:
    """digits only; a leading country '1' on an 11-digit number is
    dropped; '' becomes NULL (NULL keys never block)."""
    d = F.regexp_replace(col, "[^0-9]", "")
    d = F.when(
        (F.length(d) == 11) & d.startswith("1"), F.substring(d, 2, 10)
    ).otherwise(d)
    return F.when(d != "", d)


def match_pairs(
    records: DataFrame, *, id_col: str = "record_id", keys: tuple[str, ...]
) -> DataFrame:
    """Candidate pairs (record_a < record_b) that share at least one
    non-NULL key value — one self-equi-join per key, unioned + distinct.
    NULL keys match nothing (SQL join semantics do this for free)."""
    out = None
    for k in keys:
        lhs = records.select(F.col(id_col).alias("record_a"), F.col(k).alias("_k"))
        rhs = records.select(F.col(id_col).alias("record_b"), F.col(k).alias("_k"))
        p = (
            lhs.join(rhs, "_k")
            .where(F.col("record_a") < F.col("record_b"))
            .select("record_a", "record_b")
        )
        out = p if out is None else out.unionByName(p)
    return out.distinct()


def resolve_entities(
    records: DataFrame, *, id_col: str = "record_id", keys: tuple[str, ...]
) -> DataFrame:
    """(record_id, entity_id): entity_id = min record id transitively
    reachable through shared keys (the canonical-representative
    convention every dedup tier here uses). Singleton records keep
    themselves as entity."""
    pairs = match_pairs(records, id_col=id_col, keys=keys)
    comp = graph.connected_components(
        pairs, src="record_a", dst="record_b"
    ).select(F.col("node").alias(id_col), F.col("component").alias("entity_id"))
    return (
        records.select(id_col)
        .join(comp, id_col, "left")
        .select(
            id_col,
            F.coalesce("entity_id", F.col(id_col)).alias("entity_id"),
        )
    )
