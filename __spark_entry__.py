"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementations live in ``database_collector_spark.workloads`` (and the
operator modules it calls); this file is the thin driver-facing shim.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from database_collector_spark import (
    workloads,
    workloads2,
    workloads3,
    workloads4,
    workloads5,
    workloads_ext,
    workloads_pq,
    workloads_ts,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return workloads.q_pricing_summary(spark, "/root/testdata/sf0.001")


# The external driver correctness-checks the FIRST 50 entries of queries()
# in dict order. Entries are therefore ordered by evidence need: queries
# whose oracle rows were red or absent in the previous round's
# CORRECTNESS report come first, then this round's new queries, then a
# representative slice of the reference-parity flagships; queries with a
# green row in a prior round sort last (their implementations are
# unchanged and pinned by pytest).
_CHECK_FIRST = [
    # Round-6 rotation: the 37 queries whose latest oracle row is round 4
    # rotate back in, so no query's green evidence is older than two
    # rounds.
    "ann_ivf_kmeans", "ann_lsh_buckets", "conditional_agg",
    "crossmodal_join", "curation_pipeline", "decontaminate",
    "dedup_embedding", "dedup_embedding_lsh", "dedup_exact",
    "dedup_incremental", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dedup_simhash", "dedup_simhash_pairs", "doc_fingerprint",
    "engine_rejects", "events_hourly", "hash_split", "histogram_metrics",
    "json_struct_parse", "kv_numeric_parse", "kv_pivot_wide", "lang_id",
    "length_trim", "lexical_diversity", "mixture_sample", "quality_score",
    "registry_diff", "repetition_stats", "rollup_counts", "sequence_pack",
    "similarity_topk", "sorted_list_agg", "summary_quantiles",
    "text_normalize", "token_estimate", "topk_per_group",
    # new gates this round: real frame demux, SCD-2 history, symmetric
    # interval join batch twin, MG heavy hitters, CDC apply with deletes,
    # incremental aggregate maintenance
    "multimodal_frames", "scd2_history", "interval_join_events",
    "heavy_hitters", "cdc_apply", "incremental_agg", "snapshot_diff",
    # touched by round-6 code changes: scd1's fixture lost its
    # nondeterministic key-0 collision; graph.py escalation/budget changed
    # under dedup_clusters + curation_full; multimodal extract_features
    # gained nullable-int output arrays under multimodal_features/_decode
    "scd1_upsert", "dedup_clusters", "curation_full",
    "multimodal_features", "multimodal_decode",
    # canary (green r5): the entry() flagship, filling the window to
    # EXACTLY 50 — entries past 50 get no row, so this list must never
    # exceed the cap
    "pricing_summary",
]
assert len(_CHECK_FIRST) == 50, f"check window holds {len(_CHECK_FIRST)}, not 50"


def _ordered(all_entries: dict) -> dict:
    head = {name: all_entries[name] for name in _CHECK_FIRST if name in all_entries}
    return {**head, **{k: v for k, v in all_entries.items() if k not in head}}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 + extensions."""
    return _ordered({
        **workloads.QUERIES,
        **workloads2.QUERIES2,
        **workloads3.QUERIES3,
        **workloads4.QUERIES4,
        **workloads5.QUERIES5,
        **workloads_ext.QUERIES_EXT,
        **workloads_pq.QUERIES_PQ,
        **workloads_ts.QUERIES_TS,
    })


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each ``queries()`` entry."""
    return _ordered({
        **workloads.ORACLES,
        **workloads2.ORACLES2,
        **workloads3.ORACLES3,
        **workloads4.ORACLES4,
        **workloads5.ORACLES5,
        **workloads_ext.ORACLES_EXT,
        **workloads_pq.ORACLES_PQ,
        **workloads_ts.ORACLES_TS,
    })
