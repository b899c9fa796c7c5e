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
    # round-1 red rows, fixed this round (oracle dtype / array canon)
    "kv_numeric_parse", "conditional_agg", "sorted_list_agg", "dedup_clusters",
    "hash_split", "text_normalize", "lexical_diversity", "token_estimate",
    "length_trim", "crossmodal_join", "mixture_sample", "curation_pipeline",
    "curation_full",
    # round-1 unchecked (sat past the 50-entry window) + round-2 new gates
    "engine_rejects", "repetition_stats", "sequence_pack", "dedup_incremental",
    "ann_ivf_kmeans", "decontaminate", "dedup_simhash_pairs",
    "dedup_embedding_lsh_multi",
    "lang_id", "quality_score", "doc_fingerprint", "dedup_exact",
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_simhash",
    "similarity_topk", "ann_lsh_buckets", "dedup_embedding",
    "dedup_embedding_lsh",
    "multimodal_features", "events_hourly", "sessionization", "asof_join",
    "histogram_metrics", "summary_quantiles", "kv_pivot_wide", "json_struct_parse",
    "rollup_counts", "approx_distinct",
    # reference-parity flagships (green r1; fill the window to EXACTLY 50
    # so the core surface stays continuously re-verified — entries past 50
    # get no row, so this list must never exceed the cap)
    "pricing_summary", "long_running_sessions", "grouped_counter",
    "registry_diff", "engine_dispatch", "label_enrich", "shipping_priority",
    "topk_per_group",
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
        **workloads_ts.ORACLES_TS,
    })
