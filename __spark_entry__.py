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
    # Round-5 rotation: the 29 queries whose only oracle row was round 1
    # (pytest-pinned but stale while the harness changed underneath them)
    # rotate into the window so every query has a fresh-or-r4 row.
    "set_ops", "limit_cap", "semi_anti_orders", "correlated_avg_filter",
    "window_running", "string_funcs", "date_rollup", "case_having",
    "argmax_customer", "exact_percentiles", "cube_counts", "unpivot_melt",
    "ann_ivf_probe", "ann_ivf_multiprobe", "window_frames", "date_funcs",
    "stats_moments", "range_join_buckets", "grouping_sets", "array_funcs",
    "tfidf_top_terms", "skew_salted_join", "market_share", "top_supplier",
    "cust_order_distribution", "gap_detect", "decile_stats",
    "sample_stratified", "text_token_stats",
    # changed or new this round (decile_stats/gap_detect above too):
    # approx_distinct gained an oracle, sessionization's oracle gained the
    # floor(epoch) cast, ttl_expiry_counts + multimodal_decode are new
    "approx_distinct", "sessionization", "ttl_expiry_counts",
    "multimodal_decode", "dedup_spans", "events_sliding", "ann_pq_codes",
    "ann_pq_adc", "approx_quantiles", "scd1_upsert",
    # dependents of round-5 code changes (graph.py fallback, multimodal
    # decode tiers) — re-evidence even though their own plans are unchanged
    "dedup_clusters", "curation_full", "multimodal_features",
    # canaries (green r4): flagship parity + previously-fixed rows, filling
    # the window to EXACTLY 50 — entries past 50 get no row, so this list
    # must never exceed the cap
    "pricing_summary", "long_running_sessions", "grouped_counter",
    "engine_dispatch", "label_enrich", "shipping_priority",
    "asof_join",
    "dedup_embedding_lsh_multi",
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
