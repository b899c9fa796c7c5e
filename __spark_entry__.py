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
    workloads_ir,
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
    # Round-8 rotation, part 1 — RED-ROW RETEST: map_funcs was r7's one
    # red driver row (hash-only mismatch). Root cause was oracle-side:
    # DuckDB typed `f_cents` HUGEINT (expression over a SUM(BIGINT) CTE
    # column) and the driver's Arrow canonicalization rendered it
    # float64 vs Spark's int64. The oracle now casts to BIGINT, and
    # tests/test_oracle_schemas.py LIMIT-0-sweeps all oracles so the
    # class cannot recur (time_weighted_avg / prorate_daily /
    # rollup_cascade had the same latent bug and are cast too).
    "map_funcs",
    # part 2 — MANDATORY: the 35 gates with no driver CORRECTNESS row in
    # any round (== queries() minus the union of CORRECTNESS_r*.json
    # keys; pinned by tests/test_docs_consistency.py). All green in the
    # local tools/check.py harness.
    "null_safe_join", "bag_set_ops", "corr_matrix", "weighted_median",
    "decayed_counts", "table_checksum", "supplier_diversity",
    "capped_balance", "benford_audit", "skyline_orders", "dist_drift",
    "waiting_suppliers", "kfold_split", "filter_funnel",
    "embedding_covariance", "jaccard_join_exact",
    "embedding_dedup_clusters", "pmi_collocations", "triangle_count",
    "chunk_documents", "oov_rate", "pit_join", "time_weighted_avg",
    "interval_coalesce", "prorate_daily", "session_paths",
    "rollup_cascade", "interpolate_linear", "pattern_detect",
    "time_to_convert", "error_impact", "freshness_audit",
    "value_histogram", "sliding_unique_users", "variant_json",
    # part 3 — gates NEW in round 8 (never driver-checked).
    "multimodal_png", "sliding_unique_approx", "bigram_logppl",
    "m4_downsample", "kmv_intersection", "corpus_shuffle",
    "ann_sq8_topk", "entity_resolution", "cms_join_size",
    "rrf_fusion", "kcore_peel", "dedup_containment", "psi_drift",
    # part 4 — backfill: oldest driver evidence is the r5-latest cohort;
    # semantic flagships first per the r7 verdict's rotation directive.
    "long_running_sessions",
    # Window is EXACTLY 50 — entries past 50 get no driver row.
    # r9 MANDATORY HEAD: any red r8 rows first, then the r9-new gates —
    # the THIRTEEN staged in workloads_r9.py with pre-verified oracles
    # (readability_scores, temperature_mixture, quality_classifier,
    # weighted_sample_by, jl_projection, embedding_outliers,
    # corpus_diff, bpe_fertility, auc_scores, lang_confusion,
    # interval_outages, bfs_hops,
    # shard_overlap; registration = import QUERIES_R9/ORACLES_R9 into
    # the dicts below + list them here) plus any further r9 additions,
    # then the remaining r5-latest cohort — semantic flagships
    # asof_join, sessionization, skew_salted_join, dedup_spans,
    # label_enrich, grouping_sets, range_join_buckets first (they were
    # displaced from the r8 backfill by the 13 r8-new gates), then
    # (ann_pq_adc, ann_pq_codes, approx_distinct, approx_quantiles,
    # argmax_customer, correlated_avg_filter, cube_counts,
    # cust_order_distribution, date_rollup, dedup_embedding_lsh_multi,
    # gap_detect, grouped_counter, semi_anti_orders, shipping_priority,
    # stats_moments, text_token_stats, array_funcs, case_having,
    # date_funcs, string_funcs, set_ops, limit_cap, engine_dispatch,
    # sample_stratified, tfidf_top_terms, ttl_expiry_counts,
    # events_sliding, ann_ivf_multiprobe, ann_ivf_probe,
    # window_frames, window_running, unpivot_melt, top_supplier,
    # market_share, decile_stats, exact_percentiles), then the r6-latest
    # cohort oldest-first.
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
        **workloads_ir.QUERIES_IR,
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
        **workloads_ir.ORACLES_IR,
        **workloads_pq.ORACLES_PQ,
        **workloads_ts.ORACLES_TS,
    })
