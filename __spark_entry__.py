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
    workloads_r9,
    workloads_r10,
    workloads_r11,
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
    # Round-11 rotation, part 1 — NEW GATES: CORRECTNESS_r10 was 50/50
    # green (zero red rows anywhere, the first fully-green window), so
    # the head goes straight to the SEVEN r11 gates staged in
    # workloads_r11.py since round 10 (oracles pre-verified by the
    # driver-identical staged differential at sf0.001/0.01 + local[7],
    # judge-re-run green; registered this round).
    "substring_dedup", "semdedup_prune", "dsir_weights",
    "upsert_compaction", "bloom_decontaminate", "spearman_corr",
    "cross_source_dup_matrix",
    # part 2 — staleness-bound backfill: the EIGHTEEN r6-latest gates
    # displaced from the r10 window (newest driver row = round 6;
    # 11 - 6 = 5, the max-staleness bound binds THIS round).
    "multimodal_decode", "multimodal_features", "multimodal_frames",
    "pricing_summary", "quality_score", "registry_diff",
    "repetition_stats", "rollup_counts", "scd1_upsert", "scd2_history",
    "sequence_pack", "similarity_topk", "snapshot_diff",
    "sorted_list_agg", "summary_quantiles", "text_normalize",
    "token_estimate", "topk_per_group",
    # part 3 — oldest-evidence backfill: the first 25 (alphabetical) of
    # the 49 r7-latest gates (newest driver row = round 7; their bound
    # binds at r12, taken early here to keep r12's arithmetic solvable).
    "ann_ivf_incremental", "ann_ivf_kmeans", "attribution_first_touch",
    "bitmap_distinct", "bm25_scores", "bpe_encode", "bpe_merges",
    "char_entropy", "cluster_representatives", "cms_estimates",
    "corpus_overlap", "counter_rate", "cusum_changepoints",
    "dedup_fuzzy", "dense_timeseries", "embedding_normalize",
    "event_transitions", "ewma_smooth", "fk_bloom", "fk_integrity",
    "funnel_steps", "heavy_hitters", "heavy_hitters_by_lang",
    "histogram_quantile", "image_dhash_dedup",
    # Window is EXACTLY 50 — entries past 50 get no driver row.
    # r12 MANDATORY HEAD: any red r11 rows first, then the SEVEN r12
    # gates staged in workloads_r12.py with pre-verified oracles
    # (auc_by_group, calibration_curve, calibration_by_source,
    # kendall_tau_banded, ndcg_quality, quantiles_by_group,
    # source_governance; registration = import QUERIES_R12/ORACLES_R12
    # into the dicts below + list them here), then the TWENTY-FOUR
    # remaining r7-latest gates whose staleness bound binds EXACTLY at
    # r12 (newest row r7, 12 - 7 = 5), alphabetical: key_skew_profile,
    # label_enrich, lsh_tuning, minhash_recall_audit, mode_stats,
    # null_profile, ontime_rate, order_priority_counts, outlier_mad,
    # pii_scrub, pivot_metrics, quality_filter, range_join_bins,
    # retention_cohorts, rfm_segments, sample_stratified,
    # seasonal_decompose, session_windows, shingle_weights,
    # string_funcs, text_stats_wide, tfidf_topterms, volume_anomaly,
    # zorder_layout.
    # That is red + 7 + 24 = 31+red, leaving 19 slots (assuming 0
    # reds) for r8-latest backfill — the 48-gate r8-latest cohort's
    # staleness bound lands at r13, so its first 19 (alphabetical:
    # ann_sq8_topk .. interpolate_linear) take r12's remaining slots
    # and the other 29 MUST take r13's head, capping the r13 staged
    # cohort at ~21 minus r12 reds. Any red r11 row displaces from the
    # END of the 19.
    # All subject to the max-staleness meta-test in
    # tests/test_docs_consistency.py (no registered gate's newest driver
    # row older than 5 rounds; missing gates count as round 0).
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
        **workloads_r9.QUERIES_R9,
        **workloads_r10.QUERIES_R10,
        **workloads_r11.QUERIES_R11,
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
        **workloads_r9.ORACLES_R9,
        **workloads_r10.ORACLES_R10,
        **workloads_r11.ORACLES_R11,
        **workloads_ts.ORACLES_TS,
    })
