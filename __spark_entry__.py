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
    # Round-10 rotation, part 1 — RED-ROW RETEST: r9's only red row.
    # jl_projection died in the driver's pandas canonicalization
    # ("unhashable type: 'list'") because its final `proj` column was
    # array<bigint> — the third masked oracle-portability class after
    # HUGEINT (r7) and TIMESTAMPTZ (r8). Values were judge-verified
    # exact; only the shape was driver-hostile. The gate now emits
    # scalar y_0..y_7 on BOTH sides (operators/similarity.py::jl_project
    # flat=True keeps the array API for composition), all three oracle
    # meta-tests ban any nested final type ([], STRUCT, MAP, UNION),
    # and tools/check.py::canon_value now RAISES on list/dict values
    # instead of stringifying them (the masking).
    "jl_projection",
    # part 2 — the ELEVEN r10 gates staged in workloads_r10.py since
    # round 9 (oracles pre-verified by the driver-identical staged
    # differential at sf0.001/0.01/0.1 + local[7], judge-re-run green;
    # registered this round).
    "hll_sliding_windows", "hll_mergeable_rollup", "ann_index_roundtrip",
    "minhash_persist_incremental", "pack_sequences", "vocab_drift_kl",
    "ngram_novelty", "source_quota_sample", "ann_ivfpq_adc",
    "source_percentile_filter", "token_budget_alloc",
    # part 3 — oldest-evidence backfill: the full r5-latest cohort
    # (newest driver row = round 5; staleness bound binds this round)...
    "ann_ivf_probe", "decile_stats", "exact_percentiles", "market_share",
    "top_supplier", "unpivot_melt", "window_frames", "window_running",
    # ...then the first 30 (alphabetical) of the 48 r6-latest gates.
    "ann_lsh_buckets", "cdc_apply", "conditional_agg", "crossmodal_join",
    "curation_full", "curation_pipeline", "decontaminate",
    "dedup_clusters", "dedup_embedding", "dedup_embedding_lsh",
    "dedup_exact", "dedup_incremental", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "dedup_simhash", "dedup_simhash_pairs",
    "doc_fingerprint", "engine_rejects", "events_hourly", "hash_split",
    "histogram_metrics", "incremental_agg", "interval_join_events",
    "json_struct_parse", "kv_numeric_parse", "kv_pivot_wide", "lang_id",
    "length_trim", "lexical_diversity", "mixture_sample",
    # Window is EXACTLY 50 — entries past 50 get no driver row.
    # r11 MANDATORY HEAD: any red r10 rows first, then the r11 staged
    # cohort — the SEVEN gates staged in workloads_r11.py with
    # pre-verified oracles (substring_dedup, semdedup_prune,
    # dsir_weights, upsert_compaction, bloom_decontaminate,
    # spearman_corr, cross_source_dup_matrix;
    # registration = import
    # QUERIES_R11/ORACLES_R11 into the dicts below + list them here),
    # then the EIGHTEEN displaced r6-latest
    # gates whose staleness bound binds in r11 (newest row r6,
    # 11 - 6 = 5): multimodal_decode, multimodal_features,
    # multimodal_frames, pricing_summary, quality_score, registry_diff,
    # repetition_stats, rollup_counts, scd1_upsert, scd2_history,
    # sequence_pack, similarity_topk, snapshot_diff, sorted_list_agg,
    # summary_quantiles, text_normalize, token_estimate, topk_per_group.
    # That is red + 7 + 18 = 25+red, leaving 25 slots (assuming 0 reds)
    # for r7-latest backfill. The 49 r7-latest gates, alphabetical; the
    # FIRST 25 take r11's remaining slots:
    #   ann_ivf_incremental, ann_ivf_kmeans, attribution_first_touch,
    #   bitmap_distinct, bm25_scores, bpe_encode, bpe_merges,
    #   char_entropy, cluster_representatives, cms_estimates,
    #   corpus_overlap, counter_rate, cusum_changepoints, dedup_fuzzy,
    #   dense_timeseries, embedding_normalize, event_transitions,
    #   ewma_smooth, fk_bloom, fk_integrity, funnel_steps,
    #   heavy_hitters, heavy_hitters_by_lang, histogram_quantile,
    #   image_dhash_dedup.
    # The remaining 24 (key_skew_profile .. zorder_layout) have newest
    # row r7 and bind EXACTLY at r12 (12 - 7 = 5): they MUST take r12's
    # backfill slots, which also leaves room there for the r8-latest
    # cohort's r13 bound. Any red r10 row displaces from the END of the
    # 25 (each displaced name moves to r12's head with the 24).
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
        **workloads_ts.ORACLES_TS,
    })
