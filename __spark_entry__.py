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
    workloads_r12,
    workloads_r13,
    workloads_r14,
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
    # Round-14 rotation, part 1 — staleness-bound backfill:
    # CORRECTNESS_r13 was 50/50 green (fourth consecutive fully-green
    # window, zero reds to re-check), so the head goes to the
    # THIRTY-SIX r9-latest gates (newest driver row = round 9;
    # 14 - 9 = 5, the max-staleness bound binds THIS round). Computed
    # from the CORRECTNESS_r*.json union, alphabetical
    # (correlated_avg_filter .. weighted_sample_by).
    "correlated_avg_filter", "cube_counts", "cust_order_distribution",
    "date_funcs", "date_rollup", "dedup_embedding_lsh_multi",
    "dedup_spans", "embedding_outliers", "engine_dispatch",
    "events_sliding", "gap_detect", "grouped_counter", "grouping_sets",
    "interval_outages", "label_enrich", "lang_confusion", "limit_cap",
    "quality_classifier", "range_join_buckets", "readability_scores",
    "sample_stratified", "semi_anti_orders", "sessionization",
    "set_ops", "shard_overlap", "shipping_priority", "skew_salted_join",
    "sliding_unique_approx", "sliding_unique_users", "stats_moments",
    "string_funcs", "temperature_mixture", "text_token_stats",
    "tfidf_top_terms", "ttl_expiry_counts", "weighted_sample_by",
    # part 2 — NEW GATES: the ELEVEN r14 gates staged in
    # workloads_r14.py since round 13 (oracles pre-verified by the
    # driver-identical staged differential at sf0.001/0.01 and
    # judge-re-run green in the r13 VERDICT; registered this round).
    "pr_curve_sweep", "lift_deciles", "mcc_by_lang", "brier_quality",
    "ece_quality", "ks_separation", "mrr_quality", "fleiss_panel",
    "chi2_lang_source", "vocab_coverage", "class_balance",
    # part 3 — oldest-evidence backfill: the first 3 (alphabetical) of
    # the 50 r10-latest gates (newest driver row = round 10; their
    # bound binds at r15, taken early here per the r13 directive so
    # r15's window has ~3 slots of slack for the staged r15 gates).
    "ann_index_roundtrip", "ann_ivf_probe", "ann_ivfpq_adc",
    # Window is EXACTLY 50 — entries past 50 get no driver row.
    # r15 MANDATORY HEAD: any red r14 rows first, then the 47 remaining
    # r10-latest gates (newest row r10, 15 - 10 = 5, bound binds at
    # r15; recompute alphabetically from the CORRECTNESS union — do
    # not trust memory), then the 3 slack slots (assuming 0 reds) go
    # to the STAGED r15 gates in the order decided in r13 per the r12
    # VERDICT #5: (1) agreement_alpha, (2) token_gini, (3) pack_chunks
    # (registration = import QUERIES_R15/ORACLES_R15 + list them).
    # r16: head = the 50 r11-latest gates — ZERO structural slack.
    # r17: head = the 50 r12-latest gates. NOTE (r13 VERDICT #4 + r14
    # changes): that cohort includes gates whose IMPLEMENTATION changed
    # after their newest driver row — trimmed_mean / quantile_norm /
    # key_skew_profile (rewritten r13) and dedup_clusters /
    # embedding_dedup_clusters (roster_truncated flag column added r14,
    # oracles updated in lockstep) — their r17 rows are the
    # highest-value fresh evidence in that window; do not displace
    # them. sequence_pack / pack_sequences (rewritten r14 onto the
    # two-level prefix pass, oracles unchanged) have newest rows
    # r10/r11 and re-check at r15/r16 naturally.
    # POST-SATURATION: once 250 registers (end of r15), EVERY later
    # window is exactly consumed by the 50-gate cohort from 5 rounds
    # back, so vocab_overlap, the r16 staged cohort
    # (workloads_r16.py: embedding_drift, zipf_head_fit,
    # bigram_cond_entropy) and the r17 data-quality cohort
    # (workloads_r17.py: table_profile, fk_orphan_report,
    # key_uniqueness, staged r14) stay at the staged-green evidence
    # tier
    # PERMANENTLY — decided and documented in COVERAGE.md §staged-tier
    # (r13 VERDICT #5); the judge's check.py --staged differential
    # covers them every round. Any 1-for-1 retirement swap must be
    # recorded here with its rationale.
    # SATURATION ARITHMETIC (r14 recompute, from the CORRECTNESS
    # union): cohorts by newest evidence after r13: r9:36 r10:50
    # r11:50 r12:50 r13:50 (=236 registered) + 11 r14 staged = 247
    # after THIS round registers. Steady-state ceiling = 50-slot
    # window x 5-round staleness = 250 (reached end of r15 when the 3
    # staged r15 gates register). Do NOT stage more than ~3 gates per
    # round — the window cannot absorb them and the staleness meta-test
    # will trip.
    # Always recompute cohorts from the CORRECTNESS_r*.json union
    # (tests/test_docs_consistency.py::test_rotation_debt_cannot_drift)
    # rather than trusting name lists written from memory — the r11
    # directive's expanded r7 name list was stale; only its computed
    # endpoints were right.
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
        **workloads_r12.QUERIES_R12,
        **workloads_r13.QUERIES_R13,
        **workloads_r14.QUERIES_R14,
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
        **workloads_r12.ORACLES_R12,
        **workloads_r13.ORACLES_R13,
        **workloads_r14.ORACLES_R14,
        **workloads_ts.ORACLES_TS,
    })
