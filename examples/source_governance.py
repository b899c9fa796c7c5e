"""Source-governance triage: the decisions a 100 TB ingest makes about
WHOLE SOURCES before any per-document work is scheduled — composed
from the engine's governance tier.

    raw corpus grouped by source
      -> cross-source near-dup matrix     ("is X a mirror of Y?" —
         verified MinHash-LSH pairs rolled up per source pair; the
         same construction the cross_source_dup_matrix gate checks)
      -> per-source relative quality cut  (curation.
         relative_percentile_filter: keep each source's top share —
         one absolute threshold would drown terse domains)
      -> target-likeness audit            (text.dsir_logratio_weights:
         DSIR hashed-unigram log-ratio, averaged per source)
      -> integer token-budget quotas      (curation.
         token_budget_allocation: Hamilton apportionment over the
         SURVIVORS' token counts — quotas sum to the budget exactly)
      -> contribution inequality          (ranking.gini_by_group: is a
         source's token supply dominated by a few huge documents?)
      -> lexical redundancy               (text.vocab_overlap_matrix:
         do two sources even speak the same vocabulary — the cheap
         first signal before any document-level dedup)
      -> class-balance plan               (curation.class_balance_plan:
         the per-(source, lang) keep fractions a balanced sampler
         applies)

Run:  python examples/source_governance.py [sf_dir] [token_budget]
Defaults: /root/testdata/sf0.001 and 100_000 tokens.

Every step is the same public API the driver gates exercise
(cross_source_dup_matrix, source_percentile_filter, dsir_weights,
token_budget_alloc, token_gini, vocab_overlap, class_balance); this
file adds no logic — it shows the
composition a source-triage report actually runs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from database_collector_spark import curation
from database_collector_spark.operators import dedup, ranking, text
from database_collector_spark.session import get_spark
from database_collector_spark.workloads import _t


def run_triage(spark, sf_dir: str, token_budget: int) -> dict:
    docs = _t(spark, sf_dir, "documents")
    src = docs.select("doc_id", "source")

    # 1. cross-source duplication matrix: verified near-dup pairs,
    #    attached to sources, rolled up per unordered source pair.
    pairs = dedup.minhash_lsh_dedup(docs)
    attached = (
        pairs.join(
            src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("sa")),
            "doc_a",
        )
        .join(
            src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("sb")),
            "doc_b",
        )
        .select(
            F.least("sa", "sb").alias("src_lo"),
            F.greatest("sa", "sb").alias("src_hi"),
            F.explode(F.array("doc_a", "doc_b")).alias("d"),
        )
    )
    matrix = (
        attached.groupBy("src_lo", "src_hi")
        .agg(
            F.expr("count(*) div 2").alias("pair_count"),
            F.countDistinct("d").alias("docs_involved"),
        )
        .orderBy(F.col("pair_count").desc())
    )

    # 2. per-source relative quality floor: keep each source's top 60%.
    scored = docs.join(
        text.quality_score(docs).select(
            "doc_id", F.col("quality_score").alias("score")
        ),
        "doc_id",
    )
    kept = curation.relative_percentile_filter(scored, cut=0.40)

    # 3. target-likeness: mean per-token DSIR log-weight by source —
    #    which sources look most like the target slice?
    dsir = text.dsir_logratio_weights(docs).select("doc_id", "n_toks", "log_w")
    likeness = (
        docs.join(dsir, "doc_id")
        .filter(F.col("n_toks") > 0)
        .groupBy("source")
        .agg(F.round(F.avg(F.col("log_w") / F.col("n_toks")), 4).alias("dsir_mean"))
    )

    # 4. integer quotas over the SURVIVORS' token counts: the loader
    #    contract is that quotas sum to the budget exactly.
    survivor_toks = (
        kept.join(text.token_stats(kept).select("doc_id", "n_tokens"), "doc_id")
        .groupBy("source")
        .agg(F.sum("n_tokens").alias("n_toks"))
    )
    quotas = curation.token_budget_allocation(survivor_toks, token_budget)

    # 5. contribution inequality: exact Gini of per-doc token counts —
    #    a high-Gini source's budget is really a few huge documents.
    counted = docs.where(F.col("text").isNotNull()).select(
        "source", F.size(text.nonempty_tokens_col("text")).alias("n_tok")
    )
    gini = ranking.gini_by_group(counted, "n_tok", group_col="source")

    # 6. lexical redundancy: pairwise vocabulary overlap (top pairs).
    overlap = text.vocab_overlap_matrix(docs, group_col="source").orderBy(
        F.col("jaccard").desc()
    )

    # 7. the balanced-sampling decision table per (source, lang).
    balance = curation.class_balance_plan(docs)

    report = {
        "top_mirror_pairs": [
            (r["src_lo"], r["src_hi"], r["pair_count"], r["docs_involved"])
            for r in matrix.limit(5).collect()
        ],
        "kept_per_source": {
            r["source"]: r["n"]
            for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
        },
        "dsir_mean_per_source": {
            r["source"]: r["dsir_mean"] for r in likeness.collect()
        },
        "token_quotas": {r["source"]: r["quota"] for r in quotas.collect()},
        "token_gini": {r["source"]: r["gini"] for r in gini.collect()},
        "top_vocab_overlap": [
            (r["g_a"], r["g_b"], r["jaccard"]) for r in overlap.limit(5).collect()
        ],
        "min_keep_frac": min(
            (r["keep_frac"] for r in balance.collect()), default=None
        ),
    }
    assert sum(report["token_quotas"].values()) == token_budget
    return report


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    budget = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    spark = get_spark("source-governance-example")
    try:
        report = run_triage(spark, sf_dir, budget)
        print("== source triage report ==")
        print("mirror pairs (top 5):")
        for lo, hi, pc, di in report["top_mirror_pairs"]:
            print(f"  {lo} <-> {hi}: {pc} verified pairs, {di} docs")
        print("kept per source (top-60% quality):", report["kept_per_source"])
        print("DSIR target-likeness per source:", report["dsir_mean_per_source"])
        print(f"token quotas (sum == {budget}):", report["token_quotas"])
        print("token-supply Gini per source:", report["token_gini"])
        print("most lexically redundant source pairs:")
        for a, b, j in report["top_vocab_overlap"]:
            print(f"  {a} <-> {b}: jaccard={j}")
        print("harshest class-balance keep fraction:", report["min_keep_frac"])
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
