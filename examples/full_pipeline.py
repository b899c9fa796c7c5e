"""End-to-end training-data pipeline over the public operator surface:
the "switch from the reference and run everything" demonstration.

    raw parquet corpus
      -> quality + entropy + perplexity filters      (zero-shuffle scans)
      -> hashed-classifier model gate (audit mode)   (zero-shuffle fold)
      -> exact dedup + MinHash-LSH near-dup tier     (bounded wide ops)
      -> leakage-safe group-aware train/val/test     (map-side labels)
      -> BPE tokenizer train + corpus token counts   (vocab-sized loop)
      -> overlapping-window chunking                 (map expansion)
      -> z-ordered curated write                     (range-partitioned)
      -> temperature-mixture sampling recipe         (|domains|-row agg)

Run:  python examples/full_pipeline.py [sf_dir] [out_dir]
Defaults: /root/testdata/sf0.001 and a temp directory.

Every step is the same public API the driver gates exercise; this file
adds no logic — it exists to show the composition order and the knobs.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from database_collector_spark import curation
from database_collector_spark.operators import bpe, layout, text
from database_collector_spark.session import get_spark
from database_collector_spark.workloads import _t


def run_pipeline(spark, sf_dir: str, out_dir: str) -> dict:
    docs = _t(spark, sf_dir, "documents")

    # 0. data-quality gate BEFORE anything expensive runs (Deequ check
    #    semantics — operators/expectations.py via curate(): a poisoned
    #    ingest aborts at the audit with the measured report attached,
    #    not three shuffles later inside the dedup tier)
    gate = {
        "max_null_frac": {"doc_id": 0.0, "text": 0.0},
        "unique_keys": {"doc_id": ["doc_id"]},
    }

    # 1. quality tier: composite score + char-entropy + unigram floor.
    #    (entropy < 1.5 bits ~ degenerate/repetitive text)
    entropy = text.char_entropy(docs).select("doc_id", "entropy")
    kept = (
        curation.curate(docs, quality_min=0.3, near_dup=True, expectations=gate)
        .join(entropy, "doc_id")
        .filter(F.col("entropy") >= 1.5)
        .drop("entropy")
    )

    # 1b. model-based quality gate (fastText-shape hashed classifier) in
    #     AUDIT mode: scores attach to every surviving doc and the keep
    #     fraction is reported; a real deployment loads trained weights
    #     (hashed_classifier(weights=...)) and filters on label/p_keep.
    scores = text.hashed_classifier(kept, bigrams=True).select(
        "doc_id", "p_keep", F.col("label").alias("clf_label")
    )
    kept = kept.join(scores, "doc_id")

    # 2. leakage-safe split OVERRIDES the per-doc split from curate():
    #    byte-identical texts can never straddle train/test.
    split = curation.leakage_safe_split(kept).select("doc_id", "split")
    kept = kept.drop("split").join(split, "doc_id")
    kept.persist()

    # 3. tokenizer: learn 8 merges on the TRAIN split only, then count
    #    BPE tokens for every surviving doc with the learned merges.
    train_docs = kept.filter(F.col("split") == "train")
    merge_rows = bpe.train(train_docs, n_merges=8).orderBy("rank").collect()
    merges = [(r["sym_a"], r["sym_b"]) for r in merge_rows]
    token_counts = bpe.encode_corpus(kept, merges)

    # 4. chunk long documents into overlapping training windows.
    chunks = text.chunk_documents(kept, chunk_tokens=32, stride=24)

    # 5. write the curated corpus z-ordered by (lang-bucket, length) so
    #    scans filtered on either dimension prune files.
    lang_code = F.abs(F.hash("lang")) % 1024
    curated = kept.join(token_counts.select("doc_id", "n_bpe_tokens"), "doc_id")
    layout.zorder_repartition(
        curated, lang_code, F.col("n_bpe_tokens"), n_files=4
    ).write.mode("overwrite").parquet(f"{out_dir}/curated")

    chunks.write.mode("overwrite").parquet(f"{out_dir}/chunks")

    # 6. sampling recipe: temperature-scaled domain mixture over the
    #    curated corpus — the oversample factors a repeat-sampler applies
    #    when assembling the final training mix.
    mixture = {
        r["domain"]: r["oversample"]
        for r in curation.temperature_mixture(
            kept, by="source", temperature=2.0
        ).collect()
    }

    stats = {
        "n_raw": docs.count(),
        "n_kept": kept.count(),
        "n_chunks": chunks.count(),
        "n_merges": len(merges),
        "splits": {
            r["split"]: r["n"]
            for r in kept.groupBy("split").agg(F.count("*").alias("n")).collect()
        },
        "clf_keep_frac": kept.agg(
            F.round(F.avg((F.col("clf_label") == "keep").cast("double")), 4)
        ).collect()[0][0],
        "mixture_oversample": mixture,
    }
    kept.unpersist()
    return stats


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="pipeline_")
    spark = get_spark("full-pipeline-example")
    stats = run_pipeline(spark, sf_dir, out_dir)
    print({"out_dir": out_dir, **stats})


if __name__ == "__main__":
    main()
