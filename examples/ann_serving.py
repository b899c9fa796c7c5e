"""ANN index lifecycle end-to-end: build NIGHTLY, persist, serve ALL DAY
— the workflow every 100 TB similarity system actually runs (index build
!= index use), through this engine's public API.

    embeddings parquet
      -> BUILD: train the IVFADC composite (coarse k-means + PQ
         codebooks over per-cell residuals) and persist all artifacts
         (similarity.ivfpq_index_save: centroids / codebooks /
         cid-partitioned coded corpus — each code row is m small ints,
         ~dim/m smaller at rest than the vectors it stands in for)
      -> SERVE: reload (similarity.ivfpq_index_load), residualize the
         query batch against the loaded quantizer, ADC top-k against
         ONLY each query's coarse cell (pq_adc_topk cell_col='cid' —
         a broadcast equi-join, so probe work is sum(|probed cell|))
      -> REFRESH: residualize a new vector batch against the FROZEN
         quantizer and encode it with the FROZEN codebooks — O(|new|),
         the corpus is never re-read or retrained — then append to the
         coded cells. (similarity.incremental_assign is the plain-IVF
         sibling of this path; the composite index appends CODES, so
         the new rows go through residualize + pq_encode_quantized.)

Run:  python examples/ann_serving.py [sf_dir]
Everything is exact-integer, so serve-from-disk results are
bit-identical to an in-memory build (pinned by
tests/test_persistence_ops.py); the staged ann_ivfpq_adc gate
oracle-checks the same closed form against DuckDB.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from database_collector_spark.operators import similarity


def build_index(emb, path: str) -> None:
    """The nightly batch job: train + persist every artifact."""
    similarity.ivfpq_index_save(emb, path)


def serve_topk(spark, path: str, query_vectors, topk: int = 3):
    """The serving path: everything comes from the LOADED artifacts."""
    cents, books, codes = similarity.ivfpq_index_load(spark, path)
    queries = similarity.residualize(query_vectors, cents).select(
        F.col("vec_id").alias("q_id"), "cid", F.col("qe").alias("q_qe")
    )
    return similarity.pq_adc_topk(codes, queries, books, topk=topk, cell_col="cid")


def refresh_index(spark, path: str, new_vectors) -> int:
    """The incremental ingest path: new vectors join the index without
    retraining — residualize against the frozen quantizer, encode with
    the frozen codebooks, append to the coded cells."""
    cents, books, _codes = similarity.ivfpq_index_load(spark, path)
    # checkpoint: the write and the returned count both consume the
    # encode lineage — without it the O(|new|) ingest pass runs twice
    new_codes = (
        similarity.pq_encode_quantized(
            similarity.residualize(new_vectors, cents), books
        )
        .select("vec_id", "codes", "cid")
        .localCheckpoint(eager=True)
    )
    new_codes.write.mode("append").partitionBy("cid").parquet(f"{path}/codes")
    return new_codes.count()


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    from database_collector_spark.session import get_spark
    from database_collector_spark.workloads import _t

    spark = get_spark("ann-serving-example")
    emb = _t(spark, sf_dir, "embeddings")
    path = os.path.join(tempfile.mkdtemp(prefix="ann_serving_"), "index")

    build_index(emb.filter(F.col("vec_id") % 10 != 0), path)
    hits = serve_topk(spark, path, emb.filter(F.col("vec_id") < 5))
    print("top-k from the persisted index:")
    hits.show(15, truncate=False)

    appended = refresh_index(spark, path, emb.filter(F.col("vec_id") % 10 == 0))
    print(f"appended {appended} incrementally-ingested vectors")
    hits2 = serve_topk(spark, path, emb.filter(F.col("vec_id") < 5))
    print(f"post-refresh candidate rows: {hits2.count()}")


if __name__ == "__main__":
    main(*sys.argv[1:2])
