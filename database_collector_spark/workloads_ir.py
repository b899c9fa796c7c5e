"""IR / corpus-analytics workloads: BM25 retrieval scoring, BPE-style
tokenizer-training statistics, deterministic weighted sampling, z-order
layout keys, fixed-iteration PageRank.

These extend the training-data-pipeline tier (the reference has no IR
surface — SURVEY.md §2 stops at exporter aggregates); each gate follows
the repo's determinism conventions: exact integer intermediates, fixed
float-addition order, md5-derived uniforms, rounded float outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database_collector_spark.operators import ranking
from database_collector_spark.workloads import _t

_BM25_TERMS = ["hash", "join", "vector"]


def q_bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25(k1=1.2, b=0.75) for the fixed query {hash, join, vector} over
    every matching document (operators/ranking.py::bm25_scores). No rank
    cut in the gate — the cut is a float comparison; scores themselves
    are exact-intermediate doubles rounded to 4, summed per-term in a
    pinned order."""
    return ranking.bm25_scores(_t(spark, sf_dir, "documents"), _BM25_TERMS)


SQL_BM25_SCORES = """
WITH dl AS (
  SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
),
stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS total_dl FROM dl),
ft AS (
  SELECT doc_id, term
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
  WHERE term IN ('hash', 'join', 'vector')
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM ft GROUP BY 1, 2),
dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM ft GROUP BY 1),
scored AS (
  SELECT tf.doc_id, tf.term, dl.dl,
         ln(1 + (s.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (1.0 - 0.75
              + 0.75 * dl.dl / (CAST(s.total_dl AS DOUBLE) / s.n_docs))) AS contrib
  FROM tf
  JOIN dfreq USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
per AS (
  SELECT doc_id, MAX(dl) AS dl, COUNT(*) AS n_matched,
         SUM(CASE WHEN term = 'hash' THEN contrib END) AS c0,
         SUM(CASE WHEN term = 'join' THEN contrib END) AS c1,
         SUM(CASE WHEN term = 'vector' THEN contrib END) AS c2
  FROM scored GROUP BY doc_id
)
SELECT doc_id, CAST(dl AS INT) AS dl, CAST(n_matched AS INT) AS n_matched,
       round(0.0 + COALESCE(c0, 0.0) + COALESCE(c1, 0.0) + COALESCE(c2, 0.0),
             4) AS score
FROM per
"""


QUERIES_IR = {
    "bm25_scores": q_bm25_scores,
}

ORACLES_IR = {
    "bm25_scores": SQL_BM25_SCORES,
}
