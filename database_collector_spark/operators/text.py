"""Text-analysis operators for the training-data pipeline (extension
surface; BASELINE.json north star).

All operators are pure DataFrame expressions — no Python UDFs in the hot
path — so whole-stage codegen keeps them JVM-side at 100 TB. Each has an
exact ANSI-SQL twin in workloads.py for the DuckDB gate; determinism
rules: tokenization = literal single-space split (the corpus is
single-space normalized), hashing = md5 hex (identical lowercase hex in
every engine), ratios = integer-count rationals divided in double and
rounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Per-language stopword lists for the n-gram/voting language heuristic.
# Tiny on purpose: broadcast as a literal VALUES relation; at 100 TB this
# is a broadcast-hash-join against an exploded token stream.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "la", "de", "y", "que", "los"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "les", "des", "et", "une"),
    "zh": ("的", "是", "不"),
}


def tokens_col(text_col: str = "text") -> F.Column:
    return F.split(F.col(text_col), " ")


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-document token counting: whitespace tokens, distinct tokens,
    type-token ratio, average token length (exact rational -> round 4)."""
    t = tokens_col()
    return docs.select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_distinct_tokens"),
        F.length("text").alias("n_chars"),
        F.round(F.size(F.array_distinct(t)) / F.size(t), 4).alias("type_token_ratio"),
        # tokens are single-space separated: total token chars = n_chars - (n_tokens - 1)
        F.round(
            (F.length("text") - (F.size(t) - F.lit(1))) / F.size(t), 4
        ).alias("avg_token_len"),
    )


def _stopword_relation(spark) -> DataFrame:
    rows = [
        (lang, w) for lang, words in LANG_STOPWORDS.items() for w in words
    ]
    return spark.createDataFrame(rows, "lang_cand string, stopword string")


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-voting language identification.

    explode tokens -> broadcast join the stopword list -> votes per
    (doc, candidate) -> argmax with deterministic tie-break (votes desc,
    lang asc); docs with zero votes -> 'unknown'. One shuffle (the vote
    count), which AQE coalesces; the join is broadcast.
    """
    spark = docs.sparkSession
    toks = docs.select("doc_id", F.explode(tokens_col()).alias("tok"))
    votes = (
        toks.join(
            F.broadcast(_stopword_relation(spark)),
            toks.tok == F.col("stopword"),
        )
        .groupBy("doc_id", "lang_cand")
        .agg(F.count("*").alias("votes"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("votes"), F.asc("lang_cand"))
    best = (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("lang_cand").alias("pred_lang"), "votes")
    )
    return (
        docs.select("doc_id", "lang")
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("pred_lang"), F.lit("unknown")).alias("pred_lang"),
            F.coalesce(F.col("votes"), F.lit(0)).alias("votes"),
            F.col("lang").alias("actual_lang"),
        )
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic document quality: length saturation + stopword ratio.

    score = 0.5 * min(n_tokens/100, 1) + 0.5 * stopword_ratio, rounded.
    All components are integer-count rationals -> engine-exact.
    """
    all_stops = sorted({w for ws in LANG_STOPWORDS.values() for w in ws})
    stop_list = ",".join(f"'{w}'" for w in all_stops)
    t = tokens_col()
    base = docs.select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        F.expr(
            f"size(filter(split(text, ' '), x -> array_contains(array({stop_list}), x)))"
        ).alias("n_stopwords"),
    )
    return base.select(
        "doc_id",
        "n_tokens",
        "n_stopwords",
        F.round(F.col("n_stopwords") / F.col("n_tokens"), 4).alias("stopword_ratio"),
        F.round(
            0.5 * F.least(F.col("n_tokens") / 100.0, F.lit(1.0))
            + 0.5 * (F.col("n_stopwords") / F.col("n_tokens")),
            4,
        ).alias("quality_score"),
    )


def fingerprint(docs: DataFrame, *, k: int = 8, window: int = 4) -> DataFrame:
    """Winnowing document fingerprints (rolling-hash selection).

    Char k-gram at every position -> md5 -> per-position minimum over the
    next `window` hashes -> distinct selected fingerprints. Standard
    winnowing guarantees shared substrings of length >= k+window-1 share a
    fingerprint. Aggregated to (doc_id, n_fingerprints, min_fingerprint)
    to keep the gate output compact.

    Plan shape: generator explode (no shuffle) -> window over (doc, pos)
    (one shuffle on doc_id) -> agg on the same key (no second shuffle —
    partitioning is reused).
    """
    grams = docs.select(
        "doc_id",
        "text",
        F.explode(F.sequence(F.lit(1), F.length("text") - F.lit(k - 1))).alias("pos"),
    ).select(
        "doc_id",
        "pos",
        F.expr(f"md5(substring(text, pos, {k}))").alias("h"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, window - 1)
    )
    selected = grams.withColumn("fp", F.min("h").over(w))
    return selected.groupBy("doc_id").agg(
        F.countDistinct("fp").alias("n_fingerprints"),
        F.min("fp").alias("min_fingerprint"),
    )
