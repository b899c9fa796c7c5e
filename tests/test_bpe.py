"""BPE trainer (operators/bpe.py): hand-computed example, greedy
overlap semantics, and a Hypothesis property vs a plain-Python
reference implementation."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from database_collector_spark.operators import bpe


def _py_train(texts: list[str], n_merges: int):
    """Reference BPE: vocab of words, positional pair counts, greedy
    left-to-right single-pass merge."""
    vocab = Counter(w for t in texts for w in t.split(" ") if w)
    seqs = {w: list(w) for w in vocab}
    merges = []
    for rank in range(1, n_merges + 1):
        counts: Counter = Counter()
        for w, syms in seqs.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += vocab[w]
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, a + b, c))
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out
    return merges


def test_bpe_known_example(spark):
    # 'aaab' x3, 'ab' x1: round 1 merges (a,a) count 6 (two positions in
    # each 'aaab'); round 2 merges the then-best pair.
    df = spark.createDataFrame(
        [Row(doc_id=0, text="aaab aaab aaab ab")]
    )
    got = [tuple(r) for r in bpe.train(df, 2).orderBy("rank").collect()]
    assert got == _py_train(["aaab aaab aaab ab"], 2)
    assert got[0][1:] == ("a", "a", "aa", 6)


def test_bpe_greedy_overlap_single_pass(spark):
    # 'aaaa': greedy left-to-right gives [aa, aa], never [a, aa, a] or a
    # re-scanned [aaaa].
    df = spark.createDataFrame([Row(doc_id=0, text="aaaa")])
    vocab = bpe.apply_merge(bpe.word_vocab(df), "a", "a")
    syms = bpe.encode(vocab).collect()[0]["symbols"]
    assert syms == ["aa", "aa"]


def test_bpe_single_char_words_yield_no_pairs(spark):
    df = spark.createDataFrame([Row(doc_id=0, text="a b a c")])
    assert bpe.pair_counts(bpe.word_vocab(df)).count() == 0
    assert bpe.train(df, 2).count() == 0


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.lists(
            st.text(alphabet="abc", min_size=1, max_size=5), min_size=1, max_size=8
        ).map(" ".join),
        min_size=1,
        max_size=3,
    )
)
def test_bpe_matches_python_reference(spark, texts):
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    got = [tuple(r) for r in bpe.train(df, 3).orderBy("rank").collect()]
    assert got == _py_train(texts, 3)


def test_encode_corpus_counts_match_manual(spark):
    # merges apply in rank order: (a,a): a a a b -> aa a b ;
    # then (aa,a): -> aaa b.
    df = spark.createDataFrame([Row(doc_id=0, text="aaab ab b aaab")])
    got = bpe.encode_corpus(df, [("a", "a"), ("aa", "a")]).collect()[0]
    # aaab -> [aa,a,b] -> [aaa,b] = 2; ab -> [a,b] = 2; b -> [b] = 1
    assert got["n_words"] == 4
    assert got["n_bpe_tokens"] == 2 + 2 + 1 + 2


def test_encode_corpus_consistent_with_trained_vocab_segmentation(spark):
    texts = ["abab abab ab", "abc ab abab"]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    merge_rows = bpe.train(df, 2).orderBy("rank").collect()
    merges = [(r["sym_a"], r["sym_b"]) for r in merge_rows]
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe.encode_corpus(df, merges).collect()
    }
    # reference: apply the same greedy merges per word
    ref_merges = _py_train(texts, 2)
    assert [(m[1], m[2]) for m in ref_merges] == merges
    for i, t in enumerate(texts):
        n = 0
        for w in t.split(" "):
            syms = list(w)
            for a, b in merges:
                out, j = [], 0
                while j < len(syms):
                    if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                        out.append(a + b)
                        j += 2
                    else:
                        out.append(syms[j])
                        j += 1
                syms = out
            n += len(syms)
        assert got[i] == n


def test_fertility_report_hand_fixture(spark):
    from pyspark.sql import Row

    from database_collector_spark.operators import bpe

    docs = spark.createDataFrame(
        [
            # with merge (a,b): "ab ab" -> 2 tokens; words 2; chars 5
            Row(doc_id=1, lang="en", text="ab ab"),
            # "abc" -> [ab, c] = 2 tokens; words 1; chars 3
            Row(doc_id=2, lang="en", text="abc"),
            # "xyz" -> 3 tokens (no merge applies); words 1; chars 3
            Row(doc_id=3, lang="de", text="xyz"),
        ]
    )
    got = {
        r["lang"]: r
        for r in bpe.fertility_report(docs, [("a", "b")], by="lang").collect()
    }
    en = got["en"]
    assert (en["n_docs"], en["n_words"], en["n_chars"], en["n_bpe_tokens"]) == (
        2, 3, 8, 4,
    )
    assert abs(en["fertility"] - round(4 / 3, 4)) < 1e-9
    assert abs(en["chars_per_token"] - 2.0) < 1e-9
    de = got["de"]
    assert (de["n_words"], de["n_bpe_tokens"]) == (1, 3)
    assert abs(de["fertility"] - 3.0) < 1e-9


def test_fertility_report_zero_word_group_is_fail_soft(spark):
    from pyspark.sql import Row

    from database_collector_spark.operators import bpe

    docs = spark.createDataFrame(
        [Row(doc_id=1, lang="en", text="ab ab"), Row(doc_id=2, lang="xx", text="")]
    )
    got = {
        r["lang"]: r for r in bpe.fertility_report(docs, [("a", "b")]).collect()
    }
    assert got["xx"]["n_words"] == 0
    assert got["xx"]["fertility"] is None
    assert got["xx"]["chars_per_token"] is None
    assert got["en"]["fertility"] is not None
