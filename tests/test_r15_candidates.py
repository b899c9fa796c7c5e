"""Reference tests for the round-15 gate candidates (pre-built in round
12): boundary-splitting sequence packing, Krippendorff's alpha, exact
Gini, and the vocabulary-overlap matrix — each against a plain-Python
reference with its edge stances, the staging bar every gate candidate
clears BEFORE its oracle twin is written.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from database_collector_spark.curation import pack_segments
from database_collector_spark.operators.ranking import (
    gini_by_group,
    krippendorff_alpha,
)
from database_collector_spark.operators.text import vocab_overlap_matrix


# --------------------------------------------------------- pack_segments

def test_pack_segments_matches_concat_and_split_reference(spark):
    rows = [
        ("en", 1, "a b c"),          # 3 tokens
        ("en", 2, "d e f g h"),      # 5 tokens -> straddles with budget 4
        ("en", 3, "i"),
        ("en", 4, ""),               # zero tokens -> excluded
        ("de", 7, "x  y"),           # double space -> 2 nonempty tokens
        (None, 9, "zzz"),            # NULL stream -> excluded
        ("de", 8, None),             # NULL text -> excluded
    ]
    df = spark.createDataFrame(rows, "lang string, doc_id int, text string")
    budget = 4
    got = sorted(
        (
            (r["lang"], r["doc_id"], r["chunk_id"], r["tok_from"], r["tok_to"])
            for r in pack_segments(
                df, budget_tokens=budget, stream_col="lang", order_col="doc_id"
            ).collect()
        )
    )
    # plain-python concat-and-split per stream in doc_id order
    want = []
    for stream in ("de", "en"):
        off = 0
        docs = sorted(
            (d, len([t for t in (t_ or "").split(" ") if t]))
            for s, d, t_ in rows
            if s == stream and t_ is not None
        )
        for doc, n in docs:
            if n == 0:
                continue
            for pos in range(n):
                want.append((stream, doc, (off + pos) // budget, pos))
            off += n
    # collapse the per-token reference into contiguous segments
    segs: dict[tuple, list[int]] = {}
    for stream, doc, chunk, pos in want:
        segs.setdefault((stream, doc, chunk), []).append(pos)
    want_segs = sorted(
        (s, d, c, min(ps), max(ps) + 1) for (s, d, c), ps in segs.items()
    )
    assert got == want_segs
    # every chunk except each stream's last is exactly full
    by_chunk: dict[tuple, int] = {}
    for s, d, c, lo, hi in got:
        by_chunk[(s, c)] = by_chunk.get((s, c), 0) + (hi - lo)
    for stream in ("de", "en"):
        chunks = sorted(c for s, c in by_chunk if s == stream)
        for c in chunks[:-1]:
            assert by_chunk[(stream, c)] == budget, (stream, c)


def test_pack_segments_rejects_bad_budget(spark):
    df = spark.createDataFrame([("en", 1, "a")], "lang string, doc_id int, text string")
    with pytest.raises(ValueError, match="budget_tokens"):
        pack_segments(df, budget_tokens=0)


# --------------------------------------------------- Krippendorff alpha

def _alpha_ref(votes):
    """Canonical nominal-alpha: 1 − D_o/D_e over pairable items."""
    items: dict = {}
    for it, c in votes:
        items.setdefault(it, []).append(c)
    pair = {it: cs for it, cs in items.items() if len(cs) >= 2}
    n_p = sum(len(cs) for cs in pair.values())
    if n_p < 2:
        return None
    cats = sorted({c for cs in pair.values() for c in cs})
    t = {c: sum(cs.count(c) for cs in pair.values()) for c in cats}
    d_o = sum(
        (len(cs) ** 2 - sum(cs.count(c) ** 2 for c in cats)) / (len(cs) - 1)
        for cs in pair.values()
    ) / n_p
    d_e_num = n_p**2 - sum(v**2 for v in t.values())
    if d_e_num == 0:
        return None
    d_e = d_e_num / (n_p * (n_p - 1))
    return 1 - d_o / d_e


def test_krippendorff_matches_reference_with_missing_votes(spark):
    votes = [
        # uneven panels: items with 4, 3, 2 votes; one single-vote item
        (1, "a"), (1, "a"), (1, "a"), (1, "b"),
        (2, "b"), (2, "b"), (2, "b"),
        (3, "a"), (3, "b"),
        (4, "a"),                       # unpairable -> dropped
        (5, "c"), (5, "c"),
    ]
    df = spark.createDataFrame(votes, "item_id int, category string")
    [r] = krippendorff_alpha(df).collect()
    assert r["n_items"] == 4 and r["n_values"] == 11 and r["n_cats"] == 3
    assert r["kappa" if "kappa" in r.asDict() else "alpha"] == pytest.approx(
        round(_alpha_ref(votes), 6), abs=2e-6
    )


def test_krippendorff_edges(spark):
    # nothing pairable -> NULL
    solo = spark.createDataFrame([(1, "a"), (2, "b")], "item_id int, category string")
    [r] = krippendorff_alpha(solo).collect()
    assert r["alpha"] is None
    # unanimous single category -> D_e = 0 -> NULL
    one = spark.createDataFrame(
        [(i, "a") for i in range(3) for _ in range(2)], "item_id int, category string"
    )
    [r] = krippendorff_alpha(one).collect()
    assert r["alpha"] is None
    # perfect agreement on 2+ categories -> alpha = 1
    perfect = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b"), (2, "b")], "item_id int, category string"
    )
    [r] = krippendorff_alpha(perfect).collect()
    assert r["alpha"] == 1.0


def test_krippendorff_equals_reference_on_fleiss_style_table(spark):
    # complete panel (the fleiss_kappa input) is just a special case
    votes = [
        (i, c)
        for i, row in enumerate([[2, 1], [0, 3], [3, 0], [1, 2]])
        for c, k in enumerate(row)
        for _ in range(k)
    ]
    df = spark.createDataFrame(votes, "item_id int, category int")
    [r] = krippendorff_alpha(df).collect()
    assert r["alpha"] == pytest.approx(round(_alpha_ref(votes), 6), abs=2e-6)


# ------------------------------------------------------------------ Gini

def _gini_ref(xs):
    # exact rational half-up at 6 decimals (integer arithmetic), the
    # operator's own quantization — see test_r15_properties._gini_ref
    s = sum(xs)
    if s == 0:
        return None
    n = len(xs)
    num = sum(a - b for a in xs for b in xs if a > b)
    den = n * s
    return (2_000_000 * num + den) // (2 * den) / 1e6


def test_gini_matches_reference(spark):
    for xs in ([0, 1], [5, 5, 5], [1, 2, 3, 4, 100], [0, 0, 7], [3]):
        df = spark.createDataFrame([(x,) for x in xs], "v long")
        [r] = gini_by_group(df, "v").collect()
        assert (r["n"], r["total"]) == (len(xs), sum(xs))
        assert r["gini"] == _gini_ref(xs), xs
    # all-zero total -> NULL
    df = spark.createDataFrame([(0,), (0,)], "v long")
    [r] = gini_by_group(df, "v").collect()
    assert r["gini"] is None


def test_gini_negative_raises_and_grouped_equals_slice(spark):
    bad = spark.createDataFrame([(-1,)], "v long")
    with pytest.raises(Exception, match="non-negative"):
        gini_by_group(bad, "v").collect()
    rows = [("a", (i * 7) % 23) for i in range(30)] + [
        ("b", (i * i) % 11) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    grouped = {r["g"]: r["gini"] for r in gini_by_group(df, "v", group_col="g").collect()}
    for g in ("a", "b"):
        assert grouped[g] == _gini_ref([v for gg, v in rows if gg == g]), g


# ------------------------------------------------- vocab overlap matrix

def test_vocab_overlap_matrix_matches_set_reference(spark):
    rows = [
        ("s1", "the cat sat"),
        ("s1", "the mat"),
        ("s2", "the dog sat"),
        ("s3", "völlig anders"),   # disjoint from s1/s2 -> explicit 0 rows
        (None, "ghost words"),
        ("s2", None),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {
        (r["g_a"], r["g_b"]): r
        for r in vocab_overlap_matrix(df).collect()
    }
    vocab = {}
    for s, t in rows:
        if s is None or t is None:
            continue
        vocab.setdefault(s, set()).update(w for w in t.split(" ") if w)
    names = sorted(vocab)
    want_pairs = {
        (a, b)
        for i, a in enumerate(names)
        for b in names[i + 1 :]
    }
    assert set(got) == want_pairs
    for (a, b), r in got.items():
        inter = len(vocab[a] & vocab[b])
        assert (r["vocab_a"], r["vocab_b"], r["inter"]) == (
            len(vocab[a]), len(vocab[b]), inter
        )
        assert r["jaccard"] == round(inter / len(vocab[a] | vocab[b]), 6)
        assert r["containment"] == round(
            inter / min(len(vocab[a]), len(vocab[b])), 6
        )


def test_gini_rejects_float_values(spark):
    """Float contributions must RAISE, not truncate to integers (review
    finding: [0.4, 0.6] silently became [0, 0])."""
    df = spark.createDataFrame([(0.4,), (0.6,)], "v double")
    with pytest.raises(Exception, match="non-integer"):
        gini_by_group(df, "v").collect()


def test_pack_segments_duplicate_order_raises_and_null_order_excluded(spark):
    dup = spark.createDataFrame(
        [("en", 1, "a b"), ("en", 1, "c d")],
        "lang string, doc_id int, text string",
    )
    with pytest.raises(Exception, match="duplicate"):
        pack_segments(dup, budget_tokens=4).collect()
    with_null = spark.createDataFrame(
        [("en", 1, "a b c"), ("en", None, "x y z")],
        "lang string, doc_id int, text string",
    )
    got = pack_segments(with_null, budget_tokens=4).collect()
    assert [(r["doc_id"], r["tok_from"], r["tok_to"]) for r in got] == [(1, 0, 3)]
