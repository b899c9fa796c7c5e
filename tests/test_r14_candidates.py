"""Reference tests for the round-14 gate candidates.

Each new operator gets a plain-Python (or hand-computed) reference over a
fixture designed to hit its edge stances — the staging bar every gate
candidate clears BEFORE its oracle twin is written (the pr_curve /
vocab_richness pattern from round 12).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from database_collector_spark.curation import class_balance_plan
from database_collector_spark.operators.ranking import (
    brier_score,
    calibration_curve,
    chi2_association,
    ece_report,
    fleiss_kappa,
    ks_statistic,
    lift_curve,
    mcc,
    reciprocal_rank,
)


# ------------------------------------------------------------------ mcc

def test_mcc_matches_hand_computation(spark):
    """tp=3 fp=1 fn=2 tn=4 -> mcc = (3*4-1*2)/sqrt(4*5*5*6)."""
    rows = (
        [(1, 1)] * 3 + [(1, 0)] * 1 + [(0, 1)] * 2 + [(0, 0)] * 4
    )
    df = spark.createDataFrame(rows, "pred int, truth int")
    [r] = mcc(df, "pred", "truth").collect()
    assert (r["n"], r["tp"], r["fp"], r["fn"], r["tn"]) == (10, 3, 1, 2, 4)
    want = (3 * 4 - 1 * 2) / math.sqrt(4 * 5 * 5 * 6)
    assert r["mcc"] == round(want, 6)


def test_mcc_null_on_constant_margin_and_null_rows_dropped(spark):
    rows = [(1, 1), (1, 0), (None, 1), (1, None)]
    df = spark.createDataFrame(rows, "pred int, truth int")
    [r] = mcc(df, "pred", "truth").collect()
    # only 2 rows survive pairwise deletion; pred is constant -> NULL
    assert r["n"] == 2 and r["mcc"] is None


def test_mcc_grouped_equals_per_slice(spark):
    rows = [("a", i % 2, (i // 2) % 2) for i in range(12)] + [
        ("b", 1 if i < 7 else 0, 1 if i % 3 else 0) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "g string, pred int, truth int")
    grouped = {r["g"]: r["mcc"] for r in mcc(df, "pred", "truth", group_col="g").collect()}
    for g in ("a", "b"):
        [solo] = mcc(df.where(F.col("g") == g), "pred", "truth").collect()
        assert grouped[g] == solo["mcc"], g


# ---------------------------------------------------------- brier score

def test_brier_matches_python_reference(spark):
    rows = [(900, 1), (100, 0), (500, 1), (250, 0), (1000, 1), (0, 0)]
    df = spark.createDataFrame(rows, "p_milli int, label int")
    [r] = brier_score(df).collect()
    want = sum((p - 1000 * y) ** 2 for p, y in rows) / (1000**2 * len(rows))
    assert r["n"] == len(rows) and r["brier"] == round(want, 6)


def test_brier_domain_guard_raises(spark):
    df = spark.createDataFrame([(1500, 1)], "p_milli int, label int")
    with pytest.raises(Exception, match="outside"):
        brier_score(df).collect()


# ------------------------------------------------------------ ECE / MCE

def test_ece_report_matches_python_reference(spark):
    rows = [
        (50, 0), (120, 0), (180, 1), (450, 0), (480, 1), (520, 1),
        (730, 1), (760, 0), (990, 1), (1000, 1),
    ]
    df = spark.createDataFrame(rows, "p_milli int, label int")
    [r] = ece_report(df, n_bins=10).collect()
    bins: dict[int, list[tuple[int, int]]] = {}
    for p, y in rows:
        bins.setdefault(min(p * 10 // 1000, 9), []).append((p, y))
    gaps = {
        b: abs(1000 * sum(y for _, y in v) - sum(p for p, _ in v))
        for b, v in bins.items()
    }
    n = len(rows)
    assert r["n"] == n
    assert r["ece"] == round(sum(gaps.values()) / (1000 * n), 6)
    assert r["mce"] == round(
        max(g / (1000 * len(bins[b])) for b, g in gaps.items()), 6
    )


def test_ece_grouped_equals_per_slice(spark):
    rows = [("a", (i * 137) % 1001, i % 2) for i in range(40)] + [
        ("b", (i * 61) % 1001, 1 if i % 3 else 0) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "g string, p_milli int, label int")
    grouped = {
        r["g"]: (r["ece"], r["mce"])
        for r in ece_report(df, group_col="g").collect()
    }
    for g in ("a", "b"):
        [solo] = ece_report(df.where(F.col("g") == g)).collect()
        assert grouped[g] == (solo["ece"], solo["mce"]), g


# ------------------------------------------------------------ lift curve

def test_lift_curve_matches_python_reference(spark):
    rows = [(float(s), 1 if s >= 6 else 0) for s in range(10)] + [
        (3.0, 1),
        (3.0, 0),
    ]
    df = spark.createDataFrame(rows, "score double, label int")
    got = {r["bin"]: r for r in lift_curve(df, n_bins=4).collect()}
    cal = {r["bin"]: r for r in calibration_curve(df, n_bins=4).collect()}
    assert set(got) == set(cal)
    n_all = sum(r["n_docs"] for r in cal.values())
    p_all = sum(r["n_pos"] for r in cal.values())
    for b, row in got.items():
        assert row["lift"] == round(
            (cal[b]["n_pos"] * n_all) / (cal[b]["n_docs"] * p_all), 6
        )
        cum_n = sum(c["n_docs"] for bb, c in cal.items() if bb >= b)
        cum_pos = sum(c["n_pos"] for bb, c in cal.items() if bb >= b)
        assert (row["cum_n"], row["cum_pos"]) == (cum_n, cum_pos)
        assert row["cum_lift"] == round((cum_pos * n_all) / (cum_n * p_all), 6)
    # the whole-corpus point has lift exactly 1
    assert got[min(got)]["cum_lift"] == 1.0
    # zero-positive slice -> NULL lifts
    neg = spark.createDataFrame([(1.0, 0), (2.0, 0)], "score double, label int")
    assert all(
        r["lift"] is None and r["cum_lift"] is None
        for r in lift_curve(neg, n_bins=2).collect()
    )


# ---------------------------------------------------------- KS statistic

def _ks_python(rows):
    pos = sorted(s for s, y in rows if y == 1)
    neg = sorted(s for s, y in rows if y == 0)
    if not pos or not neg:
        return None
    best = 0
    for s in sorted({s for s, _ in rows}):
        cp = sum(1 for v in pos if v <= s)
        cn = sum(1 for v in neg if v <= s)
        best = max(best, abs(cp * len(neg) - cn * len(pos)))
    return round(best / (len(pos) * len(neg)), 6)


def test_ks_matches_python_reference(spark):
    rows = [
        (0.1, 0), (0.2, 0), (0.2, 1), (0.35, 0), (0.5, 1), (0.55, 0),
        (0.7, 1), (0.7, 1), (0.9, 1), (0.95, 0), (1.2, 1), (-0.4, 0),
    ]
    df = spark.createDataFrame(rows, "score double, label int")
    [r] = ks_statistic(df).collect()
    assert (r["n_pos"], r["n_neg"]) == (6, 6)
    assert r["ks"] == _ks_python(rows)


def test_ks_single_class_is_null_and_grouped_equals_slice(spark):
    only_pos = spark.createDataFrame([(1.0, 1), (2.0, 1)], "score double, label int")
    [r] = ks_statistic(only_pos).collect()
    assert r["ks"] is None
    rows = [("a", float(i % 7) / 3, i % 2) for i in range(30)] + [
        ("b", float((i * 13) % 11), 1 if i % 3 else 0) for i in range(24)
    ]
    df = spark.createDataFrame(rows, "g string, score double, label int")
    grouped = {r["g"]: r["ks"] for r in ks_statistic(df, group_col="g").collect()}
    for g in ("a", "b"):
        slice_rows = [(s, y) for gg, s, y in rows if gg == g]
        assert grouped[g] == _ks_python(slice_rows), g


# ------------------------------------------------------- reciprocal rank

def test_reciprocal_rank_hand_fixture(spark):
    ranked = spark.createDataFrame(
        [("q1", 1, 1), ("q1", 2, 2), ("q1", 3, 3), ("q2", 9, 1), ("q3", 7, 1)],
        "g string, doc_id int, rank int",
    )
    rels = spark.createDataFrame(
        # q1: first relevant at rank 3; q2: relevant exists but not ranked;
        # q4: judged, no ranked rows at all; q3: zero relevant judgments
        [("q1", 3, 1), ("q1", 5, 1), ("q2", 8, 1), ("q4", 1, 1), ("q3", 7, 0)],
        "g string, doc_id int, rel int",
    )
    got = {
        r["g"]: r
        for r in reciprocal_rank(ranked, rels, k=10, group_col="g").collect()
    }
    assert got["q1"]["first_rel_rank"] == 3 and got["q1"]["rr"] == round(1 / 3, 6)
    assert got["q2"]["first_rel_rank"] is None and got["q2"]["rr"] == 0.0
    assert got["q4"]["n_ranked"] == 0 and got["q4"]["rr"] == 0.0
    assert got["q3"]["n_rel"] == 0 and got["q3"]["rr"] is None


def test_reciprocal_rank_zero_rank_raises(spark):
    ranked = spark.createDataFrame([("q", 1, 0)], "g string, doc_id int, rank int")
    rels = spark.createDataFrame([("q", 1, 1)], "g string, doc_id int, rel int")
    with pytest.raises(Exception, match="1-based"):
        reciprocal_rank(ranked, rels, group_col="g").collect()


# ---------------------------------------------------------- Fleiss kappa

_FLEISS_TABLE = [
    # the Fleiss (1971) textbook table: 10 items x 14 raters x 5 categories
    [0, 0, 0, 0, 14],
    [0, 2, 6, 4, 2],
    [0, 0, 3, 5, 6],
    [0, 3, 9, 2, 0],
    [2, 2, 8, 1, 1],
    [7, 7, 0, 0, 0],
    [3, 2, 6, 3, 0],
    [2, 5, 3, 2, 2],
    [6, 5, 2, 1, 0],
    [0, 2, 2, 3, 7],
]


def _fleiss_python(table):
    n_items = len(table)
    n = sum(table[0])
    p_o = sum(
        sum(c * (c - 1) for c in row) / (n * (n - 1)) for row in table
    ) / n_items
    totals = [sum(row[j] for row in table) for j in range(len(table[0]))]
    p_e = sum((t / (n_items * n)) ** 2 for t in totals)
    return round((p_o - p_e) / (1 - p_e), 6)


def test_fleiss_kappa_matches_textbook_table(spark):
    votes = [
        (i, j)
        for i, row in enumerate(_FLEISS_TABLE)
        for j, c in enumerate(row)
        for _ in range(c)
    ]
    df = spark.createDataFrame(votes, "item_id int, category int")
    [r] = fleiss_kappa(df).collect()
    assert (r["n_items"], r["n_raters"], r["n_cats"]) == (10, 14, 5)
    assert r["kappa"] == _fleiss_python(_FLEISS_TABLE)


def test_fleiss_kappa_guards_and_edges(spark):
    # unequal panels raise in-plan
    uneven = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a")], "item_id int, category string"
    )
    with pytest.raises(Exception, match="fixed rater panel"):
        fleiss_kappa(uneven).collect()
    # single rater -> NULL (no pairs)
    solo = spark.createDataFrame([(1, "a"), (2, "b")], "item_id int, category string")
    [r] = fleiss_kappa(solo).collect()
    assert r["kappa"] is None
    # unanimous single category -> P_e = 1 -> NULL
    one_cat = spark.createDataFrame(
        [(i, "a") for i in range(3) for _ in range(2)], "item_id int, category string"
    )
    [r] = fleiss_kappa(one_cat).collect()
    assert r["kappa"] is None


# ------------------------------------------------------ chi2 association

def test_chi2_association_matches_python_reference(spark):
    rows = (
        [("s1", "ok")] * 30 + [("s1", "bad")] * 10
        + [("s2", "ok")] * 12 + [("s2", "bad")] * 28
        + [("s3", "ok")] * 25  # s3 x bad is a ZERO cell — must appear
    )
    df = spark.createDataFrame(rows, "src string, flag string")
    got = {(r["a"], r["b"]): r for r in chi2_association(df, "src", "flag").collect()}
    n = len(rows)
    ra = {"s1": 40, "s2": 40, "s3": 25}
    cb = {"ok": 67, "bad": 38}
    obs = {
        ("s1", "ok"): 30, ("s1", "bad"): 10, ("s2", "ok"): 12,
        ("s2", "bad"): 28, ("s3", "ok"): 25, ("s3", "bad"): 0,
    }
    assert set(got) == set(obs)
    for cell, o in obs.items():
        r = got[cell]
        ex = ra[cell[0]] * cb[cell[1]] / n
        contrib = (o * n - ra[cell[0]] * cb[cell[1]]) ** 2 / (
            n * ra[cell[0]] * cb[cell[1]]
        )
        assert r["observed"] == o
        assert r["expected"] == round(ex, 6)
        assert r["contrib"] == round(contrib, 6)


# --------------------------------------------------- class balance plan

def test_class_balance_plan_matches_python_reference(spark):
    rows = (
        [("s1", "en")] * 8 + [("s1", "de")] * 2 + [("s2", "en")] * 5
        + [("s2", "de")] * 5 + [(None, "en")] * 3 + [("s1", None)] * 4
    )
    df = spark.createDataFrame(rows, "source string, lang string")
    got = {
        (r["source"], r["label"]): (r["n"], r["target"], r["keep_frac"])
        for r in class_balance_plan(df).collect()
    }
    assert got == {
        ("s1", "en"): (8, 2, 0.25),
        ("s1", "de"): (2, 2, 1.0),
        ("s2", "en"): (5, 5, 1.0),
        ("s2", "de"): (5, 5, 1.0),
    }


def test_brier_and_ece_reject_float_probabilities(spark):
    """A real-valued probability column must RAISE, not silently
    truncate into the valid range (review finding: cast('long') mapped
    0.73 -> 0, inside [0, 1000], so a range-only guard never fired)."""
    df = spark.createDataFrame([(0.73, 1)], "p_milli double, label int")
    with pytest.raises(Exception, match="non-integer"):
        brier_score(df).collect()
    with pytest.raises(Exception, match="non-integer"):
        ece_report(df).collect()


def test_reciprocal_rank_duplicate_judgment_guard(spark):
    """Opt-in uniqueness guard (review finding: duplicates multiply
    matched ranked rows via the left join, inflating n_ranked/n_rel)."""
    ranked = spark.createDataFrame(
        [("q", 1, 1), ("q", 3, 2)], "g string, doc_id int, rank int"
    )
    dup_rels = spark.createDataFrame(
        [("q", 3, 1), ("q", 3, 1)], "g string, doc_id int, rel int"
    )
    with pytest.raises(Exception, match="duplicate judgment"):
        reciprocal_rank(
            ranked, dup_rels, group_col="g", check_unique_judgments=True
        ).collect()
    # clean input passes with the guard armed
    rels = spark.createDataFrame([("q", 3, 1)], "g string, doc_id int, rel int")
    [r] = reciprocal_rank(
        ranked, rels, group_col="g", check_unique_judgments=True
    ).collect()
    assert r["first_rel_rank"] == 2 and r["rr"] == 0.5


def test_map_at_k_duplicate_judgment_guard(spark):
    """map_at_k now shares the uniqueness guard with ndcg/rr (review
    finding: the trio reports together, so all three must be able to
    arm the same check)."""
    from database_collector_spark.operators.ranking import map_at_k

    ranked = spark.createDataFrame(
        [("q", 1, 1), ("q", 3, 2)], "g string, doc_id int, rank int"
    )
    dup_rels = spark.createDataFrame(
        [("q", 3, 1), ("q", 3, 1)], "g string, doc_id int, rel int"
    )
    with pytest.raises(Exception, match="duplicate judgment"):
        map_at_k(
            ranked, dup_rels, group_col="g", check_unique_judgments=True
        ).collect()
    rels = spark.createDataFrame([("q", 3, 1)], "g string, doc_id int, rel int")
    [r] = map_at_k(
        ranked, rels, group_col="g", check_unique_judgments=True
    ).collect()
    assert r["hits"] == 1 and r["n_rel"] == 1
