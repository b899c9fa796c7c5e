"""Heavy hitters (operators/heavyhitters.py): two-phase MG + exact recount."""

from __future__ import annotations

from pyspark.sql import functions as F

from database_collector_spark.operators import heavyhitters


def _items(spark, vals, parts=8):
    return (
        spark.createDataFrame([(v,) for v in vals], "item string")
        .repartition(parts)
    )


def test_heavy_hitters_equals_exact_having(spark):
    # skewed stream: 'hot' 300x, 'warm' 40x, tail of 660 singletons;
    # result must equal the exact GROUP BY + HAVING answer
    vals = ["hot"] * 300 + ["warm"] * 40 + [f"t{i}" for i in range(660)]
    items = _items(spark, vals)
    got = {
        r["item"]: r["n"]
        for r in heavyhitters.heavy_hitters(
            items, threshold_num=1, threshold_den=50
        ).collect()
    }
    # N=1000, threshold = N/50 = 20: hot and warm qualify, tail doesn't
    assert got == {"hot": 300, "warm": 40}


def test_heavy_hitters_boundary_is_exact_integer(spark):
    # item at EXACTLY phi*N must be included (>=, integer arithmetic)
    vals = ["edge"] * 20 + [f"t{i}" for i in range(980)]
    items = _items(spark, vals)
    got = heavyhitters.heavy_hitters(
        items, threshold_num=1, threshold_den=50
    ).collect()
    assert {r["item"] for r in got} == {"edge"}


def test_mg_candidates_never_lose_true_heavy_hitter(spark):
    # adversarial: capacity far below distinct count, hitter spread
    # across every partition — candidate set must still contain it
    vals = (["hh"] * 200 + [f"u{i}" for i in range(2000)]) * 1
    cands = {
        r["item"]
        for r in heavyhitters.mg_candidates(
            _items(spark, vals, parts=16), item_col="item", capacity=11
        ).collect()
    }
    assert "hh" in cands


def test_heavy_hitters_plan_broadcasts_candidates(spark):
    items = _items(spark, ["a"] * 10 + ["b"] * 2)
    plan = (
        heavyhitters.heavy_hitters(items, threshold_num=1, threshold_den=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # candidate set and total are broadcast; the item universe is never
    # sort-merge joined or exact-grouped without pruning
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_heavy_hitters_preserves_non_string_item_type(spark):
    items = (
        spark.createDataFrame([(7,)] * 30 + [(i,) for i in range(100, 170)], "item long")
        .repartition(4)
    )
    out = heavyhitters.heavy_hitters(items, threshold_num=1, threshold_den=10)
    assert dict(out.dtypes)["item"] == "bigint"
    assert {r["item"]: r["n"] for r in out.collect()} == {7: 30}


def test_heavy_hitters_random_streams_match_exact(spark):
    # randomized cross-check: for arbitrary skew profiles and thresholds
    # the two-phase result must equal the exact Python computation
    import collections
    import random

    rng = random.Random(6)
    for trial in range(4):
        n_items = rng.randint(50, 400)
        vals = [f"i{int(rng.expovariate(0.02))}" for _ in range(n_items)]
        den = rng.choice([10, 25, 50])
        exact = {
            k: c
            for k, c in collections.Counter(vals).items()
            if c * den >= len(vals)
        }
        got = {
            r["item"]: r["n"]
            for r in heavyhitters.heavy_hitters(
                _items(spark, vals, parts=rng.choice([2, 8, 16])),
                threshold_num=1,
                threshold_den=den,
            ).collect()
        }
        assert got == exact, f"trial {trial}"


def test_grouped_heavy_hitters_equals_exact_per_group(spark):
    # per-group thresholds are independent: 'x' is heavy in group a
    # (6/20 >= 1/4) but the same absolute count in the larger group b
    # (6/60 < 1/4) is not
    rows = [("a", "x")] * 6 + [("a", f"t{i}") for i in range(14)]
    rows += [("b", "x")] * 6 + [("b", "y")] * 20 + [("b", f"u{i}") for i in range(34)]
    items = spark.createDataFrame(rows, "g string, item string").repartition(8)
    got = {
        (r["g"], r["item"]): r["n"]
        for r in heavyhitters.grouped_heavy_hitters(
            items, group_col="g", threshold_num=1, threshold_den=4
        ).collect()
    }
    assert got == {("a", "x"): 6, ("b", "y"): 20}


def test_grouped_heavy_hitters_random_matches_exact(spark):
    import collections
    import random

    rng = random.Random(13)
    rows = [
        (rng.choice(["g1", "g2", "g3"]), f"i{int(rng.expovariate(0.05))}")
        for _ in range(600)
    ]
    den = 20
    per_group = collections.defaultdict(collections.Counter)
    for g, i in rows:
        per_group[g][i] += 1
    exact = {
        (g, i): c
        for g, cnt in per_group.items()
        for i, c in cnt.items()
        if c * den >= sum(cnt.values())
    }
    items = spark.createDataFrame(rows, "g string, item string").repartition(16)
    got = {
        (r["g"], r["item"]): r["n"]
        for r in heavyhitters.grouped_heavy_hitters(
            items, group_col="g", threshold_num=1, threshold_den=den
        ).collect()
    }
    assert got == exact
