"""SCD-1 latest-wins merge (operators/merge.py)."""

from __future__ import annotations

from database_collector_spark.operators.merge import scd1_merge


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, val string, version long")


def test_scd1_update_insert_untouched(spark):
    base = _df(spark, [(1, "a", 0), (2, "b", 0), (3, "c", 0)])
    delta = _df(spark, [(2, "B", 1), (9, "new", 1)])
    got = {
        r["k"]: (r["val"], r["version"])
        for r in scd1_merge(base, delta, key="k", version_col="version").collect()
    }
    assert got == {1: ("a", 0), 2: ("B", 1), 3: ("c", 0), 9: ("new", 1)}


def test_scd1_version_tie_delta_wins(spark):
    # re-delivered update with the SAME version: delta must win (idempotent
    # redelivery), and the higher version always beats a lower delta
    base = _df(spark, [(1, "a", 5), (2, "b", 5)])
    delta = _df(spark, [(1, "A", 5), (2, "stale", 3)])
    got = {
        r["k"]: r["val"]
        for r in scd1_merge(base, delta, key="k", version_col="version").collect()
    }
    assert got == {1: "A", 2: "b"}


def test_scd1_single_shuffle_plan(spark):
    base = _df(spark, [(1, "a", 0)])
    delta = _df(spark, [(1, "A", 1)])
    plan = (
        scd1_merge(base, delta, key="k", version_col="version")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # union + one key-partitioned window: exactly one hash exchange
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_scd1_user_columns_named_like_old_helpers_survive(spark):
    # helper columns use reserved __scd_*__ names, so user data carrying
    # _src/_rn (the old helper names) passes through untouched
    base = spark.createDataFrame(
        [(1, "a", 0, "keep-src", "keep-rn")],
        "k long, val string, version long, _src string, _rn string",
    )
    delta = spark.createDataFrame(
        [(1, "A", 1, "d-src", "d-rn")],
        "k long, val string, version long, _src string, _rn string",
    )
    row = scd1_merge(base, delta, key="k", version_col="version").collect()[0]
    assert (row["val"], row["_src"], row["_rn"]) == ("A", "d-src", "d-rn")


def test_scd1_reserved_helper_names_rejected(spark):
    import pytest

    base = spark.createDataFrame([(1, 0, "x")], "k long, version long, __scd_src__ string")
    delta = spark.createDataFrame([(1, 1, "y")], "k long, version long, __scd_src__ string")
    with pytest.raises(AssertionError, match="reserved merge helper"):
        scd1_merge(base, delta, key="k", version_col="version")


def test_scd2_end_dates_and_keeps_history(spark):
    from database_collector_spark.operators.merge import scd2_merge

    base = _df(spark, [(1, "a", 0), (2, "b", 0), (3, "c", 0)])
    delta = _df(spark, [(1, "A", 1), (1, "A2", 2), (9, "new", 1)])
    got = {
        (r["k"], r["version"]): (r["val"], r["valid_to"], r["is_current"])
        for r in scd2_merge(base, delta, key="k", version_col="version").collect()
    }
    assert got == {
        (1, 0): ("a", 1, False),
        (1, 1): ("A", 2, False),
        (1, 2): ("A2", None, True),
        (2, 0): ("b", None, True),
        (3, 0): ("c", None, True),
        (9, 1): ("new", None, True),
    }


def test_scd2_redelivery_idempotent(spark):
    # same (key, version) in base and delta: the delta copy wins, history
    # does not fork into two rows of the same version
    from database_collector_spark.operators.merge import scd2_merge

    base = _df(spark, [(1, "old-copy", 1), (1, "v0", 0)])
    delta = _df(spark, [(1, "fresh-copy", 1)])
    rows = sorted(
        scd2_merge(base, delta, key="k", version_col="version").collect(),
        key=lambda r: r["version"],
    )
    assert [(r["version"], r["val"]) for r in rows] == [(0, "v0"), (1, "fresh-copy")]
    assert [r["is_current"] for r in rows] == [False, True]


def test_scd2_single_shuffle_plan(spark):
    from database_collector_spark.operators.merge import scd2_merge

    base = _df(spark, [(1, "a", 0)])
    delta = _df(spark, [(1, "A", 1)])
    plan = (
        scd2_merge(base, delta, key="k", version_col="version")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # union + dedup window + lead window all ride ONE key-hash exchange
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_scd2_reserved_output_names_rejected(spark):
    import pytest

    from database_collector_spark.operators.merge import scd2_merge

    base = spark.createDataFrame([(1, 0, "x")], "k long, version long, valid_to string")
    delta = spark.createDataFrame([(1, 1, "y")], "k long, version long, valid_to string")
    with pytest.raises(AssertionError, match="reserved merge"):
        scd2_merge(base, delta, key="k", version_col="version")


def test_cdc_apply_upserts_and_deletes(spark):
    from database_collector_spark.operators.merge import cdc_apply

    base = _df(spark, [(1, "a", 0), (2, "b", 0), (3, "c", 0)])
    changes = spark.createDataFrame(
        [
            (2, "B", 1, "U"),   # update
            (3, "c", 1, "D"),   # delete
            (9, "new", 1, "U"),  # insert
            (9, "gone", 2, "D"),  # ...then deleted at a later version
        ],
        "k long, val string, version long, op string",
    )
    got = {
        r["k"]: r["val"]
        for r in cdc_apply(base, changes, key="k", version_col="version").collect()
    }
    assert got == {1: "a", 2: "B"}


def test_cdc_apply_single_shuffle_and_schema(spark):
    from database_collector_spark.operators.merge import cdc_apply

    base = _df(spark, [(1, "a", 0)])
    changes = spark.createDataFrame(
        [(1, "A", 1, "U")], "k long, val string, version long, op string"
    )
    out = cdc_apply(base, changes, key="k", version_col="version")
    assert out.columns == ["k", "val", "version"]  # op dropped
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_incremental_merge_matches_from_scratch_and_absorbs_retraction(spark):
    from database_collector_spark.operators.incremental import delta_agg, merge_agg

    rows = spark.createDataFrame(
        [("a", 10), ("a", 20), ("b", 5), ("a", 7), ("b", 1)], "g string, v long"
    )
    yesterday = rows.filter("v >= 5")   # (a,10) (a,20) (b,5) (a,7)
    today = rows.filter("v < 5")        # (b,1)
    base_agg = delta_agg(
        yesterday, group_cols=["g"], sum_cols={"v": "v_sum"}
    )
    rest = today
    # retraction: remove one previously-counted ('a', 20) contribution
    retract = spark.createDataFrame([("a", -20)], "g string, v long")
    # hand-build the retraction's delta-agg row with count -1
    from pyspark.sql import functions as F

    retract_agg = retract.groupBy("g").agg(
        F.lit(-1).alias("n"), F.sum("v").alias("v_sum")
    )
    merged = merge_agg(
        base_agg.unionByName(retract_agg),
        rest,
        group_cols=["g"],
        sum_cols={"v": "v_sum"},
    )
    got = {r["g"]: (r["n"], r["v_sum"]) for r in merged.collect()}
    # from scratch minus the retracted (a,20): a -> (10, 7), b -> (5, 1)
    assert got == {"a": (2, 17), "b": (2, 6)}


def test_snapshot_diff_classifies_iud(spark):
    from database_collector_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None)], "k long, val string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d"), (5, None)], "k long, val string"
    )
    got = {
        r["k"]: (r["val"], r["op"])
        for r in snapshot_diff(old, new, key="k").collect()
    }
    # 1 unchanged (omitted), 2 updated, 3 deleted (old values), 4+5 inserted
    assert got == {
        2: ("B", "U"),
        3: (None, "D"),
        4: ("d", "I"),
        5: (None, "I"),
    }


def test_snapshot_diff_null_transitions_are_updates(spark):
    # NULL -> value and value -> NULL must classify as 'U', not silently
    # drop (null-safe struct comparison)
    from database_collector_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame([(1, None), (2, "x")], "k long, val string")
    new = spark.createDataFrame([(1, "v"), (2, None)], "k long, val string")
    got = {r["k"]: r["op"] for r in snapshot_diff(old, new, key="k").collect()}
    assert got == {1: "U", 2: "U"}


def test_snapshot_diff_then_cdc_apply_roundtrips(spark):
    from database_collector_spark.operators.merge import cdc_apply, snapshot_diff
    from pyspark.sql import functions as F

    old = spark.createDataFrame(
        [(1, "a", 0), (2, "b", 0), (3, "c", 0)], "k long, val string, version long"
    )
    new = spark.createDataFrame(
        [(1, "a", 0), (2, "B", 0), (9, "new", 0)], "k long, val string, version long"
    )
    changes = snapshot_diff(old, new, key="k").withColumn(
        "version", F.lit(1)
    ).withColumn("op", F.when(F.col("op") == "D", "D").otherwise("U"))
    applied = cdc_apply(old, changes, key="k", version_col="version")
    got = {r["k"]: r["val"] for r in applied.collect()}
    assert got == {r["k"]: r["val"] for r in new.collect()}
