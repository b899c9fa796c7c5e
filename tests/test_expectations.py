"""Unit tests for operators/expectations.py against hand-built frames —
the data-quality tier's Python-reference coverage (the staged r17
differential covers the fixture-scale oracle parity)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from database_collector_spark.operators import expectations


def test_column_profile_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [
            Row(a=1, b="x"),
            Row(a=1, b=None),
            Row(a=2, b="y"),
            Row(a=None, b="y"),
        ]
    )
    got = {
        r["col_name"]: (r["n_rows"], r["n_nulls"], r["null_frac"], r["n_distinct"])
        for r in expectations.column_profile(df).collect()
    }
    assert got == {
        "a": (4, 1, 0.25, 2),
        "b": (4, 1, 0.25, 2),
    }


def test_column_profile_rejects_unsafe_names_and_empty(spark):
    df = spark.createDataFrame([Row(a=1)])
    with pytest.raises(ValueError, match="no columns"):
        expectations.column_profile(df, [])
    bad = df.select(F.col("a").alias("a b"))
    with pytest.raises(ValueError, match="safe identifier"):
        expectations.column_profile(bad)


def test_referential_integrity_counts_orphans_and_null_keys(spark):
    child = spark.createDataFrame(
        [Row(fk=1), Row(fk=1), Row(fk=2), Row(fk=9), Row(fk=None)]
    )
    parent = spark.createDataFrame([Row(pk=1), Row(pk=2), Row(pk=3)])
    r = expectations.referential_integrity(child, "fk", parent, "pk").collect()[0]
    assert r["n_child_rows"] == 5
    assert r["n_child_keyed"] == 4  # the NULL key is unkeyed, not orphaned
    assert r["n_orphan_rows"] == 1 and r["n_orphan_keys"] == 1  # fk=9
    assert r["orphan_frac"] == 0.25


def test_referential_integrity_all_keyed_clean(spark):
    child = spark.createDataFrame([Row(fk=1), Row(fk=2)])
    parent = spark.createDataFrame([Row(pk=1), Row(pk=2)])
    r = expectations.referential_integrity(child, "fk", parent, "pk").collect()[0]
    assert r["n_orphan_rows"] == 0 and r["orphan_frac"] == 0.0


def test_key_uniqueness_verdicts_and_null_key_grouping(spark):
    df = spark.createDataFrame(
        [
            Row(id=1, g="a"),
            Row(id=2, g="a"),
            Row(id=3, g=None),
            Row(id=4, g=None),
        ]
    )
    got = {
        r["key_name"]: r
        for r in expectations.key_uniqueness(
            df, {"id": ["id"], "g": ["g"], "pair": ["id", "g"]}
        ).collect()
    }
    assert got["id"]["is_unique"] is True and got["id"]["n_keys"] == 4
    # two NULL g rows group together: duplicates under GROUP BY semantics
    assert got["g"]["is_unique"] is False
    assert got["g"]["n_dup_keys"] == 2 and got["g"]["n_dup_rows"] == 4
    assert got["pair"]["is_unique"] is True
    with pytest.raises(ValueError, match="no key sets"):
        expectations.key_uniqueness(df, {})


def test_key_uniqueness_accepts_expression_keys(spark):
    df = spark.createDataFrame([Row(t="x"), Row(t="x"), Row(t="y")])
    r = expectations.key_uniqueness(df, {"md5": [F.md5("t")]}).collect()[0]
    assert (r["n_keys"], r["n_dup_keys"], r["n_dup_rows"], r["is_unique"]) == (
        2,
        1,
        2,
        False,
    )
