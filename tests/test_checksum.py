"""Order-insensitive table checksum (operators/checksum.py)."""

from __future__ import annotations

from pyspark.sql import Row

from database_collector_spark.operators.checksum import table_checksum


def _sum_row(df):
    r = table_checksum(df, ("a", "b")).collect()[0]
    return (r["n_rows"], r["sum_h1"], r["sum_h2"], r["sum_h3"], r["sum_h4"])


def test_checksum_invariant_under_order_and_partitioning(spark):
    rows = [Row(a=str(i), b=f"v{i % 7}") for i in range(100)]
    df1 = spark.createDataFrame(rows)
    df2 = spark.createDataFrame(list(reversed(rows))).repartition(13)
    assert _sum_row(df1) == _sum_row(df2)


def test_checksum_detects_single_row_change(spark):
    rows = [Row(a=str(i), b="x") for i in range(50)]
    base = _sum_row(spark.createDataFrame(rows))
    changed = rows[:25] + [Row(a="25", b="y")] + rows[26:]
    assert _sum_row(spark.createDataFrame(changed)) != base


def test_checksum_detects_duplicate_multiplicity(spark):
    rows = [Row(a="1", b="x"), Row(a="2", b="y")]
    dup = rows + [Row(a="1", b="x")]
    c1, c2 = _sum_row(spark.createDataFrame(rows)), _sum_row(spark.createDataFrame(dup))
    assert c1 != c2 and c2[0] == 3


def test_checksum_null_is_not_empty_string(spark):
    df_null = spark.createDataFrame([Row(a=None, b="x")], "a string, b string")
    df_empty = spark.createDataFrame([Row(a="", b="x")])
    assert _sum_row(df_null) != _sum_row(df_empty)
