"""Parquet schema evolution on the read path: a lake directory whose
shards were written at different pipeline versions (later shards carry
added columns) must stay readable — with the union schema via
mergeSchema, or with a pinned explicit schema that simply ignores the
new column. Both behaviors are contracts ingest code relies on."""

from __future__ import annotations

import tempfile

from pyspark.sql import Row


def _write_shards(spark, root):
    spark.createDataFrame([Row(id=1, v="a"), Row(id=2, v="b")]).write.parquet(
        f"{root}/shard1"
    )
    spark.createDataFrame(
        [Row(id=3, v="c", score=7)]
    ).write.parquet(f"{root}/shard2")


def test_merge_schema_unions_columns_with_nulls(spark):
    with tempfile.TemporaryDirectory() as tmp:
        _write_shards(spark, tmp)
        df = spark.read.option("mergeSchema", "true").parquet(
            f"{tmp}/shard1", f"{tmp}/shard2"
        )
        assert set(df.columns) == {"id", "v", "score"}
        got = {r["id"]: r["score"] for r in df.collect()}
        assert got == {1: None, 2: None, 3: 7}


def test_explicit_schema_pins_old_columns(spark):
    with tempfile.TemporaryDirectory() as tmp:
        _write_shards(spark, tmp)
        df = spark.read.schema("id long, v string").parquet(
            f"{tmp}/shard1", f"{tmp}/shard2"
        )
        assert df.columns == ["id", "v"]
        assert sorted(r["id"] for r in df.collect()) == [1, 2, 3]
