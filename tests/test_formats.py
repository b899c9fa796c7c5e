"""Format-breadth pins: the lake formats this Spark distribution reads
and writes out of the box (ORC alongside the parquet/CSV/JSONL/promtext
paths the sources/ modules own). These are executable claims — if a
future distribution drops the ORC datasource, this fails loudly instead
of the README overstating support."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F


def test_orc_round_trip_preserves_schema_and_values(spark):
    df = spark.range(0, 100).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).cast("int").alias("small"),
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("s"),
        (F.col("id") * 1.5).alias("d"),
        F.struct(F.col("id").alias("a"), F.lit("x").alias("b")).alias("nested"),
        F.array(F.col("id"), F.col("id") + 1).alias("arr"),
    )
    with tempfile.TemporaryDirectory() as tmp:
        df.write.format("orc").option("compression", "zlib").save(f"{tmp}/t")
        back = spark.read.format("orc").load(f"{tmp}/t")
        # ORC read-back relaxes nullability (top-level and nested); names
        # and types must survive exactly
        assert back.schema.simpleString() == df.schema.simpleString()
        assert back.count() == 100
        a = {r["k"]: r for r in df.collect()}
        b = {r["k"]: r for r in back.collect()}
        assert a == b


def test_orc_predicate_pushdown_reaches_scan(spark):
    with tempfile.TemporaryDirectory() as tmp:
        spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") % 10).cast("int").alias("g")
        ).write.format("orc").save(f"{tmp}/t")
        q = spark.read.format("orc").load(f"{tmp}/t").where(F.col("g") == 3)
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan and "g" in plan
        assert q.count() == 100
