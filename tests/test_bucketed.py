"""Bucketed co-located join: the at-rest zero-shuffle contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from database_collector_spark.sinks.bucketed import read_table, write_bucketed


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark):
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    try:
        write_bucketed(
            orders.withColumnRenamed("o_orderkey", "k"),
            "bkt_orders",
            bucket_col="k",
            n_buckets=8,
        )
        write_bucketed(
            lineitem.withColumnRenamed("l_orderkey", "k"),
            "bkt_lineitem",
            bucket_col="k",
            n_buckets=8,
        )
        # at sf0.001 the planner would broadcast instead (also fine, but
        # not what this test pins); force the sort-merge path a 100 TB
        # fact-fact join takes
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # since Spark 3.0 bucketed scans only expose their file-level sort
        # order behind this flag (reading per-bucket files as one sorted
        # stream serializes the scan when a bucket has many files; ours
        # have exactly one, see write_bucketed)
        spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
        joined = read_table(spark, "bkt_orders").join(
            read_table(spark, "bkt_lineitem"), "k"
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
        # bucket files are written key-sorted: the join needs no Sort either
        assert "+- Sort " not in plan, plan
        # and the result is still correct
        assert joined.count() == lineitem.count()
        # grouping by the bucket key also rides the bucketing (no shuffle)
        agg = (
            read_table(spark, "bkt_lineitem")
            .groupBy("k")
            .agg(F.count("*").alias("n"))
        )
        assert "Exchange hashpartitioning" not in _plan(agg)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
        spark.sql("DROP TABLE IF EXISTS bkt_orders")
        spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
