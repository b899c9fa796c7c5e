"""URL canonicalization edge cases (operators/urls.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from database_collector_spark.operators import urls


def _canon(spark, raw):
    df = spark.createDataFrame([(u,) for u in raw], "url string")
    return [
        r["c"] for r in df.select(urls.canonical_url(F.col("url")).alias("c")).collect()
    ]


def test_canonical_url_normalization_rules(spark):
    got = _canon(
        spark,
        [
            "HTTP://WWW.Example.COM:80/A/b/?utm_source=x&z=1&a=2#frag",
            "https://example.com:443/x/",
            "https://example.com:8443/x",     # non-default port preserved
            "http://example.com/",            # root path -> bare host
            "http://example.com/a?ref=nav&fbclid=1&gclid=2&utm_campaign=c",
        ],
    )
    assert got == [
        "http://example.com/A/b?a=2&z=1",
        "https://example.com/x",
        "https://example.com:8443/x",
        "http://example.com",
        "http://example.com/a",
    ]


def test_canonical_url_null_and_unparseable(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "not a url at all")], "doc_id long, url string"
    )
    rows = df.select(
        "doc_id", urls.canonical_url(F.col("url")).alias("c")
    ).collect()
    assert all(r["c"] is None for r in rows)
    # and url_dedup drops them rather than grouping NULLs together
    assert urls.url_dedup(df).count() == 0


def test_url_dedup_zero_shuffle_before_group(spark):
    df = spark.createDataFrame(
        [(1, "http://a.com/x"), (2, "http://A.COM/x/")], "doc_id long, url string"
    )
    out = urls.url_dedup(df)
    # plan BEFORE execution: once AQE finalizes, toString appends the
    # initial plan too and every Exchange would count twice
    plan = out._jdf.queryExecution().executedPlan().toString()
    # exactly the one groupBy exchange; canonicalization is projection
    assert plan.count("Exchange hashpartitioning") == 1
    assert "EvalPython" not in plan and "InPandas" not in plan
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["n_dups"] == 2
    assert rows[0]["keeper_doc_id"] == 1
