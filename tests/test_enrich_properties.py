"""Property-based enrichment invariants (SURVEY.md §5 item 5): random
label sets / metric types / timestamps through enrich() must always yield
the 5 pipeline labels, a non-null timestamp, and finite values.

Hypothesis drives the INPUT GENERATION only; each example batch runs
through the real Spark transform. Examples are kept small and the example
count modest — each is a full Spark job.
"""

from __future__ import annotations

import datetime as dt
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from database_collector_spark.model.schemas import METRIC_SAMPLE_SCHEMA
from database_collector_spark.operators.enrich import enrich

ANCHOR = "2024-06-01 00:00:00"
PIPELINE_LABELS = {"identifier", "job", "region", "accountId", "engine"}

label_keys = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=8
).filter(lambda k: k not in PIPELINE_LABELS and k != "__name__")

samples_strategy = st.lists(
    st.fixed_dictionaries(
        {
            "name": st.text(alphabet="abcdefg_", min_size=1, max_size=12),
            "metric_type": st.sampled_from(
                ["COUNTER", "GAUGE", "UNTYPED", None]
            ),
            "labels": st.dictionaries(
                label_keys,
                st.text(alphabet="xyz0189.-", max_size=6),
                max_size=4,
            ),
            "value": st.floats(
                allow_nan=False,
                allow_infinity=False,
                min_value=-1e12,
                max_value=1e12,
            ),
            "ts": st.one_of(
                st.none(),
                st.datetimes(
                    min_value=dt.datetime(2020, 1, 1),
                    max_value=dt.datetime(2030, 1, 1),
                ),
            ),
        }
    ),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(samples=samples_strategy)
def test_enrich_invariants(spark, samples):
    rows = [
        Row(
            name=s["name"],
            metric_type=s["metric_type"],
            labels=s["labels"],
            value=s["value"],
            ts=s["ts"],
            buckets=None,
            quantiles=None,
            sample_sum=None,
            sample_count=None,
        )
        for s in samples
    ]
    df = spark.createDataFrame(rows, METRIC_SAMPLE_SCHEMA)
    out = enrich(
        df,
        host="db-1.cluster.rds.amazonaws.com",
        engine="mysql",
        region="us-west-2",
        account_id="123",
        anchor_ts=ANCHOR,
    ).collect()

    assert len(out) == len(rows)  # scalar samples map 1:1
    for r in out:
        labels = r["labels"]
        # 5 pipeline labels always present with pipeline values
        # (prometheus.go:46-65), regardless of source label collisions
        assert PIPELINE_LABELS <= set(labels)
        assert labels["identifier"] == "db-1"  # truncation at first '.'
        assert labels["job"] == "database-collector"
        assert labels["engine"] == "mysql"
        # name carried as __name__
        assert labels["__name__"]
        # timestamp never null: source ts or the anchor
        assert r["ts"] is not None
        # values remain finite
        assert r["value"] is None or math.isfinite(r["value"])


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    host=st.text(
        alphabet="abcdefghij0123456789.-", min_size=1, max_size=30
    ).filter(lambda h: not h.startswith("."))
)
def test_identifier_is_host_prefix(spark, host):
    df = spark.createDataFrame(
        [
            Row(
                name="m",
                metric_type="GAUGE",
                labels={},
                value=1.0,
                ts=None,
                buckets=None,
                quantiles=None,
                sample_sum=None,
                sample_count=None,
            )
        ],
        METRIC_SAMPLE_SCHEMA,
    )
    (row,) = enrich(
        df,
        host=host,
        engine="postgres",
        region="r",
        account_id="a",
        anchor_ts=ANCHOR,
    ).collect()
    assert row["labels"]["identifier"] == host.split(".")[0]
