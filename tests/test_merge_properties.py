"""Property-based merge-family invariants: on ANY version-stamped base +
delta, (1) SCD-2's current slice must equal SCD-1's latest-wins output,
(2) cdc_apply with no deletes must equal scd1_merge, (3) snapshot_diff
must roundtrip through cdc_apply. Hypothesis drives input generation
only; each example runs the real Spark transforms, so examples stay
small and few (each is a full Spark job)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from database_collector_spark.operators.merge import (
    cdc_apply,
    scd1_merge,
    scd2_merge,
    snapshot_diff,
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=5),      # key
        st.sampled_from(["a", "b", "c", None]),     # value
        st.integers(min_value=0, max_value=3),      # version
    ),
    min_size=0,
    max_size=6,
)


def _mk(spark, rows):
    # a physical table holds one row per (key, version); dedup in PYTHON
    # (a Spark dropDuplicates picks arbitrary rows per re-evaluation, and
    # these frames are each evaluated by two operators per test)
    d = {(k, ver): v for k, v, ver in rows}
    rows = [(k, v, ver) for (k, ver), v in d.items()]
    return spark.createDataFrame(
        rows or [(None, None, None)], "k long, val string, version long"
    ).filter("k is not null")


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(base_rows=rows_strategy, delta_rows=rows_strategy)
def test_scd2_current_slice_equals_scd1(spark, base_rows, delta_rows):
    base = _mk(spark, base_rows)
    delta = _mk(spark, delta_rows)
    s1 = {
        (r["k"], r["val"], r["version"])
        for r in scd1_merge(base, delta, key="k", version_col="version").collect()
    }
    s2_current = {
        (r["k"], r["val"], r["version"])
        for r in scd2_merge(base, delta, key="k", version_col="version")
        .filter("is_current")
        .drop("valid_to", "is_current")
        .collect()
    }
    assert s1 == s2_current


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(base_rows=rows_strategy, delta_rows=rows_strategy)
def test_cdc_apply_without_deletes_equals_scd1(spark, base_rows, delta_rows):
    base = _mk(spark, base_rows)
    delta = _mk(spark, delta_rows)
    changes = delta.withColumn("op", F.lit("U"))
    got = {
        tuple(r)
        for r in cdc_apply(base, changes, key="k", version_col="version").collect()
    }
    want = {
        tuple(r)
        for r in scd1_merge(base, delta, key="k", version_col="version").collect()
    }
    assert got == want


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(old_rows=rows_strategy, new_rows=rows_strategy)
def test_snapshot_diff_roundtrips_through_cdc_apply(spark, old_rows, new_rows):
    # snapshots: one row per key — dedup in PYTHON (a Spark
    # dropDuplicates picks arbitrary rows per re-evaluation, and `old`
    # is evaluated twice below)
    def snap(rows):
        d = {k: v for k, v, _ in rows}
        return spark.createDataFrame(
            list(d.items()) or [(None, None)], "k long, val string"
        ).filter("k is not null")

    old = snap(old_rows)
    new = snap(new_rows)
    changes = (
        snapshot_diff(old, new, key="k")
        .withColumn("version", F.lit(1))
        .withColumn("op", F.when(F.col("op") == "D", "D").otherwise("U"))
    )
    applied = {
        (r["k"], r["val"])
        for r in cdc_apply(
            old.withColumn("version", F.lit(0)), changes, key="k", version_col="version"
        ).drop("version").collect()
    }
    want = {(r["k"], r["val"]) for r in new.collect()}
    assert applied == want
