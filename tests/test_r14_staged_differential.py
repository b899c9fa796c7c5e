"""Differential verification of the STAGED r14 gates (workloads_r14.py)
against their DuckDB oracles — the exact comparison tools/check.py (and
the external driver) runs: row count, sorted column names,
order-insensitive canonical value hash. Run at sf0.001 so the suite
stays fast; the staging rounds re-run everything at sf0.01/sf0.1
through `tools/check.py --staged`.

Also LIMIT-0-sweeps the staged oracles through the shared portability
predicate (tools/check.py::unportable_type) and applies the blanket
no-Python-UDF / no-CartesianProduct plan invariant at staging time.
"""

from __future__ import annotations

import importlib.util

import duckdb
import pytest

from database_collector_spark import workloads_r14

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

_spec = importlib.util.spec_from_file_location("check", "/root/repo/tools/check.py")
check = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(check)


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def test_staged_sets_are_one_to_one():
    assert set(workloads_r14.QUERIES_R14) == set(workloads_r14.ORACLES_R14)


def test_staged_oracles_have_no_arrow_unportable_columns(con):
    for name, sql in workloads_r14.ORACLES_R14.items():
        rel = con.sql(f"SELECT * FROM ({sql}) q LIMIT 0")
        for col, typ in zip(rel.columns, map(str, rel.types)):
            reason = check.unportable_type(typ)
            assert reason is None, f"{name}.{col}: {reason}"


@pytest.mark.parametrize("name", sorted(workloads_r14.QUERIES_R14))
def test_staged_gate_matches_oracle(spark, con, name):
    sdf = workloads_r14.QUERIES_R14[name](spark, SF)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    res = con.sql(workloads_r14.ORACLES_R14[name])
    o_cols = res.columns
    o_rows = res.fetchall()
    assert len(s_rows) == len(o_rows), f"{name}: rows {len(s_rows)} vs {len(o_rows)}"
    assert len(s_rows) > 0, f"{name}: trivially-empty gate"
    sc, s_canon = check.canon_rows(s_cols, s_rows)
    oc, o_canon = check.canon_rows(o_cols, o_rows)
    assert sc == oc, f"{name}: columns {sc} vs {oc}"
    assert check.value_hash(s_canon) == check.value_hash(o_canon), (
        f"{name}: value hash mismatch; first spark={s_canon[:2]} oracle={o_canon[:2]}"
    )


def test_staged_plans_have_no_python_udfs_or_cartesians(spark):
    """The blanket plan invariant the registered gates get from
    test_plan_quality.py, applied at staging time: nothing in the r14
    tier may fall back to row-at-a-time Python eval or an unbroadcast
    cartesian product."""
    for name, fn in workloads_r14.QUERIES_R14.items():
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
        assert "CartesianProduct" not in plan, f"{name}: cartesian product"


_pq_spec = importlib.util.spec_from_file_location(
    "plan_quality", "/root/repo/tests/test_plan_quality.py"
)
plan_quality = importlib.util.module_from_spec(_pq_spec)
_pq_spec.loader.exec_module(plan_quality)


def test_ks_separation_single_partitions_are_guard_only(spark):
    """ks_statistic inherits auc_exact's whole scale argument; pin it
    structurally — every SinglePartition exchange in the gate must be
    the prefix core's bounded rng guard (count-over-() window above,
    rng min/max aggregate below), never a corpus gather or sort."""
    plan = (
        workloads_r14.q_ks_separation(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    plan_quality._assert_single_partition_is_guard_only(plan)


@pytest.mark.parametrize("gate", ["pr_curve_sweep", "lift_deciles"])
def test_curve_gates_single_partitions_are_bounded_aggregates(spark, gate):
    """The curve gates ride the ungrouped calibration core: legitimate
    SinglePartition exchanges are bounded post-aggregate gathers (the
    <=65536-row `_cell#` histogram, the <= n_bins `bin#` table, scalar
    totals) — each occurrence's child must be an aggregate and any
    sorted consumer must sort one of those bounded keys, so a
    corpus-sized funnel fails structurally regardless of occurrence
    count (the r11 ADVICE stance)."""
    plan = (
        workloads_r14.QUERIES_R14[gate](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    plan_quality._assert_single_partition_inputs_bounded(
        plan,
        child_markers=("HashAggregate",),
        sorted_key_markers=("bin#", "_cell#"),
    )


def test_ece_foldable_from_streamed_fixed_bin_state(spark):
    """The monitoring story behind ece_report, pinned: its per-bin state
    (n, positives, Σp) is a plain keyed commutative aggregate over the
    SAME all-integer bin expression, so a Structured Streaming
    update-mode query maintains it with BOUNDED state (n_bins keys
    forever), and folding ECE/MCE from the stream's end-state equals
    the batch operator exactly — the calibration-error monitor a
    production gate runs while the corpus streams in (the
    fixed_bin_calibration / ttl_expiry_counts pattern)."""
    import json as _json
    import os as _os
    import tempfile as _tempfile

    from pyspark.sql import functions as F

    from database_collector_spark.operators.ranking import ece_report

    rows = [
        (50, 0), (120, 0), (180, 1), (450, 0), (480, 1), (520, 1),
        (730, 1), (760, 0), (990, 1), (1000, 1), (0, 0), (999, 1),
    ]
    n_bins, scale = 5, 1000
    latest: dict = {}

    def sink(batch_df, _bid):
        for r in batch_df.collect():
            latest[r["b"]] = (r["nb"], r["pos"], r["sp"])

    with _tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/in"
        _os.makedirs(src)

        def run_pass():
            stream = spark.readStream.schema("p_milli long, label int").json(src)
            binned = stream.select(
                F.least(
                    F.expr(f"(p_milli * {n_bins}) div {scale}"),
                    F.lit(n_bins - 1),
                ).alias("b"),
                "p_milli",
                "label",
            )
            agg = binned.groupBy("b").agg(
                F.count("*").alias("nb"),
                F.sum("label").alias("pos"),
                F.sum("p_milli").alias("sp"),
            )
            q = (
                agg.writeStream.outputMode("update")
                .foreachBatch(sink)
                .option("checkpointLocation", f"{tmp}/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            try:
                assert q.awaitTermination(120), "stream pass did not finish"
            finally:
                q.stop()

        for i, chunk in enumerate((rows[:5], rows[5:9], rows[9:])):
            with open(f"{src}/b{i}.json", "w") as f:
                f.write(
                    "\n".join(
                        _json.dumps({"p_milli": p, "label": y}) for p, y in chunk
                    )
                )
            run_pass()

    n = sum(nb for nb, _, _ in latest.values())
    gaps = {b: abs(scale * pos - sp) for b, (nb, pos, sp) in latest.items()}
    ece = round(sum(gaps.values()) / (scale * n), 6)
    mce = round(
        max(g / (scale * latest[b][0]) for b, g in gaps.items()), 6
    )
    [batch] = ece_report(
        spark.createDataFrame(rows, "p_milli long, label int"),
        n_bins=n_bins,
        scale=scale,
    ).collect()
    assert (batch["n"], batch["ece"], batch["mce"]) == (n, ece, mce)
