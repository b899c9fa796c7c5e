"""Streaming UPSERT sink: maintain a latest-wins keyed table from a
change stream via foreachBatch + generation directories.

The reference pushes gauge samples and keeps no sink-side state
(collector/internal/exporter, SURVEY §2.1); a warehouse consuming the
same stream usually wants the CURRENT row per key — the streaming twin
of ``operators/merge.py::scd1_merge``. Without a transactional table
format, read-merge-overwrite of one directory is unsafe (the job would
overwrite its own input, and a crash mid-write destroys the only copy).
The recipe here is **immutable generations**:

* batch N writes the fully merged state to ``{path}/gen=N`` — never
  touching earlier generations;
* the current state is the LARGEST generation carrying Spark's
  ``_SUCCESS`` marker (a half-written generation is simply ignored);
* batch N merges onto the largest COMPLETE generation **< N** — so a
  replayed batch (foreachBatch is at-least-once) re-reads exactly the
  pre-N state it saw the first time and overwrites ``gen=N`` in place:
  duplicate delivery converges to the identical directory, the same
  idempotency argument as ``streaming/sink.py``.

At scale each generation is a full copy, so this suits dimension-sized
upsert targets (the usual case for latest-wins state); for fact-sized
targets keep the raw stream in the append-only batch-id sink and
compact instead. ``prune_generations`` bounds retained copies.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from database_collector_spark.operators.merge import scd1_merge


def _hadoop(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return jvm, fs, p


def complete_generations(spark: SparkSession, path: str) -> list[int]:
    """Generation ids under ``path`` with a ``_SUCCESS`` marker, sorted."""
    jvm, fs, p = _hadoop(spark, path)
    if not fs.exists(p):
        return []
    gens = []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if not name.startswith("gen="):
            continue
        if fs.exists(jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS")):
            gens.append(int(name[len("gen="):]))
    return sorted(gens)


def read_state(
    spark: SparkSession, path: str, *, before: int | None = None
) -> DataFrame | None:
    """Latest complete generation (optionally strictly before ``before``),
    or None when no complete generation exists."""
    gens = [g for g in complete_generations(spark, path) if before is None or g < before]
    if not gens:
        return None
    return spark.read.parquet(f"{path}/gen={gens[-1]}")


def prune_generations(spark: SparkSession, path: str, *, keep: int = 2) -> int:
    """Delete all but the newest ``keep`` complete generations (and any
    incomplete ones older than them). Returns the number removed."""
    jvm, fs, p = _hadoop(spark, path)
    keepset = set(complete_generations(spark, path)[-keep:])
    removed = 0
    if not fs.exists(p):
        return 0
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if name.startswith("gen=") and int(name[len("gen="):]) not in keepset:
            fs.delete(st.getPath(), True)
            removed += 1
    return removed


def upsert_parquet_sink(
    spark: SparkSession,
    path: str,
    *,
    key: str,
    version_col: str,
    keep_generations: int = 2,
) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch`` function maintaining a latest-wins table
    at ``path``. Each batch: read the newest complete generation < this
    batch id, ``scd1_merge`` the batch onto it (within-batch duplicates
    collapse under the same rule: highest version wins, delta wins
    ties), write ``gen={batch_id}``, prune old generations.

    Replay-safe by construction — see the module docstring.
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        prev = read_state(spark, path, before=int(batch_id))
        if prev is None:
            prev = spark.createDataFrame([], batch_df.schema)
        merged = scd1_merge(prev, batch_df, key=key, version_col=version_col)
        merged.write.mode("overwrite").parquet(f"{path}/gen={int(batch_id)}")
        prune_generations(spark, path, keep=max(keep_generations, 1))

    return _sink
