"""Latest-wins (SCD-1) and history-keeping (SCD-2) merges — the MERGE
INTO shapes a mutable-snapshot pipeline needs, expressed without a lake
format.

The reference re-reads its whole registry every tick (SURVEY.md §2.2
immutable-snapshot model); a 100 TB lake cannot — it merges deltas. The
canonical Spark-native form is NOT a full-outer join (two sorted sides +
null-merging logic): union the base and the delta with a source flag and
elect one winner per key with a row_number window — ONE shuffle on the
key, winner = highest version, delta beating base on ties. The same
partitioning feeds a partitioned-overwrite sink (sinks/parquet.py), which
is exactly how MERGE INTO compiles in Delta/Iceberg's copy-on-write mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd1_merge(
    base: DataFrame,
    delta: DataFrame,
    *,
    key: str,
    version_col: str,
) -> DataFrame:
    """Upsert ``delta`` into ``base``: per key, keep the row with the
    highest ``version_col``; on version ties the delta row wins (the
    re-delivered-update idempotency rule). Columns must match
    (unionByName). Output schema = input schema.

    The tag/rank helper columns use reserved ``__scd_*__`` names and are
    asserted absent from the input — ``withColumn`` silently REPLACES an
    existing column, so a bare ``_src``/``_rn`` would corrupt user data
    carrying those names before the final drop."""
    src_tag, rank = "__scd_src__", "__scd_rn__"
    clash = {src_tag, rank} & set(base.columns) | {src_tag, rank} & set(
        delta.columns
    )
    assert not clash, f"reserved merge helper column(s) present in input: {clash}"
    tagged = base.withColumn(src_tag, F.lit(0)).unionByName(
        delta.withColumn(src_tag, F.lit(1))
    )
    w = Window.partitionBy(key).orderBy(
        F.col(version_col).desc(), F.col(src_tag).desc()
    )
    return (
        tagged.withColumn(rank, F.row_number().over(w))
        .filter(F.col(rank) == 1)
        .drop(rank, src_tag)
    )


def cdc_apply(
    base: DataFrame,
    changes: DataFrame,
    *,
    key: str,
    version_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC change stream (upserts AND deletes) to a snapshot —
    the full MERGE INTO WHEN MATCHED [AND op='D'] THEN DELETE shape.

    ``changes`` carries ``op_col`` with 'U' (upsert) or 'D' (delete);
    ``base`` rows are implicit version-0 upserts. Per key the row with
    the highest version wins (change rows beat base on ties, the
    scd1_merge redelivery rule); if that winner is a delete the key
    vanishes from the output. This is latest-wins + tombstone filtering
    in ONE keyed window pass — the same single-shuffle plan as
    scd1_merge, because a delete is just an update whose payload is
    "absence". Output schema = base schema (op column dropped).

    At 100 TB this is how a Debezium/binlog feed folds into a lake
    snapshot without a lake format: union + one window shuffle +
    partitioned overwrite, tombstones never reaching the sink."""
    src_tag, rank = "__scd_src__", "__scd_rn__"
    reserved = {src_tag, rank}
    clash = reserved & set(base.columns) | reserved & set(changes.columns)
    assert not clash, f"reserved merge helper column(s) present in input: {clash}"
    assert op_col in changes.columns, f"changes is missing op column {op_col!r}"
    assert op_col not in base.columns, (
        f"base must not carry the op column {op_col!r} (it is implicit 'U')"
    )
    tagged = base.withColumn(op_col, F.lit("U")).withColumn(
        src_tag, F.lit(0)
    ).unionByName(changes.withColumn(src_tag, F.lit(1)))
    w = Window.partitionBy(key).orderBy(
        F.col(version_col).desc(), F.col(src_tag).desc()
    )
    return (
        tagged.withColumn(rank, F.row_number().over(w))
        .filter((F.col(rank) == 1) & (F.col(op_col) != "D"))
        .drop(rank, src_tag, op_col)
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    key: str,
    op_col: str = "op",
) -> DataFrame:
    """Generate the CDC change set that turns snapshot ``old`` into
    ``new`` — the inverse of ``cdc_apply``: inserts ('I'), updates
    ('U', any non-key column differs), deletes ('D', key vanished).
    Unchanged rows are omitted. Delete rows carry the OLD row's values
    (there is no new row to carry); inserts/updates carry the new row's.

    Plan: ONE full-outer join on the key (both sides shuffle once —
    unavoidable: the diff must see both versions of every key), with the
    row comparison as a struct equality on the join output — no
    per-column join conditions, no second pass. This is the data-plane
    generalization of registry refresh_diff (sources/registry.py, which
    diffs only membership); at 100 TB it is how a nightly snapshot pair
    becomes the delta feed for cdc_apply/merge_agg consumers."""
    assert op_col not in old.columns and op_col not in new.columns, (
        f"op column {op_col!r} already present in input"
    )
    value_cols = [c for c in old.columns if c != key]
    o = old.alias("__old__")
    n = new.alias("__new__")
    ok, nk = F.col(f"__old__.{key}"), F.col(f"__new__.{key}")
    joined = o.join(n, ok == nk, "full_outer")
    # null-safe struct comparison: a NULL in any value column must read
    # as "differs from non-NULL", not as unknown (plain != would yield
    # NULL and the row would silently drop as unchanged)
    changed = ~F.struct(
        *[F.col(f"__old__.{c}") for c in value_cols]
    ).eqNullSafe(F.struct(*[F.col(f"__new__.{c}") for c in value_cols]))
    op = (
        F.when(ok.isNull(), F.lit("I"))
        .when(nk.isNull(), F.lit("D"))
        .when(changed, F.lit("U"))
    )
    side = F.when(op == "D", F.lit("__old__")).otherwise(F.lit("__new__"))
    return (
        joined.withColumn(op_col, op)
        .filter(F.col(op_col).isNotNull())
        .select(
            F.coalesce(nk, ok).alias(key),
            *[
                F.when(
                    side == "__old__", F.col(f"__old__.{c}")
                ).otherwise(F.col(f"__new__.{c}")).alias(c)
                for c in value_cols
            ],
            op_col,
        )
    )


def scd2_merge(
    base: DataFrame,
    delta: DataFrame,
    *,
    key: str,
    version_col: str,
    valid_to: str = "valid_to",
    is_current: str = "is_current",
) -> DataFrame:
    """History-keeping merge (SCD type 2): every version of every key is
    KEPT, each end-dated by its successor.

    Inputs are version-stamped row sets with identical columns (same
    contract as ``scd1_merge``); output = input columns plus
    ``valid_to`` (the NEXT version for this key — the superseded row's
    end date, same type as ``version_col``) and ``is_current`` (true iff
    no successor exists). Re-delivered (key, version) pairs collapse to
    the delta copy first (idempotent redelivery), so re-running a merge
    never forks history.

    Plan shape: union + ONE shuffle on the key — the redelivery-dedup
    row_number and the successor ``lead`` ride the same key-partitioned
    window exchange (the second window adds at most a sort, never a
    second shuffle). This is exactly how MERGE INTO ... WHEN MATCHED
    THEN UPDATE SET valid_to/is_current compiles in a copy-on-write lake
    format, minus the format."""
    src_tag, rank = "__scd_src__", "__scd_rn__"
    reserved = {src_tag, rank, valid_to, is_current}
    clash = reserved & set(base.columns) | reserved & set(delta.columns)
    assert not clash, f"reserved merge helper/output column(s) in input: {clash}"
    tagged = base.withColumn(src_tag, F.lit(0)).unionByName(
        delta.withColumn(src_tag, F.lit(1))
    )
    # per key, versions ascending with delta before base inside a version:
    # the first row of each version run survives (delta copy on
    # redelivery). lag() rides the same window spec as row_number, and
    # lead() orders by a prefix of it — one key-hash exchange total.
    w_dedup = Window.partitionBy(key).orderBy(
        F.col(version_col), F.col(src_tag).desc()
    )
    w_succ = Window.partitionBy(key).orderBy(F.col(version_col))
    # window functions can't sit in a WHERE clause — materialize the
    # version-run-start flag as a column, then filter on it
    return (
        tagged.withColumn(
            rank,
            (F.row_number().over(w_dedup) == 1)
            | (F.col(version_col) != F.lag(version_col).over(w_dedup)),
        )
        .filter(F.col(rank))
        .drop(rank, src_tag)
        .withColumn(valid_to, F.lead(version_col).over(w_succ))
        .withColumn(is_current, F.col(valid_to).isNull())
    )
