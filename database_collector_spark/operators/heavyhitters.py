"""Heavy hitters: items / n-grams with frequency >= phi * N (extension
surface — the corpus-stats companion to decontamination: the frequent
boilerplate n-grams ARE the spans worth span-dedup'ing and the items a
mixture report leads with).

Two-phase plan, the mergeable-summaries shape (Misra-Gries summaries and
their merge rule are public classics — Misra & Gries 1982; Agarwal et
al., "Mergeable Summaries", PODS'12):

1. **Candidate generation, zero shuffle**: each partition folds its rows
   into a Misra-Gries summary of ``ceil(1/phi)`` counters inside ONE
   mapInPandas pass (vectorized: pandas value_counts per Arrow batch,
   merged into the summary by the add-then-subtract-(k+1)th-largest merge
   rule — amortized O(1)/row, fixed memory). The MG undercount bound
   (<= n_p/(k+1) per partition) plus pigeonhole-over-partitions
   guarantees every item with global frequency >= phi*N survives in at
   least one partition's summary — the summary can only over-RETAIN,
   never lose a true heavy hitter.
2. **Exact recount of candidates only**: the distinct candidate set is
   at most ``ceil(1/phi)`` items per partition — broadcast it, semi-join
   the item stream, and count exactly. The only shuffle in the job moves
   (candidate, partial-count) pairs: O(candidates) per partition, not
   O(distinct items).

Net: the result equals the exact ``GROUP BY item HAVING count >=
ceil(phi*N)`` answer (which is what the DuckDB oracle runs), while the
plan never shuffles the full item universe — at 100 TB the full groupBy
moves billions of distinct n-grams; this moves ~1/phi per partition.

The threshold is a RATIONAL (num/den): the final filter is exact integer
arithmetic ``count * den >= num * N`` — no float-boundary item can flip
between engines.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def mg_candidates(
    items: DataFrame, *, item_col: str, capacity: int
) -> DataFrame:
    """Per-partition Misra-Gries candidate items (at most ``capacity``
    per partition), zero shuffle. Any item whose count in SOME partition
    exceeds n_p/(capacity+1) is guaranteed present."""

    def _partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        summary = pd.Series(dtype="int64")
        for pdf in batches:
            batch_counts = pdf[item_col].value_counts()
            summary = summary.add(batch_counts, fill_value=0)
            if len(summary) > capacity:
                # mergeable-MG rule: subtract the (k+1)-th largest count
                # from everyone, drop the non-positives
                kth = summary.nlargest(capacity + 1).iloc[-1]
                summary = summary - kth
                summary = summary[summary > 0]
        if len(summary):
            yield pd.DataFrame({item_col: summary.index})

    # candidate schema mirrors the INPUT column's type (a string-typed
    # candidate frame would silently cast-join against e.g. long items)
    field = items.schema[item_col]
    return items.mapInPandas(
        _partition,
        schema=T.StructType([T.StructField(item_col, field.dataType, True)]),
    ).distinct()


def grouped_mg_candidates(
    items: DataFrame, *, group_col: str, item_col: str, capacity: int
) -> DataFrame:
    """Per-(partition, group) Misra-Gries candidates: one summary of
    ``capacity`` counters per group per partition, zero shuffle. The MG
    guarantee applies within each group independently — an item with
    count >= n_{g,p}/(capacity+1) in some partition's slice of group g
    is retained — so per-group heavy hitters can never be lost. Executor
    memory is #groups-in-partition x capacity counters: sized for
    low-cardinality grouping keys (language, source, split), which is
    what per-group corpus stats group by."""

    def _partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        summaries: dict = {}
        for pdf in batches:
            # merge the batch's (group, item) counts, then apply the
            # mergeable-MG prune per oversized group: subtract that
            # group's (k+1)-th largest count, drop non-positives
            counts = pdf.groupby([group_col, item_col]).size()
            for (g, item), c in counts.items():
                s = summaries.setdefault(g, {})
                s[item] = s.get(item, 0) + int(c)
            for g, s in summaries.items():
                if len(s) > capacity:
                    kth = sorted(s.values(), reverse=True)[capacity]
                    summaries[g] = {
                        i: c - kth for i, c in s.items() if c - kth > 0
                    }
        out_g, out_i = [], []
        for g, s in summaries.items():
            for item in s:
                out_g.append(g)
                out_i.append(item)
        if out_g:
            yield pd.DataFrame({group_col: out_g, item_col: out_i})

    gf = items.schema[group_col]
    itf = items.schema[item_col]
    return items.mapInPandas(
        _partition,
        schema=T.StructType(
            [
                T.StructField(group_col, gf.dataType, True),
                T.StructField(item_col, itf.dataType, True),
            ]
        ),
    ).distinct()


def grouped_heavy_hitters(
    items: DataFrame,
    *,
    group_col: str,
    item_col: str = "item",
    threshold_num: int = 1,
    threshold_den: int = 100,
) -> DataFrame:
    """Per-group frequent items: all (group, item) with count >=
    (num/den) * N_group, with EXACT counts — the grouped twin of
    ``heavy_hitters`` (same two-phase shape: grouped MG candidates with
    zero shuffle, then exact recount of the broadcast candidate set; the
    only full-width shuffle ships the small per-group totals).

    Output: ``(group_col, item_col, n)`` — exactly the rows the exact
    GROUP BY + HAVING against the per-group total would return.

    NULL contract: NULL items are excluded up front — from the
    candidate set, the recount, AND the denominator N_group (pandas
    value_counts drops NaN and equi-joins drop null keys, so a silent
    NULL would otherwise inflate N while never being returnable; the
    explicit filter makes the semantics "frequent non-null items")."""
    items = items.where(F.col(item_col).isNotNull())
    phi_inv = math.ceil(threshold_den / threshold_num)
    cands = grouped_mg_candidates(
        items, group_col=group_col, item_col=item_col, capacity=phi_inv
    )
    totals = items.groupBy(group_col).agg(F.count("*").alias("_hh_group_total"))
    return (
        items.join(F.broadcast(cands), [group_col, item_col])
        .groupBy(group_col, item_col)
        .agg(F.count("*").alias("n"))
        .join(F.broadcast(totals), group_col)
        .filter(
            F.col("n") * threshold_den >= threshold_num * F.col("_hh_group_total")
        )
        .drop("_hh_group_total")
    )


def heavy_hitters(
    items: DataFrame,
    *,
    item_col: str = "item",
    threshold_num: int = 1,
    threshold_den: int = 2000,
) -> DataFrame:
    """All items occurring at least ``(threshold_num/threshold_den) * N``
    times in ``items`` (one row per occurrence), with their EXACT counts.

    Output: ``(item_col, n)`` — exactly the items the full exact GROUP
    BY + HAVING would return, via MG candidate pruning + exact recount
    (see module docstring for the plan shape and guarantee).

    NULL contract: NULL items are excluded up front — from the
    candidate set, the recount, AND the denominator N (pandas
    value_counts drops NaN and equi-joins drop null keys, so a silent
    NULL would otherwise inflate N while never being returnable; the
    explicit filter makes the semantics "frequent non-null items").
    """
    items = items.where(F.col(item_col).isNotNull())
    phi_inv = math.ceil(threshold_den / threshold_num)
    cands = mg_candidates(items, item_col=item_col, capacity=phi_inv)
    total = items.agg(F.count("*").alias("_hh_total"))
    return (
        items.join(F.broadcast(cands), item_col)
        .groupBy(item_col)
        .agg(F.count("*").alias("n"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n") * threshold_den >= threshold_num * F.col("_hh_total"))
        .drop("_hh_total")
    )
