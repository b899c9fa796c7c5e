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
    """
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
