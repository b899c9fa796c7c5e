"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.10 extension surface).

The built-in groupBy().count() covers the reference's counter; this module
adds the operator Spark lacks natively: a per-key running counter with
inactivity expiry (TTL) — the state-store-friendly shape for unbounded key
spaces (event ids at 100 TB/day): keys that go quiet are evicted instead
of accumulating forever.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("total", T.LongType(), True),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id_label", T.StringType(), True),
        T.StructField("rds_events_total", T.LongType(), True),
        T.StructField("expired", T.BooleanType(), True),
    ]
)


def _update_counts(
    key: tuple,
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (label,) = key
    if state.hasTimedOut:
        (total,) = state.get
        state.remove()
        yield pd.DataFrame(
            {"event_id_label": [label], "rds_events_total": [total], "expired": [True]}
        )
        return
    n_new = sum(len(b) for b in batches)
    total = (state.get[0] if state.exists else 0) + n_new
    state.update((total,))
    state.setTimeoutDuration(60 * 60 * 1000)  # evict keys quiet for 1h
    yield pd.DataFrame(
        {"event_id_label": [label], "rds_events_total": [total], "expired": [False]}
    )


def running_counts_with_ttl(labeled_events: DataFrame) -> DataFrame:
    """Streaming frame with an ``event_id_label`` column -> running counts
    with 1h-inactivity eviction. Each update emits the new total; eviction
    emits a final tombstone row with expired=true (so a downstream sink can
    flush the closing value)."""
    return labeled_events.groupBy("event_id_label").applyInPandasWithState(
        _update_counts,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
