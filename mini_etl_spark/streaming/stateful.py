"""Custom stateful streaming operators via ``applyInPandasWithState``.

For semantics the built-in windowed aggregations can't express (running
lifetime totals, custom eviction, cross-batch logic), Structured Streaming
exposes per-key user state. The operator here — running per-key totals
emitted on every update — is the canonical shape: grouped Arrow batches in,
a typed state object carried across micro-batches, rows out.

Scale notes: state lives in the executor state store, partitioned by the
grouping key — the same shuffle-on-key cost shape as any keyed aggregation.
State size is O(distinct keys × state row); for unbounded key spaces use a
timeout (``GroupStateTimeout.ProcessingTimeTimeout``) and drop idle keys in
the handler.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals(
    events: DataFrame,
    key: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Running lifetime (n_events, value_sum) per key, one output row per
    key per micro-batch in which the key appeared (output mode: update)."""

    def _update(
        keys: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, total = state.get
        else:
            n, total = 0, 0.0
        for pdf in batches:
            n += len(pdf)
            total += float(pdf[value_col].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"key": [keys[0]], "n_events": [n], "value_sum": [round(total, 2)]}
        )

    key_type = events.schema[key].dataType.simpleString()  # any key type works
    return (
        events.groupBy(key)
        .applyInPandasWithState(
            _update,
            outputStructType=f"key {key_type}, n_events long, value_sum double",
            stateStructType="n long, total double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        .withColumnRenamed("key", key)
    )
