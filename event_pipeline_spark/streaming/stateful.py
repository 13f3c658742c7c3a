"""Custom stateful per-key processing over a stream (SURVEY §2.8).

The reference's closest analogue is per-event retry state and the
execution-context chain (nexus/task.py:57-118); the Spark mapping is
``applyInPandasWithState`` — user logic sees (key, batch-of-rows, state)
and state lives in Spark's state store (RocksDB/HDFS-backed on a
cluster), so a billion keys never touch the driver.

``stateful_apply`` is the thin general wrapper; ``running_counts`` is the
canned operator used by tests (per-key event counter that survives
across micro-batches).
"""

from __future__ import annotations

from typing import Any, Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stateful_apply(
    df: DataFrame,
    keys: list[str],
    func: Callable[[Any, Iterator[pd.DataFrame], GroupState], Iterator[pd.DataFrame]],
    output_schema: str,
    state_schema: str,
    output_mode: str = "update",
    timeout: str = GroupStateTimeout.NoTimeout,
) -> DataFrame:
    """``df.groupBy(keys).applyInPandasWithState(...)`` with the argument
    order the rest of this codebase uses. ``df`` may be streaming or
    batch (batch runs a single 'micro-batch' with empty initial state).
    """
    return (
        df.groupBy(*keys)
        .applyInPandasWithState(func, output_schema, state_schema, output_mode, timeout)
    )


def running_counts(df: DataFrame, key: str = "user_id") -> DataFrame:
    """Per-key running event count across micro-batches."""

    def update(key_tuple, batches: Iterator[pd.DataFrame], state: GroupState):
        total = state.get[0] if state.exists else 0
        for pdf in batches:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({key: [key_tuple[0]], "n": [total]})

    return stateful_apply(
        df,
        [key],
        update,
        output_schema=f"{key} string, n long",
        state_schema="n long",
        output_mode="update",
    )
