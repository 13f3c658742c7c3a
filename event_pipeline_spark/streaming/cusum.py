"""Streaming CUSUM: change-point statistics over a live count stream.

The 24/7 form of ``operators/trends.py::daily_cusum`` — the batch
operator replays the whole history through two windows; a monitor
cannot. Page's recursion IS sequential, which makes it a perfect fit
for per-key value state: everything the reflection identity
``S_t = C_t − min_{j≤t} C_j`` needs is four scalars per key

    (ref, cum, running_min, running_max)

— constant-size regardless of stream length (the same bound as
``streaming/scd2.py``'s open-version triple). ``ref`` pins to the
key's FIRST observed count, matching the batch operator exactly, so
the live emission equals the batch rebuild row-for-row on the same
data (asserted by the stream==batch test).

Input contract: one row per (key, day, count) — the upstream windowed
count the streaming pipeline already produces. Within a micro-batch a
key's rows apply in day order; across batches, arrival order governs
(the standard no-total-order-across-batches contract).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CUSUM_SCHEMA = (
    "key string, day string, c long, cusum_pos long, cusum_neg long, "
    "alarm boolean"
)


def _make_cusum_processor(threshold_units: int):
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class Cusum(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState(
                "st", "ref long, cum long, mn long, mx long"
            )

        def handleInputRows(self, key, rows, timer_values):
            batches = [pdf for pdf in rows if len(pdf)]
            if not batches:
                return
            batch = pd.concat(batches).sort_values("day")
            if self._st.exists():
                ref, cum, mn, mx = (int(v) for v in self._st.get())
            else:
                ref = None  # type: ignore[assignment]
                cum = mn = mx = 0
            out = []
            for _, row in batch.iterrows():
                c = int(row["c"])
                if ref is None:
                    ref = c
                cum += c - ref
                mn = min(mn, cum)
                mx = max(mx, cum)
                pos, neg = cum - mn, mx - cum
                out.append(
                    (
                        str(key[0]),
                        row["day"],
                        c,
                        pos,
                        neg,
                        bool(
                            pos >= threshold_units
                            or neg >= threshold_units
                        ),
                    )
                )
            self._st.update((int(ref), int(cum), int(mn), int(mx)))
            yield pd.DataFrame(
                out,
                columns=[
                    "key", "day", "c", "cusum_pos", "cusum_neg", "alarm"
                ],
            )

        def close(self) -> None:
            pass

    return Cusum()


def streaming_cusum(
    stream: DataFrame,
    *,
    key_col: str = "event_type",
    day_col: str = "day",
    count_col: str = "c",
    threshold_units: int = 50,
) -> DataFrame:
    """Per-day CUSUM statistics of a (key, day, count) stream (see
    module doc); emits one row per input row, append-only."""
    from event_pipeline_spark.streaming.stateful import (
        transform_with_state,
    )

    keyed = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(day_col).alias("day"),
        F.col(count_col).cast("long").alias("c"),
    )
    return transform_with_state(
        keyed,
        ["key"],
        _make_cusum_processor(threshold_units),
        CUSUM_SCHEMA,
        output_mode="Append",
        time_mode="None",
    )
