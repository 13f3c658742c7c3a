"""Streaming EWMA: exponentially-decayed per-key level over a live
count stream.

The 24/7 form of ``operators/trends.py::daily_ewma`` — the batch
operator reads ``lags`` previous days through ``lag()`` windows over
the whole history; a monitor carries them instead. State per key is
the last ``lags`` observed daily counts (a bounded deque — 11 BIGINTs
at the default, constant regardless of stream length; the
``streaming/cusum.py`` posture with a small list instead of four
scalars, because the truncated dyadic EWMA is a finite FIR filter, not
a recursion).

The emission replays the batch operator's exact dyadic arithmetic
(``Σ c_{t-j}·2^(lags-j)`` in integer units, one presentation division
by 2^lags), and the batch ``lag()`` semantics — previous OBSERVED
rows, not calendar adjacency — match the deque by construction, so
the live emission equals the batch rebuild row-for-row on the same
data (asserted by the stream==batch test).

Input contract: one row per (key, day, count), the upstream windowed
count. Within a micro-batch a key's rows apply in day order; across
batches, arrival order governs (the standard contract).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EWMA_SCHEMA = (
    "key string, day string, c long, ewma_units long, ewma double"
)

_DEFAULT_LAGS = 10  # == operators/trends.py::_EWMA_LAGS


def _make_ewma_processor(lags: int):
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class Ewma(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            # bounded history: the last `lags` counts, oldest first
            self._hist = handle.getValueState("hist", "h string")

        def handleInputRows(self, key, rows, timer_values):
            batches = [pdf for pdf in rows if len(pdf)]
            if not batches:
                return
            batch = pd.concat(batches).sort_values("day")
            hist: list[int] = (
                [int(x) for x in self._hist.get()[0].split(",") if x]
                if self._hist.exists()
                else []
            )
            out = []
            for _, row in batch.iterrows():
                c = int(row["c"])
                window = (hist + [c])[-(lags + 1):]
                units = sum(
                    v << (lags - j)
                    for j, v in enumerate(reversed(window))
                )
                out.append(
                    (
                        str(key[0]),
                        row["day"],
                        c,
                        units,
                        units / float(1 << lags),
                    )
                )
                hist = (hist + [c])[-lags:]
            self._hist.update((",".join(str(x) for x in hist),))
            yield pd.DataFrame(
                out, columns=["key", "day", "c", "ewma_units", "ewma"]
            )

        def close(self) -> None:
            pass

    return Ewma()


def streaming_ewma(
    stream: DataFrame,
    *,
    key_col: str = "event_type",
    day_col: str = "day",
    count_col: str = "c",
    lags: int = _DEFAULT_LAGS,
) -> DataFrame:
    """Per-day dyadic EWMA of a (key, day, count) stream (see module
    doc); emits one row per input row, append-only."""
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
        _make_ewma_processor(lags),
        EWMA_SCHEMA,
        output_mode="Append",
        time_mode="None",
    )
