"""Streaming Markov transition pairs: live (prev_type, next_type) rows.

The 24/7 form of ``operators/temporal.py::event_transitions`` — the
batch operator lags each user's (ts, event_id)-ordered sequence; a
live next-event dashboard needs the transition pairs as they happen.
Per-user value state holds exactly one string

    (last_type)

— constant size per user regardless of stream length (the
``streaming/abtest.py`` per-unit posture).

Contract: emits one ``(prev_type, next_type)`` row per consecutive
event pair. Within a micro-batch events order by (ts, event_id) — the
batch operator's total order; across batches arrival order governs
(the ``streaming/funnel.py`` no-total-order contract: a late-arriving
earlier event extends the chain at its ARRIVAL position). When
arrival respects event time, counting emissions therefore reproduces
the batch transition matrix row-for-row (asserted by the
stream==batch test, including a chain continued across micro-batches).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TRANSITIONS_OUT_SCHEMA = "prev_type string, next_type string"


def _make_transitions_processor():
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserChain(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState("st", "last string")

        def handleInputRows(self, key, rows, timer_values):
            batches = [pdf for pdf in rows if len(pdf)]
            if not batches:
                return
            batch = pd.concat(batches).sort_values(["t", "eid"])
            types = [str(s) for s in batch["s"]]
            last = str(self._st.get()[0]) if self._st.exists() else None
            out = []
            for s in types:
                if last is not None:
                    out.append((last, s))
                last = s
            self._st.update((last,))
            if out:
                yield pd.DataFrame(
                    out, columns=["prev_type", "next_type"]
                )

        def close(self) -> None:
            pass

    return UserChain()


def streaming_transitions(
    stream: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user consecutive (prev_type, next_type) pairs of a live
    event stream (see module doc); append-only."""
    from event_pipeline_spark.streaming.stateful import (
        transform_with_state,
    )

    keyed = stream.select(
        F.col(user_col).cast("long").alias("unit"),
        F.col(ts_col).cast("timestamp").cast("long").alias("t"),
        F.col(id_col).cast("long").alias("eid"),
        F.col(type_col).cast("string").alias("s"),
    )
    return transform_with_state(
        keyed,
        ["unit"],
        _make_transitions_processor(),
        TRANSITIONS_OUT_SCHEMA,
        output_mode="Append",
        time_mode="None",
    )
