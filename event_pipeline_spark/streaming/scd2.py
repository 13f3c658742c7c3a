"""Streaming SCD type-2 history: closed versions emitted as they close.

The batch operator (``operators/cdc.py::scd2_history``) rebuilds the
full type-2 table from a change log; on a 24/7 ingest the dimension's
"current open version" must persist across micro-batches so a change
arriving tomorrow closes the version opened today. This completes the
batch↔streaming pair for the CDC family (``snapshot_diff`` is
inherently batch — it compares two complete snapshots).

Contract: the stream emits CLOSED versions only — the immutable,
append-only history rows ``(key, state, valid_from, valid_to,
version)``; the still-open version of each key lives in the value
state. That is the warehouse-friendly shape (append-only sink, no
retractions); the open row is exactly what the NEXT change will close.
Within a micro-batch, a key's events apply in ``(ts, tiebreak)``
order; across batches, arrival order governs (the same
no-total-order-across-batches contract as the streaming dedups).

State is one ``(state, valid_from, version)`` triple per key —
constant-size regardless of history length, because closed versions
leave through the sink instead of accumulating in state.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HISTORY_SCHEMA = (
    "key long, state string, valid_from string, valid_to string, "
    "version long"
)

_TS_FMT = "%Y-%m-%d %H:%M:%S.%f"


def _make_scd2_processor():
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class OpenVersion(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._cur = handle.getValueState(
                "cur", "st string, vf string, ver long"
            )

        def handleInputRows(self, key, rows, timer_values):
            events = [
                pdf for pdf in rows if len(pdf)
            ]
            if not events:
                return
            batch = pd.concat(events).sort_values(["ts", "tiebreak"])
            if self._cur.exists():
                st, vf, ver = self._cur.get()
            else:
                st = vf = None
                ver = 0
            closed = []
            for _, row in batch.iterrows():
                new_state = row["state"]
                ts = row["ts"].strftime(_TS_FMT)
                if st is None:
                    st, vf, ver = new_state, ts, 1
                elif new_state != st:
                    closed.append((int(key[0]), st, vf, ts, int(ver)))
                    st, vf, ver = new_state, ts, ver + 1
            self._cur.update((st, vf, int(ver)))
            if closed:
                yield pd.DataFrame(
                    closed,
                    columns=[
                        "key", "state", "valid_from", "valid_to", "version"
                    ],
                )

        def close(self) -> None:
            pass

    return OpenVersion()


def streaming_scd2(
    stream: DataFrame,
    *,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Closed SCD2 versions of a change stream (see module doc)."""
    from event_pipeline_spark.streaming.stateful import transform_with_state

    keyed = stream.select(
        F.col(key_col).cast("long").alias("key"),
        F.col(state_col).alias("state"),
        F.col(ts_col).alias("ts"),
        F.col(tiebreak_col).cast("long").alias("tiebreak"),
    )
    return transform_with_state(
        keyed,
        ["key"],
        _make_scd2_processor(),
        HISTORY_SCHEMA,
        output_mode="Append",
        time_mode="None",
    )
