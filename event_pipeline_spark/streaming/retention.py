"""Streaming cohort retention: live (cohort, offset) activity marks.

The 24/7 form of ``operators/temporal.py::events_retention`` — the
batch triangle groups users by their first active day and counts who
returns at each offset; a live growth dashboard needs the marks as
they happen. Per-user value state holds exactly two integers

    (cohort_day, offset_bitmask)

— the epoch day of the user's first seen activity and a bitmask of
the day offsets already emitted, bounded to ``horizon_days`` (≤ 63)
bits — bits 0..horizon_days-1 — so state is constant per user
regardless of stream length (the ``streaming/abtest.py`` per-unit
posture).

Contract: emits ``(cohort_day, day_offset)`` ONCE per (user, offset)
— offset 0 on first sight, each later offset the first time the user
is active that many days after joining; offsets at or beyond the
horizon never emit (EXCLUSIVE bound — ``horizon_days=63`` emits
offsets 0..62, so the highest mask bit is 62 and the signed-long
value state never overflows; the batch triangle is unbounded). Counting emissions therefore reproduces the batch
operator within the horizon: per-(cohort, offset) counts equal
``n_active`` and the offset-0 counts are the cohort sizes, row for
row (asserted by the stream==batch test, including a return arriving
in a later micro-batch). Cohort day is the first day SEEN (within a
micro-batch the minimum day; across batches arrival order governs —
the streaming/funnel.py no-total-order contract: a late-arriving
earlier day cannot retroactively move a cohort).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RETENTION_OUT_SCHEMA = "cohort_day int, day_offset int"


def _make_retention_processor(horizon_days: int):
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class CohortMark(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState("st", "cohort int, mask long")

        def handleInputRows(self, key, rows, timer_values):
            batches = [pdf for pdf in rows if len(pdf)]
            if not batches:
                return
            days = sorted(int(d) for d in pd.concat(batches)["day"])
            if self._st.exists():
                cohort, mask = (int(v) for v in self._st.get())
            else:
                cohort, mask = days[0], 0
            out = []
            for d in days:
                off = d - cohort
                if off < 0 or off >= horizon_days:
                    # pre-cohort arrival / beyond the window; the
                    # EXCLUSIVE bound keeps the highest mask bit at
                    # horizon_days-1 <= 62, so the signed-long value
                    # state never needs bit 63 (1 << 63 would overflow
                    # int64 and crash the query on day exactly 63).
                    continue
                bit = 1 << off
                if mask & bit:
                    continue
                mask |= bit
                out.append((cohort, off))
            self._st.update((cohort, mask))
            if out:
                yield pd.DataFrame(
                    out, columns=["cohort_day", "day_offset"]
                )

        def close(self) -> None:
            pass

    return CohortMark()


def streaming_retention(
    stream: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    activity_type: str | None = None,
    horizon_days: int = 63,
) -> DataFrame:
    """Per-user (cohort, offset) activity marks of a live event stream
    (see module doc); append-only, each pair emitted once."""
    from event_pipeline_spark.streaming.stateful import (
        transform_with_state,
    )

    if not 0 < horizon_days <= 63:
        raise ValueError("horizon_days must fit the 64-bit state mask")
    ev = stream
    if activity_type is not None:
        ev = ev.where(F.col(type_col) == activity_type)
    keyed = ev.select(
        F.col(user_col).cast("long").alias("unit"),
        F.datediff(
            F.to_date(F.col(ts_col).cast("timestamp")),
            F.lit("1970-01-01").cast("date"),
        )
        .cast("int")
        .alias("day"),
    )
    return transform_with_state(
        keyed,
        ["unit"],
        _make_retention_processor(horizon_days),
        RETENTION_OUT_SCHEMA,
        output_mode="Append",
        time_mode="None",
    )
