"""Streaming conversion funnel: per-user stage advancement as it happens.

The 24/7 form of ``operators/temporal.py::events_funnel`` — the batch
operator collapses each user's history into a sorted array and folds
it once; a live product-analytics monitor cannot wait for the history
to be complete. The fold IS sequential per user, which makes it a
perfect fit for per-key value state: everything the next event needs
is three scalars per user

    (stage, ts_us, start_us)

— the highest stage reached, the timestamp that reached it, and the
stage-1 timestamp the horizon window anchors to. Constant-size
regardless of stream length (the ``streaming/scd2.py`` open-version
discipline: conversions leave through the sink instead of
accumulating in state).

Contract: the stream emits ADVANCEMENT rows only — ``(key, stage,
step, ts_us)`` whenever a user first reaches ``stage`` via a strictly
time-ordered sequence (a purchase before the signup does not count,
exactly the batch semantics). Aggregating the emissions therefore
reproduces the batch report: ``count(distinct key) where stage >= k``
equals the batch ``n_<step_k>`` column row-for-row (asserted by the
stream==batch test, including a conversion spanning the micro-batch
boundary). Within a micro-batch a user's events apply in (ts,
tiebreak) order; across batches, arrival order governs (the standard
no-total-order-across-batches contract).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FUNNEL_OUT_SCHEMA = "key long, stage int, step string, ts_us long"


def _make_funnel_processor(steps: list[str], horizon_us: int | None):
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class FunnelStage(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState(
                "st", "stage int, ts long, start long"
            )

        def handleInputRows(self, key, rows, timer_values):
            batches = [pdf for pdf in rows if len(pdf)]
            if not batches:
                return
            batch = pd.concat(batches).sort_values(["t", "tiebreak"])
            if self._st.exists():
                stage, ts, start = (int(v) for v in self._st.get())
            else:
                stage, ts, start = 0, 0, 0
            out = []
            for _, row in batch.iterrows():
                if stage >= len(steps):
                    break  # converted; nothing left to advance
                t = int(row["t"])
                if row["step"] != steps[stage]:
                    continue
                # strictly-later ordering; stage 0 has no predecessor
                if stage > 0 and t <= ts:
                    continue
                if (
                    horizon_us is not None
                    and stage > 0
                    and t > start + horizon_us
                ):
                    continue
                if stage == 0:
                    start = t
                stage += 1
                ts = t
                out.append((int(key[0]), stage, steps[stage - 1], t))
            self._st.update((int(stage), int(ts), int(start)))
            if out:
                yield pd.DataFrame(
                    out, columns=["key", "stage", "step", "ts_us"]
                )

        def close(self) -> None:
            pass

    return FunnelStage()


def streaming_funnel(
    stream: DataFrame,
    steps: list[str] | None = None,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    horizon_hours: int | None = None,
) -> DataFrame:
    """Per-user funnel advancements of a live event stream (see module
    doc); append-only, one row per stage reached."""
    from event_pipeline_spark.operators.temporal import FUNNEL_STEPS
    from event_pipeline_spark.streaming.stateful import (
        transform_with_state,
    )

    steps = FUNNEL_STEPS if steps is None else steps
    keyed = stream.where(F.col(type_col).isin(steps)).select(
        F.col(user_col).cast("long").alias("key"),
        F.col(type_col).alias("step"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("t"),
        F.col(tiebreak_col).cast("long").alias("tiebreak"),
    )
    horizon_us = (
        None if horizon_hours is None else int(horizon_hours) * 3_600_000_000
    )
    return transform_with_state(
        keyed,
        ["key"],
        _make_funnel_processor(list(steps), horizon_us),
        FUNNEL_OUT_SCHEMA,
        output_mode="Append",
        time_mode="None",
    )
