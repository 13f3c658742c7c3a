"""Streaming A/B monitor: per-unit assignment/conversion deltas.

The 24/7 form of ``operators/stats.py::ab_test_proportions`` — the
batch readout reduces each experiment UNIT to (bucket, ever
converted) before the two-proportion z-test; a live experiment
dashboard needs those unit-level reductions as they happen. Per-unit
value state holds exactly two scalars

    (bucket, converted)

— constant size per unit, O(units) total (the
``streaming/exactdedup.py`` O(distinct-digests) posture; an
experiment's unit universe is its enrollment, which IS the quantity
being counted).

Contract: the stream emits DELTA rows only — ``(bucket, d_n,
d_conv)``: (+1, s) when a unit is first seen, (0, +1) when a
previously-unconverted unit converts. Units never re-emit otherwise,
so cumulative sums of the deltas equal the batch operator's
(n_a, conv_a, n_b, conv_b) row-for-row over everything streamed
(asserted by the stream==batch test, including a conversion arriving
in a later micro-batch than its unit's enrollment), and the z
statistic is the same fixed-shape expression over those counters —
see ``z_from_counters``. A unit's bucket is frozen at first sight
(the assignment mechanism's own invariant); later rows only
contribute their success bit.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

AB_OUT_SCHEMA = "bucket int, d_n long, d_conv long"


def _make_ab_processor():
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class AbUnit(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState("st", "bucket int, conv int")

        def handleInputRows(self, key, rows, timer_values):
            batches = [pdf for pdf in rows if len(pdf)]
            if not batches:
                return
            batch = pd.concat(batches)
            if self._st.exists():
                bucket, conv = (int(v) for v in self._st.get())
                first = False
            else:
                bucket = int(batch.iloc[0]["bucket"])
                conv = 0
                first = True
            s = int(batch["success"].max())
            out = []
            if first:
                conv = s
                out.append((bucket, 1, conv))
            elif conv == 0 and s == 1:
                conv = 1
                out.append((bucket, 0, 1))
            self._st.update((bucket, conv))
            if out:
                yield pd.DataFrame(
                    out, columns=["bucket", "d_n", "d_conv"]
                )

        def close(self) -> None:
            pass

    return AbUnit()


def streaming_ab_deltas(
    stream: DataFrame,
    *,
    unit_col: str = "user_id",
    bucket_col: str = "bucket",
    success_col: str = "success",
) -> DataFrame:
    """Per-unit enrollment/conversion deltas of a live experiment
    stream (see module doc); append-only."""
    from event_pipeline_spark.streaming.stateful import (
        transform_with_state,
    )

    keyed = stream.select(
        F.col(unit_col).cast("long").alias("unit"),
        F.col(bucket_col).cast("int").alias("bucket"),
        F.col(success_col).cast("int").alias("success"),
    )
    return transform_with_state(
        keyed,
        ["unit"],
        _make_ab_processor(),
        AB_OUT_SCHEMA,
        output_mode="Append",
        time_mode="None",
    )


def z_from_counters(
    n_a: int, conv_a: int, n_b: int, conv_b: int
) -> float | None:
    """The batch operator's pooled two-proportion z over cumulative
    delta sums — the same fixed-shape expression
    ``ab_test_proportions`` rounds to 7 dp."""
    if n_a <= 0 or n_b <= 0:
        return None
    pa, pb = conv_a / n_a, conv_b / n_b
    pool = (conv_a + conv_b) / (n_a + n_b)
    se2 = pool * (1.0 - pool) * (1 / n_a + 1 / n_b)
    if se2 <= 0:
        return None
    return round((pa - pb) / math.sqrt(se2), 7)
