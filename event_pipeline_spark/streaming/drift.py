"""Streaming PSI drift: live distribution monitoring against a frozen
reference.

The 24/7 form of ``operators/stats.py::psi_bins`` — the batch operator
compares two complete snapshots; a serving monitor has a FROZEN
expected distribution (captured at training time, a few counts per
key) and a live stream whose actual distribution accumulates forever.
Per-key state is the ``n_bins`` actual bin counters — constant-size
regardless of stream length (the ``streaming/cusum.py`` posture), and
the frozen expected counts ride into the processor as literals (the
k-means-centroid pattern), so no stream-side join is needed.

Each micro-batch emits, per key seen in it, the CURRENT total PSI over
all accumulated rows — computed with exactly the batch operator's
smoothed arithmetic (add-one bins, per-bin 7dp rounding before the
sum), so the last emission equals ``psi_bins`` run on reference vs
everything-so-far, row-for-row (asserted by the stream==batch test).

Binning contract matches the batch operator: caller-fixed integer
[lo, hi) equal-width edges, out-of-range clamps into the edge bins.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DRIFT_SCHEMA = "key string, n_actual long, psi double"


def _make_psi_processor(
    expected: dict[str, list[int]], n_bins: int
):
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    from event_pipeline_spark.streaming.hll import _round_half_up

    def total_psi(exp: list[int], act: list[int]) -> float:
        ne = sum(exp) + n_bins
        na = sum(act) + n_bins
        out = 0.0
        for ce, ca in zip(exp, act):
            pe = (ce + 1) / ne
            pa = (ca + 1) / na
            # HALF_UP like F.round in the batch operator, not Python's
            # banker's rounding (same discipline as streaming/sample.py).
            out += _round_half_up((pa - pe) * math.log(pa / pe), 7)
        return out

    class PsiDrift(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._act = handle.getValueState("act", "h string")

        def handleInputRows(self, key, rows, timer_values):
            batches = [pdf for pdf in rows if len(pdf)]
            if not batches:
                return
            k = str(key[0])
            exp = expected.get(k)
            if exp is None:
                return  # unmonitored key: no reference captured
            act = (
                [int(x) for x in self._act.get()[0].split(",")]
                if self._act.exists()
                else [0] * n_bins
            )
            for _, row in pd.concat(batches).iterrows():
                act[int(row["bin"])] += 1
            self._act.update((",".join(str(x) for x in act),))
            yield pd.DataFrame(
                [(k, int(sum(act)), total_psi(exp, act))],
                columns=["key", "n_actual", "psi"],
            )

        def close(self) -> None:
            pass

    return PsiDrift()


def streaming_psi(
    stream: DataFrame,
    expected: dict[str, list[int]],
    *,
    key_col: str = "key",
    value_col: str = "v",
    lo: int = 0,
    hi: int = 100,
    n_bins: int = 10,
) -> DataFrame:
    """Per-key running PSI of a live (key, value) stream against the
    frozen per-key expected bin counts (see module doc); emits one row
    per (key, micro-batch), append-only."""
    from event_pipeline_spark.streaming.stateful import (
        transform_with_state,
    )

    for k, counts in expected.items():
        if len(counts) != n_bins:
            raise ValueError(
                f"expected[{k!r}] has {len(counts)} bins, want {n_bins}"
            )
    # clamp-first + integer DIV, the exact batch psi_bins binning form
    v = F.least(
        F.greatest(F.col(value_col).cast("bigint"), F.lit(lo)),
        F.lit(hi - 1),
    )
    keyed = stream.select(
        F.col(key_col).cast("string").alias("key"), v.alias("vclamp")
    ).select(
        "key",
        F.expr(
            f"CAST(((vclamp - {lo}) * {n_bins}) DIV {hi - lo} AS INT)"
        ).alias("bin"),
    )
    return transform_with_state(
        keyed,
        ["key"],
        _make_psi_processor(dict(expected), n_bins),
        DRIFT_SCHEMA,
        output_mode="Append",
        time_mode="None",
    )
