"""Streaming HLL: live approximate distinct counts with bounded state.

The 24/7 form of ``operators/sketches.py::hll_md5_estimate`` — exact
distinct-per-window needs unbounded per-key state (the set itself),
which is the one thing a streaming monitor cannot hold; the HLL
register array is the textbook bounded substitute (HLL_M = 256 bytes
per key here, constant forever). This completes the sketch family's
batch↔streaming matrix the way cusum/ewma/psi did for trends.

The processor replays the batch operator's EXACT arithmetic — the
same md5-low-64 little-endian hash, the same mod-2^60 slice, the same
(idx, rho) split, the same scaled-integer harmonic sum T = Σ 2^(w+1−M)
and linear-counting switch, with HALF_UP decimal rounding mirroring
``F.round`` — so the live emission equals the batch rebuild
row-for-row on the same data (asserted by the stream==batch test,
registers carried across the micro-batch boundary).
"""

from __future__ import annotations

import hashlib
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from event_pipeline_spark.operators.sketches import (
    HLL_ALPHA,
    HLL_M,
    HLL_P,
    HLL_W,
)

HLL_OUT_SCHEMA = "key string, nz long, t_units long, est double"


def _round_half_up(x: float, places: int) -> float:
    q = Decimal(1).scaleb(-places)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def _idx_rho(value: str) -> tuple[int, int]:
    lo = int.from_bytes(
        hashlib.md5(value.encode()).digest()[8:16], "little"
    )
    x = lo % (1 << 60)
    rem = x % (1 << HLL_W)
    idx = x >> HLL_W
    rho = (HLL_W + 1) if rem == 0 else (HLL_W + 1 - rem.bit_length())
    return idx, rho


def _estimate(regs: list[int]) -> tuple[int, int, float]:
    import math

    shift = HLL_W + 1
    nz = sum(1 for r in regs if r > 0)
    t = sum(1 << (shift - r) for r in regs if r > 0) + (HLL_M - nz) * (
        1 << shift
    )
    raw = HLL_ALPHA * float(HLL_M * HLL_M) * float(1 << shift) / float(t)
    v = HLL_M - nz
    if raw <= 2.5 * HLL_M and v > 0:
        est = _round_half_up(
            float(HLL_M) * _round_half_up(math.log(float(HLL_M) / v), 7),
            3,
        )
    else:
        est = _round_half_up(raw, 3)
    return nz, t, est


def _make_hll_processor():
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class HllState(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._regs = handle.getValueState("regs", "h string")

        def handleInputRows(self, key, rows, timer_values):
            batches = [pdf for pdf in rows if len(pdf)]
            if not batches:
                return
            regs = (
                [int(r) for r in self._regs.get()[0].split(",")]
                if self._regs.exists()
                else [0] * HLL_M
            )
            for _, row in pd.concat(batches).iterrows():
                idx, rho = _idx_rho(str(row["v"]))
                if rho > regs[idx]:
                    regs[idx] = rho
            self._regs.update((",".join(str(r) for r in regs),))
            nz, t, est = _estimate(regs)
            yield pd.DataFrame(
                [(str(key[0]), nz, t, est)],
                columns=["key", "nz", "t_units", "est"],
            )

        def close(self) -> None:
            pass

    return HllState()


def streaming_hll(
    stream: DataFrame,
    *,
    key_col: str = "key",
    value_col: str = "v",
) -> DataFrame:
    """Per-key running HLL distinct estimate of a live (key, value)
    stream (see module doc); emits one row per (key, micro-batch),
    append-only. State: HLL_M (= 2^{p}) registers per key, p = {P}.
    """.format(p=HLL_P, P=HLL_P)
    from event_pipeline_spark.streaming.stateful import (
        transform_with_state,
    )

    keyed = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("string").alias("v"),
    )
    return transform_with_state(
        keyed,
        ["key"],
        _make_hll_processor(),
        HLL_OUT_SCHEMA,
        output_mode="Append",
        time_mode="None",
    )
