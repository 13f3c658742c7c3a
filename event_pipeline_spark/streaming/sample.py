"""Streaming weighted sample: a live exactly-k draw with bounded state.

The 24/7 form of ``operators/sampling.py::weighted_sample_k`` — a
fixed-size quality-weighted corpus sample that stays correct as
documents keep arriving. Because the Efraimidis–Spirakis race key
−ln(u)/w is a DETERMINISTIC function of (key, salt), maintaining the
sample online is just keeping the k smallest race keys seen so far —
per stream-group state is k (race, id, weight) triples, constant
forever, and the live sample equals the batch operator run over
everything that has arrived, EXACTLY (asserted by the stream==batch
test; not just distributionally — row for row).

Emits the group's full current sample each micro-batch it changes
(Update-mode semantics delivered append-style with a batch marker:
consumers keep the latest emission per group).

Duplicate-arrival semantics: state dedupes on the (member, weight)
PAIR. Re-delivery of an identical row (at-least-once sources) is
idempotent — a stated, deliberate deviation from batch, where two
identical input rows occupy two race slots. The same member arriving
again at a DIFFERENT weight races as a fresh row, exactly as a second
batch row would; both rows can hold sample slots simultaneously, and
the stream==batch parity then requires comparing against a batch input
that carries both rows. The parity test keeps (member, weight) pairs
unique across batches except for the re-delivery case it pins.
"""

from __future__ import annotations

import hashlib
import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SAMPLE_OUT_SCHEMA = (
    "grp string, member string, weight double, race double"
)


def _race(member: str, weight: float, salt: str) -> float:
    from event_pipeline_spark.streaming.hll import _round_half_up

    digest = hashlib.md5((member + salt).encode()).hexdigest()
    h13 = int(digest[:8] + digest[8:13], 16)
    u = ((h13 % (1 << 52)) + 0.5) / float(1 << 52)
    # HALF_UP like F.round, not Python's banker's rounding
    return -_round_half_up(math.log(u), 7) / weight


def _make_sampler(k: int, salt: str):
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class WeightedReservoir(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._best = handle.getValueState("best", "h string")

        def handleInputRows(self, key, rows, timer_values):
            batches = [pdf for pdf in rows if len(pdf)]
            if not batches:
                return
            best: list[tuple[float, str, float]] = []
            if self._best.exists():
                for part in self._best.get()[0].split("|"):
                    r, m, w = part.split("\x1f")
                    best.append((float(r), m, float(w)))
            before = {(b[1], b[2]) for b in best}
            for _, row in pd.concat(batches).iterrows():
                m, w = str(row["member"]), float(row["w"])
                # dedupe on the (member, weight) PAIR: identical
                # re-delivery is idempotent; a new weight races as a
                # fresh batch row would (see module doc)
                if w <= 0 or any(
                    b[1] == m and b[2] == w for b in best
                ):
                    continue
                best.append((_race(m, w, salt), m, w))
                best.sort(key=lambda t: (t[0], t[1]))
                del best[k:]
            changed = {(b[1], b[2]) for b in best} != before
            self._best.update(
                (
                    "|".join(
                        f"{r!r}\x1f{m}\x1f{w!r}" for r, m, w in best
                    ),
                )
            )
            if changed:
                yield pd.DataFrame(
                    [(str(key[0]), m, w, r) for r, m, w in best],
                    columns=["grp", "member", "weight", "race"],
                )

        def close(self) -> None:
            pass

    return WeightedReservoir()


def streaming_weighted_sample(
    stream: DataFrame,
    k: int,
    *,
    group_col: str = "grp",
    member_col: str = "member",
    weight_col: str = "w",
    salt: str = "",
) -> DataFrame:
    """Per-group exactly-k weighted sample of a live (group, member,
    weight) stream (see module doc); re-emits a group's current sample
    whenever it changes."""
    from event_pipeline_spark.streaming.stateful import (
        transform_with_state,
    )

    keyed = stream.select(
        F.col(group_col).cast("string").alias("grp"),
        F.col(member_col).cast("string").alias("member"),
        F.col(weight_col).cast("double").alias("w"),
    )
    return transform_with_state(
        keyed,
        ["grp"],
        _make_sampler(k, salt),
        SAMPLE_OUT_SCHEMA,
        output_mode="Append",
        time_mode="None",
    )
