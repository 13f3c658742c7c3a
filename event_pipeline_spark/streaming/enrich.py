"""Stream-static enrichment: join a live stream to a dimension table.

The most common streaming join in practice — events arrive, attributes
live in a dimension — and the one with the most misunderstood
semantics, so this module states them instead of hiding them:

- the static side is SNAPSHOTTED logically at query planning: file
  sources re-list per micro-batch only through their own source
  mechanics, so treat the dimension as FROZEN for the query's
  lifetime. A dimension that changes during the run needs the CDC
  path — ``streaming/scd2.py`` to maintain versions and
  ``operators/cdc.py::pit_join`` to look them up as-of event time —
  not this join;
- stream-static joins are stateless (no watermark, no state store):
  each micro-batch is a plain batch join, so a small dimension should
  BROADCAST — the default here — making enrichment a map-side
  operation on every batch;
- inner and left-outer (stream side preserved) are the supported
  shapes for append streams; right/full would need the static side to
  emit rows for data that never arrives.

The live test pins batch==stream row parity and that the per-batch
plan actually broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: list[str],
    *,
    how: str = "left",
    broadcast: bool = True,
) -> DataFrame:
    """Join a streaming DataFrame to a static dimension on equi-keys
    (see module doc). ``how`` is ``inner`` or ``left`` (stream side
    preserved)."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"stream-static enrichment supports inner/left, not {how!r}"
        )
    d = F.broadcast(dim) if broadcast else dim
    return stream.join(d, on, how)
