"""Pin/release registry for operator-internal ``persist()`` calls.

Several operators persist an intermediate DataFrame that the RETURNED
(lazy) plan still references — e.g. ``running_total`` pins its
range-partitioned layout because re-sampling range boundaries on
recompute could re-assign partition ids after the offsets were already
collected, and the Jaccard/MinHash joins pin shingle/pair frames so an
expensive UDF is not re-executed once per consumer. The operator cannot
unpersist before returning (the caller has not materialized yet), and
the caller is not always aware a persist happened — so repeated runs
would accumulate cached partitions.

``pin(df)`` persists and registers the frame; ``release_pins()``
unpersists everything registered (idempotent; safe after the consuming
action). The query registry auto-releases at each query-function entry,
so back-to-back registry runs (driver grading, bench, check_oracles)
hold at most one query's pins at a time. Callers composing operators
manually should call ``release_pins()`` after materializing the result
— not before, since a pinned frame may be recompute-unsafe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["pin", "track", "release_pins", "pinned_count"]

_pins: list[DataFrame] = []


def pin(df: DataFrame) -> DataFrame:
    """Persist ``df`` (MEMORY_AND_DISK default) and register it for a
    later ``release_pins()``. Returns the same DataFrame."""
    df.persist()
    _pins.append(df)
    return df


def track(df: DataFrame) -> DataFrame:
    """Register an ALREADY-persisted (or localCheckpointed) frame for
    ``release_pins()`` without re-persisting it — for operators whose
    iteration loop manages storage itself but whose final result
    carries a persist out of the function (duplicate_clusters'
    labels). Only safe to release after the caller materializes: a
    released localCheckpoint cannot be recomputed."""
    _pins.append(df)
    return df


def release_pins() -> int:
    """Unpersist every pinned frame (non-blocking) and clear the
    registry. Returns the number of frames released."""
    n = len(_pins)
    for df in _pins:
        try:
            df.unpersist(blocking=False)
        except Exception:  # session already stopped — nothing to free
            pass
    _pins.clear()
    return n


def pinned_count() -> int:
    return len(_pins)
