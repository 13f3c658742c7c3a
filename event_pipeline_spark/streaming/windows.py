"""Windowed aggregation + watermark helpers (SURVEY §2.8).

The reference has no streaming engine (its comparison chart lists
"Streaming Support: Planned"); these are the [ext] operators mandated by
the blueprint, built directly on Structured Streaming primitives. Every
helper works identically on a batch DataFrame (``window`` /
``session_window`` are ordinary expressions), which is how the
differential tests pin semantics: stream(availableNow) == batch.

Scale notes: windowed aggregations shuffle on (window, keys) — partial
aggregation happens map-side first; watermarks bound state size, so a
100 TB/day stream holds only (watermark horizon x key cardinality) rows
of state. ``sessionize`` is the batch analogue of ``session_window``
(lag + running flag — one shuffle per window spec over user_id).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.column import Column as ColumnType


def ensure_event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Make ``ts_col`` usable as streaming event time. Spark requires
    zoned TIMESTAMP for watermarks (``withWatermark`` on TIMESTAMP_NTZ
    raises EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE); cast NTZ through the
    session timezone (UTC in this engine, so the wall clock is
    unchanged). No-op for anything already TIMESTAMP."""
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def with_watermark(df: DataFrame, ts_col: str, delay: str) -> DataFrame:
    """Late-data horizon, e.g. ``with_watermark(df, "ts", "10 minutes")``.
    No-op semantics on batch DataFrames (Spark ignores it there)."""
    return ensure_event_time(df, ts_col).withWatermark(ts_col, delay)


def tumbling(df: DataFrame, ts_col: str, duration: str, *keys: str | Column):
    """Non-overlapping windows: ``groupBy(window(ts, duration), *keys)``.
    Returns GroupedData — chain ``.agg(...)``."""
    return df.groupBy(F.window(ts_col, duration), *keys)


def sliding(
    df: DataFrame, ts_col: str, duration: str, slide: str, *keys: str | Column
):
    """Overlapping windows: each row lands in duration/slide windows."""
    return df.groupBy(F.window(ts_col, duration, slide), *keys)


def session(df: DataFrame, ts_col: str, gap: str, *keys: str | Column):
    """Gap-based session windows (dynamic length, merged on overlap)."""
    return df.groupBy(F.session_window(ts_col, gap), *keys)


def sessionize(
    df: DataFrame,
    ts_col: str,
    gap_seconds: int,
    *keys: str,
    session_col: str = "session_id",
    tiebreakers: tuple[str, ...] = (),
) -> DataFrame:
    """Batch sessionization: assign a per-key session index via
    lag + cumulative-sum of new-session flags (the Q18 scaffold made
    total). One shuffle on ``keys``; both window functions share the
    same partitioning so Catalyst plans a single Exchange.

    ``tiebreakers`` make the order total when timestamps collide —
    required for cross-engine determinism (FIXTURES.md conventions).
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreakers]
    part = Window.partitionBy(*keys).orderBy(*order)
    prev_ts = F.lag(F.col(ts_col)).over(part)
    # Interval arithmetic works on both TIMESTAMP and TIMESTAMP_NTZ
    # (a cast-to-long gap would be rejected for NTZ event time).
    gap = F.make_dt_interval(secs=F.lit(gap_seconds))
    new_session = F.when(
        prev_ts.isNull() | (F.col(ts_col) > prev_ts + gap),
        F.lit(1),
    ).otherwise(F.lit(0))
    running = Window.partitionBy(*keys).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(session_col, F.sum(new_session).over(running))


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    *,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    watermark: str,
    within: str,
    how: str = "inner",
) -> DataFrame:
    """Event-time-bounded stream-stream equi-join: pair rows sharing
    ``keys`` whose right event lands in ``[left_ts, left_ts + within]``.

    Both sides get the same watermark; the time-bound condition is what
    lets Spark EVICT buffered rows — without it, each side's join state
    grows without limit (at 100 TB/day the job dies in hours). State
    held per side ≈ rows in (watermark + within) of event time × key
    cardinality, independent of stream length.

    ``how``: "inner" (emits as matches arrive) or the outer variants
    ("left_outer"/"right_outer"/"full_outer" — null-padded rows emit
    only once the watermark passes the join horizon, so a terminating
    micro-batch run sees outer rows only for horizons the final
    watermark crossed).

    Column collision note: ``keys`` are equi-joined with the USING form
    (single copy in the output); all other columns must be pre-aliased
    distinct by the caller. Works identically on batch DataFrames
    (condition degenerates to an interval predicate), which is how the
    differential test pins semantics: stream(availableNow) == batch.
    """
    l = ensure_event_time(left, left_ts).withWatermark(left_ts, watermark)
    r = ensure_event_time(right, right_ts).withWatermark(right_ts, watermark)
    # Pre-alias each side's key columns so the join condition never
    # holds DataFrame-object refs — keeps self-joins (both sides derived
    # from one source) unambiguous. Watermark metadata rides on the ts
    # columns, which pass through untouched.
    l2 = l.select(
        *[F.col(k).alias(f"__l_{k}") for k in keys],
        *[c for c in l.columns if c not in set(keys)],
    )
    r2 = r.select(
        *[F.col(k).alias(f"__r_{k}") for k in keys],
        *[c for c in r.columns if c not in set(keys)],
    )
    # The time bound lives INSIDE the join condition: for outer joins a
    # post-filter would turn null-padded rows into dropped rows, and for
    # all variants Spark derives its state-eviction horizon from it.
    cond = None
    for c in [F.col(f"__l_{k}") == F.col(f"__r_{k}") for k in keys] + [
        F.col(right_ts) >= F.col(left_ts),
        F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {within}"),
    ]:
        cond = c if cond is None else cond & c
    joined = l2.join(r2, on=cond, how=how)
    # collapse the aliased equi-key columns back to one copy each
    keep = [
        F.coalesce(f"__l_{k}", f"__r_{k}").alias(k) for k in keys
    ]
    others = [c for c in joined.columns if not c.startswith(("__l_", "__r_"))]
    return joined.select(*keep, *others)


def dedup_stream(
    df: DataFrame, keys: list[str], ts_col: str, watermark: str
) -> DataFrame:
    """Streaming ingestion dedup: drop repeats of ``keys`` arriving
    within the watermark horizon — the standard exactly-once-ish guard
    for at-least-once sources (Kafka redeliveries, file re-drops).

    State is bounded by the watermark: Spark keeps one entry per key
    seen in the last ``watermark`` of event time and evicts older state,
    so a 24/7 pipeline's dedup state is O(keys per horizon), not O(all
    keys ever). ``dropDuplicatesWithinWatermark`` accepts a repeat whose
    twin is older than the horizon — the documented at-most-one-per-
    horizon contract, the price of bounded state at 100 TB/day.
    """
    return with_watermark(df, ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )
