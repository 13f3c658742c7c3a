"""Custom stateful per-key processing over a stream (SURVEY §2.8).

The reference's closest analogue is per-event retry state and the
execution-context chain (nexus/task.py:57-118); the Spark mapping is
``applyInPandasWithState`` — user logic sees (key, batch-of-rows, state)
and state lives in Spark's state store (RocksDB/HDFS-backed on a
cluster), so a billion keys never touch the driver.

``stateful_apply`` is the thin general wrapper; ``running_counts`` is the
canned operator used by tests (per-key event counter that survives
across micro-batches).
"""

from __future__ import annotations

from typing import Any, Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stateful_apply(
    df: DataFrame,
    keys: list[str],
    func: Callable[[Any, Iterator[pd.DataFrame], GroupState], Iterator[pd.DataFrame]],
    output_schema: str,
    state_schema: str,
    output_mode: str = "update",
    timeout: str = GroupStateTimeout.NoTimeout,
) -> DataFrame:
    """``df.groupBy(keys).applyInPandasWithState(...)`` with the argument
    order the rest of this codebase uses. ``df`` may be streaming or
    batch (batch runs a single 'micro-batch' with empty initial state).
    """
    return (
        df.groupBy(*keys)
        .applyInPandasWithState(func, output_schema, state_schema, output_mode, timeout)
    )


def running_counts(df: DataFrame, key: str = "user_id") -> DataFrame:
    """Per-key running event count across micro-batches."""

    def update(key_tuple, batches: Iterator[pd.DataFrame], state: GroupState):
        total = state.get[0] if state.exists else 0
        for pdf in batches:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({key: [key_tuple[0]], "n": [total]})

    return stateful_apply(
        df,
        [key],
        update,
        output_schema=f"{key} string, n long",
        state_schema="n long",
        output_mode="update",
    )


# -- state API v2: transformWithStateInPandas ------------------------------
#
# Spark 4's successor to applyInPandasWithState: a StatefulProcessor object
# with named state variables (value/list/map), timers, and per-state TTL,
# backed by the RocksDB state store provider. The PySpark client talks to
# the state server over protobuf, so the API needs the `protobuf` package
# at runtime — absent in some environments; `has_transform_with_state()`
# reports availability and `transform_with_state` raises a clear error
# when the dependency is missing (the rest of this module keeps working).

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

_shipped_to: set[str] = set()  # spark app ids the vendor zip was added to


def _vendor_dir():
    import pathlib

    return pathlib.Path(__file__).resolve().parent.parent / "_vendor"


def ensure_protobuf(spark: "Any" = None) -> bool:
    """Make ``google.protobuf`` importable, vendoring the repo's
    pure-Python runtime shim (``event_pipeline_spark/_vendor``) when no
    real protobuf install exists.

    Driver side: the vendor dir joins ``sys.path``. Worker side: when a
    session is passed, the shim is zipped once and shipped via
    ``addPyFile`` so executor Python workers can import it too — which
    is what lets ``transformWithStateInPandas``'s state-server client
    run in a container with no protobuf wheel and no network.
    """
    import importlib
    import sys

    try:
        import google.protobuf  # noqa: F401
        available = True
    except ImportError:
        vendor = _vendor_dir()
        if not (vendor / "google" / "protobuf").is_dir():
            return False
        if str(vendor) not in sys.path:
            sys.path.insert(0, str(vendor))
        importlib.invalidate_caches()
        try:
            import google.protobuf  # noqa: F401
            available = True
        except ImportError:
            return False
    if spark is not None and available:
        app_id = spark.sparkContext.applicationId
        if app_id not in _shipped_to:
            _shipped_to.add(app_id)
            spark.sparkContext.addPyFile(_vendor_zip())
    return available


_vendor_zip_path: str | None = None


def _vendor_zip() -> str:
    """Zip the vendored ``google`` package for addPyFile.

    Built in a fresh per-process ``mkdtemp`` directory (0700) rather
    than a fixed name in the shared temp dir: a predictable shared path
    could be pre-planted by another local user (the zip is shipped to
    every executor and imported), and a stale cached zip would keep
    shipping old shim code after the vendored files change. The
    per-process path is cached for the process lifetime only.
    """
    import tempfile
    import zipfile
    from pathlib import Path

    global _vendor_zip_path
    if _vendor_zip_path is not None and Path(_vendor_zip_path).exists():
        return _vendor_zip_path
    vendor = _vendor_dir()
    out = Path(tempfile.mkdtemp(prefix="eps_pb_shim_")) / "protobuf_shim.zip"
    with zipfile.ZipFile(out, "w") as zf:
        for py in sorted((vendor / "google").rglob("*.py")):
            zf.write(py, py.relative_to(vendor))
    _vendor_zip_path = str(out)
    return _vendor_zip_path


def has_transform_with_state(spark: "Any" = None) -> bool:
    """True when the state-v2 Python client can run (protobuf installed
    or the vendored shim available)."""
    return ensure_protobuf(spark)


def transform_with_state(
    df: DataFrame,
    keys: list[str],
    processor: "Any",
    output_schema: str,
    output_mode: str = "Update",
    time_mode: str = "None",
) -> DataFrame:
    """``df.groupBy(keys).transformWithStateInPandas(...)`` with this
    codebase's argument order.

    ``processor`` is a ``pyspark.sql.streaming.stateful_processor
    .StatefulProcessor``: ``init(handle)`` declares named state variables
    (``handle.getValueState/getListState/getMapState``, each with optional
    TTL), ``handleInputRows(key, rows, timerValues)`` yields output
    pandas DataFrames. Requires the RocksDB state store provider — set
    ``spark.sql.streaming.stateStore.providerClass`` to
    ``ROCKSDB_PROVIDER`` before starting the query.
    """
    if not ensure_protobuf(df.sparkSession):
        raise RuntimeError(
            "transformWithStateInPandas needs the 'protobuf' package "
            "(pyspark's state-v2 client imports google.protobuf); install "
            "protobuf or use stateful_apply (applyInPandasWithState)."
        )
    return df.groupBy(*keys).transformWithStateInPandas(
        statefulProcessor=processor,
        outputStructType=output_schema,
        outputMode=output_mode,
        timeMode=time_mode,
    )


def make_running_stats_processor(key: str = "user_id", value_col: str = "value"):
    """A canned StatefulProcessor: per-key running (count, sum, min, max)
    in a single ValueState — the state-v2 analogue of ``running_counts``.

    Built lazily so importing this module never touches the protobuf-
    dependent base class.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState(
                "agg", "n long, total double, mn double, mx double"
            )

        def handleInputRows(self, key_tuple, rows, timer_values):
            if self._agg.exists():
                n, total, mn, mx = self._agg.get()
            else:
                n, total, mn, mx = 0, 0.0, float("inf"), float("-inf")
            for pdf in rows:
                vals = pdf[value_col]
                n += len(vals)
                total += float(vals.sum())
                if len(vals):
                    mn = min(mn, float(vals.min()))
                    mx = max(mx, float(vals.max()))
            self._agg.update((n, total, mn, mx))
            yield pd.DataFrame(
                {key: [key_tuple[0]], "n": [n], "total": [total],
                 "mn": [mn], "mx": [mx]}
            )

        def close(self) -> None:
            pass

    return RunningStats()


RUNNING_STATS_SCHEMA = "user_id string, n long, total double, mn double, mx double"


def make_session_log_processor(
    key: str = "user_id", value_col: str = "value", ttl_ms: int | None = None
):
    """A StatefulProcessor exercising the full state-v2 variable
    surface: a ListState event log (appendValue/get), a MapState of
    per-bucket counts (updateValue/iterator), and an optional TTL on the
    ValueState total — the named-state shapes the reference's stateful
    events would map onto. Emits one row per key per batch with the log
    length, distinct bucket count, and running total."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class SessionLog(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._log = handle.getListState("log", "v double")
            self._buckets = handle.getMapState(
                "buckets", "b long", "cnt long"
            )
            self._total = handle.getValueState(
                "total", "t double", ttlDurationMs=ttl_ms
            )

        def handleInputRows(self, key_tuple, rows, timer_values):
            total = self._total.get()[0] if self._total.exists() else 0.0
            for pdf in rows:
                for v in pdf[value_col]:
                    v = float(v)
                    self._log.appendValue((v,))
                    bucket = int(v // 10)
                    prev = (
                        self._buckets.getValue((bucket,))[0]
                        if self._buckets.containsKey((bucket,))
                        else 0
                    )
                    self._buckets.updateValue((bucket,), (prev + 1,))
                    total += v
            self._total.update((total,))
            log_len = sum(1 for _ in self._log.get())
            n_buckets = sum(1 for _ in self._buckets.keys())
            yield pd.DataFrame(
                {
                    key: [key_tuple[0]],
                    "log_len": [log_len],
                    "n_buckets": [n_buckets],
                    "total": [total],
                }
            )

        def close(self) -> None:
            pass

    return SessionLog()


SESSION_LOG_SCHEMA = (
    "user_id string, log_len long, n_buckets long, total double"
)


def make_timer_processor(key_col: str = "user_id", delay_ms: int = 10):
    """A StatefulProcessor exercising the timer protocol: every input
    batch registers a processing-time timer ``delay_ms`` ahead (after
    listing existing timers); when it fires, ``handleExpiredTimer``
    emits a ``fired=true`` row carrying the expiry. Covers
    RegisterTimer / ListTimers / ExpiryTimerRequest — the reference's
    scheduled-followup shape (mixins/schedule.py) on state-v2."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class TimerProc(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._seen = handle.getValueState("seen", "n long")

        def handleInputRows(self, key_tuple, rows, timer_values):
            n = self._seen.get()[0] if self._seen.exists() else 0
            for pdf in rows:
                n += len(pdf)
            self._seen.update((n,))
            existing = list(self._handle.listTimers())
            now = timer_values.getCurrentProcessingTimeInMs()
            self._handle.registerTimer(now + delay_ms)
            yield pd.DataFrame(
                {
                    key_col: [key_tuple[0]],
                    "n": [n],
                    "fired": [False],
                    "timers_before": [len(existing)],
                }
            )

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):  # noqa: N803 — pyspark calls by keyword
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    "n": [-1],
                    "fired": [True],
                    "timers_before": [0],
                }
            )

        def close(self) -> None:
            pass

    return TimerProc()


TIMER_SCHEMA = "user_id string, n long, fired boolean, timers_before long"


def make_event_time_session_processor(
    key_col: str = "user_id", ts_col: str = "ts", gap_ms: int = 500
):
    """Event-time session close via timers: every batch re-registers a
    timer at (max event time + gap); when the WATERMARK passes it —
    i.e. the key has been silent for the gap in event time — the timer
    fires and emits a ``closed`` row with the session's event count.
    The state-v2 form of the reference's idle-session expiry, driven by
    data time, not wall clock."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class EventTimeSession(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._count = handle.getValueState("count", "n long")

        def handleInputRows(self, key, rows, timerValues):  # noqa: N803
            n = self._count.get()[0] if self._count.exists() else 0
            max_ts = 0
            for pdf in rows:
                n += len(pdf)
                if len(pdf):
                    batch_max = pdf[ts_col].max()
                    max_ts = max(max_ts, int(batch_max.timestamp() * 1000))
            self._count.update((n,))
            # one live timer per key: re-arm at the newest event + gap
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
            self._handle.registerTimer(max_ts + gap_ms)
            yield pd.DataFrame(
                {key_col: [key[0]], "n": [n], "closed": [False]}
            )

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):  # noqa: N803
            n = self._count.get()[0] if self._count.exists() else 0
            self._count.clear()
            yield pd.DataFrame(
                {key_col: [key[0]], "n": [n], "closed": [True]}
            )

        def close(self) -> None:
            pass

    return EventTimeSession()


EVENT_SESSION_SCHEMA = "user_id string, n long, closed boolean"


def sessionizing_counts(
    df: DataFrame, key: str = "user_id", idle_ms: int = 2_000
) -> DataFrame:
    """Per-key counter whose state EXPIRES after ``idle_ms`` of
    processing-time inactivity — the bounded-state guarantee custom
    stateful operators need at 100 TB: keys that go quiet are evicted
    (and report a final ``closed=true`` row) instead of accumulating
    forever. Uses processing-time timeouts; the watermark-driven twin is
    ``EventTimeTimeout`` with the same handler shape."""

    def update(key_tuple, batches: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            n = state.get[0] if state.exists else 0
            state.remove()
            yield pd.DataFrame(
                {key: [key_tuple[0]], "n": [n], "closed": [True]}
            )
            return
        total = state.get[0] if state.exists else 0
        for pdf in batches:
            total += len(pdf)
        state.update((total,))
        state.setTimeoutDuration(idle_ms)
        yield pd.DataFrame(
            {key: [key_tuple[0]], "n": [total], "closed": [False]}
        )

    return stateful_apply(
        df,
        [key],
        update,
        output_schema=f"{key} string, n long, closed boolean",
        state_schema="n long",
        output_mode="update",
        timeout=GroupStateTimeout.ProcessingTimeTimeout,
    )
