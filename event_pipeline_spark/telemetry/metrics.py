"""Telemetry capture: per-event and per-network-op metric rows.

Parity with the reference's ``EventMetrics`` / ``TelemetryLogger``
(nexus/telemetry/logger.py:21-160) and ``NetworkMetrics`` /
``NetworkTelemetry`` (nexus/telemetry/network.py:12-140). Capture is
driver-side and O(#events) — tiny; analysis happens on the DataFrame from
``to_df`` so the reporter queries (SURVEY §2.6) are ordinary Spark
aggregations that scale to ledgers from millions of runs when persisted
through a store backend.
"""

from __future__ import annotations

import threading
import time
import typing
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


@dataclass
class EventMetrics:
    """One event execution (telemetry/logger.py:21-58)."""

    event_name: str
    task_id: str
    start_time: float
    end_time: float | None = None
    status: str = "pending"  # pending | completed | failed
    error: str | None = None
    retry_count: int = 0
    process_id: int | None = None
    pipeline_id: str | None = None

    def duration(self) -> float:
        if not self.end_time:
            return 0.0
        return self.end_time - self.start_time


EVENT_METRICS_SCHEMA = T.StructType(
    [
        T.StructField("event_name", T.StringType(), False),
        T.StructField("task_id", T.StringType(), False),
        T.StructField("start_time", T.DoubleType(), False),
        T.StructField("end_time", T.DoubleType(), True),
        T.StructField("status", T.StringType(), False),
        T.StructField("error", T.StringType(), True),
        T.StructField("retry_count", T.IntegerType(), False),
        T.StructField("process_id", T.LongType(), True),
        T.StructField("pipeline_id", T.StringType(), True),
    ]
)


@dataclass
class NetworkMetrics:
    """One remote operation (telemetry/network.py:12-31)."""

    task_id: str
    host: str
    port: int
    start_time: float
    end_time: float | None = None
    bytes_sent: int = 0
    bytes_received: int = 0
    error: str | None = None
    operation: str = "remote_call"

    def latency(self) -> float:
        if not self.end_time:
            return 0.0
        return self.end_time - self.start_time


NETWORK_METRICS_SCHEMA = T.StructType(
    [
        T.StructField("task_id", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("port", T.IntegerType(), False),
        T.StructField("start_time", T.DoubleType(), False),
        T.StructField("end_time", T.DoubleType(), True),
        T.StructField("bytes_sent", T.LongType(), False),
        T.StructField("bytes_received", T.LongType(), False),
        T.StructField("error", T.StringType(), True),
        T.StructField("operation", T.StringType(), False),
    ]
)


class TelemetryLogger:
    """Thread-safe event-metric capture (logger.py:105-160)."""

    def __init__(self) -> None:
        self._metrics: dict[tuple[str | None, str], EventMetrics] = {}
        self._lock = threading.Lock()

    def start_event(
        self,
        event_name: str,
        task_id: str,
        process_id: int | None = None,
        pipeline_id: str | None = None,
    ) -> None:
        with self._lock:
            self._metrics[(pipeline_id, task_id)] = EventMetrics(
                event_name=event_name,
                task_id=task_id,
                start_time=time.time(),
                process_id=process_id,
                pipeline_id=pipeline_id,
            )

    def end_event(
        self,
        task_id: str,
        name: str = "",
        error: str | None = None,
        pipeline_id: str | None = None,
    ) -> None:
        with self._lock:
            m = self._metrics.get((pipeline_id, task_id))
            if m is None:
                return
            m.end_time = time.time()
            m.status = "failed" if error else "completed"
            m.error = error

    def record_retry(
        self, task_id: str, name: str = "", pipeline_id: str | None = None
    ) -> None:
        with self._lock:
            m = self._metrics.get((pipeline_id, task_id))
            if m is not None:
                m.retry_count += 1

    def get_all_metrics(self) -> list[EventMetrics]:
        with self._lock:
            return list(self._metrics.values())

    def to_df(self, spark: SparkSession) -> DataFrame:
        rows = [vars(m).copy() for m in self.get_all_metrics()]
        return spark.createDataFrame(rows, schema=EVENT_METRICS_SCHEMA)  # type: ignore[arg-type]


class NetworkTelemetry:
    """Thread-safe network-op capture (network.py:33-140)."""

    def __init__(self) -> None:
        self._metrics: dict[str, NetworkMetrics] = {}
        self._lock = threading.Lock()

    def start_operation(
        self, task_id: str, host: str, port: int, operation: str = "remote_call"
    ) -> None:
        with self._lock:
            self._metrics[task_id] = NetworkMetrics(
                task_id=task_id, host=host, port=port, start_time=time.time(),
                operation=operation,
            )

    def end_operation(
        self,
        task_id: str,
        bytes_sent: int = 0,
        bytes_received: int = 0,
        error: str | None = None,
    ) -> None:
        with self._lock:
            m = self._metrics.get(task_id)
            if m is None:
                return
            m.end_time = time.time()
            m.bytes_sent = bytes_sent
            m.bytes_received = bytes_received
            m.error = error

    def get_all_metrics(self) -> list[NetworkMetrics]:
        with self._lock:
            return list(self._metrics.values())

    def to_df(self, spark: SparkSession) -> DataFrame:
        rows = [vars(m).copy() for m in self.get_all_metrics()]
        return spark.createDataFrame(rows, schema=NETWORK_METRICS_SCHEMA)  # type: ignore[arg-type]
