"""Signal-driven metric capture: the bridge from the lifecycle signal
bus to the ``TelemetryLogger`` ledger.

Parity with the reference's collector + factory
(``nexus/telemetry/collector.py:20-86``,
``nexus/telemetry/factory.py:7-27``): ``TelemetryLoggerFactory`` holds
a swappable logger class behind a lazy singleton, and
``MetricsCollector``'s static handlers subscribe to
``event_execution_start`` / ``event_execution_end`` /
``event_execution_retry`` so pipeline runs record event timings,
failures, and retry counts WITHOUT the executor knowing telemetry
exists — the same inversion the reference uses.

Mapping note: this executor reports per-STAGE contexts (a ``||`` group
is one record whose ``events`` lists its member names); the collector
starts/ends one metric row per member name, so the ledger granularity
matches the reference's per-event rows. Stage members share the stage's
wall-clock (members run inside one driver walk; per-member timing would
require per-member signals, which the reference also lacks for grouped
execution).
"""

from __future__ import annotations

import typing

from event_pipeline_spark.telemetry import signals as S
from event_pipeline_spark.telemetry.metrics import TelemetryLogger


class TelemetryLoggerFactory:
    """Lazy, swappable logger provider (factory.py:7-27). Tests or
    embedders install a subclass with ``set_logger_class``; everything
    else calls ``get_logger`` and shares one instance."""

    _logger_class: type[TelemetryLogger] = TelemetryLogger
    _instance: TelemetryLogger | None = None

    @classmethod
    def set_logger_class(cls, logger_class: type[TelemetryLogger]) -> None:
        cls._logger_class = logger_class
        cls._instance = None

    @classmethod
    def get_logger(cls) -> TelemetryLogger:
        if cls._instance is None:
            cls._instance = cls._logger_class()
        return cls._instance

    @classmethod
    def reset(cls) -> None:
        cls._logger_class = TelemetryLogger
        cls._instance = None


def _event_names(event: typing.Any) -> list[str]:
    """The signal payload is a list of names (stage groups), a single
    name, or an event object; normalize to names."""
    if event is None:
        return []
    if isinstance(event, str):
        return [event]
    if isinstance(event, (list, tuple)):
        return [n for e in event for n in _event_names(e)]
    return [type(event).__name__]


class MetricsCollector:
    """Static signal handlers feeding the factory's logger
    (collector.py:20-71)."""

    @staticmethod
    def on_event_start(sender, event=None, execution_context=None, **kw):
        log = TelemetryLoggerFactory.get_logger()
        pipeline_id = kw.get("pipeline_id")
        for name in _event_names(event):
            log.start_event(name, task_id=name, pipeline_id=pipeline_id)

    @staticmethod
    def on_event_end(sender, event=None, execution_context=None, **kw):
        log = TelemetryLoggerFactory.get_logger()
        error = None
        ctx = execution_context
        if ctx is not None and getattr(ctx, "errors", None):
            error = str(ctx.errors[0])
        for name in _event_names(event):
            log.end_event(
                name, name, error=error, pipeline_id=kw.get("pipeline_id")
            )

    @staticmethod
    def on_event_retry(sender, event=None, **kw):
        log = TelemetryLoggerFactory.get_logger()
        for name in _event_names(event):
            log.record_retry(name, name, pipeline_id=kw.get("pipeline_id"))


def register_collectors() -> None:
    """Connect the collector to the signal bus (collector.py:74-86).
    Uses strong references — the static methods would otherwise be
    garbage-collected out of the weak listener set."""
    S.event_execution_start.connect(MetricsCollector.on_event_start, weak=False)
    S.event_execution_end.connect(MetricsCollector.on_event_end, weak=False)
    S.event_execution_retry.connect(MetricsCollector.on_event_retry, weak=False)


def unregister_collectors() -> None:
    S.event_execution_start.disconnect(MetricsCollector.on_event_start)
    S.event_execution_end.disconnect(MetricsCollector.on_event_end)
    S.event_execution_retry.disconnect(MetricsCollector.on_event_retry)
