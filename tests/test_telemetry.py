"""Telemetry + signal tests (reference: tests/unittests/test_telemetry.py,
test_signals usage across test_pipeline.py)."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from event_pipeline_spark.core.events import EventBase, RetryPolicy, event
from event_pipeline_spark.plans.dag import build_dag
from event_pipeline_spark.plans.executor import PipelineRunner
from event_pipeline_spark.telemetry import (
    NetworkTelemetry,
    TelemetryLogger,
    execution_metrics,
    failed_events,
    failed_network_ops,
    retry_stats,
    slow_events,
)
from event_pipeline_spark.telemetry.signals import SoftSignal
from event_pipeline_spark.telemetry import signals as S


# -- SoftSignal bus -------------------------------------------------------

def test_signal_connect_emit_disconnect():
    sig = SoftSignal("test_sig", ["value"])
    seen = []

    def listener(sender, signal, value):
        seen.append((sender, signal.name, value))
        return "ok"

    sig.connect(listener)
    responses = sig.emit(sender="me", value=42)
    assert seen == [("me", "test_sig", 42)]
    assert responses[0][1] == "ok"

    sig.disconnect(listener)
    sig.emit(sender="me", value=43)
    assert len(seen) == 1


def test_signal_rejects_undeclared_kwargs():
    sig = SoftSignal("strict", ["a"])
    with pytest.raises(TypeError, match="does not provide"):
        sig.emit(sender=None, b=1)


def test_signal_weakref_pruning():
    sig = SoftSignal("weak", ["x"])

    class Holder:
        def __init__(self):
            self.calls = 0

        def on(self, sender, signal, x):
            self.calls += 1

    h = Holder()
    sig.connect(h.on)
    sig.emit(x=1)
    assert h.calls == 1
    del h
    assert sig.listeners() == []  # weakref died and was pruned


def test_all_17_signals_declared():
    assert len(S.ALL_SIGNALS) == 17
    assert "pipeline_execution_start" in S.ALL_SIGNALS


# -- capture + runner wiring ----------------------------------------------

class TinyOk(EventBase):
    def process(self, **params):
        return True, self.spark.range(3).toDF("id")


class TinyFlaky(EventBase):
    retry_policy = RetryPolicy(max_attempts=3, backoff_factor=0.0)
    _fails = {"n": 0}

    def process(self, **params):
        if self._fails["n"] < 2:
            self._fails["n"] += 1
            raise ValueError("transient")
        return True, self.spark.range(1).toDF("id")


def test_runner_populates_telemetry_and_signals(spark):
    from event_pipeline_spark.core.events import EventRegistry

    # other test modules clear the registry; re-register our classes
    EventRegistry.register(TinyOk)
    EventRegistry.register(TinyFlaky)
    TinyFlaky._fails["n"] = 0
    tl = TelemetryLogger()
    started, ended = [], []
    on_start = lambda sender, signal, pipeline: started.append(1)  # noqa: E731
    on_end = lambda sender, signal, execution_context: ended.append(1)  # noqa: E731
    S.pipeline_execution_start.connect(on_start, weak=False)
    S.pipeline_execution_end.connect(on_end, weak=False)
    try:
        runner = PipelineRunner(spark, telemetry=tl)
        run = runner.run(build_dag("TinyOk -> TinyFlaky"))
    finally:
        S.pipeline_execution_start.disconnect(on_start)
        S.pipeline_execution_end.disconnect(on_end)

    assert started == [1] and ended == [1]
    metrics = {m.event_name: m for m in tl.get_all_metrics()}
    assert metrics["TinyOk"].status == "completed"
    assert metrics["TinyFlaky"].retry_count == 2  # two failed attempts
    assert all(m.pipeline_id == run.run_id for m in metrics.values())


# -- reporter aggregates ---------------------------------------------------

@pytest.fixture()
def metrics_df(spark):
    tl = TelemetryLogger()
    rows = [
        ("a", "t1", 0.0, 0.5, "completed", None, 0),
        ("b", "t2", 0.0, 2.5, "completed", None, 2),
        ("c", "t3", 0.0, 0.1, "failed", "boom", 1),
        ("d", "t4", 1.0, 4.0, "completed", None, 0),
    ]
    return spark.createDataFrame(
        [
            {
                "event_name": r[0], "task_id": r[1], "start_time": r[2],
                "end_time": r[3], "status": r[4], "error": r[5],
                "retry_count": r[6], "process_id": None, "pipeline_id": None,
            }
            for r in rows
        ],
        schema=tl.to_df(spark).schema,
    )


def test_failed_and_slow_events(metrics_df):
    assert [r["event_name"] for r in failed_events(metrics_df).collect()] == ["c"]
    slow = sorted(r["event_name"] for r in slow_events(metrics_df, 1.0).collect())
    assert slow == ["b", "d"]


def test_retry_stats_shape(metrics_df):
    stats = retry_stats(metrics_df)
    assert stats["total_retries"] == 3
    assert stats["events_with_retries"] == 2
    assert stats["events_by_retry_count"] == {"0": 2, "1": 1, "2": 1}


def test_execution_metrics_one_pass(metrics_df):
    m = execution_metrics(metrics_df)
    assert m["completed"] == 3 and m["failed"] == 1
    assert m["success_rate"] == pytest.approx(75.0)
    assert m["completion_rate"] == pytest.approx(100.0)
    assert m["total_duration"] == pytest.approx(4.0)  # max(end) - min(start)
    assert m["average_duration"] == pytest.approx((0.5 + 2.5 + 0.1 + 3.0) / 4)


def test_network_telemetry(spark):
    nt = NetworkTelemetry()
    nt.start_operation("op1", "hostA", 9000)
    nt.end_operation("op1", bytes_sent=10, bytes_received=20)
    nt.start_operation("op2", "hostB", 9001)
    nt.end_operation("op2", error="conn reset")
    df = nt.to_df(spark)
    assert df.count() == 2
    assert [r["task_id"] for r in failed_network_ops(df).collect()] == ["op2"]


def test_run_registry_and_first_error(spark):
    from event_pipeline_spark.core.events import EventBase, EventRegistry
    from event_pipeline_spark.plans.executor import PipelineRunner, get_run

    class RegOk(EventBase):
        def process(self, **params):
            return True, self.spark.range(1).toDF("id")

    class RegBad(EventBase):
        def process(self, **params):
            raise ValueError("boom")

    EventRegistry.register(RegOk)
    EventRegistry.register(RegBad)
    run = PipelineRunner(spark).run(build_dag("RegOk -> RegBad"))
    assert get_run(run.run_id) is run  # state cache (pipeline.py:68-147)
    err = run.first_error_record()
    assert err is not None and "RegBad" in err.events


# -- signal-driven collector (reference collector.py/factory.py parity) ------

def test_collector_records_pipeline_run_via_signals(spark):
    """register_collectors wires the signal bus to the factory's
    logger: a DAG run lands start/end rows with durations, and a
    failing stage records its error — the executor never touches
    telemetry directly."""
    from event_pipeline_spark.core.events import EventRegistry, event
    from event_pipeline_spark.plans.dag import build_dag
    from event_pipeline_spark.plans.executor import PipelineRunner
    from event_pipeline_spark.telemetry import (
        TelemetryLoggerFactory,
        register_collectors,
        unregister_collectors,
    )

    @event
    def TcOk(spark, previous_result):
        return True, None

    @event
    def TcBoom(spark, previous_result):
        raise ValueError("kaput")

    EventRegistry.register(TcOk)
    EventRegistry.register(TcBoom)
    TelemetryLoggerFactory.reset()
    register_collectors()
    try:
        PipelineRunner(spark).run(build_dag("TcOk->TcBoom"))
    finally:
        unregister_collectors()
    try:
        metrics = {
            m.task_id: m
            for m in TelemetryLoggerFactory.get_logger().get_all_metrics()
        }
        assert metrics["TcOk"].status == "completed"
        assert metrics["TcOk"].duration() >= 0.0
        assert metrics["TcOk"].end_time is not None
        assert metrics["TcBoom"].status == "failed"
        assert "kaput" in (metrics["TcBoom"].error or "")
    finally:
        TelemetryLoggerFactory.reset()


def test_collector_counts_retries(spark):
    from event_pipeline_spark.core.events import (
        EventBase,
        EventRegistry,
        RetryPolicy,
    )
    from event_pipeline_spark.plans.dag import build_dag
    from event_pipeline_spark.plans.executor import PipelineRunner
    from event_pipeline_spark.telemetry import (
        TelemetryLoggerFactory,
        register_collectors,
        unregister_collectors,
    )

    calls = {"n": 0}

    class TcFlaky(EventBase):
        executor = None

        def get_retry_policy(self):
            return RetryPolicy(max_attempts=3, backoff_factor=0.0)

        def process(self, *a, **k):
            calls["n"] += 1
            if calls["n"] < 3:
                raise RuntimeError("flaky")
            return True, None

    EventRegistry.register(TcFlaky)
    TelemetryLoggerFactory.reset()
    register_collectors()
    try:
        PipelineRunner(spark).run(build_dag("TcFlaky"))
    finally:
        unregister_collectors()
    try:
        rows = TelemetryLoggerFactory.get_logger().get_all_metrics()
        flaky = [m for m in rows if m.task_id == "TcFlaky"]
        assert flaky and flaky[0].retry_count == 2  # attempts 2 and 3
        assert flaky[0].status == "completed"
    finally:
        TelemetryLoggerFactory.reset()


def test_factory_swaps_logger_class():
    from event_pipeline_spark.telemetry import (
        TelemetryLogger,
        TelemetryLoggerFactory,
    )

    class Custom(TelemetryLogger):
        pass

    TelemetryLoggerFactory.reset()
    base = TelemetryLoggerFactory.get_logger()
    assert TelemetryLoggerFactory.get_logger() is base  # singleton
    TelemetryLoggerFactory.set_logger_class(Custom)
    assert isinstance(TelemetryLoggerFactory.get_logger(), Custom)
    TelemetryLoggerFactory.reset()
    assert type(TelemetryLoggerFactory.get_logger()) is TelemetryLogger


def test_listener_decorator_connects_to_one_or_many_signals():
    from event_pipeline_spark.telemetry.signals import SoftSignal, listener

    a, b = SoftSignal("sig_a", ["x"]), SoftSignal("sig_b", ["x"])
    seen = []

    @listener(a, weak=False)
    def single(sender, signal, x):
        seen.append(("single", signal.name, x))

    @listener([a, b], weak=False)
    def multi(sender, signal, x):
        seen.append(("multi", signal.name, x))

    a.emit(sender=None, x=1)
    b.emit(sender=None, x=2)
    assert ("single", "sig_a", 1) in seen
    assert ("multi", "sig_a", 1) in seen
    assert ("multi", "sig_b", 2) in seen
    assert ("single", "sig_b", 2) not in seen
