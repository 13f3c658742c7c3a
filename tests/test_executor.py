"""Executor semantics tests, mirroring reference tests/unittests/test_base.py
(evaluation states, retry, goto) and test_task.py execution scenarios."""

from __future__ import annotations

import pytest

from event_pipeline_spark.core.events import (
    EvaluationState,
    EventBase,
    EventRegistry,
    MaxRetryError,
    RetryPolicy,
    event,
)
from event_pipeline_spark.core.fields import InputDataField
from event_pipeline_spark.plans.dag import build_dag
from event_pipeline_spark.plans.executor import PipelineRunner, RunState
from event_pipeline_spark.plans.pipeline import BatchPipeline, Pipeline

VISITS: list[str] = []


@pytest.fixture(autouse=True)
def _clean():
    VISITS.clear()
    EventRegistry.clear()
    yield


def _simple(name: str, *, ok: bool = True, raises: type[Exception] | None = None,
            **attrs):
    """Register a scripted event class recording its visit."""

    def process(self, **params):
        VISITS.append(name)
        if raises is not None:
            raise raises(name)
        return ok, None

    return type(name, (EventBase,), {"process": process, **attrs})


class TestRouting:
    def test_sequential_chain(self, spark):
        _simple("A"), _simple("B"), _simple("C")
        res = PipelineRunner(spark).run(build_dag("A->B->C"))
        assert VISITS == ["A", "B", "C"]
        assert res.state is RunState.COMPLETED
        assert [r.success for r in res.records] == [True, True, True]

    def test_parallel_gathered_into_one_context(self, spark):
        _simple("A"), _simple("B"), _simple("C")
        res = PipelineRunner(spark).run(build_dag("A||B|->C"))
        assert VISITS == ["A", "B", "C"]
        # A||B is ONE context; C is the second
        assert len(res.records) == 2
        assert res.records[0].events == ["A", "B"]

    def test_conditional_takes_failure_branch(self, spark):
        _simple("A", ok=False), _simple("B"), _simple("C"), _simple("S")
        res = PipelineRunner(spark).run(build_dag("A(0->B,1->C)->S"))
        assert VISITS == ["A", "B", "S"]  # sink drains after branch
        assert res.records[0].success is False

    def test_conditional_takes_success_branch(self, spark):
        _simple("A"), _simple("B"), _simple("C"), _simple("S")
        PipelineRunner(spark).run(build_dag("A(0->B,1->C)->S"))
        assert VISITS == ["A", "C", "S"]

    def test_exception_routes_to_failure(self, spark):
        _simple("A", raises=ValueError), _simple("B"), _simple("C")
        res = PipelineRunner(spark).run(build_dag("A(0->B,1->C)"))
        assert VISITS == ["A", "B"]
        assert "ValueError" in res.records[0].errors[0]

    def test_filter_by_event(self, spark):
        _simple("A"), _simple("B")
        res = PipelineRunner(spark).run(build_dag("A->B"))
        assert len(res.filter_by_event("a")) == 1


class TestPiping:
    def test_pipe_pointer_passes_dataframe(self, spark):
        captured = {}

        class Produce(EventBase):
            def process(self, **params):
                return True, self.spark.range(3)

        class Consume(EventBase):
            def process(self, **params):
                captured["prev"] = self.previous_result
                return True, None

        PipelineRunner(spark).run(build_dag("Produce|->Consume"))
        assert captured["prev"] is not None
        assert captured["prev"].count() == 3

    def test_plain_pointer_does_not_pass(self, spark):
        captured = {}

        class Produce(EventBase):
            def process(self, **params):
                return True, self.spark.range(3)

        class Consume(EventBase):
            def process(self, **params):
                captured["prev"] = self.previous_result
                return True, None

        PipelineRunner(spark).run(build_dag("Produce->Consume"))
        assert captured["prev"] is None


class TestEvaluationStates:
    """Reference test_base.py:59-128: all four states."""

    def _run_pair(self, spark, state, a_ok, b_ok):
        _simple("A", ok=a_ok)
        _simple(
            "B",
            ok=b_ok,
            execution_evaluation_state=state,
            **({"raises": ValueError} if not b_ok else {}),
        )
        _simple("Win"), _simple("Lose")
        res = PipelineRunner(spark).run(build_dag("A||B(0->Lose,1->Win)"))
        return res.records[0].success

    def test_all_success_state(self, spark):
        assert self._run_pair(
            spark, EvaluationState.SUCCESS_ON_ALL_EVENTS_SUCCESS, True, True
        )
        assert not self._run_pair(
            spark, EvaluationState.SUCCESS_ON_ALL_EVENTS_SUCCESS, True, False
        )

    def test_partial_success_state(self, spark):
        assert self._run_pair(
            spark, EvaluationState.SUCCESS_FOR_PARTIAL_SUCCESS, True, False
        )

    def test_partial_error_fails(self, spark):
        assert not self._run_pair(
            spark, EvaluationState.FAILURE_FOR_PARTIAL_ERROR, True, False
        )
        assert self._run_pair(
            spark, EvaluationState.FAILURE_FOR_PARTIAL_ERROR, True, True
        )

    def test_all_failure_state(self, spark):
        # at least one event produced a result → not "all failed"
        assert self._run_pair(
            spark, EvaluationState.FAILURE_FOR_ALL_EVENTS_FAILURE, True, False
        )


class TestRetry:
    def test_backoff_values(self):
        p = RetryPolicy(max_attempts=5, backoff_factor=0.1, max_backoff=0.3)
        assert p.backoff_time(1) == 0
        assert p.backoff_time(2) == pytest.approx(0.2)
        assert p.backoff_time(3) == pytest.approx(0.3)  # capped

    def test_retry_until_success(self, spark):
        attempts = {"n": 0}

        class Flaky(EventBase):
            retry_policy = RetryPolicy(max_attempts=4, backoff_factor=0.0)

            def process(self, **params):
                attempts["n"] += 1
                if attempts["n"] < 3:
                    raise OSError("transient")
                return True, None

        res = PipelineRunner(spark).run(build_dag("Flaky"))
        assert attempts["n"] == 3
        assert res.records[0].success
        assert res.records[0].retry_counts["Flaky"] == 3

    def test_retry_whitelist_skips_other_exceptions(self, spark):
        attempts = {"n": 0}

        class Picky(EventBase):
            retry_policy = RetryPolicy(
                max_attempts=5, backoff_factor=0.0,
                retry_on_exceptions=(OSError,),
            )

            def process(self, **params):
                attempts["n"] += 1
                raise ValueError("not retryable")

        res = PipelineRunner(spark).run(build_dag("Picky"))
        assert attempts["n"] == 1  # no retries for non-whitelisted
        assert not res.records[0].success

    def test_retry_exhaustion(self, spark):
        class Doomed(EventBase):
            retry_policy = RetryPolicy(max_attempts=3, backoff_factor=0.0)

            def process(self, **params):
                raise OSError("always")

        res = PipelineRunner(spark).run(build_dag("Doomed"))
        assert not res.records[0].success
        assert "max retries" in res.records[0].errors[0]

    def test_dsl_retry_count_applies(self, spark):
        attempts = {"n": 0}

        class Shaky(EventBase):
            def process(self, **params):
                attempts["n"] += 1
                raise OSError("x")

        PipelineRunner(spark).run(build_dag("Shaky * 3"))
        assert attempts["n"] == 3


class TestGoto:
    def test_goto_configured_descriptor(self, spark):
        class A(EventBase):
            def process(self, **params):
                VISITS.append("A")
                self.goto(3)

        _simple("B"), _simple("C"), _simple("D")
        res = PipelineRunner(spark).run(build_dag("A(0->B,1->C,3->D)"))
        assert VISITS == ["A", "D"]
        assert res.state is RunState.COMPLETED

    def test_goto_unconfigured_descriptor_cancels(self, spark):
        class A(EventBase):
            def process(self, **params):
                self.goto(7)

        _simple("B"), _simple("C")
        res = PipelineRunner(spark).run(build_dag("A(0->B,1->C)"))
        assert res.state is RunState.CANCELLED


class TestStopAndBypass:
    def test_stop_on_success_cancels(self, spark):
        _simple("A", stop_on_success=True), _simple("B")
        res = PipelineRunner(spark).run(build_dag("A->B"))
        assert VISITS == ["A"]
        assert res.state is RunState.CANCELLED

    def test_bypass_passes_previous_through(self, spark):
        class Produce(EventBase):
            def process(self, **params):
                return True, self.spark.range(2)

        class Skip(EventBase):
            def can_bypass_current_event(self):
                return True

            def process(self, **params):  # pragma: no cover
                raise AssertionError("must be bypassed")

        captured = {}

        class Consume(EventBase):
            def process(self, **params):
                captured["prev"] = self.previous_result
                return True, None

        PipelineRunner(spark).run(build_dag("Produce|->Skip|->Consume"))
        assert captured["prev"].count() == 2


class TestEventDecorator:
    def test_function_event_with_params(self, spark):
        seen = {}

        @event
        def Greet(spark, name):
            seen["name"] = name
            return None

        res = PipelineRunner(spark, params={"name": "ada"}).run(build_dag("Greet"))
        assert seen["name"] == "ada"
        assert res.records[0].success


class TestPipelineAPI:
    def test_fields_and_start(self, spark):
        @event
        def Hello(name):
            VISITS.append(f"hello-{name}")
            return None

        class P(Pipeline):
            name = InputDataField(str, required=True)

            class Meta:
                pointy = "Hello"

        p = P(name="x")
        res = p.start(spark)
        assert VISITS == ["hello-x"]
        assert res.state is RunState.COMPLETED
        with pytest.raises(RuntimeError):
            p.start(spark)  # rerun guard
        p.start(spark, force_rerun=True)

    def test_field_validation(self, spark):
        class P(Pipeline):
            age = InputDataField(int)

            class Meta:
                pointy = "Nothing"

        with pytest.raises(TypeError):
            P(age="not-an-int")
        with pytest.raises(TypeError):
            P(bogus=1)

    def test_batch_pipeline_round_robin(self, spark):
        batches = []

        @event
        def Consume(names, age):
            batches.append((list(names) if names else None, age))
            return None

        class BP(BatchPipeline):
            names = InputDataField(list, batch_size=2)
            age = InputDataField(int)

            class Meta:
                pointy = "Consume"

        bp = BP(names=["a", "b", "c"], age=30)
        results = bp.execute(spark)
        assert batches == [(["a", "b"], 30), (["c"], 30)]
        assert len(results) == 2


class TestRowLevelEvaluation:
    """row_level_errors: the stage's ``error`` column feeds the evaluation
    state via ONE observed materialization (no second scan), and the
    evaluated result is cached for the branch that consumes it."""

    def _error_event(self, spark, n_errors: int):
        from pyspark.sql import functions as F

        def process(self, **params):
            VISITS.append("A")
            df = self.spark.range(10).withColumn(
                "error", F.col("id") < n_errors
            )
            return True, df

        type("A", (EventBase,), {
            "process": process,
            "row_level_errors": True,
            "execution_evaluation_state": EvaluationState.FAILURE_FOR_PARTIAL_ERROR,
        })

    def test_row_errors_route_to_failure_branch(self, spark):
        self._error_event(spark, n_errors=2)
        _simple("B"), _simple("C")
        res = PipelineRunner(spark).run(build_dag("A(0->B,1->C)"))
        assert VISITS == ["A", "B"]
        assert res.records[0].success is False
        # the evaluated result was cached for the downstream branch
        assert res.records[0].result.is_cached
        res.unpersist()
        assert not res.records[0].result.is_cached

    def test_no_row_errors_route_to_success_branch(self, spark):
        self._error_event(spark, n_errors=0)
        _simple("B"), _simple("C")
        res = PipelineRunner(spark).run(build_dag("A(0->B,1->C)"))
        assert VISITS == ["A", "C"]
        assert res.records[0].success is True
        res.unpersist()

    def test_string_error_column_from_map_with_errors(self, spark):
        """The framework's own row-level-error producer (map_with_errors)
        emits `error string` (null = success) — evaluation must accept
        that contract too, not just boolean flags."""
        from event_pipeline_spark.core.mapreduce import map_with_errors

        def process(self, **params):
            VISITS.append("A")
            src = self.spark.range(10).withColumnRenamed("id", "n")
            mapped = map_with_errors(src, lambda rec: 100 // (rec["n"] - 5))
            return True, mapped

        type("A", (EventBase,), {
            "process": process,
            "row_level_errors": True,
            "execution_evaluation_state": EvaluationState.FAILURE_FOR_PARTIAL_ERROR,
        })
        _simple("B"), _simple("C")
        res = PipelineRunner(spark).run(build_dag("A(0->B,1->C)"))
        # n=5 divides by zero -> one errored row -> failure branch
        assert VISITS == ["A", "B"]
        assert res.records[0].success is False
        res.unpersist()

    def test_evaluation_does_not_rescan_stage(self, spark):
        """The stage plan runs ONCE: evaluation metrics ride the observed
        materialization and the downstream read hits the cache."""
        from pyspark.sql import functions as F

        acc = spark.sparkContext.accumulator(0)

        @F.udf("long")
        def tick(x):
            acc.add(1)
            return x

        def process(self, **params):
            df = (
                self.spark.range(100)
                .withColumn("y", tick("id"))
                .withColumn("error", F.lit(False))
            )
            return True, df

        type("A", (EventBase,), {
            "process": process,
            "row_level_errors": True,
        })
        res = PipelineRunner(spark).run(build_dag("A"))
        assert res.records[0].success is True
        after_eval = acc.value
        assert after_eval == 100
        # downstream consumption reuses the cache — no recompute
        assert res.records[0].result.count() == 100
        assert acc.value == after_eval
        res.unpersist()
