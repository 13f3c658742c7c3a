"""Event layer: EventBase, @event decorator, retry policy, evaluation states.

Re-expresses the reference's event contract (nexus/base.py:364-649) for a
Spark-first engine. An event is a **stage**: a function from an optional
input DataFrame to ``(success: bool, output: DataFrame | None)``
(reference ``process()`` contract, base.py:523-539). Where the reference
answers "which thread/process/remote host runs this Python function"
(executors, §2.7 of SURVEY.md), Spark owns distribution — an event body
builds a DataFrame plan and Spark schedules it.

Row-level errors ride in an ``error`` boolean column; stage-level errors
are Python exceptions. Both feed the evaluation state (base.py:276-308).
"""

from __future__ import annotations

import inspect
import time
from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

# defaults mirror nexus/constants.py:7-11
MAX_RETRIES = 5
MAX_BACKOFF_FACTOR = 0.05
MAX_BACKOFF = 100.0


class StopProcessingError(RuntimeError):
    """Cancels the whole pipeline run (reference exceptions + task.py:498-537)."""


class MaxRetryError(RuntimeError):
    """Retries exhausted (reference _RetryMixin behavior)."""

    def __init__(self, attempts: int, last: Exception):
        super().__init__(f"max retries reached after {attempts} attempts: {last!r}")
        self.attempts = attempts
        self.last = last


class SwitchTask(Exception):
    """Raised by ``EventBase.goto`` to jump to a sibling branch descriptor
    (reference base.py:456-497, exceptions.py:97-115)."""

    def __init__(self, descriptor: int, result: DataFrame | None = None,
                 execute_on_event_method: bool = True):
        super().__init__(f"switch to descriptor {descriptor}")
        self.descriptor = descriptor
        self.result = result
        self.execute_on_event_method = execute_on_event_method


@dataclass
class RetryPolicy:
    """Exponential backoff ``factor * 2^(n-1)`` capped at ``max_backoff``,
    optionally restricted to an exception whitelist (base.py:66-127)."""

    max_attempts: int = MAX_RETRIES
    backoff_factor: float = MAX_BACKOFF_FACTOR
    max_backoff: float = MAX_BACKOFF
    retry_on_exceptions: tuple[type[Exception], ...] = ()

    def backoff_time(self, retry_count: int) -> float:
        if retry_count <= 1:
            return 0.0
        return min(self.backoff_factor * (2 ** (retry_count - 1)), self.max_backoff)

    def retryable(self, exc: Exception) -> bool:
        if isinstance(exc, (SwitchTask, StopProcessingError)):
            return False
        if not self.retry_on_exceptions:
            return True
        return isinstance(exc, tuple(self.retry_on_exceptions))


class EvaluationState(Enum):
    """The four execution-evaluation states (base.py:276-308), reduced to
    a pure function of (has_success, has_error). On DataFrames both bits
    come from ONE aggregate: count(*) and count_if(error)."""

    SUCCESS_ON_ALL_EVENTS_SUCCESS = "all-success"
    FAILURE_FOR_PARTIAL_ERROR = "any-error-fails"
    SUCCESS_FOR_PARTIAL_SUCCESS = "any-success"
    FAILURE_FOR_ALL_EVENTS_FAILURE = "all-failure-fails"

    def success(self, has_success: bool, has_error: bool) -> bool:
        if self is EvaluationState.SUCCESS_ON_ALL_EVENTS_SUCCESS:
            return has_success and not has_error
        if self is EvaluationState.SUCCESS_FOR_PARTIAL_SUCCESS:
            return has_success
        if self is EvaluationState.FAILURE_FOR_PARTIAL_ERROR:
            return not has_error
        # FAILURE_FOR_ALL_EVENTS_FAILURE: fails only if everything failed
        return has_success or not has_error


class EventRegistry:
    """Name → event class, case-insensitive resolution like the
    reference's task.py:809-822."""

    _classes: dict[str, type["EventBase"]] = {}

    @classmethod
    def register(cls, klass: type["EventBase"]) -> None:
        cls._classes[klass.__name__.lower()] = klass

    @classmethod
    def resolve(cls, name: str) -> type["EventBase"]:
        klass = cls._classes.get(name.lower())
        if klass is None:
            raise KeyError(f"event {name!r} was not found")
        return klass

    @classmethod
    def clear(cls) -> None:
        cls._classes.clear()


class EventBase:
    """A pipeline stage.

    Subclass and implement ``process``. Class attributes mirror the
    reference's per-event knobs that still make sense on Spark; executor
    selection (base.py:212-268) intentionally has no analogue.
    """

    execution_evaluation_state = EvaluationState.SUCCESS_ON_ALL_EVENTS_SUCCESS
    retry_policy: RetryPolicy | dict | None = None
    #: stop flags (base.py:553-608)
    stop_on_success = False
    stop_on_error = False
    #: opt in to row-level evaluation: the stage's ``error`` boolean column
    #: feeds the evaluation state. Evaluation rides on ONE materializing
    #: action via ``df.observe()`` and the result is cached for downstream
    #: stages (SURVEY §4.3) — no separate counting scan.
    row_level_errors = False

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        EventRegistry.register(cls)

    def __init__(self, spark: SparkSession, previous_result: DataFrame | None = None):
        self.spark = spark
        self.previous_result = previous_result
        self._retry_count = 0

    # -- contract -------------------------------------------------------

    def process(self, *args: Any, **kwargs: Any) -> tuple[bool, DataFrame | None]:
        raise NotImplementedError

    def can_bypass_current_event(self) -> bool:
        """Pre-check to skip this stage, passing input through
        (base.py:499-521)."""
        return False

    def goto(self, descriptor: int, result: DataFrame | None = None,
             execute_on_event_method: bool = True) -> None:
        """Jump to a sibling branch (base.py:456-497)."""
        raise SwitchTask(descriptor, result, execute_on_event_method)

    # -- retry engine (base.py:155-209) --------------------------------

    def get_retry_policy(self) -> RetryPolicy | None:
        if isinstance(self.retry_policy, dict):
            self.retry_policy = RetryPolicy(**self.retry_policy)
        return self.retry_policy

    def run_with_retry(self, call: Callable[[], tuple[bool, DataFrame | None]]
                       ) -> tuple[bool, DataFrame | None]:
        from event_pipeline_spark.telemetry import signals as S

        policy = self.get_retry_policy()
        if policy is None:
            return call()
        last: Exception | None = None
        while self._retry_count < policy.max_attempts:
            self._retry_count += 1
            backoff = policy.backoff_time(self._retry_count)
            if self._retry_count > 1:
                # a retry, not the first attempt (base.py:155-209)
                S.event_execution_retry.emit(
                    sender=type(self), event=self, execution_context=None,
                    task_id=None, backoff=backoff,
                    retry_count=self._retry_count,
                    max_attempts=policy.max_attempts,
                )
            if backoff:
                time.sleep(backoff)
            try:
                return call()
            except Exception as exc:  # noqa: BLE001 — policy decides
                if not policy.retryable(exc):
                    raise
                last = exc
        S.event_execution_retry_done.emit(
            sender=type(self), event=self, execution_context=None,
            task_id=None, max_attempts=policy.max_attempts,
        )
        raise MaxRetryError(self._retry_count, last or RuntimeError("no attempt ran"))


def event(
    fn: Callable | None = None,
    *,
    name: str | None = None,
    evaluation_state: EvaluationState = EvaluationState.SUCCESS_ON_ALL_EVENTS_SUCCESS,
    retry_policy: RetryPolicy | dict | None = None,
    stop_on_success: bool = False,
    stop_on_error: bool = False,
) -> Callable:
    """Build an EventBase subclass from a plain function
    (reference nexus/decorators.py:12-50).

    The function receives ``(spark, previous_result, **pipeline_fields
    matched by parameter name)`` — parameter-name matching mirrors the
    reference's column resolution (task.py:129-196). It may return
    ``(bool, DataFrame)`` or just a DataFrame (success inferred as True).
    """

    def deco(f: Callable) -> type[EventBase]:
        klass_name = name or f.__name__
        sig = inspect.signature(f)

        def process(self, **params):
            kwargs = {}
            for pname in sig.parameters:
                if pname == "spark":
                    kwargs["spark"] = self.spark
                elif pname == "previous_result":
                    kwargs["previous_result"] = self.previous_result
                elif pname in params:
                    kwargs[pname] = params[pname]
            out = f(**kwargs)
            if isinstance(out, tuple):
                return out
            return True, out

        klass = type(
            klass_name,
            (EventBase,),
            {
                "process": process,
                "execution_evaluation_state": evaluation_state,
                "retry_policy": retry_policy,
                "stop_on_success": stop_on_success,
                "stop_on_error": stop_on_error,
                "__doc__": f.__doc__,
                "__wrapped__": staticmethod(f),
            },
        )
        return klass

    return deco(fn) if fn is not None else deco
