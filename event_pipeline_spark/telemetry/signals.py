"""SoftSignal bus: in-process pub/sub for pipeline lifecycle events.

Re-expresses the reference's signal system (nexus/signal/signals.py:16-210
``SoftSignal``; the 17 declared lifecycle signals :213-285). Listeners are
held as weak references and pruned when they die, like the reference;
``connect(weak=False)`` opts into a strong reference for lambdas/closures.

``emit`` validates kwargs against ``provide_args`` (the reference builds a
signature and binds, signals.py:120-160) and returns ``[(listener,
response), ...]`` like Django-style senders.

Spark mapping (SURVEY §2.8): these drive driver-side orchestration hooks;
streaming-side lifecycle additionally surfaces through
``StreamingQueryListener`` (see streaming module), which we bridge by
re-emitting onQueryStarted/Progress/Terminated as SoftSignals.
"""

from __future__ import annotations

import threading
import typing
import weakref


class SoftSignal:
    def __init__(self, name: str, provide_args: list[str] | None = None) -> None:
        self.name = name
        args = set(provide_args or [])
        args.update({"sender", "signal"})
        self._provide_args = args
        self._lock = threading.Lock()
        # sender (or None = any) -> set of listener refs
        self._listeners: dict[typing.Any, list] = {}

    def __repr__(self) -> str:
        return f"<SoftSignal: {self.name!r}>"

    @staticmethod
    def _make_ref(listener: typing.Callable, weak: bool):
        if not weak:
            return lambda: listener
        if hasattr(listener, "__self__") and hasattr(listener, "__func__"):
            return weakref.WeakMethod(listener)
        return weakref.ref(listener)

    def connect(
        self,
        listener: typing.Callable,
        sender: typing.Any = None,
        weak: bool = True,
    ) -> None:
        with self._lock:
            self._listeners.setdefault(sender, []).append(
                self._make_ref(listener, weak)
            )

    def disconnect(self, listener: typing.Callable, sender: typing.Any = None) -> None:
        with self._lock:
            refs = self._listeners.get(sender, [])
            self._listeners[sender] = [r for r in refs if r() not in (listener, None)]

    def listeners(self, sender: typing.Any = None) -> list[typing.Callable]:
        out: list[typing.Callable] = []
        with self._lock:
            for key in ({None} | ({sender} if sender is not None else set())):
                kept = []
                for ref in self._listeners.get(key, []):
                    fn = ref()
                    if fn is not None:
                        kept.append(ref)
                        out.append(fn)
                self._listeners[key] = kept  # prune dead refs
        return out

    def emit(self, sender: typing.Any = None, **kwargs: typing.Any) -> list[tuple]:
        unknown = set(kwargs) - self._provide_args
        if unknown:
            raise TypeError(
                f"signal {self.name!r} does not provide {sorted(unknown)};"
                f" declared: {sorted(self._provide_args)}"
            )
        responses = []
        for fn in self.listeners(sender):
            responses.append((fn, fn(sender=sender, signal=self, **kwargs)))
        return responses


def listener(
    signal: "SoftSignal | typing.Iterable[SoftSignal]",
    sender: typing.Any = None,
    weak: bool = True,
):
    """Decorator connecting a callback to one or more signals
    (reference decorators.py:53-93):

        @listener(event_execution_end)
        def on_end(sender, signal, **kwargs): ...

        @listener([pipeline_execution_start, pipeline_execution_end])
        def on_edge(sender, signal, **kwargs): ...

    Pass ``weak=False`` for lambdas/locals that would otherwise be
    garbage-collected out of the weak listener set."""

    def wrapper(func):
        targets = signal if isinstance(signal, (list, tuple)) else [signal]
        for s in targets:
            s.connect(listener=func, sender=sender, weak=weak)
        return func

    return wrapper


# The reference's declared lifecycle signals (signals.py:213-285), same
# names and provide_args.
pipeline_pre_init = SoftSignal("pipeline_pre_init", ["args", "kwargs"])
pipeline_post_init = SoftSignal("pipeline_post_init", ["pipeline"])
pipeline_shutdown = SoftSignal("pipeline_shutdown", ["pipeline", "execution_context"])
pipeline_stop = SoftSignal("pipeline_stop", ["pipeline", "execution_context"])
pipeline_execution_start = SoftSignal("pipeline_execution_start", ["pipeline"])
pipeline_execution_end = SoftSignal("pipeline_execution_end", ["execution_context"])
event_init = SoftSignal("event_init", ["event", "init_kwargs"])
event_execution_init = SoftSignal(
    "event_execution_init",
    ["event", "execution_context", "executor", "call_kwargs"],
)
event_execution_start = SoftSignal(
    "event_execution_start", ["event", "execution_context"]
)
event_execution_end = SoftSignal("event_execution_end", ["event", "execution_context"])
event_execution_retry = SoftSignal(
    "event_execution_retry",
    ["event", "execution_context", "task_id", "backoff", "retry_count", "max_attempts"],
)
event_execution_retry_done = SoftSignal(
    "event_execution_retry_done",
    ["event", "execution_context", "task_id", "max_attempts"],
)
event_execution_cancelled = SoftSignal(
    "event_execution_cancelled", ["task_profiles", "execution_context", "state"]
)
event_execution_aborted = SoftSignal(
    "event_execution_aborted", ["task_profiles", "execution_context", "state"]
)
batch_pipeline_started = SoftSignal(
    "batch_pipeline_started", ["batch", "total_pipelines", "timestamp"]
)
batch_pipeline_finished = SoftSignal(
    "batch_pipeline_finished",
    ["batch", "metrics", "success_rate", "total_duration", "timestamp"],
)
pipeline_metrics_updated = SoftSignal(
    "pipeline_metrics_updated",
    ["batch_id", "metrics", "active_count", "completion_rate", "timestamp"],
)

ALL_SIGNALS: dict[str, SoftSignal] = {
    s.name: s
    for s in [
        pipeline_pre_init, pipeline_post_init, pipeline_shutdown, pipeline_stop,
        pipeline_execution_start, pipeline_execution_end, event_init,
        event_execution_init, event_execution_start, event_execution_end,
        event_execution_retry, event_execution_retry_done,
        event_execution_cancelled, event_execution_aborted,
        batch_pipeline_started, batch_pipeline_finished, pipeline_metrics_updated,
    ]
}
