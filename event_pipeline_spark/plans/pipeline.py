"""Pipeline: declared fields + Pointy source → executable DAG.

Mirrors the reference's Pipeline surface (nexus/pipeline.py:150-360):
``InputDataField`` descriptors collected at class creation, Pointy source
from ``Meta.pointy`` / ``Meta.file``, parameter binding + validation at
instantiation, ``start()`` to execute. BatchPipeline (pipeline.py:1002-1316)
re-expresses per-batch process fan-out as sequential sub-runs whose batch
axis is, on Spark, usually better modeled as a partitioned DataFrame —
see the class docstring.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import SparkSession

from event_pipeline_spark.core.fields import EMPTY, InputDataField
from event_pipeline_spark.plans.dag import PipelineNode, build_dag
from event_pipeline_spark.plans.executor import PipelineRunner, RunResult
from event_pipeline_spark.telemetry import signals as S
from event_pipeline_spark.telemetry.metrics import TelemetryLogger


class PipelineMeta(type):
    """Collect field descriptors and locate the Pointy source
    (reference pipeline.py:150-220)."""

    def __new__(mcs, name, bases, ns):
        cls = super().__new__(mcs, name, bases, ns)
        fields: dict[str, InputDataField] = {}
        for base in reversed(cls.__mro__):
            for k, v in vars(base).items():
                if isinstance(v, InputDataField):
                    fields[k] = v
        cls.__pipeline_fields__ = fields

        meta = ns.get("Meta")
        pointy = getattr(meta, "pointy", None) if meta else None
        file = getattr(meta, "file", None) if meta else None
        if pointy is None and file is not None:
            with open(file) as fh:
                pointy = fh.read()
        if pointy is None and name not in ("Pipeline", "BatchPipeline"):
            # <ClassName>.pty discovery (reference pipeline.py:188-216)
            candidate = f"{name}.pty"
            if os.path.exists(candidate):
                with open(candidate) as fh:
                    pointy = fh.read()
        if pointy is None:
            # inherit the parent's source, like the reference's MRO lookup
            pointy = next(
                (getattr(b, "__pointy_source__", None) for b in bases
                 if getattr(b, "__pointy_source__", None)),
                None,
            )
        cls.__pointy_source__ = pointy
        cls.__dag__ = build_dag(pointy) if pointy else None
        return cls


class Pipeline(metaclass=PipelineMeta):
    """Subclass with InputDataField attrs and a ``Meta.pointy`` DSL string."""

    __pipeline_fields__: dict[str, InputDataField]
    __pointy_source__: str | None
    __dag__: PipelineNode | None

    def __init__(self, **kwargs: Any):
        S.pipeline_pre_init.emit(sender=type(self), args=None, kwargs=kwargs)
        for fname, f in self.__pipeline_fields__.items():
            value = kwargs.pop(fname, EMPTY)
            setattr(self, fname, value)  # descriptor validates
        if kwargs:
            raise TypeError(f"unexpected fields: {sorted(kwargs)}")
        self._last_run: RunResult | None = None
        S.pipeline_post_init.emit(sender=type(self), pipeline=self)

    def field_values(self) -> dict[str, Any]:
        return {
            name: getattr(self, name) for name in self.__pipeline_fields__
        }

    def get_dag(self) -> PipelineNode:
        if self.__dag__ is None:
            raise ValueError(
                f"{type(self).__name__} has no Pointy source (Meta.pointy/file)"
            )
        return self.__dag__

    def start(
        self,
        spark: SparkSession,
        force_rerun: bool = False,
        telemetry: "TelemetryLogger | None" = None,
    ) -> RunResult:
        """Execute the DAG. Re-running without force_rerun raises, like the
        reference's EventDone rerun guard (pipeline.py:304-360)."""
        if self._last_run is not None and not force_rerun:
            raise RuntimeError(
                "pipeline already executed; pass force_rerun=True to rerun"
            )
        runner = PipelineRunner(spark, params=self.field_values(), telemetry=telemetry)
        self._last_run = runner.run(self.get_dag())
        return self._last_run

    def stop(self) -> None:
        """Signal-only stop hook (reference pipeline.py stop/shutdown)."""
        S.pipeline_stop.emit(
            sender=type(self), pipeline=self, execution_context=self._last_run
        )

    def shutdown(self) -> None:
        S.pipeline_shutdown.emit(
            sender=type(self), pipeline=self, execution_context=self._last_run
        )

    def explain(self) -> str:
        return self.get_dag().explain()

    def to_dot(self) -> str:
        return self.get_dag().to_dot()


class BatchPipeline(Pipeline):
    """Partitioned fan-out (reference pipeline.py:1002-1316).

    The reference chunks list/file fields with per-field batch processors,
    round-robin co-advances them (exhausted iterators pad with None,
    pipeline.py:1158-1189), and runs one child Pipeline per batch in a
    process pool. Here each batch is a driver-side sub-run; the events
    inside it build Spark plans, so the heavy lifting is distributed
    regardless. When batch elements are rows, prefer ONE DataFrame with
    the batch axis as partitions — this class exists for API/semantic
    parity with driver-side Python collections.
    """

    def execute(self, spark: SparkSession) -> list[RunResult]:
        batch_iters = {}
        for fname, f in self.__pipeline_fields__.items():
            value = getattr(self, fname)
            processor = f.batch_processor
            # <field>_batch method override (reference pipeline.py:1133-1145)
            override = getattr(self, f"{fname}_batch", None)
            if override is not None:
                from event_pipeline_spark.core.fields import validate_batch_processor

                validate_batch_processor(override)
                processor = override
            if processor is not None and value is not None:
                batch_iters[fname] = processor(value, f.batch_size or 1)

        import time as _time

        t0 = _time.time()
        S.batch_pipeline_started.emit(
            sender=type(self), batch=self, total_pipelines=None, timestamp=t0
        )
        if not batch_iters:
            out = [self.start(spark, force_rerun=True)]
            self._emit_batch_finished(out, t0)
            return out

        results: list[RunResult] = []
        static = {
            k: v for k, v in self.field_values().items() if k not in batch_iters
        }
        exhausted: set[str] = set()
        while len(exhausted) < len(batch_iters):
            params = dict(static)
            for fname, it in batch_iters.items():
                if fname in exhausted:
                    params[fname] = None  # None padding (pipeline.py:1158-1189)
                    continue
                try:
                    params[fname] = next(it)
                except StopIteration:
                    exhausted.add(fname)
                    params[fname] = None
            if len(exhausted) == len(batch_iters):
                break
            runner = PipelineRunner(spark, params=params)
            results.append(runner.run(self.get_dag()))
        self._emit_batch_finished(results, t0)
        return results

    def _emit_batch_finished(self, results: list[RunResult], t0: float) -> None:
        import time as _time

        from event_pipeline_spark.plans.executor import RunState

        completed = sum(1 for r in results if r.state is RunState.COMPLETED)
        failed = len(results) - completed
        finished = completed + failed
        S.batch_pipeline_finished.emit(
            sender=type(self),
            batch=self,
            metrics={"total_pipelines": len(results), "completed": completed,
                     "failed": failed},
            success_rate=(completed / finished * 100.0) if finished else 0.0,
            total_duration=_time.time() - t0,
            timestamp=_time.time(),
        )
