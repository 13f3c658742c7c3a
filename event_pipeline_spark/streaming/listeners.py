"""StreamingQueryListener → SoftSignal bridge (SURVEY §2.8).

The reference's 17 lifecycle signals are driver-side pub/sub
(nexus/signal/signals.py); Spark's streaming engine reports lifecycle
through ``StreamingQueryListener``. This adapter re-emits engine events
on the same SoftSignal bus so one listener API observes both driver
orchestration and engine progress:

- onQueryStarted   → ``pipeline_execution_start`` (pipeline=event)
- onQueryProgress  → ``pipeline_metrics_updated`` (metrics=progress row)
- onQueryTerminated→ ``pipeline_execution_end`` (execution_context=event)

Register with ``spark.streams.addListener(SignalBridgeListener())``.
"""

from __future__ import annotations

import time

from pyspark.sql.streaming import StreamingQueryListener

from event_pipeline_spark.telemetry import signals as S


class SignalBridgeListener(StreamingQueryListener):
    def onQueryStarted(self, event) -> None:
        S.pipeline_execution_start.emit(sender=type(self), pipeline=event)

    def onQueryProgress(self, event) -> None:
        p = event.progress
        S.pipeline_metrics_updated.emit(
            sender=type(self),
            batch_id=p.batchId,
            metrics={
                "numInputRows": p.numInputRows,
                "inputRowsPerSecond": p.inputRowsPerSecond,
                "processedRowsPerSecond": p.processedRowsPerSecond,
            },
            active_count=None,
            completion_rate=None,
            timestamp=time.time(),
        )

    def onQueryIdle(self, event) -> None:  # Spark 3.5+ callback
        pass

    def onQueryTerminated(self, event) -> None:
        S.pipeline_execution_end.emit(sender=type(self), execution_context=event)
