"""Observed metrics on streams: per-micro-batch aggregates that ride the
query itself (SURVEY §4.3's observe()+listener design, streaming form).

``df.observe(name, aggs...)`` attaches named aggregates to the plan; each
micro-batch reports their values in ``QueryProgressEvent.progress
.observedMetrics[name]`` — telemetry costs zero extra passes and zero
extra state. The batch analogue lives in
``plans/executor.PipelineRunner._observe_row_errors``.

``ObservedMetricsCollector`` accumulates those rows per observation name
(and re-emits them on the SoftSignal bus), so DAG-level conditional
logic — "pause the sink when the batch error rate spikes" — reads a
driver-side dict instead of re-aggregating the stream.
"""

from __future__ import annotations

import time
from collections import defaultdict
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

from event_pipeline_spark.telemetry import signals as S


def observe(df: DataFrame, name: str, *aggs: Column) -> DataFrame:
    """Attach named aggregates to a (streaming or batch) DataFrame."""
    return df.observe(name, *aggs)


def error_count_expr(df: DataFrame, error_col: str = "error") -> Column:
    """Aggregate counting errored rows for either error-column contract:
    ``boolean`` flags (true = error) or the ``map_with_errors`` form
    (``string`` message, null = success). Passing a string column to
    ``count_if`` raises DATATYPE_MISMATCH, so dispatch on the type."""
    from pyspark.sql.types import BooleanType

    col = F.col(error_col)
    if isinstance(df.schema[error_col].dataType, BooleanType):
        return F.count_if(col)
    return F.count(col)  # count() skips nulls: non-null message == error


def observe_errors(df: DataFrame, name: str = "stage", error_col: str = "error") -> DataFrame:
    """The canned row-level health observation: total rows + error rows
    per micro-batch (same two bits the evaluation states consume)."""
    return df.observe(
        name,
        F.count(F.lit(1)).alias("n"),
        error_count_expr(df, error_col).alias("errs"),
    )


def publisher_callback(
    publisher, operation_prefix: str = "stream"
) -> Callable[[str, dict], None]:
    """Bridge observed metrics to the telemetry publisher surface: a
    callback for :class:`ObservedMetricsCollector` that exports each
    micro-batch's observation as a network-shaped metric record
    (``operation = "<prefix>:<observation name>"``) through any
    ``MetricsPublisher`` — Elasticsearch bulk docs, a Grafana HTTP
    push, or a composite fan-out — so a running stream's per-batch
    health lands in the same monitoring backends as the batch
    pipelines', with zero extra query passes."""

    def cb(name: str, metrics: dict) -> None:
        publisher.publish_network_metrics(
            {**metrics, "operation": f"{operation_prefix}:{name}"}
        )

    return cb


class ObservedMetricsCollector(StreamingQueryListener):
    """Accumulates ``observedMetrics`` per observation name across
    micro-batches; optionally invokes ``callback(name, metrics_dict)``
    per report and re-emits on the signal bus
    (``pipeline_metrics_updated``).

    Register/unregister with ``spark.streams.addListener/removeListener``.
    """

    def __init__(self, callback: Callable[[str, dict], None] | None = None):
        self.metrics: dict[str, list[dict]] = defaultdict(list)
        self.callback = callback

    # -- totals ----------------------------------------------------------

    def total(self, name: str, field: str) -> float:
        """Sum one observed field across all reported micro-batches."""
        return sum(m.get(field, 0) or 0 for m in self.metrics.get(name, []))

    # -- listener callbacks ---------------------------------------------

    def onQueryStarted(self, event) -> None:
        pass

    def onQueryProgress(self, event) -> None:
        observed = event.progress.observedMetrics or {}
        for name, row in observed.items():
            m = row.asDict()
            self.metrics[name].append(m)
            if self.callback is not None:
                self.callback(name, m)
            S.pipeline_metrics_updated.emit(
                sender=type(self),
                batch_id=event.progress.batchId,
                metrics={name: m},
                active_count=None,
                completion_rate=None,
                timestamp=time.time(),
            )

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        pass
