"""Telemetry (SURVEY §2.6, §2.8): signal bus, metric capture, and
DataFrame-native reporting aggregates."""

from event_pipeline_spark.telemetry.metrics import (
    EVENT_METRICS_SCHEMA,
    NETWORK_METRICS_SCHEMA,
    EventMetrics,
    NetworkMetrics,
    NetworkTelemetry,
    TelemetryLogger,
)
from event_pipeline_spark.telemetry.collector import (
    MetricsCollector,
    TelemetryLoggerFactory,
    register_collectors,
    unregister_collectors,
)
from event_pipeline_spark.telemetry.publisher import (
    CompositePublisher,
    ElasticsearchPublisher,
    GrafanaCloudPublisher,
    MetricsPublisher,
    PrometheusPublisher,
    es_bulk_payload,
    publish_df_distributed,
)
from event_pipeline_spark.telemetry.reporter import (
    execution_metrics,
    failed_events,
    failed_network_ops,
    retry_stats,
    slow_events,
    slow_network_ops,
)
from event_pipeline_spark.telemetry.signals import ALL_SIGNALS, SoftSignal, listener

__all__ = [
    "ALL_SIGNALS",
    "CompositePublisher",
    "ElasticsearchPublisher",
    "EVENT_METRICS_SCHEMA",
    "EventMetrics",
    "GrafanaCloudPublisher",
    "MetricsCollector",
    "MetricsPublisher",
    "PrometheusPublisher",
    "es_bulk_payload",
    "publish_df_distributed",
    "NETWORK_METRICS_SCHEMA",
    "NetworkMetrics",
    "NetworkTelemetry",
    "SoftSignal",
    "TelemetryLogger",
    "TelemetryLoggerFactory",
    "register_collectors",
    "unregister_collectors",
    "execution_metrics",
    "listener",
    "failed_events",
    "failed_network_ops",
    "retry_stats",
    "slow_events",
    "slow_network_ops",
]
