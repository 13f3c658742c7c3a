"""Structured Streaming surface (SURVEY §2.8): windows + watermarks,
stateful per-key processing, foreachBatch DAG execution, trigger mapping,
listener→signal bridge."""

from event_pipeline_spark.streaming.listeners import SignalBridgeListener
from event_pipeline_spark.streaming.neardedup import (
    NEAR_DEDUP_SCHEMA,
    streaming_near_dedup,
)
from event_pipeline_spark.streaming.observe import (
    ObservedMetricsCollector,
    publisher_callback,
    observe,
    observe_errors,
)
from event_pipeline_spark.streaming.runner import (
    StreamingPipeline,
    read_parquet_stream,
)
from event_pipeline_spark.streaming.schedule import ScheduleError, make_trigger
from event_pipeline_spark.streaming.scheduler import (
    CronSchedule,
    EmbeddedScheduler,
    get_pipeline_scheduler,
    schedule_pipeline,
)
from event_pipeline_spark.streaming.sinks import (
    idempotent_parquet_writer,
    read_sink,
)
from event_pipeline_spark.streaming.stateful import (
    ROCKSDB_PROVIDER,
    EVENT_SESSION_SCHEMA,
    RUNNING_STATS_SCHEMA,
    SESSION_LOG_SCHEMA,
    TIMER_SCHEMA,
    has_transform_with_state,
    make_event_time_session_processor,
    make_running_stats_processor,
    make_session_log_processor,
    make_timer_processor,
    running_counts,
    stateful_apply,
    transform_with_state,
)
from event_pipeline_spark.streaming.windows import (
    dedup_stream,
    ensure_event_time,
    session,
    sessionize,
    sliding,
    stream_stream_join,
    tumbling,
    with_watermark,
)

__all__ = [
    "ROCKSDB_PROVIDER",
    "EVENT_SESSION_SCHEMA",
    "RUNNING_STATS_SCHEMA",
    "SESSION_LOG_SCHEMA",
    "TIMER_SCHEMA",
    "dedup_stream",
    "idempotent_parquet_writer",
    "read_sink",
    "streaming_near_dedup",
    "CronSchedule",
    "EmbeddedScheduler",
    "NEAR_DEDUP_SCHEMA",
    "ObservedMetricsCollector",
    "publisher_callback",
    "ScheduleError",
    "get_pipeline_scheduler",
    "schedule_pipeline",
    "SignalBridgeListener",
    "StreamingPipeline",
    "observe",
    "observe_errors",
    "has_transform_with_state",
    "make_event_time_session_processor",
    "make_running_stats_processor",
    "make_session_log_processor",
    "make_timer_processor",
    "make_trigger",
    "read_parquet_stream",
    "running_counts",
    "transform_with_state",
    "session",
    "sessionize",
    "sliding",
    "stateful_apply",
    "stream_stream_join",
    "ensure_event_time",
    "tumbling",
    "with_watermark",
]
