"""event_pipeline_spark — a PySpark-native analytics/dataflow engine.

A from-scratch re-expression of the capabilities of the public
``nshaibu/event_pipeline`` framework (reference at /root/reference, GPL-3.0)
on Apache Spark: the Pointy-Lang DAG DSL, the Django-style result query DSL,
batch fan-out, result stores, telemetry aggregates — plus Spark-native
relational analytics and LLM-data-pipeline operators (dedup, similarity
search, text analysis) that the reference does not have.

Architecture is idiomatic Spark (DataFrame/SQL/Catalyst/Structured
Streaming), NOT a port of the reference's thread/process execution engine.
"""

from event_pipeline_spark.core.events import (
    EvaluationState,
    EventBase,
    RetryPolicy,
    event,
)
from event_pipeline_spark.core.fields import FileInputDataField, InputDataField
from event_pipeline_spark.core.lookup import compile_filters, where
from event_pipeline_spark.core.result import ResultSet
from event_pipeline_spark.operators.skew import key_skew, salted_agg, salted_join
from event_pipeline_spark.plans.pipeline import BatchPipeline, Pipeline
from event_pipeline_spark.session import get_session, load_tables

__version__ = "0.1.0"

__all__ = [
    "BatchPipeline",
    "EvaluationState",
    "EventBase",
    "FileInputDataField",
    "InputDataField",
    "Pipeline",
    "ResultSet",
    "RetryPolicy",
    "compile_filters",
    "event",
    "get_session",
    "key_skew",
    "load_tables",
    "salted_agg",
    "salted_join",
    "where",
    "__version__",
]
