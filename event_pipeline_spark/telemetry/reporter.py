"""Telemetry reporting as Spark aggregations.

The reference's reporter iterates Python lists (nexus/telemetry/
reporter.py:38-94) and its batch-pipeline metrics are Python properties
(nexus/pipeline.py:581-625). Here every question is one DataFrame
aggregation over the metrics table, so the same code answers it for one
run or for a persisted ledger of millions:

- ``failed_events``  — status == 'failed' (reporter.py:38-52)
- ``slow_events``    — duration > threshold (reporter.py:54-68)
- ``retry_stats``    — SUM / conditional COUNT / GROUP BY histogram
  (reporter.py:70-94), computed in ONE pass + one small groupBy
- ``execution_metrics`` — success_rate, average_duration, total_duration,
  completion_rate (pipeline.py:595-625), ONE aggregation pass
- ``slow_network_ops`` / ``failed_network_ops`` — latency > t; error IS
  NOT NULL (network.py:119-137)

All are plain filters/aggregates → whole-stage codegen, no UDFs.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _duration():
    # built lazily: Column construction needs an active SparkContext
    return F.col("end_time") - F.col("start_time")


def failed_events(metrics: DataFrame) -> DataFrame:
    return metrics.where(F.col("status") == "failed")


def slow_events(metrics: DataFrame, threshold_seconds: float = 1.0) -> DataFrame:
    return metrics.where(
        F.col("end_time").isNotNull() & (_duration() > threshold_seconds)
    )


def retry_stats(metrics: DataFrame) -> dict[str, Any]:
    """Reference shape (reporter.py:70-94): totals + histogram keyed by
    stringified retry_count, zero-filled up to the max observed."""
    totals = metrics.agg(
        F.coalesce(F.sum("retry_count"), F.lit(0)).alias("total_retries"),
        F.count_if(F.col("retry_count") > 0).alias("events_with_retries"),
        F.coalesce(F.max("retry_count"), F.lit(0)).alias("max_retries"),
    ).first()
    hist_rows = (
        metrics.groupBy("retry_count").count().orderBy("retry_count").collect()
    )
    hist = {r["retry_count"]: r["count"] for r in hist_rows}
    return {
        "total_retries": int(totals["total_retries"]),
        "events_with_retries": int(totals["events_with_retries"]),
        "events_by_retry_count": {
            str(i): int(hist.get(i, 0)) for i in range(int(totals["max_retries"]) + 1)
        },
    }


def execution_metrics(
    metrics: DataFrame, total_pipelines: int | None = None
) -> dict[str, float]:
    """The PipelineExecutionMetrics property set (pipeline.py:581-625) in
    one aggregation pass. ``total_pipelines`` defaults to the row count
    (every tracked run finished or failed)."""
    row = metrics.agg(
        F.count("*").alias("total"),
        F.count_if(F.col("status") == "completed").alias("completed"),
        F.count_if(F.col("status") == "failed").alias("failed"),
        F.avg(
            F.when(F.col("end_time").isNotNull(), _duration())
        ).alias("average_duration"),
        F.min("start_time").alias("t0"),
        F.max("end_time").alias("t1"),
    ).first()
    completed, failed = int(row["completed"]), int(row["failed"])
    total = total_pipelines if total_pipelines is not None else int(row["total"])
    finished = completed + failed
    return {
        "total_pipelines": float(total),
        "completed": float(completed),
        "failed": float(failed),
        "success_rate": (completed / finished * 100.0) if finished else 0.0,
        "average_duration": float(row["average_duration"] or 0.0),
        "total_duration": (
            float(row["t1"] - row["t0"])
            if row["t0"] is not None and row["t1"] is not None
            else 0.0
        ),
        "completion_rate": (finished / total * 100.0) if total else 0.0,
    }


def slow_network_ops(network: DataFrame, threshold_seconds: float = 1.0) -> DataFrame:
    return network.where(
        F.col("end_time").isNotNull() & (_duration() > threshold_seconds)
    )


def failed_network_ops(network: DataFrame) -> DataFrame:
    return network.where(F.col("error").isNotNull())
