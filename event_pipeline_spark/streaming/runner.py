"""Streaming pipeline execution: readStream → DAG per micro-batch → sink.

SURVEY §2.8/§3.3: the reference triggers whole-pipeline runs from a
scheduler (APScheduler, mixins/schedule.py:46-131); the Spark-first
re-expression runs the SAME driver DAG (plans/executor.py) inside
``foreachBatch``, so every micro-batch flows through the Pointy graph —
sequencing, piping, conditionals, retries — with exactly-once sinks when
the terminal write is idempotent (SURVEY §7 hard part (d)).

The micro-batch DataFrame is bound to the pipeline parameter named
``batch_df`` (+ ``batch_id``); events consume it by declaring a parameter
of that name — the reference's parameter-name matching
(nexus/task.py:129-196) applied to streams.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from event_pipeline_spark.plans.dag import PipelineNode, build_dag
from event_pipeline_spark.plans.executor import PipelineRunner, RunResult


class StreamingPipeline:
    """Run a Pointy DAG on every micro-batch of a streaming source."""

    def __init__(
        self,
        dag: PipelineNode | str,
        params: dict[str, Any] | None = None,
        on_batch_done: Callable[[int, RunResult], None] | None = None,
    ) -> None:
        self.dag = build_dag(dag) if isinstance(dag, str) else dag
        self.params = params or {}
        self.on_batch_done = on_batch_done
        self.runs: list[tuple[int, RunResult]] = []

    def _foreach_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        runner = PipelineRunner(
            batch_df.sparkSession,
            params={**self.params, "batch_df": batch_df, "batch_id": batch_id},
        )
        run = runner.run(self.dag)
        self.runs.append((batch_id, run))
        if self.on_batch_done is not None:
            self.on_batch_done(batch_id, run)

    def start(
        self,
        source: DataFrame,
        checkpoint: str,
        trigger: dict[str, Any] | None = None,
        query_name: str | None = None,
    ) -> StreamingQuery:
        """``source`` must be a streaming DataFrame (``spark.readStream``)."""
        writer = (
            source.writeStream.foreachBatch(self._foreach_batch)
            .option("checkpointLocation", checkpoint)
        )
        if query_name:
            writer = writer.queryName(query_name)
        writer = writer.trigger(**(trigger or {"availableNow": True}))
        return writer.start()


def read_parquet_stream(
    spark: SparkSession,
    path: str,
    schema=None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-based streaming source over a parquet directory — the
    streaming analogue of the reference's chunked file reads
    (default_batch_processors.py:28-54). Streaming file sources require
    an explicit schema; pass one or it is inferred from a batch peek."""
    if schema is None:
        schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)
