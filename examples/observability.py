"""Observability end-to-end: signal-driven capture -> reporter
aggregates -> publishers, plus per-batch streaming metrics and live
state-v2 session state.

Run: python examples/observability.py

Demonstrates the round-4 telemetry surface:
1. register_collectors() wires the lifecycle signal bus to the
   TelemetryLogger ledger — the DAG executor never touches telemetry.
2. The ledger's DataFrame feeds the one-pass reporter aggregates AND
   exports through publishers: Prometheus text exposition (scrape it
   live) and Elasticsearch bulk NDJSON (printed here via a capture
   transport; swap in the default urllib transport for a real sink).
3. A streaming query's observed metrics ride the query into the same
   publisher via publisher_callback — zero extra passes.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from event_pipeline_spark.core.events import EventRegistry, event
from event_pipeline_spark.plans.dag import build_dag
from event_pipeline_spark.plans.executor import PipelineRunner
from event_pipeline_spark.session import get_session
from event_pipeline_spark.streaming import (
    ObservedMetricsCollector,
    observe_errors,
    publisher_callback,
)
from event_pipeline_spark.telemetry import (
    ElasticsearchPublisher,
    PrometheusPublisher,
    TelemetryLoggerFactory,
    execution_metrics,
    register_collectors,
    unregister_collectors,
)


@event
def Extract(spark, previous_result):
    return True, spark.range(1000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("v")
    )


@event
def Aggregate(spark, previous_result):
    return True, previous_result.groupBy("k").agg(F.sum("v").alias("total"))


def main() -> None:
    spark = get_session("observability-example")
    EventRegistry.register(Extract)
    EventRegistry.register(Aggregate)

    # 1. signals -> ledger: run a DAG with collectors registered
    TelemetryLoggerFactory.reset()
    register_collectors()
    try:
        PipelineRunner(spark).run(build_dag("Extract |-> Aggregate"))
    finally:
        unregister_collectors()
    logger = TelemetryLoggerFactory.get_logger()
    ledger = logger.to_df(spark)
    print("\n== execution metrics (one aggregation pass) ==")
    print(execution_metrics(ledger))

    # 2a. Prometheus: serve /metrics from the ledger, scrape it live
    prom = PrometheusPublisher()
    prom.publish_event_metrics_df(ledger)
    port = prom.start_http_server(0)
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics") as r:
        print("\n== /metrics (first lines) ==")
        print("\n".join(r.read().decode().splitlines()[:6]))
    prom.shutdown()

    # 2b. Elasticsearch: one bulk NDJSON request for the whole ledger
    captured = []
    es = ElasticsearchPublisher(
        ["http://elasticsearch:9200"],
        transport=lambda url, body, hdrs: captured.append((url, body)),
    )
    n = es.publish_event_metrics_df(ledger)
    print(f"\n== ES bulk: {n} docs -> {captured[0][0]} ==")
    print(captured[0][1].decode().splitlines()[0])

    # 3. streaming observed metrics -> the same publisher surface
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(i, i % 5 == 0) for i in range(100)], "id long, error boolean"
        ).coalesce(1).write.parquet(f"{d}/src")
        collector = ObservedMetricsCollector(
            callback=publisher_callback(es, "example")
        )
        spark.streams.addListener(collector)
        try:
            q = (
                observe_errors(
                    spark.readStream.schema("id long, error boolean")
                    .parquet(f"{d}/src"),
                    "ingest",
                )
                .writeStream.format("noop")
                .option("checkpointLocation", f"{d}/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(60)
            deadline = time.time() + 10
            while len(captured) < 2 and time.time() < deadline:
                time.sleep(0.5)
        finally:
            spark.streams.removeListener(collector)
    print(f"\n== streaming batches exported: {len(captured) - 1} ==")
    print(captured[-1][1].decode().splitlines()[-1])


if __name__ == "__main__":
    main()
