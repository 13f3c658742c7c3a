"""Metrics publishers: payload formats (ES bulk NDJSON, Prometheus text
exposition, Grafana JSON), composite fan-out with error isolation, and
the distributed foreachPartition export path.

Mirrors the reference's publisher suite
(/root/reference/tests/unittests/test_telemetry_publishers.py) but
asserts the actual wire payloads instead of mocked client calls — the
formats are public, so the tests pin them byte-for-byte where stable.
"""

from __future__ import annotations

import json
import urllib.request
from datetime import datetime, timezone

import pytest

from event_pipeline_spark.telemetry.metrics import EventMetrics
from event_pipeline_spark.telemetry.publisher import (
    CompositePublisher,
    ElasticsearchPublisher,
    GrafanaCloudPublisher,
    MetricsPublisher,
    PrometheusPublisher,
    es_bulk_payload,
    publish_df_distributed,
)


def _event(**kw) -> EventMetrics:
    base = dict(
        event_name="fetch",
        task_id="t1",
        start_time=100.0,
        end_time=101.5,
        status="completed",
        retry_count=0,
    )
    base.update(kw)
    return EventMetrics(**base)


class _Capture:
    """Transport double recording every (url, body, headers) call."""

    def __init__(self, fail: bool = False):
        self.calls: list[tuple[str, bytes, dict]] = []
        self.fail = fail

    def __call__(self, url: str, body: bytes, headers: dict) -> None:
        if self.fail:
            raise ConnectionError("sink down")
        self.calls.append((url, body, headers))


# -- format_metrics ----------------------------------------------------------

def test_format_metrics_event_and_network():
    pub = ElasticsearchPublisher(["http://es:9200"], transport=_Capture())
    ev = pub.format_metrics(_event(retry_count=2))
    assert ev["metric_type"] == "event"
    assert ev["duration"] == pytest.approx(1.5)
    assert ev["event_name"] == "fetch" and ev["retry_count"] == 2
    assert "timestamp" in ev

    net = pub.format_metrics({"operation": "rpc", "bytes_sent": 7})
    assert net["metric_type"] == "network"
    assert net["operation"] == "rpc" and net["bytes_sent"] == 7


# -- Elasticsearch -----------------------------------------------------------

def test_es_bulk_payload_framing():
    body = es_bulk_payload([{"a": 1}, {"b": 2}], "idx-2026.08.14")
    lines = body.decode().splitlines()
    assert len(lines) == 4 and body.endswith(b"\n")
    assert json.loads(lines[0]) == {"index": {"_index": "idx-2026.08.14"}}
    assert json.loads(lines[1]) == {"a": 1}
    assert json.loads(lines[3]) == {"b": 2}


def test_elasticsearch_publisher_posts_bulk_with_dated_index():
    cap = _Capture()
    pub = ElasticsearchPublisher(
        ["http://es:9200/"], index_prefix="pipe", transport=cap
    )
    when = datetime(2026, 8, 14, tzinfo=timezone.utc)
    assert pub.index_name("event", when) == "pipe-event-2026.08.14"

    pub.publish_event_metrics(_event())
    pub.publish_network_metrics({"operation": "rpc", "latency": 0.2})
    assert len(cap.calls) == 2
    url, body, headers = cap.calls[0]
    assert url == "http://es:9200/_bulk"
    assert headers["Content-Type"] == "application/x-ndjson"
    action, doc = body.decode().splitlines()
    assert json.loads(action)["index"]["_index"].startswith("pipe-event-")
    assert json.loads(doc)["event_name"] == "fetch"
    assert json.loads(cap.calls[1][1].decode().splitlines()[0])["index"][
        "_index"
    ].startswith("pipe-network-")


def test_elasticsearch_transport_failure_is_swallowed():
    pub = ElasticsearchPublisher(["http://es:9200"], transport=_Capture(fail=True))
    pub.publish_event_metrics(_event())  # must not raise


# -- Prometheus --------------------------------------------------------------

def test_prometheus_exposition_counters_and_histograms():
    pub = PrometheusPublisher()
    pub.publish_event_metrics(_event(end_time=100.3, retry_count=2))
    pub.publish_event_metrics(_event(task_id="t2", end_time=100.04))
    pub.publish_network_metrics(
        {"operation": "rpc", "bytes_sent": 10, "bytes_received": 3, "latency": 0.02}
    )
    text = pub.exposition_text()
    assert "# TYPE event_duration_seconds histogram" in text
    assert 'le="0.05"' in text and 'le="+Inf"' in text
    assert 'event_retries_total{event_name="fetch"} 2.0' in text
    assert 'network_bytes_total{direction="sent",operation="rpc"} 10.0' in text
    assert 'network_bytes_total{direction="received",operation="rpc"} 3.0' in text
    assert "network_latency_seconds_sum" in text
    # retry counter only increments when retry_count > 0 (one event had 0)
    assert text.count("event_retries_total{") == 1


def test_prometheus_histogram_buckets_are_cumulative():
    pub = PrometheusPublisher()
    for dur in (0.04, 0.3, 0.3):
        pub.publish_event_metrics(_event(end_time=100.0 + dur))
    text = pub.exposition_text()

    def bucket(le: str) -> int:
        for line in text.splitlines():
            if line.startswith("event_duration_seconds_bucket") and f'le="{le}"' in line:
                return int(float(line.rsplit(" ", 1)[1]))
        raise AssertionError(f"no bucket le={le}")

    assert bucket("0.05") == 1
    assert bucket("0.5") == 3
    assert bucket("+Inf") == 3
    assert "event_duration_seconds_count" in text


def test_prometheus_http_server_serves_metrics():
    pub = PrometheusPublisher()
    port = pub.start_http_server(0)
    try:
        pub.publish_event_metrics(_event())
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics") as r:
            assert "version=0.0.4" in r.headers["Content-Type"]
            body = r.read().decode()
        assert "event_duration_seconds_count" in body
    finally:
        pub.shutdown()


# -- Grafana -----------------------------------------------------------------

def test_grafana_publisher_url_headers_and_json():
    cap = _Capture()
    pub = GrafanaCloudPublisher(
        "KEY", "org1", "http://grafana.local/api/v1/metrics/", transport=cap
    )
    pub.publish_event_metrics(_event())
    pub.publish_network_metrics({"operation": "rpc", "latency": 0.1})
    (u1, b1, h1), (u2, b2, _) = cap.calls
    assert u1 == "http://grafana.local/api/v1/metrics/org1/events"
    assert u2 == "http://grafana.local/api/v1/metrics/org1/network"
    assert h1["Authorization"] == "Bearer KEY"
    assert h1["Content-Type"] == "application/json"
    assert json.loads(b1)["metric_type"] == "event"
    assert json.loads(b2)["operation"] == "rpc"


# -- Composite ---------------------------------------------------------------

class _Recorder(MetricsPublisher):
    def __init__(self, fail: bool = False):
        self.events, self.network, self.fail = [], [], fail

    def publish_event_metrics(self, m):
        if self.fail:
            raise RuntimeError("backend down")
        self.events.append(m)

    def publish_network_metrics(self, m):
        if self.fail:
            raise RuntimeError("backend down")
        self.network.append(m)


def test_composite_fans_out_to_all_backends():
    a, b = _Recorder(), _Recorder()
    comp = CompositePublisher([a, b])
    comp.publish_event_metrics(_event())
    comp.publish_network_metrics({"operation": "rpc"})
    assert len(a.events) == len(b.events) == 1
    assert len(a.network) == len(b.network) == 1


def test_composite_isolates_backend_failures():
    bad, good = _Recorder(fail=True), _Recorder()
    comp = CompositePublisher([bad, good])
    comp.publish_event_metrics(_event())  # must not raise
    assert len(good.events) == 1  # the healthy backend still got it


# -- DataFrame + distributed paths ------------------------------------------

def _ledger(spark):
    from event_pipeline_spark.telemetry.metrics import TelemetryLogger

    log = TelemetryLogger()
    for i in range(6):
        log.start_event("ev", f"t{i}", pipeline_id="p1")
        log.end_event(
            f"t{i}", error=None if i % 2 else "boom", pipeline_id="p1"
        )
    return log.to_df(spark)


def test_publish_event_metrics_df_driver_side(spark):
    df = _ledger(spark)
    cap = _Capture()
    pub = ElasticsearchPublisher(["http://es:9200"], transport=cap)
    assert pub.publish_event_metrics_df(df) == 6
    # the ES ledger form batches into ONE bulk request
    assert len(cap.calls) == 1
    lines = cap.calls[0][1].decode().splitlines()
    assert len(lines) == 12
    names = {json.loads(l)["task_id"] for l in lines[1::2]}
    assert names == {f"t{i}" for i in range(6)}


def test_publish_df_distributed_exports_from_executors(spark, tmp_path):
    """foreachPartition export: every partition builds its own publisher
    and writes its rows — all rows exported, no driver collect."""
    out_dir = str(tmp_path)

    class FilePublisher(MetricsPublisher):
        def publish_event_metrics(self, m):
            import os

            with open(
                f"{out_dir}/part-{os.getpid()}-{m.task_id}.json", "w"
            ) as f:
                json.dump(self.format_metrics(m), f)

    df = _ledger(spark).repartition(3)
    publish_df_distributed(df, FilePublisher, kind="event")
    written = sorted(tmp_path.glob("part-*.json"))
    assert len(written) == 6
    docs = [json.loads(p.read_text()) for p in written]
    assert {d["task_id"] for d in docs} == {f"t{i}" for i in range(6)}
    assert all(d["metric_type"] == "event" for d in docs)

    with pytest.raises(ValueError, match="kind"):
        publish_df_distributed(df, FilePublisher, kind="bogus")


def test_observed_stream_metrics_reach_a_publisher(spark, tmp_path):
    """Live bridge: a streaming query's per-batch observed metrics flow
    through ObservedMetricsCollector -> publisher_callback -> an ES
    publisher, landing as bulk NDJSON docs tagged stream:<name>."""
    from event_pipeline_spark.streaming import (
        ObservedMetricsCollector,
        observe_errors,
        publisher_callback,
    )

    src_dir = f"file://{tmp_path}/pub_src"
    spark.createDataFrame(
        [(1, False), (2, True), (3, False)], "id long, error boolean"
    ).coalesce(1).write.parquet(src_dir)

    cap = _Capture()
    pub = ElasticsearchPublisher(["http://es:9200"], transport=cap)
    collector = ObservedMetricsCollector(callback=publisher_callback(pub))
    spark.streams.addListener(collector)
    try:
        stream = spark.readStream.schema("id long, error boolean").parquet(src_dir)
        q = (
            observe_errors(stream, "ingest")
            .writeStream.format("noop")
            .option("checkpointLocation", f"{tmp_path}/pub_ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        deadline = __import__("time").time() + 15
        while not cap.calls and __import__("time").time() < deadline:
            __import__("time").sleep(0.5)  # listener events are async
    finally:
        spark.streams.removeListener(collector)
    assert cap.calls, "no metrics were published"
    docs = [
        json.loads(line)
        for _u, body, _h in cap.calls
        for line in body.decode().splitlines()[1::2]
    ]
    ingest = [d for d in docs if d.get("operation") == "stream:ingest"]
    assert ingest and ingest[0]["metric_type"] == "network"
    assert ingest[0]["n"] == 3 and ingest[0]["errs"] == 1
