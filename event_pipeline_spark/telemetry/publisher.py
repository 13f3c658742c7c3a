"""Metrics publishers: export the telemetry ledgers to monitoring
backends (Elasticsearch, Prometheus, Grafana-style HTTP, composite).

Parity with the reference's publisher surface
(/root/reference/nexus/telemetry/publisher.py:40-253): a
``MetricsPublisher`` contract with per-event and per-network-op publish
methods, concrete Elasticsearch / Prometheus / Grafana-shaped backends,
and a ``CompositePublisher`` that fans out with per-backend error
isolation. The reference binds each backend to its client library
(elasticsearch-py, prometheus_client, requests); here each backend is
split into

- a PURE payload formatter in a public wire format — Elasticsearch bulk
  NDJSON, Prometheus text exposition 0.0.4, JSON for the HTTP pusher —
  unit-testable with no sink, and
- a pluggable ``transport`` callable (default: stdlib ``urllib`` POST),
  so no client library is required and tests capture payloads directly.

Spark-first additions: every publisher also accepts the metrics
DataFrames produced by ``TelemetryLogger.to_df`` /
``NetworkTelemetry.to_df`` (driver-side iteration — these ledgers are
control-plane sized), and :func:`publish_df_distributed` exports a LARGE
metrics DataFrame from the executors via ``foreachPartition`` with a
per-partition publisher factory — one transport connection per
partition, no driver collect, the 100 TB-ledger path.
"""

from __future__ import annotations

import json
import logging
import threading
import typing
from bisect import bisect_left
from dataclasses import asdict
from datetime import datetime, timezone
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import DataFrame

from event_pipeline_spark.telemetry.metrics import EventMetrics, NetworkMetrics

logger = logging.getLogger(__name__)

Transport = typing.Callable[[str, bytes, dict], None]
"""(url, body, headers) -> None; raises on failure."""


def urllib_transport(url: str, body: bytes, headers: dict) -> None:
    """Default POST transport over stdlib urllib (no client library)."""
    import urllib.request

    req = urllib.request.Request(url, data=body, headers=headers, method="POST")
    with urllib.request.urlopen(req, timeout=10) as resp:  # noqa: S310
        resp.read()


def _utcnow_iso() -> str:
    return datetime.now(timezone.utc).isoformat()


class MetricsPublisher:
    """Base publishing contract (reference publisher.py:40-72).

    Subclasses implement ``publish_event_metrics`` /
    ``publish_network_metrics`` for one record; the DataFrame forms are
    shared here and accept the ``EVENT_METRICS_SCHEMA`` /
    ``NETWORK_METRICS_SCHEMA`` ledgers row by row.
    """

    def publish_event_metrics(self, metrics: EventMetrics) -> None:
        raise NotImplementedError

    def publish_network_metrics(self, metrics: dict) -> None:
        raise NotImplementedError

    def format_metrics(
        self, metrics: typing.Union[EventMetrics, dict]
    ) -> dict:
        """Standardized export dict: the record's fields plus an ISO
        timestamp, a ``metric_type`` tag, and (for events) the computed
        duration (reference publisher.py:53-72)."""
        if isinstance(metrics, EventMetrics):
            data = asdict(metrics)
            data.update(
                timestamp=_utcnow_iso(),
                metric_type="event",
                duration=metrics.duration(),
            )
        else:
            data = {
                **metrics,
                "timestamp": _utcnow_iso(),
                "metric_type": "network",
            }
        return data

    # -- DataFrame forms (Spark-side ledgers) --------------------------

    def publish_event_metrics_df(self, df: DataFrame) -> int:
        """Publish every row of an event-metrics ledger; returns the
        count. Driver-side iteration — use
        :func:`publish_df_distributed` for ledgers too big to stream
        through one process."""
        n = 0
        for row in df.toLocalIterator():
            self.publish_event_metrics(EventMetrics(**row.asDict()))
            n += 1
        return n

    def publish_network_metrics_df(self, df: DataFrame) -> int:
        n = 0
        for row in df.toLocalIterator():
            d = row.asDict()
            m = NetworkMetrics(**d)
            d["latency"] = m.latency()
            self.publish_network_metrics(d)
            n += 1
        return n


# ---------------------------------------------------------------------------
# Elasticsearch (bulk NDJSON)
# ---------------------------------------------------------------------------


def es_bulk_payload(docs: list[dict], index: str) -> bytes:
    """Elasticsearch `_bulk` NDJSON: an ``{"index": ...}`` action line
    per document, newline-terminated (the public bulk-API framing)."""
    lines = []
    for doc in docs:
        lines.append(json.dumps({"index": {"_index": index}}))
        lines.append(json.dumps(doc, default=str))
    return ("\n".join(lines) + "\n").encode()


class ElasticsearchPublisher(MetricsPublisher):
    """Publishes to Elasticsearch via the public bulk REST API with
    date-suffixed indices (reference publisher.py:75-114 uses
    elasticsearch-py's ``client.index`` per record; batching through
    ``_bulk`` is the at-scale equivalent).

    Publish errors are logged, not raised — telemetry export must never
    fail the pipeline it measures."""

    def __init__(
        self,
        hosts: list[str],
        index_prefix: str = "event-pipeline-metrics",
        transport: Transport = urllib_transport,
    ):
        self.hosts = list(hosts)
        self.index_prefix = index_prefix
        self.transport = transport

    def index_name(self, metric_type: str, when: datetime | None = None) -> str:
        date = (when or datetime.now(timezone.utc)).strftime("%Y.%m.%d")
        return f"{self.index_prefix}-{metric_type}-{date}"

    def _bulk(self, metric_type: str, docs: list[dict]) -> None:
        if not docs:
            return
        body = es_bulk_payload(docs, self.index_name(metric_type))
        url = f"{self.hosts[0].rstrip('/')}/_bulk"
        self.transport(
            url, body, {"Content-Type": "application/x-ndjson"}
        )

    def publish_event_metrics(self, metrics: EventMetrics) -> None:
        try:
            self._bulk("event", [self.format_metrics(metrics)])
        except Exception as e:  # noqa: BLE001 — export must not propagate
            logger.error("Failed to publish event metrics to Elasticsearch: %s", e)

    def publish_network_metrics(self, metrics: dict) -> None:
        try:
            self._bulk("network", [self.format_metrics(metrics)])
        except Exception as e:  # noqa: BLE001
            logger.error("Failed to publish network metrics to Elasticsearch: %s", e)

    def publish_event_metrics_df(self, df: DataFrame) -> int:
        """One bulk request for the whole ledger instead of a request
        per record."""
        docs = [
            self.format_metrics(EventMetrics(**row.asDict()))
            for row in df.toLocalIterator()
        ]
        self._bulk("event", docs)
        return len(docs)


# ---------------------------------------------------------------------------
# Prometheus (text exposition format 0.0.4)
# ---------------------------------------------------------------------------

_DEFAULT_BUCKETS = (
    0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0,
)


def _escape_label(v: str) -> str:
    return (
        str(v).replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")
    )


def _fmt_labels(labels: dict[str, str]) -> str:
    if not labels:
        return ""
    inner = ",".join(
        f'{k}="{_escape_label(v)}"' for k, v in sorted(labels.items())
    )
    return "{" + inner + "}"


class _Counter:
    def __init__(self, name: str, help_: str, label_names: list[str]):
        self.name, self.help, self.label_names = name, help_, label_names
        self._values: dict[tuple, float] = {}

    def inc(self, labels: dict[str, str], amount: float = 1.0) -> None:
        key = tuple(labels[n] for n in self.label_names)
        self._values[key] = self._values.get(key, 0.0) + amount

    def expose(self) -> list[str]:
        out = [f"# HELP {self.name} {self.help}", f"# TYPE {self.name} counter"]
        for key, v in sorted(self._values.items()):
            labels = dict(zip(self.label_names, key))
            out.append(f"{self.name}{_fmt_labels(labels)} {v}")
        return out


class _Histogram:
    """Cumulative-bucket histogram matching Prometheus client semantics:
    every observation lands in all buckets with ``le >= value``, plus
    ``+Inf``, ``_sum`` and ``_count`` series."""

    def __init__(
        self,
        name: str,
        help_: str,
        label_names: list[str],
        buckets: tuple[float, ...] = _DEFAULT_BUCKETS,
    ):
        self.name, self.help, self.label_names = name, help_, label_names
        self.buckets = tuple(sorted(buckets))
        self._counts: dict[tuple, list[int]] = {}
        self._sums: dict[tuple, float] = {}
        self._totals: dict[tuple, int] = {}

    def observe(self, labels: dict[str, str], value: float) -> None:
        key = tuple(labels[n] for n in self.label_names)
        counts = self._counts.setdefault(key, [0] * len(self.buckets))
        for i in range(bisect_left(self.buckets, value), len(self.buckets)):
            counts[i] += 1
        self._sums[key] = self._sums.get(key, 0.0) + value
        self._totals[key] = self._totals.get(key, 0) + 1

    def expose(self) -> list[str]:
        out = [f"# HELP {self.name} {self.help}", f"# TYPE {self.name} histogram"]
        for key in sorted(self._counts):
            labels = dict(zip(self.label_names, key))
            for le, c in zip(self.buckets, self._counts[key]):
                out.append(
                    f"{self.name}_bucket{_fmt_labels({**labels, 'le': repr(le)})} {c}"
                )
            out.append(
                f"{self.name}_bucket{_fmt_labels({**labels, 'le': '+Inf'})} "
                f"{self._totals[key]}"
            )
            out.append(f"{self.name}_sum{_fmt_labels(labels)} {self._sums[key]}")
            out.append(f"{self.name}_count{_fmt_labels(labels)} {self._totals[key]}")
        return out


class PrometheusPublisher(MetricsPublisher):
    """Maintains the reference's four metric families
    (publisher.py:117-180) — event duration histogram, retry counter,
    network byte counters, network latency histogram — and renders the
    public text exposition format. ``start_http_server`` serves
    ``/metrics`` from a stdlib threaded server (no prometheus_client
    dependency); call without it to scrape via :meth:`exposition_text`
    (e.g. for a pushgateway or file-based collection)."""

    def __init__(self, port: int | None = None):
        self._lock = threading.Lock()
        self.event_duration = _Histogram(
            "event_duration_seconds",
            "Duration of event execution",
            ["event_name", "status"],
        )
        self.event_retries = _Counter(
            "event_retries_total", "Number of event retries", ["event_name"]
        )
        self.network_bytes = _Counter(
            "network_bytes_total",
            "Number of bytes sent/received",
            ["operation", "direction"],
        )
        self.network_latency = _Histogram(
            "network_latency_seconds",
            "Network operation latency",
            ["operation"],
        )
        self._server: ThreadingHTTPServer | None = None
        if port is not None:
            self.start_http_server(port)

    def publish_event_metrics(self, metrics: EventMetrics) -> None:
        try:
            with self._lock:
                self.event_duration.observe(
                    {"event_name": metrics.event_name, "status": metrics.status},
                    metrics.duration(),
                )
                if metrics.retry_count > 0:
                    self.event_retries.inc(
                        {"event_name": metrics.event_name}, metrics.retry_count
                    )
        except Exception as e:  # noqa: BLE001
            logger.error("Failed to publish event metrics to Prometheus: %s", e)

    def publish_network_metrics(self, metrics: dict) -> None:
        try:
            op = metrics.get("operation", "unknown")
            with self._lock:
                if metrics.get("bytes_sent"):
                    self.network_bytes.inc(
                        {"operation": op, "direction": "sent"},
                        metrics["bytes_sent"],
                    )
                if metrics.get("bytes_received"):
                    self.network_bytes.inc(
                        {"operation": op, "direction": "received"},
                        metrics["bytes_received"],
                    )
                if "latency" in metrics:
                    self.network_latency.observe(
                        {"operation": op}, metrics["latency"]
                    )
        except Exception as e:  # noqa: BLE001
            logger.error("Failed to publish network metrics to Prometheus: %s", e)

    def exposition_text(self) -> str:
        with self._lock:
            lines = (
                self.event_duration.expose()
                + self.event_retries.expose()
                + self.network_bytes.expose()
                + self.network_latency.expose()
            )
        return "\n".join(lines) + "\n"

    def start_http_server(self, port: int) -> int:
        """Serve ``/metrics``; returns the bound port (pass 0 for an
        ephemeral port in tests)."""
        pub = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 — http.server contract
                body = pub.exposition_text().encode()
                self.send_response(200)
                self.send_header(
                    "Content-Type", "text/plain; version=0.0.4; charset=utf-8"
                )
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *args):  # silence request logging
                pass

        self._server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        threading.Thread(target=self._server.serve_forever, daemon=True).start()
        return self._server.server_address[1]

    def shutdown(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None


# ---------------------------------------------------------------------------
# Grafana-style HTTP push
# ---------------------------------------------------------------------------


class GrafanaCloudPublisher(MetricsPublisher):
    """HTTP JSON pusher shaped like the reference's Grafana Cloud
    adapter (publisher.py:183-226): bearer-token session, per-type
    endpoint ``{base_url}/{org_slug}/{metric_type}``. ``base_url`` is a
    required explicit endpoint here (the reference derives it from a
    region slug; any Grafana-compatible JSON ingest endpoint works)."""

    def __init__(
        self,
        api_key: str,
        org_slug: str,
        base_url: str,
        transport: Transport = urllib_transport,
    ):
        self.headers = {
            "Authorization": f"Bearer {api_key}",
            "Content-Type": "application/json",
        }
        self.org_slug = org_slug
        self.base_url = base_url.rstrip("/")
        self.transport = transport

    def _send(self, metric_type: str, data: dict) -> None:
        url = f"{self.base_url}/{self.org_slug}/{metric_type}"
        self.transport(url, json.dumps(data, default=str).encode(), self.headers)

    def publish_event_metrics(self, metrics: EventMetrics) -> None:
        try:
            self._send("events", self.format_metrics(metrics))
        except Exception as e:  # noqa: BLE001
            logger.error("Failed to publish event metrics to Grafana: %s", e)

    def publish_network_metrics(self, metrics: dict) -> None:
        try:
            self._send("network", self.format_metrics(metrics))
        except Exception as e:  # noqa: BLE001
            logger.error("Failed to publish network metrics to Grafana: %s", e)


# ---------------------------------------------------------------------------
# Composite + distributed export
# ---------------------------------------------------------------------------


class CompositePublisher(MetricsPublisher):
    """Fans out to several backends; one backend's failure never blocks
    the others (reference publisher.py:229-253)."""

    def __init__(self, publishers: list[MetricsPublisher]):
        self.publishers = list(publishers)

    def publish_event_metrics(self, metrics: EventMetrics) -> None:
        for p in self.publishers:
            try:
                p.publish_event_metrics(metrics)
            except Exception as e:  # noqa: BLE001
                logger.error(
                    "Failed to publish event metrics using %s: %s",
                    p.__class__.__name__, e,
                )

    def publish_network_metrics(self, metrics: dict) -> None:
        for p in self.publishers:
            try:
                p.publish_network_metrics(metrics)
            except Exception as e:  # noqa: BLE001
                logger.error(
                    "Failed to publish network metrics using %s: %s",
                    p.__class__.__name__, e,
                )


def publish_df_distributed(
    df: DataFrame,
    publisher_factory: typing.Callable[[], MetricsPublisher],
    kind: str = "event",
) -> None:
    """Export a metrics DataFrame FROM THE EXECUTORS: each partition
    constructs its own publisher (one transport connection / registry
    per partition — publishers hold sockets and locks, so the factory
    ships instead of an instance) and publishes its rows. No driver
    collect; a billion-row metrics ledger exports at scan parallelism.

    ``kind`` is ``"event"`` (rows match EVENT_METRICS_SCHEMA) or
    ``"network"`` (NETWORK_METRICS_SCHEMA).
    """
    if kind not in ("event", "network"):
        raise ValueError(f"kind must be 'event' or 'network', got {kind!r}")

    def _publish_partition(rows: typing.Iterator) -> None:
        pub = publisher_factory()
        for row in rows:
            d = row.asDict()
            if kind == "event":
                pub.publish_event_metrics(EventMetrics(**d))
            else:
                m = NetworkMetrics(**d)
                d["latency"] = m.latency()
                pub.publish_network_metrics(d)

    df.foreachPartition(_publish_partition)
