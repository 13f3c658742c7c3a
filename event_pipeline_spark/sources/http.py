"""HTTP → DataFrame source (SURVEY §2.4).

The reference's ETL example fetches JSON from a URL inside an event with
retry (examples/user_posts_etl/events.py:14-58). The Spark mapping:
driver-side fetch (stdlib urllib — one small request; NOT the data path)
then ``spark.createDataFrame``. For large HTTP-backed datasets the right
design is a manifest of URLs fanned out via ``mapInPandas`` so each
executor fetches its shard — ``fetch_shards`` below — keeping the driver
out of the data path at 100 TB.
"""

from __future__ import annotations

import json
import urllib.request
from typing import Any, Callable, Iterator

from pyspark.sql import DataFrame, SparkSession

from event_pipeline_spark.core.events import RetryPolicy


def _get(url: str, timeout: float) -> bytes:
    with urllib.request.urlopen(url, timeout=timeout) as resp:  # noqa: S310
        return resp.read()


def fetch_json(
    spark: SparkSession,
    url: str,
    schema: Any = None,
    *,
    timeout: float = 30.0,
    retry_policy: RetryPolicy | None = None,
) -> DataFrame:
    """GET a JSON document (object-per-element array or one object) and
    return it as a DataFrame, retrying with the event retry engine's
    backoff (reference events.py:31-50 retries transport errors)."""
    import time

    policy = retry_policy or RetryPolicy(max_attempts=3, backoff_factor=0.1)
    attempt, last = 0, None
    while attempt < policy.max_attempts:
        attempt += 1
        backoff = policy.backoff_time(attempt)
        if backoff:
            time.sleep(backoff)
        try:
            payload = json.loads(_get(url, timeout))
            break
        except Exception as exc:  # noqa: BLE001 — policy decides
            if not policy.retryable(exc):
                raise
            last = exc
    else:
        raise last or RuntimeError("no attempt ran")

    rows = payload if isinstance(payload, list) else [payload]
    if schema is not None:
        return spark.createDataFrame(rows, schema=schema)
    return spark.createDataFrame(rows)


def fetch_shards(
    url_df: DataFrame,
    parse: Callable[[bytes], list[dict]],
    output_schema: str,
    *,
    url_col: str = "url",
    timeout: float = 30.0,
) -> DataFrame:
    """Executor-side fan-out fetch: one HTTP GET per row of ``url_df``,
    parsed to rows by ``parse``. The scale path for HTTP ingestion — the
    driver only holds the manifest."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out: list[dict] = []
            for url in pdf[url_col]:
                out.extend(parse(_get(url, timeout)))
            yield pd.DataFrame(out)

    return url_df.mapInPandas(run, schema=output_schema)


# ---------------------------------------------------------------------------
# First-class connector: Python DataSource (Spark 4 DataSource API)
# ---------------------------------------------------------------------------


def _rows_from_json(payload: bytes, field_names: list[str]):
    """JSON array-of-objects (or single object) → tuples in field order."""
    data = json.loads(payload)
    if not isinstance(data, list):
        data = [data]
    for obj in data:
        yield tuple(obj.get(f) for f in field_names)


try:  # pragma: no cover — import guard exercised via HAS_DATASOURCE_API
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )

    HAS_DATASOURCE_API = True

    class HttpJsonDataSource(DataSource):
        """``spark.read.format("http_json")`` — the reference's HTTP JSON
        ingestion (examples/user_posts_etl/events.py:14-58) as a real
        Spark connector instead of a driver-side fetch.

        Options:
        - ``urls``: newline- or ``;``-separated URL manifest. Each URL
          becomes one InputPartition, so N urls fetch on N cores —
          executors do the I/O, the driver only plans. This is the shape
          that scales to a million-object HTTP/object-store manifest.
        - ``timeout``: per-request seconds (default 30).

        A user schema is required (``.schema(...)``) — HTTP bodies are
        not self-describing enough to infer without a fetch, and a
        planning-time fetch from the driver is exactly what this
        connector exists to avoid.
        """

        @classmethod
        def name(cls) -> str:
            return "http_json"

        def schema(self):
            raise ValueError(
                "http_json requires an explicit .schema(...): the "
                "connector does not fetch at planning time to infer one"
            )

        def reader(self, schema) -> "HttpJsonReader":
            return HttpJsonReader(schema, self.options)

        def simpleStreamReader(self, schema) -> "HttpJsonStreamReader":
            return HttpJsonStreamReader(schema, self.options)

    class HttpJsonReader(DataSourceReader):
        def __init__(self, schema, options) -> None:
            self.field_names = [f.name for f in schema.fields]
            raw = options.get("urls") or options.get("url") or ""
            self.urls = [
                u.strip()
                for u in raw.replace("\n", ";").split(";")
                if u.strip()
            ]
            if not self.urls:
                raise ValueError("http_json: set option 'urls'")
            self.timeout = float(options.get("timeout", "30"))

        def partitions(self) -> list[InputPartition]:
            return [InputPartition(u) for u in self.urls]

        def read(self, partition: InputPartition):
            url = partition.value
            yield from _rows_from_json(
                _get(url, self.timeout), self.field_names
            )

    class HttpJsonStreamReader(SimpleDataSourceStreamReader):
        """Polling micro-batch reader: each trigger GETs the manifest
        URLs once and emits their rows, advancing an epoch offset.

        The reference's closest construct is cron-scheduled re-ingestion
        (/root/reference/nexus/mixins/schedule.py:79-131); here the
        poll rides Structured Streaming's offset log, so restarts resume
        from the recorded epoch and downstream gets exactly-once
        micro-batches. Options:

        - ``urls`` / ``timeout``: as the batch reader.
        - ``max_epochs``: stop emitting after N polls (0 = unbounded) —
          lets availableNow/terminating tests drain deterministically.
        """

        def __init__(self, schema, options) -> None:
            self.field_names = [f.name for f in schema.fields]
            raw = options.get("urls") or options.get("url") or ""
            self.urls = [
                u.strip()
                for u in raw.replace("\n", ";").split(";")
                if u.strip()
            ]
            if not self.urls:
                raise ValueError("http_json: set option 'urls'")
            self.timeout = float(options.get("timeout", "30"))
            self.max_epochs = int(options.get("max_epochs", "0"))

        def initialOffset(self) -> dict:
            return {"epoch": 0}

        def read(self, start: dict):
            epoch = start["epoch"]
            if self.max_epochs and epoch >= self.max_epochs:
                return iter(()), start
            rows = [
                row
                for url in self.urls
                for row in _rows_from_json(
                    _get(url, self.timeout), self.field_names
                )
            ]
            return iter(rows), {"epoch": epoch + 1}

        def commit(self, end: dict) -> None:
            pass  # nothing to clean up; HTTP has no consumable offsets

    def register_http_json(spark: SparkSession) -> None:
        """Register the connector once per session (idempotent)."""
        spark.dataSource.register(HttpJsonDataSource)

except ImportError:  # pyspark < 4: fall back to fetch_json/fetch_shards
    HAS_DATASOURCE_API = False

    def register_http_json(spark: SparkSession) -> None:
        raise NotImplementedError(
            "pyspark.sql.datasource API not available in this pyspark"
        )
