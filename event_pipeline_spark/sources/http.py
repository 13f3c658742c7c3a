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
