"""Redis hash-per-schema store (reference parity, client injected).

The reference keeps one Redis hash per schema with pickled values and
filters client-side after a full HSCAN (nexus/backends/stores/
redis_store.py:9-120 — insert raises on existing key :24-38, update
raises on missing :40-53, ``HLEN`` count :20-22, scan-filter :97-120).

This backend takes any object with the redis-py hash command surface
(``hexists/hset/hdel/hget/hlen/hscan``) — a real ``redis.Redis`` when the
package is installed, or an in-memory fake in tests, mirroring the
reference's mocked-connector test strategy. Values are JSON, not pickle:
same layout, minus arbitrary-code-on-load.

Scale note (SURVEY §2.4): Redis is a metadata/run-ledger store here.
``as_dataframe`` pulls the full hash through the driver
(``createDataFrame``) exactly like the reference's full-scan filter —
correct for ledgers, wrong for data; bulk data belongs in
``ParquetTableStore``. A spark-redis DSv2 connector would stream
partitioned HSCANs executor-side; not bundled in this container.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from event_pipeline_spark.stores.base import (
    ObjectDoesNotExist,
    ObjectExistError,
    Record,
    StoreBackend,
)


def _default_client():
    try:
        import redis  # type: ignore[import-not-found]
    except ImportError as exc:  # pragma: no cover — not in this container
        raise NotImplementedError(
            "redis-py is not installed; pass an explicit `client` with the "
            "redis hash-command surface"
        ) from exc
    return redis.Redis()  # pragma: no cover


class RedisStore(StoreBackend):
    def __init__(self, client: Any = None, spark: SparkSession | None = None) -> None:
        self.spark = spark or SparkSession.active()
        self.client = client if client is not None else _default_client()

    @staticmethod
    def _dumps(record: Record, record_key: str) -> bytes:
        return json.dumps({**record, "id": record_key}, default=str).encode("utf-8")

    def exists(self, schema_name: str, record_key: str) -> bool:
        return bool(self.client.hexists(schema_name, record_key))

    def insert_record(self, schema_name: str, record_key: str, record: Record) -> None:
        if self.exists(schema_name, record_key):  # redis_store.py:24-28
            raise ObjectExistError(
                f"record {record_key!r} already exists in {schema_name!r}"
            )
        self.client.hset(schema_name, record_key, self._dumps(record, record_key))

    def update_record(self, schema_name: str, record_key: str, record: Record) -> None:
        if not self.exists(schema_name, record_key):  # redis_store.py:40-44
            raise ObjectDoesNotExist(record_key)
        self.client.hset(schema_name, record_key, self._dumps(record, record_key))

    def delete_record(self, schema_name: str, record_key: str) -> None:
        if not self.exists(schema_name, record_key):
            raise ObjectDoesNotExist(record_key)
        self.client.hdel(schema_name, record_key)

    def get_record(self, schema_name: str, record_key: str) -> Record:
        raw = self.client.hget(schema_name, record_key)
        if raw is None:
            raise ObjectDoesNotExist(record_key)
        return json.loads(raw)

    def count(self, schema_name: str) -> int:
        return int(self.client.hlen(schema_name))  # HLEN, redis_store.py:20-22

    def _scan_all(self, schema_name: str) -> list[Record]:
        """Full HSCAN like the reference's filter path
        (redis_store.py:104-120)."""
        records: list[Record] = []
        cursor = 0
        while True:
            cursor, data = self.client.hscan(schema_name, cursor=cursor)
            records.extend(json.loads(v) for v in data.values())
            if cursor == 0:
                return records

    def as_dataframe(self, schema_name: str) -> DataFrame:
        records = self._scan_all(schema_name)
        if not records:
            raise ObjectDoesNotExist(f"schema {schema_name!r} is empty or absent")
        return self.spark.createDataFrame(records)  # type: ignore[arg-type]
