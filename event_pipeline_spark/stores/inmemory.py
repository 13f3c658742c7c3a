"""In-memory store: dict-of-dicts + on-demand DataFrame view.

Parity with the reference's ``InMemoryKeyValueStoreBackend``
(nexus/backends/stores/inmemory_store.py:8-83): records live in a
``{schema: {key: record}}`` dict; filtering matches attribute equality
client-side (store.py:19-26 ``_generate_filter_match``). Our DataFrame
surface additionally supports the full lookup DSL.

Scale note: this backend is for tests and tiny run ledgers, like the
reference's. The DataFrame view is rebuilt per call via
``createDataFrame`` — fine for driver-sized data, by design.
"""

from __future__ import annotations

import threading
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from event_pipeline_spark.stores.base import (
    ObjectDoesNotExist,
    ObjectExistError,
    Record,
    StoreBackend,
)


class InMemoryStore(StoreBackend):
    def __init__(self, spark: SparkSession | None = None) -> None:
        self.spark = spark or SparkSession.active()
        self._data: dict[str, dict[str, Record]] = {}
        self._lock = threading.Lock()

    def _table(self, schema_name: str) -> dict[str, Record]:
        return self._data.setdefault(schema_name, {})

    def exists(self, schema_name: str, record_key: str) -> bool:
        return record_key in self._data.get(schema_name, {})

    def insert_record(self, schema_name: str, record_key: str, record: Record) -> None:
        with self._lock:
            table = self._table(schema_name)
            if record_key in table:
                raise ObjectExistError(
                    f"record {record_key!r} already exists in {schema_name!r}"
                )
            table[record_key] = {**record, "id": record_key}

    def update_record(self, schema_name: str, record_key: str, record: Record) -> None:
        with self._lock:
            table = self._table(schema_name)
            if record_key not in table:
                raise ObjectDoesNotExist(record_key)
            table[record_key] = {**record, "id": record_key}

    def delete_record(self, schema_name: str, record_key: str) -> None:
        with self._lock:
            table = self._data.get(schema_name, {})
            if record_key not in table:
                raise ObjectDoesNotExist(record_key)
            del table[record_key]

    def get_record(self, schema_name: str, record_key: str) -> Record:
        try:
            return dict(self._data[schema_name][record_key])
        except KeyError:
            raise ObjectDoesNotExist(record_key) from None

    def count(self, schema_name: str) -> int:
        return len(self._data.get(schema_name, {}))

    def as_dataframe(self, schema_name: str) -> DataFrame:
        records = list(self._data.get(schema_name, {}).values())
        if not records:
            raise ObjectDoesNotExist(f"schema {schema_name!r} is empty or absent")
        return self.spark.createDataFrame(records)  # type: ignore[arg-type]
