"""Key-value result-store contract (Spark-first re-expression).

Mirrors the reference's ``KeyValueStoreBackendBase``
(nexus/backends/store.py:11-80): per-``schema_name`` tables of records
keyed by id, with ``exists / insert / update / delete / get / filter /
count``. Records here are plain dicts (the reference stores pydantic-mini
model ``__dict__``s — sqlite_store.py:113-118).

Two surfaces per backend:

- **record CRUD** — driver-side, O(1)-ish metadata operations, matching
  the reference's per-record semantics exactly (insert raises on
  duplicate, update raises on missing — sqlite_store.py:100-160).
- **DataFrame surface** — ``as_dataframe(schema)`` exposes the whole
  table as a DataFrame and ``filter_record`` compiles the same lookup
  DSL the reference pushes into SQL (sqlite_store.py:245-282) into a
  Catalyst predicate, so filters reach the scan (PushedFilters) instead
  of being applied client-side. This is the path that scales: at 100 TB
  you never iterate records on the driver; you read the table.

``save()``-style upsert (try insert, fall back to update —
nexus/mixins/backend.py:151-160) is ``upsert_record``.
"""

from __future__ import annotations

import abc
from typing import Any, Iterator

from pyspark.sql import DataFrame


class ObjectExistError(RuntimeError):
    """Insert of a record key that already exists (reference exceptions)."""


class ObjectDoesNotExist(KeyError):
    """Update/get/delete of a record key that is absent."""


Record = dict[str, Any]


class StoreBackend(abc.ABC):
    """Contract shared by all store backends."""

    # -- record CRUD (reference store.py:32-80) -------------------------

    @abc.abstractmethod
    def exists(self, schema_name: str, record_key: str) -> bool: ...

    @abc.abstractmethod
    def insert_record(self, schema_name: str, record_key: str, record: Record) -> None: ...

    @abc.abstractmethod
    def update_record(self, schema_name: str, record_key: str, record: Record) -> None: ...

    @abc.abstractmethod
    def delete_record(self, schema_name: str, record_key: str) -> None: ...

    @abc.abstractmethod
    def get_record(self, schema_name: str, record_key: str) -> Record: ...

    @abc.abstractmethod
    def count(self, schema_name: str) -> int: ...

    def upsert_record(self, schema_name: str, record_key: str, record: Record) -> None:
        """Insert-or-update (``save()``, mixins/backend.py:151-160)."""
        try:
            self.insert_record(schema_name, record_key, record)
        except ObjectExistError:
            self.update_record(schema_name, record_key, record)

    def reload_record(self, schema_name: str, record_key: str) -> Record:
        """Fresh read of a record (reference ``reload_record``)."""
        return self.get_record(schema_name, record_key)

    # -- DataFrame surface ----------------------------------------------

    @abc.abstractmethod
    def as_dataframe(self, schema_name: str) -> DataFrame:
        """The whole schema table as a DataFrame (lazy scan)."""

    def filter_record(self, schema_name: str, **filter_kwargs: Any) -> DataFrame:
        """Lookup-DSL filter compiled to a Catalyst predicate.

        Same DSL the reference pushes into store SQL
        (sqlite_store.py:245-282); here Catalyst owns the pushdown.
        """
        from event_pipeline_spark.core.lookup import compile_filters

        df = self.as_dataframe(schema_name)
        return df.where(compile_filters(df.schema, **filter_kwargs))

    def filter_records(self, schema_name: str, **filter_kwargs: Any) -> Iterator[Record]:
        """Record-iterator convenience matching the reference's return
        shape (list of model instances). Driver-side — small results only."""
        for row in self.filter_record(schema_name, **filter_kwargs).toLocalIterator():
            yield row.asDict(recursive=True)

    def close(self) -> None:  # reference store.py:28-30
        pass
