"""Store backends (SURVEY §2.4): per-schema record tables with CRUD +
lookup-DSL filtering, re-expressed on Spark-native storage."""

from event_pipeline_spark.stores.base import (
    ObjectDoesNotExist,
    ObjectExistError,
    Record,
    StoreBackend,
)
from event_pipeline_spark.stores.files import FileJSONStore
from event_pipeline_spark.stores.inmemory import InMemoryStore
from event_pipeline_spark.stores.jdbc import JDBCStore
from event_pipeline_spark.stores.parquet import ParquetTableStore
from event_pipeline_spark.stores.redis import RedisStore
from event_pipeline_spark.stores.sqlite import SQLiteStore

__all__ = [
    "FileJSONStore",
    "InMemoryStore",
    "JDBCStore",
    "ObjectDoesNotExist",
    "ObjectExistError",
    "ParquetTableStore",
    "Record",
    "RedisStore",
    "SQLiteStore",
    "StoreBackend",
]
