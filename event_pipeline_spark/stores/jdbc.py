"""JDBC store: Postgres/SQLite parity via Spark's JDBC source.

The reference's SQL stores (nexus/backends/stores/postgres_store.py:16-226,
sqlite_store.py:16-313) hand-build SQL and push the lookup DSL into WHERE
clauses (sqlite_store.py:245-282, sql_utils.py:4-28). Spark's JDBC source
does the same pushdown through Catalyst (filters land in the remote query)
plus parallel partitioned reads the reference cannot do.

Untestable in this container (no JDBC driver jar / live DB), so the class
only *builds* reader/writer configs; ``as_dataframe`` issues the actual
``spark.read.format("jdbc")`` call. Config construction is unit-tested;
the network path is exercised only when a driver is on the classpath.

Scale notes baked into the options:
- ``partitionColumn/lowerBound/upperBound/numPartitions`` → parallel scan
  instead of the reference's single-cursor fetch.
- ``pushDownPredicate`` (default true) → lookup filters run in the DB.
- writes use ``truncate=true`` overwrite to keep DDL, batched inserts.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_pipeline_spark.stores.base import (
    ObjectDoesNotExist,
    ObjectExistError,
    Record,
    StoreBackend,
)


class JDBCStore(StoreBackend):
    def __init__(
        self,
        url: str,
        spark: SparkSession | None = None,
        *,
        user: str | None = None,
        password: str | None = None,
        driver: str | None = None,
        fetchsize: int = 10_000,
        batchsize: int = 10_000,
        partition_options: dict[str, Any] | None = None,
    ) -> None:
        self.spark = spark or SparkSession.active()
        self.url = url
        self.base_options: dict[str, str] = {"url": url, "fetchsize": str(fetchsize)}
        if user:
            self.base_options["user"] = user
        if password:
            self.base_options["password"] = password
        if driver:
            self.base_options["driver"] = driver
        self.write_options = {**self.base_options, "batchsize": str(batchsize)}
        self.partition_options = {
            k: str(v) for k, v in (partition_options or {}).items()
        }

    def reader_options(self, schema_name: str) -> dict[str, str]:
        return {**self.base_options, **self.partition_options, "dbtable": schema_name}

    # -- DataFrame surface -------------------------------------------------

    def as_dataframe(self, schema_name: str) -> DataFrame:
        return self.spark.read.format("jdbc").options(
            **self.reader_options(schema_name)
        ).load()

    def write_table(self, schema_name: str, df: DataFrame, mode: str = "append") -> None:
        opts = {**self.write_options, "dbtable": schema_name}
        if mode == "overwrite":
            opts["truncate"] = "true"
        df.write.format("jdbc").options(**opts).mode(mode).save()

    # -- record CRUD -------------------------------------------------------

    def exists(self, schema_name: str, record_key: str) -> bool:
        return (
            self.as_dataframe(schema_name)
            .where(F.col("id") == record_key)
            .limit(1)
            .count()
            > 0
        )

    def insert_record(self, schema_name: str, record_key: str, record: Record) -> None:
        if self.exists(schema_name, record_key):
            raise ObjectExistError(record_key)
        self.write_table(
            schema_name, self.spark.createDataFrame([{**record, "id": record_key}])
        )

    def update_record(self, schema_name: str, record_key: str, record: Record) -> None:
        raise NotImplementedError(
            "row UPDATE requires a direct DB connection; Spark JDBC is "
            "scan/append/overwrite only — use upsert_table on a staging "
            "table + MERGE in the database, or the ParquetTableStore"
        )

    def delete_record(self, schema_name: str, record_key: str) -> None:
        raise NotImplementedError(
            "row DELETE requires a direct DB connection (see update_record)"
        )

    def get_record(self, schema_name: str, record_key: str) -> Record:
        rows = (
            self.as_dataframe(schema_name)
            .where(F.col("id") == record_key)
            .limit(1)
            .collect()
        )
        if not rows:
            raise ObjectDoesNotExist(record_key)
        return rows[0].asDict(recursive=True)

    def count(self, schema_name: str) -> int:
        return self.as_dataframe(schema_name).count()
