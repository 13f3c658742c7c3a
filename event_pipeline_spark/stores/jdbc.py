"""JDBC store: Postgres/SQLite parity via Spark's JDBC source.

The reference's SQL stores (nexus/backends/stores/postgres_store.py:16-226,
sqlite_store.py:16-313) hand-build SQL and push the lookup DSL into WHERE
clauses (sqlite_store.py:245-282, sql_utils.py:4-28). Spark's JDBC source
does the same pushdown through Catalyst (filters land in the remote query)
plus parallel partitioned reads the reference cannot do.

Two planes, matching how a JDBC-backed store is actually used at scale:

- **data plane** (scans, filters, bulk writes) — Spark's JDBC source:
  distributed, partitioned, predicate-pushdown through Catalyst.
- **control plane** (single-record UPDATE/DELETE — per-record semantics
  Spark's scan/append/overwrite source cannot express) — one driver-side
  JDBC connection through the JVM's ``DriverManager``, prepared
  statements, identifier-validated. O(1) record mutations never touch
  executors, exactly like the reference's single-cursor stores.

Live-tested end-to-end against embedded Derby (on Spark's classpath for
the Hive metastore — tests/test_jdbc_store.py); Postgres needs only its
public driver jar on the classpath (none ships in this container).

Scale notes baked into the options:
- ``partitionColumn/lowerBound/upperBound/numPartitions`` → parallel scan
  instead of the reference's single-cursor fetch.
- ``pushDownPredicate`` (default true) → lookup filters run in the DB.
- writes use ``truncate=true`` overwrite to keep DDL, batched inserts.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_pipeline_spark.stores.base import (
    ObjectDoesNotExist,
    ObjectExistError,
    Record,
    StoreBackend,
)
from event_pipeline_spark.stores.sqlite import _check_ident


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
        string_column_type: str | None = "VARCHAR(4096)",
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
        self.string_column_type = string_column_type
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
        # Some dialects map StringType to an incomparable LOB type (Derby:
        # CLOB, which rejects `WHERE col = 'x'`); pin strings to VARCHAR at
        # CREATE time. Ignored when the table already exists.
        if self.string_column_type:
            strings = [
                f.name for f in df.schema.fields if f.dataType.typeName() == "string"
            ]
            if strings:
                opts["createTableColumnTypes"] = ", ".join(
                    f"{c} {self.string_column_type}" for c in strings
                )
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

    # -- control plane: driver-side JDBC connection ------------------------

    @contextmanager
    def _connection(self) -> Iterator[Any]:
        """One short-lived JDBC connection in the driver JVM. The driver
        jar is already on Spark's classpath (it must be, for the data
        plane), so ``DriverManager`` resolves the same driver here."""
        jvm = self.spark._jvm  # noqa: SLF001 — py4j JVM gateway
        if "user" in self.base_options:
            conn = jvm.java.sql.DriverManager.getConnection(
                self.url,
                self.base_options.get("user"),
                self.base_options.get("password", ""),
            )
        else:
            conn = jvm.java.sql.DriverManager.getConnection(self.url)
        try:
            yield conn
        finally:
            conn.close()

    def execute_update(self, sql: str, params: tuple[Any, ...] = ()) -> int:
        """Run one DML statement with bound parameters; returns the
        affected-row count. Values always travel as ``?`` bindings —
        identifiers must already be validated by the caller."""
        with self._connection() as conn:
            st = conn.prepareStatement(sql)
            try:
                for i, v in enumerate(params, start=1):
                    st.setObject(i, v)
                return st.executeUpdate()
            finally:
                st.close()

    def update_record(self, schema_name: str, record_key: str, record: Record) -> None:
        """Single-record UPDATE through the control-plane connection.
        Spark's JDBC writer quotes column identifiers at CREATE time (so
        they keep their case) but passes ``dbtable`` through unquoted —
        mutations mirror that to resolve the same objects."""
        table = _check_ident(schema_name)
        cols = [_check_ident(c) for c in record if c != "id"]
        if not cols:
            return
        sets = ", ".join(f'"{c}" = ?' for c in cols)
        n = self.execute_update(
            f'UPDATE {table} SET {sets} WHERE "id" = ?',
            tuple(record[c] for c in cols) + (record_key,),
        )
        if n == 0:
            raise ObjectDoesNotExist(record_key)

    def delete_record(self, schema_name: str, record_key: str) -> None:
        table = _check_ident(schema_name)
        n = self.execute_update(
            f'DELETE FROM {table} WHERE "id" = ?', (record_key,)
        )
        if n == 0:
            raise ObjectDoesNotExist(record_key)

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
