"""SQLite store: the reference's canonical relational backend, live.

Parity with ``SqliteStoreBackend``
(nexus/backends/stores/sqlite_store.py:16-313): per-schema tables created
on first insert with types inferred from the record
(sqlite_store.py:30-45 ``_map_types``), ``id`` as primary key, CRUD with
the same error contract (insert raises on duplicate, delete raises on
missing), ``count``, and the lookup DSL compiled into a parameterized SQL
WHERE clause that executes *inside* SQLite
(sqlite_store.py:245-282 ``_build_sql_filter``) — real pushdown, not
client-side filtering.

Uses the stdlib ``sqlite3`` driver directly (no JDBC jar needed), so the
whole reference workflow — pipeline results persisted to a SQLite file,
filtered back out with the DSL — round-trips in any environment.

Scale note: SQLite is a driver-local, single-file engine; like the
reference, this backend is for run ledgers and result metadata, not data
tables. The DataFrame surface materializes query results driver-side
(bounded by ``fetch_cap``, default 1M rows) and hands them to Spark via
Arrow; 100 TB-scale state belongs in ``ParquetTableStore``/``JDBCStore``,
which this class mirrors API-for-API so callers can swap backends.
"""

from __future__ import annotations

import json
import re
import sqlite3
import threading
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from event_pipeline_spark.stores.base import (
    ObjectDoesNotExist,
    ObjectExistError,
    Record,
    StoreBackend,
)

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")

# declared SQLite type -> Spark type, for schema-faithful empty reads
_SQL_TO_SPARK: dict[str, T.DataType] = {
    "BOOLEAN": T.BooleanType(),
    "INTEGER": T.LongType(),
    "REAL": T.DoubleType(),
    "VARCHAR": T.StringType(),
    "TEXT": T.StringType(),
    "JSON": T.StringType(),
    "BLOB": T.BinaryType(),
}


def _check_ident(name: str) -> str:
    """Table/column names interpolate into SQL (placeholders can't bind
    identifiers) — reject anything that isn't a bare identifier."""
    if not _IDENT.match(name):
        raise ValueError(f"invalid SQL identifier: {name!r}")
    return name


def build_sql_filter(filter_kwargs: dict[str, Any]) -> tuple[str, list[Any]]:
    """Lookup DSL -> (WHERE clause, parameters), same operator table the
    reference pushes into SQLite (sqlite_store.py:245-282) plus the two
    DSL members it special-cases elsewhere (``exact`` bare form,
    ``isnull``). Values always travel as ``?`` parameters.

    NULL semantics match ``core/lookup.py``: SQL three-valued logic means
    NULL never satisfies any operator except ``isnull`` — identical to
    the Catalyst compilation, so a filter answered by SQLite and one
    answered by Spark agree row-for-row.
    """
    conditions: list[str] = []
    parameters: list[Any] = []
    op_map = {"gt": ">", "gte": ">=", "lt": "<", "lte": "<="}

    for key, value in filter_kwargs.items():
        field, _, operator = key.rpartition("__")
        if not field or operator not in (
            "contains", "icontains", "startswith", "endswith",
            "gt", "gte", "lt", "lte", "in", "isnull", "exact",
        ):
            field, operator = key, "exact"
        field = _check_ident(field)
        if operator == "contains":
            conditions.append(f"{field} LIKE ? ESCAPE '\\'")
            parameters.append(f"%{_escape_like(value)}%")
        elif operator == "icontains":
            conditions.append(f"LOWER({field}) LIKE LOWER(?) ESCAPE '\\'")
            parameters.append(f"%{_escape_like(value)}%")
        elif operator == "startswith":
            conditions.append(f"{field} LIKE ? ESCAPE '\\'")
            parameters.append(f"{_escape_like(value)}%")
        elif operator == "endswith":
            conditions.append(f"{field} LIKE ? ESCAPE '\\'")
            parameters.append(f"%{_escape_like(value)}")
        elif operator in op_map:
            conditions.append(f"{field} {op_map[operator]} ?")
            parameters.append(value)
        elif operator == "in":
            values = list(value)
            placeholders = ",".join("?" for _ in values)
            conditions.append(f"{field} IN ({placeholders})")
            parameters.extend(values)
        elif operator == "isnull":
            conditions.append(f"{field} IS {'NULL' if value else 'NOT NULL'}")
        else:  # exact
            conditions.append(f"{field} = ?")
            parameters.append(value)

    return (" AND ".join(conditions) if conditions else "1"), parameters


def _escape_like(value: Any) -> str:
    """% and _ are LIKE wildcards — a filter value containing them must
    match literally (the reference leaks them; documented divergence)."""
    return str(value).replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")


class SQLiteStore(StoreBackend):
    """Stdlib-sqlite3 store with DSL filter pushdown.

    ``path`` is a filesystem path or ``":memory:"``. One connection,
    serialized by a lock (sqlite is single-writer anyway); safe to call
    from foreachBatch/listener threads.
    """

    def __init__(self, path: str, spark: SparkSession | None = None,
                 *, fetch_cap: int = 1_000_000) -> None:
        self.spark = spark or SparkSession.active()
        self.path = path
        self.fetch_cap = fetch_cap
        self._conn = sqlite3.connect(path, check_same_thread=False)
        self._lock = threading.Lock()

    # -- schema management (reference create_schema, :55-85) -----------

    def _schema_exists(self, schema_name: str) -> bool:
        cur = self._conn.execute(
            "SELECT 1 FROM sqlite_master WHERE type='table' AND name=?",
            (schema_name,),
        )
        return cur.fetchone() is not None

    @staticmethod
    def _map_type(value: Any) -> str:
        # same mapping as the reference (sqlite_store.py:30-45); bool
        # precedes int (bool is an int subclass)
        if isinstance(value, bool):
            return "BOOLEAN"
        if isinstance(value, int):
            return "INTEGER"
        if isinstance(value, float):
            return "REAL"
        if isinstance(value, str):
            return "VARCHAR"
        if isinstance(value, (bytes, bytearray)):
            return "BLOB"
        return "JSON"

    def create_schema(self, schema_name: str, record: Record) -> None:
        _check_ident(schema_name)
        if self._schema_exists(schema_name):
            raise ObjectExistError(f"schema {schema_name!r} already exists")
        fields = ", ".join(
            f"{_check_ident(name)} {self._map_type(value)}"
            for name, value in record.items()
            if name != "id"
        )
        ddl = f"CREATE TABLE {schema_name} (id VARCHAR PRIMARY KEY"
        ddl += f", {fields})" if fields else ")"
        with self._lock:
            self._conn.execute(ddl)
            self._conn.commit()

    def _encode(self, record: Record, record_key: str) -> dict[str, Any]:
        out: dict[str, Any] = {"id": record_key}
        for name, value in record.items():
            if name == "id":
                continue
            _check_ident(name)
            if isinstance(value, (dict, list, tuple)):
                value = json.dumps(value, sort_keys=True)  # JSON columns
            out[name] = value
        return out

    # -- record CRUD ---------------------------------------------------

    def exists(self, schema_name: str, record_key: str) -> bool:
        if not self._schema_exists(_check_ident(schema_name)):
            return False
        cur = self._conn.execute(
            f"SELECT 1 FROM {schema_name} WHERE id = ? LIMIT 1", (record_key,)
        )
        return cur.fetchone() is not None

    def insert_record(self, schema_name: str, record_key: str, record: Record) -> None:
        _check_ident(schema_name)
        if not self._schema_exists(schema_name):
            self.create_schema(schema_name, record)
        row = self._encode(record, record_key)
        cols = ", ".join(row)
        placeholders = ", ".join("?" for _ in row)
        with self._lock:
            try:
                self._conn.execute(
                    f"INSERT INTO {schema_name} ({cols}) VALUES ({placeholders})",
                    list(row.values()),
                )
            except sqlite3.IntegrityError:
                raise ObjectExistError(
                    f"record {record_key!r} already exists in {schema_name!r}"
                ) from None
            self._conn.commit()

    def update_record(self, schema_name: str, record_key: str, record: Record) -> None:
        _check_ident(schema_name)
        row = self._encode(record, record_key)
        assignments = ", ".join(f"{c} = ?" for c in row if c != "id")
        values = [v for c, v in row.items() if c != "id"]
        with self._lock:
            cur = self._conn.execute(
                f"UPDATE {schema_name} SET {assignments} WHERE id = ?",
                values + [record_key],
            )
            if cur.rowcount == 0:
                raise ObjectDoesNotExist(record_key)
            self._conn.commit()

    def delete_record(self, schema_name: str, record_key: str) -> None:
        _check_ident(schema_name)
        with self._lock:
            cur = self._conn.execute(
                f"DELETE FROM {schema_name} WHERE id = ?", (record_key,)
            )
            if cur.rowcount == 0:
                raise ObjectDoesNotExist(record_key)
            self._conn.commit()

    def get_record(self, schema_name: str, record_key: str) -> Record:
        _check_ident(schema_name)
        cur = self._conn.execute(
            f"SELECT * FROM {schema_name} WHERE id = ?", (record_key,)
        )
        row = cur.fetchone()
        if row is None:
            raise ObjectDoesNotExist(record_key)
        return dict(zip([d[0] for d in cur.description], row))

    def count(self, schema_name: str) -> int:
        _check_ident(schema_name)
        if not self._schema_exists(schema_name):
            raise ObjectDoesNotExist(f"schema {schema_name!r} does not exist")
        return self._conn.execute(f"SELECT COUNT(*) FROM {schema_name}").fetchone()[0]

    def count_where(self, schema_name: str, **filter_kwargs: Any) -> int:
        """COUNT with the WHERE pushed into SQLite — no rows move."""
        _check_ident(schema_name)
        where, params = build_sql_filter(filter_kwargs)
        cur = self._conn.execute(
            f"SELECT COUNT(*) FROM {schema_name} WHERE {where}", params
        )
        return cur.fetchone()[0]

    # -- DataFrame surface ---------------------------------------------

    def _spark_schema(self, schema_name: str) -> T.StructType:
        cur = self._conn.execute(f"PRAGMA table_info({_check_ident(schema_name)})")
        fields = [
            T.StructField(
                name, _SQL_TO_SPARK.get((decl or "").upper(), T.StringType()),
                nullable=True,
            )
            for _, name, decl, *_ in cur.fetchall()
        ]
        if not fields:
            raise ObjectDoesNotExist(f"schema {schema_name!r} does not exist")
        return T.StructType(fields)

    def _fetch_df(self, sql: str, params: list[Any], schema_name: str) -> DataFrame:
        spark_schema = self._spark_schema(schema_name)
        pdf = pd.read_sql_query(
            f"{sql} LIMIT {int(self.fetch_cap) + 1}", self._conn, params=params
        )
        if len(pdf) > self.fetch_cap:
            raise RuntimeError(
                f"SQLite result exceeds fetch_cap={self.fetch_cap}; this "
                "backend is for run ledgers — use ParquetTableStore/JDBCStore "
                "for data tables"
            )
        for field in spark_schema.fields:  # pandas reads NULL-int as NaN-float
            if isinstance(field.dataType, T.LongType):
                pdf[field.name] = pdf[field.name].astype("Int64")
            elif isinstance(field.dataType, T.BooleanType):
                pdf[field.name] = pdf[field.name].astype("boolean")
        return self.spark.createDataFrame(pdf, schema=spark_schema)

    def as_dataframe(self, schema_name: str) -> DataFrame:
        return self._fetch_df(
            f"SELECT * FROM {_check_ident(schema_name)}", [], schema_name
        )

    def filter_record(self, schema_name: str, **filter_kwargs: Any) -> DataFrame:
        """Override of the base (Catalyst-side) filter: the WHERE clause
        runs inside SQLite, like the reference's SQL pushdown — only
        matching rows ever cross into Spark."""
        _check_ident(schema_name)
        if not self._schema_exists(schema_name):
            raise ObjectDoesNotExist(f"schema {schema_name!r} does not exist")
        where, params = build_sql_filter(filter_kwargs)
        return self._fetch_df(
            f"SELECT * FROM {schema_name} WHERE {where}", params, schema_name
        )

    def filter_records(self, schema_name: str, **filter_kwargs: Any) -> Iterator[Record]:
        where, params = build_sql_filter(filter_kwargs)
        cur = self._conn.execute(
            f"SELECT * FROM {_check_ident(schema_name)} WHERE {where}", params
        )
        names = [d[0] for d in cur.description]
        for row in cur:
            yield dict(zip(names, row))

    def write_table(self, schema_name: str, df: DataFrame, mode: str = "append") -> None:
        """Land a (small) DataFrame as a SQLite table — the store side of
        a pipeline→ledger sink. Executed via executemany in one
        transaction; bounded by the caller (results/metrics, not data)."""
        _check_ident(schema_name)
        pdf = df.toPandas()
        rows = [
            tuple(None if pd.isna(v) else v for v in rec)
            for rec in pdf.itertuples(index=False, name=None)
        ]
        cols = [_check_ident(c) for c in pdf.columns]
        sample = {
            c: (None if pdf[c].isna().all() else pdf[c].dropna().iloc[0])
            for c in cols
        }
        with self._lock:
            if mode == "overwrite":
                self._conn.execute(f"DROP TABLE IF EXISTS {schema_name}")
                self._conn.commit()
        if not self._schema_exists(schema_name):
            if "id" in sample:
                self.create_schema(schema_name, sample)
            else:
                ddl_cols = ", ".join(
                    f"{c} {self._map_type(sample[c])}" for c in cols
                )
                with self._lock:
                    self._conn.execute(f"CREATE TABLE {schema_name} ({ddl_cols})")
                    self._conn.commit()
        placeholders = ", ".join("?" for _ in cols)
        with self._lock:
            self._conn.executemany(
                f"INSERT INTO {schema_name} ({', '.join(cols)}) "
                f"VALUES ({placeholders})",
                rows,
            )
            self._conn.commit()

    def close(self) -> None:
        self._conn.close()
