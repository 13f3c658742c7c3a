"""JSON-file-per-record store (HDFS-store parity) on any Hadoop FS.

The reference's HDFS backend writes one JSON file per record under
``<base>/<schema>/<key>.json`` (nexus/backends/stores/hdfs_store.py:12-142)
and counts by listing ``*.json``. That layout is natively Spark-readable:
``spark.read.json("<base>/<schema>/")`` — which is exactly the DataFrame
surface here (SURVEY §2.4).

Filesystem access goes through Hadoop's ``FileSystem`` API on the JVM, so
the same code serves ``file://``, ``hdfs://``, or ``s3a://`` base paths —
no Python HDFS client needed.

Scale note: one-file-per-record is the reference's layout, kept for
parity; it is fine for run ledgers (thousands of records), wrong for data
(small-files problem). Bulk data belongs in ``ParquetTableStore``.
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


class FileJSONStore(StoreBackend):
    def __init__(self, base_path: str, spark: SparkSession | None = None) -> None:
        self.spark = spark or SparkSession.active()
        self.base_path = base_path.rstrip("/")
        jvm = self.spark._jvm
        jsc = self.spark._jsc
        self._hpath = jvm.org.apache.hadoop.fs.Path  # type: ignore[union-attr]
        self._fs = self._hpath(self.base_path).getFileSystem(  # type: ignore[misc]
            jsc.hadoopConfiguration()  # type: ignore[union-attr]
        )

    def _schema_path(self, schema_name: str):
        return self._hpath(f"{self.base_path}/{schema_name}")

    def _record_path(self, schema_name: str, record_key: str):
        return self._hpath(f"{self.base_path}/{schema_name}/{record_key}.json")

    def _write(self, path, record: Record) -> None:
        out = self._fs.create(path, True)  # overwrite=True
        try:
            out.write(bytearray(json.dumps(record, default=str).encode("utf-8")))
        finally:
            out.close()

    # -- record CRUD ------------------------------------------------------

    def exists(self, schema_name: str, record_key: str) -> bool:
        return bool(self._fs.exists(self._record_path(schema_name, record_key)))

    def insert_record(self, schema_name: str, record_key: str, record: Record) -> None:
        if self.exists(schema_name, record_key):  # hdfs_store.py:52-55
            raise ObjectExistError(
                f"record {record_key!r} already exists in {schema_name!r}"
            )
        self._fs.mkdirs(self._schema_path(schema_name))
        self._write(self._record_path(schema_name, record_key), {**record, "id": record_key})

    def update_record(self, schema_name: str, record_key: str, record: Record) -> None:
        if not self.exists(schema_name, record_key):
            raise ObjectDoesNotExist(record_key)
        self._write(self._record_path(schema_name, record_key), {**record, "id": record_key})

    def delete_record(self, schema_name: str, record_key: str) -> None:
        if not self._fs.delete(self._record_path(schema_name, record_key), False):
            raise ObjectDoesNotExist(record_key)

    def get_record(self, schema_name: str, record_key: str) -> Record:
        path = self._record_path(schema_name, record_key)
        if not self._fs.exists(path):
            raise ObjectDoesNotExist(record_key)
        stream = self._fs.open(path)
        try:
            # py4j can't fill a Python bytearray in place; commons-io (a
            # hadoop-common dependency, always on Spark's classpath) drains
            # the stream JVM-side and returns the bytes once.
            jvm = self.spark._jvm
            text = jvm.org.apache.commons.io.IOUtils.toString(  # type: ignore[union-attr]
                stream, "UTF-8"
            )
            return json.loads(text)
        finally:
            stream.close()

    def count(self, schema_name: str) -> int:
        """List ``*.json`` like the reference (hdfs_store.py:41-47)."""
        path = self._schema_path(schema_name)
        if not self._fs.exists(path):
            return 0
        statuses = self._fs.listStatus(path)
        return sum(
            1 for s in statuses if s.getPath().getName().endswith(".json")
        )

    # -- DataFrame surface -------------------------------------------------

    def as_dataframe(self, schema_name: str) -> DataFrame:
        if not self._fs.exists(self._schema_path(schema_name)):
            raise ObjectDoesNotExist(f"schema {schema_name!r} has no records")
        return self.spark.read.json(f"{self.base_path}/{schema_name}/")
