"""Parquet table-per-schema store — the bulk/scale path.

The reference persists every ``EventResult`` through a store backend
(nexus/mixins/backend.py:28-71 auto-``save()``); SURVEY §2.4 maps that to
"table per schema on parquet/Delta, MERGE-style upsert". This backend is
that mapping, dependency-free:

- ``write_table(schema, df)`` — bulk append, the hot path. Results are
  written by executors in parallel; nothing flows through the driver.
- ``upsert_table(schema, df, key)`` — MERGE semantics (match on key →
  replace, else insert), implemented as ``old LEFT ANTI new UNION new``
  into a staging directory, then an atomic-ish directory swap via the
  Hadoop ``FileSystem`` rename. On Delta/Iceberg this becomes a real
  ``MERGE INTO``; the API is deliberately identical so swapping the
  format is a one-class change.
- reads are plain ``spark.read.parquet`` — lookup-DSL filters compile to
  Catalyst predicates and arrive at the scan as PushedFilters.

Single-record CRUD exists for contract parity with the reference
(insert-raises-on-duplicate etc., sqlite_store.py:100-160) but each write
rewrites the table — correct, documented, and fine for run ledgers; NOT
for data. At 100 TB you use the bulk methods, partitioned by a time or
hash column via ``partition_by``.
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


class ParquetTableStore(StoreBackend):
    def __init__(
        self,
        root: str,
        spark: SparkSession | None = None,
        partition_by: list[str] | None = None,
    ) -> None:
        self.spark = spark or SparkSession.active()
        self.root = root.rstrip("/")
        self.partition_by = partition_by or []
        jvm = self.spark._jvm
        self._hpath = jvm.org.apache.hadoop.fs.Path  # type: ignore[union-attr]
        self._fs = self._hpath(self.root).getFileSystem(  # type: ignore[misc]
            self.spark._jsc.hadoopConfiguration()  # type: ignore[union-attr]
        )

    def _path(self, schema_name: str) -> str:
        return f"{self.root}/{schema_name}"

    def _exists_table(self, schema_name: str) -> bool:
        return bool(self._fs.exists(self._hpath(self._path(schema_name))))

    # -- bulk surface (the real API at scale) ----------------------------

    def write_table(self, schema_name: str, df: DataFrame, mode: str = "append") -> None:
        writer = df.write.mode(mode)
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.parquet(self._path(schema_name))

    def upsert_table(self, schema_name: str, df: DataFrame, key: str = "id") -> None:
        """MERGE: rows in ``df`` replace same-key rows, others append.

        Unpartitioned tables pay the parquet-without-transaction-log
        floor: one anti-join shuffle (broadcast when ``df`` is small) +
        one full rewrite. Partitioned tables get Delta-style pruning
        instead (``_upsert_partitioned``): only the partitions present in
        ``df`` are read, merged, and swapped — upsert cost scales with the
        touched partitions, not the table. A real MERGE INTO on
        Delta/Iceberg is still the upgrade path; the API is identical.
        """
        if not self._exists_table(schema_name):
            self.write_table(schema_name, df, mode="overwrite")
            return
        if self.partition_by and self._upsert_partitioned(schema_name, df, key):
            return
        current = self._align_partition_types(self.as_dataframe(schema_name), df)
        merged = current.join(df.select(key).distinct(), key, "left_anti").unionByName(df)
        staging = self._path(f"__staging__{schema_name}")
        writer = merged.write.mode("overwrite")
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.parquet(staging)
        target = self._hpath(self._path(schema_name))
        self._fs.delete(target, True)
        self._fs.rename(self._hpath(staging), target)

    def _align_partition_types(self, current: DataFrame, df: DataFrame) -> DataFrame:
        """Partition-column type inference can read ``day=2026-01-01``
        back as DATE while the incoming rows carry STRING; cast the stored
        side to the incoming types so the merge union is well-typed."""
        for c in self.partition_by:
            if c in current.columns and c in df.columns:
                current = current.withColumn(c, F.col(c).cast(df.schema[c].dataType))
        return current

    def _upsert_partitioned(self, schema_name: str, df: DataFrame, key: str) -> bool:
        """Partition-pruned MERGE: read only the partitions ``df`` lands
        in, anti-join + union there, and swap just those partition
        directories. Untouched partitions are never read or rewritten.

        Assumes the partition value is stable per key (the standard
        contract for partitioned upserts — e.g. partitioned by a creation
        date): a key that *moved* partitions would leave its old row
        behind, so keys must not change partition. Falls back to the full
        rewrite (returns False) when a partition value is null (a null
        never satisfies the ``col == lit`` pruning predicate, so the
        null-partition rows could not be merged).
        """
        parts = [tuple(r) for r in df.select(*self.partition_by).distinct().collect()]
        for values in parts:
            for v in values:
                if v is None:
                    return False
        if not parts:
            return True  # empty upsert: nothing to do

        # partition-pruning predicate: OR of per-partition conjunctions
        pred = None
        for values in parts:
            conj = None
            for c, v in zip(self.partition_by, values):
                term = F.col(c) == F.lit(v)
                conj = term if conj is None else conj & term
            pred = conj if pred is None else pred | conj

        current = self._align_partition_types(
            self.as_dataframe(schema_name).where(pred), df
        )
        merged = current.join(df.select(key).distinct(), key, "left_anti").unionByName(df)
        staging = self._path(f"__staging__{schema_name}")
        self._fs.delete(self._hpath(staging), True)
        merged.write.mode("overwrite").partitionBy(*self.partition_by).parquet(staging)

        # Swap the partition directories Spark ACTUALLY wrote in staging.
        # Never reconstruct `c=v` names from Python values: Spark
        # Hive-escapes partition values (space→%20, ':'→%3A, True→'true',
        # decimal/date renderings) differently from str(v), and a
        # reconstructed path that misses would orphan the upserted rows.
        table_root = self._path(schema_name)
        staged = self._staged_partition_dirs(staging)
        if not staged:
            self._fs.delete(self._hpath(staging), True)
            return False  # nothing staged where rows were expected: full rewrite
        for rel in staged:
            src = self._hpath(f"{staging}/{rel}")
            dst = self._hpath(f"{table_root}/{rel}")
            self._fs.delete(dst, True)
            parent = dst.getParent()
            if not self._fs.exists(parent):
                self._fs.mkdirs(parent)
            self._fs.rename(src, dst)
        self._fs.delete(self._hpath(staging), True)
        return True

    def _staged_partition_dirs(self, staging: str) -> list[str]:
        """Relative Hive-escaped paths of partition leaf dirs under
        ``staging``, exactly as the parquet writer named them — one
        entry per ``len(partition_by)``-deep directory chain."""
        rels: list[str] = []

        def walk(path, depth: int, rel: str) -> None:
            for st in self._fs.listStatus(path):
                if not st.isDirectory():
                    continue
                name = st.getPath().getName()
                if name.startswith(("_", ".")):
                    continue
                sub = f"{rel}/{name}" if rel else name
                if depth == 1:
                    rels.append(sub)
                else:
                    walk(st.getPath(), depth - 1, sub)

        walk(self._hpath(staging), len(self.partition_by), "")
        return rels

    def delete_where(self, schema_name: str, **filter_kwargs: Any) -> None:
        """Anti-delete: rewrite the table without matching rows.

        NULL-predicate rows are KEPT: under three-valued logic a bare
        ``~pred`` drops rows where the predicate is NULL, which would
        silently delete every NULL-valued row — lookup.py's contract is
        "NULL never matches any operator", and a destructive op must
        honor it."""
        from event_pipeline_spark.core.lookup import compile_filters

        df = self.as_dataframe(schema_name)
        kept = df.where(
            ~F.coalesce(compile_filters(df.schema, **filter_kwargs), F.lit(False))
        )
        staging = self._path(f"__staging__{schema_name}")
        kept.write.mode("overwrite").parquet(staging)
        target = self._hpath(self._path(schema_name))
        self._fs.delete(target, True)
        self._fs.rename(self._hpath(staging), target)

    # -- record CRUD (contract parity; table-rewrite writes) -------------

    def exists(self, schema_name: str, record_key: str) -> bool:
        if not self._exists_table(schema_name):
            return False
        return (
            self.as_dataframe(schema_name)
            .where(F.col("id") == record_key)
            .limit(1)
            .count()
            > 0
        )

    def insert_record(self, schema_name: str, record_key: str, record: Record) -> None:
        if self.exists(schema_name, record_key):
            raise ObjectExistError(
                f"record {record_key!r} already exists in {schema_name!r}"
            )
        row_df = self.spark.createDataFrame([{**record, "id": record_key}])
        self.write_table(schema_name, row_df, mode="append")

    def update_record(self, schema_name: str, record_key: str, record: Record) -> None:
        if not self.exists(schema_name, record_key):
            raise ObjectDoesNotExist(record_key)
        self.upsert_table(
            schema_name,
            self.spark.createDataFrame([{**record, "id": record_key}]),
        )

    def delete_record(self, schema_name: str, record_key: str) -> None:
        if not self.exists(schema_name, record_key):
            raise ObjectDoesNotExist(record_key)
        self.delete_where(schema_name, id=record_key)

    def get_record(self, schema_name: str, record_key: str) -> Record:
        if not self._exists_table(schema_name):
            raise ObjectDoesNotExist(record_key)
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
        if not self._exists_table(schema_name):
            return 0
        # COUNT(*) over parquet resolves from footer metadata — no data read.
        return self.as_dataframe(schema_name).count()

    # -- DataFrame surface -------------------------------------------------

    def as_dataframe(self, schema_name: str) -> DataFrame:
        if not self._exists_table(schema_name):
            raise ObjectDoesNotExist(f"schema {schema_name!r} has no table")
        return self.spark.read.parquet(self._path(schema_name))
