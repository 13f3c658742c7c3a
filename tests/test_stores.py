"""Store-backend contract tests (reference: tests/unittests/stores/*).

Same CRUD + filter + count contract exercised per backend, as the
reference does for inmemory/sqlite/postgres/redis; here over
InMemoryStore / FileJSONStore / ParquetTableStore, plus the bulk
upsert/pushdown paths the Spark design adds.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from event_pipeline_spark.stores import (
    FileJSONStore,
    InMemoryStore,
    JDBCStore,
    ObjectDoesNotExist,
    ObjectExistError,
    ParquetTableStore,
)

REC1 = {"event_name": "fetch", "error": False, "n": 1}
REC2 = {"event_name": "parse", "error": True, "n": 2}


@pytest.fixture(params=["inmemory", "files", "parquet"])
def store(request, spark, tmp_path):
    if request.param == "inmemory":
        return InMemoryStore(spark)
    if request.param == "files":
        return FileJSONStore(f"file://{tmp_path}/store", spark)
    return ParquetTableStore(f"file://{tmp_path}/ptab", spark)


def test_crud_contract(store):
    assert not store.exists("results", "a")
    assert store.count("results") == 0

    store.insert_record("results", "a", REC1)
    assert store.exists("results", "a")
    with pytest.raises(ObjectExistError):
        store.insert_record("results", "a", REC1)

    store.insert_record("results", "b", REC2)
    assert store.count("results") == 2

    got = store.get_record("results", "a")
    assert got["event_name"] == "fetch" and got["id"] == "a"

    store.update_record("results", "a", {**REC1, "n": 99})
    assert store.get_record("results", "a")["n"] == 99
    with pytest.raises(ObjectDoesNotExist):
        store.update_record("results", "zz", REC1)

    # save() semantics: insert-or-update (mixins/backend.py:151-160)
    store.upsert_record("results", "c", REC1)
    store.upsert_record("results", "c", {**REC1, "n": 7})
    assert store.get_record("results", "c")["n"] == 7
    assert store.count("results") == 3

    store.delete_record("results", "b")
    assert store.count("results") == 2
    with pytest.raises(ObjectDoesNotExist):
        store.get_record("results", "b")
    with pytest.raises(ObjectDoesNotExist):
        store.delete_record("results", "b")


def test_filter_record_lookup_dsl(store):
    store.insert_record("evts", "x", REC1)
    store.insert_record("evts", "y", REC2)
    rows = store.filter_record("evts", error=False).collect()
    assert [r["id"] for r in rows] == ["x"]
    rows = store.filter_record("evts", event_name__startswith="pa", n__gte=2).collect()
    assert [r["id"] for r in rows] == ["y"]
    assert list(store.filter_records("evts", n__in=[1, 2])).__len__() == 2


def test_parquet_bulk_upsert(spark, tmp_path):
    store = ParquetTableStore(f"file://{tmp_path}/bulk", spark)
    df1 = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], "id string, v int"
    )
    store.upsert_table("t", df1)
    assert store.count("t") == 3

    df2 = spark.createDataFrame([("b", 20), ("d", 4)], "id string, v int")
    store.upsert_table("t", df2)
    out = {r["id"]: r["v"] for r in store.as_dataframe("t").collect()}
    assert out == {"a": 1, "b": 20, "c": 3, "d": 4}

    store.delete_where("t", v__gte=4)
    out = {r["id"]: r["v"] for r in store.as_dataframe("t").collect()}
    assert out == {"a": 1, "c": 3}


def test_parquet_filter_pushdown_reaches_scan(spark, tmp_path):
    store = ParquetTableStore(f"file://{tmp_path}/push", spark)
    store.write_table(
        "t", spark.createDataFrame([("a", 1), ("b", 2)], "id string, v int")
    )
    plan = store.filter_record("t", v__gt=1)._sc is not None and (
        store.filter_record("t", v__gt=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "GreaterThan(v,1)" in plan


def test_jdbc_store_builds_options(spark):
    store = JDBCStore(
        "jdbc:postgresql://db:5432/nexus",
        spark,
        user="u",
        password="p",
        driver="org.postgresql.Driver",
        partition_options={
            "partitionColumn": "id",
            "lowerBound": 0,
            "upperBound": 1000,
            "numPartitions": 16,
        },
    )
    opts = store.reader_options("results")
    assert opts["url"].startswith("jdbc:postgresql")
    assert opts["dbtable"] == "results"
    assert opts["numPartitions"] == "16"
    # control-plane mutations validate identifiers before any connection
    with pytest.raises(ValueError, match="identifier"):
        store.update_record("results; DROP TABLE results", "a", {"x": 1})


def test_parquet_partitioned_upsert_prunes(spark, tmp_path):
    """Partitioned MERGE touches only the partitions the new rows land in:
    results are exact AND the untouched partition's files are not
    rewritten (Delta-style pruning on plain parquet)."""
    import os

    root = tmp_path / "ptup"
    store = ParquetTableStore(f"file://{root}", spark, partition_by=["day"])
    df1 = spark.createDataFrame(
        [("a", "d1", 1), ("b", "d1", 2), ("c", "d2", 3)],
        "id string, day string, v int",
    )
    store.upsert_table("t", df1)

    untouched = root / "t" / "day=d2"
    files_before = sorted(os.listdir(untouched))

    df2 = spark.createDataFrame(
        [("a", "d1", 10), ("e", "d1", 5)],
        "id string, day string, v int",
    )
    store.upsert_table("t", df2)

    out = {r["id"]: (r["day"], r["v"]) for r in store.as_dataframe("t").collect()}
    assert out == {
        "a": ("d1", 10), "b": ("d1", 2),
        "c": ("d2", 3), "e": ("d1", 5),
    }
    # the 01-02 partition was neither read-modified nor rewritten
    assert sorted(os.listdir(untouched)) == files_before
    # staging directory cleaned up
    assert not (root / "__staging__t").exists()


def test_parquet_partitioned_upsert_new_partition(spark, tmp_path):
    store = ParquetTableStore(f"file://{tmp_path}/ptnew", spark, partition_by=["day"])
    store.upsert_table(
        "t",
        spark.createDataFrame([("a", "d1", 1)], "id string, day string, v int"),
    )
    store.upsert_table(
        "t",
        spark.createDataFrame([("z", "d3", 9)], "id string, day string, v int"),
    )
    out = {r["id"]: r["v"] for r in store.as_dataframe("t").collect()}
    assert out == {"a": 1, "z": 9}


def test_parquet_partitioned_upsert_null_partition_falls_back(spark, tmp_path):
    """A null partition value can't be path-addressed; the merge falls
    back to the full rewrite and stays correct."""
    store = ParquetTableStore(f"file://{tmp_path}/ptnull", spark, partition_by=["day"])
    store.upsert_table(
        "t",
        spark.createDataFrame(
            [("a", "d1", 1), ("n", None, 2)], "id string, day string, v int"
        ),
    )
    store.upsert_table(
        "t",
        spark.createDataFrame([("n", None, 20)], "id string, day string, v int"),
    )
    out = {r["id"]: r["v"] for r in store.as_dataframe("t").collect()}
    assert out == {"a": 1, "n": 20}


def test_parquet_partitioned_upsert_hive_escaped_values(spark, tmp_path):
    """Partition values Spark Hive-escapes in dir names (space→%20,
    ':'→%3A) — the swap must track the directories Spark actually wrote,
    not a str(v) reconstruction, or upserted rows vanish."""
    store = ParquetTableStore(f"file://{tmp_path}/ptesc", spark, partition_by=["seg"])
    mk = lambda rows: spark.createDataFrame(rows, "id string, seg string, v int")  # noqa: E731
    store.upsert_table("t", mk([("a", "north america", 1), ("b", "tz:utc", 2)]))
    store.upsert_table("t", mk([("a", "north america", 10), ("c", "tz:utc", 3)]))
    out = {r["id"]: (r["seg"], r["v"]) for r in store.as_dataframe("t").collect()}
    assert out == {
        "a": ("north america", 10),
        "b": ("tz:utc", 2),
        "c": ("tz:utc", 3),
    }
    assert not (tmp_path / "ptesc" / "__staging__t").exists()


def test_parquet_partitioned_upsert_bool_partition(spark, tmp_path):
    """Spark writes bool partitions as flag=true/false; Python str(True)
    is 'True' — another reconstruction mismatch that must not lose rows."""
    store = ParquetTableStore(f"file://{tmp_path}/ptbool", spark, partition_by=["flag"])
    mk = lambda rows: spark.createDataFrame(rows, "id string, flag boolean, v int")  # noqa: E731
    store.upsert_table("t", mk([("a", True, 1), ("b", False, 2)]))
    store.upsert_table("t", mk([("a", True, 10)]))
    out = {r["id"]: r["v"] for r in store.as_dataframe("t").collect()}
    assert out == {"a": 10, "b": 2}


def test_parquet_delete_where_keeps_null_predicate_rows(spark, tmp_path):
    """delete_where(value__gt=10) must NOT delete rows whose value is
    NULL: lookup contract says NULL never matches any operator, and under
    three-valued logic a bare ~pred would drop them."""
    store = ParquetTableStore(f"file://{tmp_path}/delnull", spark)
    store.write_table(
        "t",
        spark.createDataFrame(
            [("a", 5), ("b", 20), ("n", None)], "id string, value int"
        ),
        mode="overwrite",
    )
    store.delete_where("t", value__gt=10)
    out = {r["id"] for r in store.as_dataframe("t").collect()}
    assert out == {"a", "n"}


def test_parquet_partitioned_upsert_date_inference(spark, tmp_path):
    """Date-like partition values read back as DATE; the merge aligns
    types and the pruned swap still lands in the same directory."""
    store = ParquetTableStore(f"file://{tmp_path}/ptdate", spark, partition_by=["day"])
    mk = lambda rows: spark.createDataFrame(rows, "id string, day string, v int")  # noqa: E731
    store.upsert_table("t", mk([("a", "2026-01-01", 1), ("c", "2026-01-02", 3)]))
    store.upsert_table("t", mk([("a", "2026-01-01", 10)]))
    out = {r["id"]: r["v"] for r in store.as_dataframe("t").collect()}
    assert out == {"a": 10, "c": 3}
