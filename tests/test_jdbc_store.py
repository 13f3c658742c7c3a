"""JDBCStore: live round-trip against embedded Derby (already on Spark's
classpath for the Hive metastore) — closes the round-2 "no JDBC driver
jar" gate with a real database. Mirrors the reference's SQL-store
contract (nexus/backends/stores/postgres_store.py:16-226, tests at
tests/unittests/stores/test_postgres_store.py): CRUD error semantics,
DSL filter pushdown into the database scan, count, DataFrame surface.
Data plane = Spark JDBC source; control plane (row UPDATE/DELETE) =
driver-side DriverManager connection.
"""

from __future__ import annotations

import pytest

from event_pipeline_spark.stores.base import ObjectDoesNotExist, ObjectExistError
from event_pipeline_spark.stores.jdbc import JDBCStore


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "ledger"
    s = JDBCStore(f"jdbc:derby:{db};create=true", spark)
    s.write_table(
        "runs",
        spark.createDataFrame(
            [
                ("r1", "alpha", 10, True),
                ("r2", "beta", 25, False),
                ("r3", "Gamma", 31, True),
            ],
            "id string, name string, n long, ok boolean",
        ),
    )
    return s


def test_read_back_whole_table(store):
    rows = {r["id"]: r for r in store.as_dataframe("runs").collect()}
    assert set(rows) == {"r1", "r2", "r3"}
    assert rows["r1"]["name"] == "alpha" and rows["r2"]["n"] == 25


def test_exists_get_and_missing_raises(store):
    assert store.exists("runs", "r1") and not store.exists("runs", "zz")
    assert store.get_record("runs", "r2")["name"] == "beta"
    with pytest.raises(ObjectDoesNotExist):
        store.get_record("runs", "zz")


def test_insert_duplicate_raises_and_new_lands(store, spark):
    with pytest.raises(ObjectExistError):
        store.insert_record("runs", "r1", {"name": "dup", "n": 0, "ok": False})
    store.insert_record("runs", "r4", {"name": "delta", "n": 7, "ok": True})
    assert store.get_record("runs", "r4")["n"] == 7


def test_update_delete_through_control_plane(store):
    store.update_record("runs", "r2", {"name": "beta2", "n": 26, "ok": True})
    got = store.get_record("runs", "r2")
    assert got["name"] == "beta2" and got["n"] == 26 and got["ok"] is True
    with pytest.raises(ObjectDoesNotExist):
        store.update_record("runs", "zz", {"name": "x"})

    store.insert_record("runs", "tmp", {"name": "t", "n": 1, "ok": True})
    store.delete_record("runs", "tmp")
    assert not store.exists("runs", "tmp")
    with pytest.raises(ObjectDoesNotExist):
        store.delete_record("runs", "tmp")


def test_upsert_record(store):
    store.upsert_record("runs", "u1", {"name": "v1", "n": 1, "ok": True})
    store.upsert_record("runs", "u1", {"name": "v2", "n": 2, "ok": True})
    assert store.get_record("runs", "u1")["name"] == "v2"


def test_count(store):
    assert store.count("runs") == store.as_dataframe("runs").count() >= 4


def test_identifier_injection_rejected(store):
    with pytest.raises(ValueError, match="identifier"):
        store.update_record('runs"; DROP TABLE runs --', "r1", {"n": 1})
    with pytest.raises(ValueError, match="identifier"):
        store.update_record("runs", "r1", {'n" = 0 --': 1})


def test_lookup_dsl_pushdown_reaches_database_scan(store):
    """filter_record compiles the lookup DSL to a Catalyst predicate that
    lands in the JDBC scan as PushedFilters — the DB evaluates the WHERE
    (reference pushes the same DSL into SQL, sql_utils.py:4-28)."""
    df = store.filter_record("runs", n__gte=20, ok=True)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "JDBCRelation" in plan and "PushedFilters" in plan
    assert "GreaterThanOrEqual(n,20)" in plan and "EqualTo(ok,true)" in plan
    ids = sorted(r["id"] for r in df.collect())
    assert "r1" not in ids and "r3" in ids  # r1: n=10 filtered in the DB


def test_partitioned_parallel_read(store, spark):
    """partitionColumn splits the scan into parallel range queries — the
    data-plane feature the reference's single-cursor stores lack."""
    from event_pipeline_spark.stores.jdbc import JDBCStore

    big = spark.range(1, 1001).selectExpr(
        "CAST(id AS STRING) AS id", "id AS n"
    )
    store.write_table("bulk", big)
    pstore = JDBCStore(
        store.url,
        spark,
        partition_options={
            "partitionColumn": "n",
            "lowerBound": 1,
            "upperBound": 1000,
            "numPartitions": 4,
        },
    )
    df = pstore.as_dataframe("bulk")
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 1000
    assert df.agg({"n": "sum"}).first()[0] == 500_500
