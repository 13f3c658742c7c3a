"""SQLiteStore: live round-trip against a real sqlite file — the
reference's canonical store workflow (nexus/backends/stores/
sqlite_store.py:16-313, tests/unittests/stores/test_sqlite_store.py),
exercised un-mocked: CRUD error contract, DSL filter pushdown into SQL,
count, and the DataFrame surface."""

from __future__ import annotations

import sqlite3

import pytest

from event_pipeline_spark.stores.base import ObjectDoesNotExist, ObjectExistError
from event_pipeline_spark.stores.sqlite import SQLiteStore, build_sql_filter


@pytest.fixture()
def store(spark, tmp_path):
    s = SQLiteStore(str(tmp_path / "ledger.db"), spark)
    yield s
    s.close()


def _seed(store):
    store.insert_record("runs", "r1", {"name": "alpha", "n": 10, "ok": True})
    store.insert_record("runs", "r2", {"name": "beta", "n": 25, "ok": False})
    store.insert_record("runs", "r3", {"name": "Gamma", "n": None, "ok": True})


class TestCRUD:
    def test_insert_get_roundtrip_on_real_file(self, store, tmp_path):
        _seed(store)
        got = store.get_record("runs", "r1")
        assert got["id"] == "r1" and got["name"] == "alpha" and got["n"] == 10
        # really on disk: reopen the file with raw sqlite3
        raw = sqlite3.connect(str(tmp_path / "ledger.db"))
        assert raw.execute("SELECT COUNT(*) FROM runs").fetchone()[0] == 3
        raw.close()

    def test_insert_duplicate_raises(self, store):
        _seed(store)
        with pytest.raises(ObjectExistError):
            store.insert_record("runs", "r1", {"name": "dup", "n": 0, "ok": False})

    def test_update_missing_raises_and_present_updates(self, store):
        _seed(store)
        with pytest.raises(ObjectDoesNotExist):
            store.update_record("runs", "nope", {"name": "x", "n": 1, "ok": True})
        store.update_record("runs", "r2", {"name": "beta2", "n": 26, "ok": True})
        assert store.get_record("runs", "r2")["n"] == 26

    def test_delete_contract(self, store):
        _seed(store)
        store.delete_record("runs", "r1")
        assert not store.exists("runs", "r1")
        with pytest.raises(ObjectDoesNotExist):
            store.delete_record("runs", "r1")

    def test_upsert_record(self, store):
        store.upsert_record("runs", "k", {"name": "v1", "n": 1, "ok": True})
        store.upsert_record("runs", "k", {"name": "v2", "n": 2, "ok": True})
        assert store.get_record("runs", "k")["name"] == "v2"
        assert store.count("runs") == 1

    def test_count_missing_schema_raises(self, store):
        with pytest.raises(ObjectDoesNotExist):
            store.count("never_created")

    def test_json_column_roundtrip(self, store):
        store.insert_record("meta", "m1", {"cfg": {"a": 1, "b": [2, 3]}})
        assert store.get_record("meta", "m1")["cfg"] == '{"a": 1, "b": [2, 3]}'

    def test_identifier_injection_rejected(self, store):
        _seed(store)
        with pytest.raises(ValueError, match="identifier"):
            store.insert_record("runs; DROP TABLE runs", "k", {"n": 1})
        with pytest.raises(ValueError, match="identifier"):
            store.filter_record("runs", **{"n; DROP": 1})


class TestFilterPushdown:
    """The DSL WHERE executes inside SQLite (reference
    sqlite_store.py:245-282) — assert both the SQL built and the rows."""

    def test_build_sql_filter_operators(self):
        where, params = build_sql_filter(
            {"name__contains": "al", "n__gte": 5, "ok": True}
        )
        assert where == "name LIKE ? ESCAPE '\\' AND n >= ? AND ok = ?"
        assert params == ["%al%", 5, True]

    def test_in_and_isnull_take_no_misplaced_params(self):
        where, params = build_sql_filter({"n__in": [1, 2, 3], "n__isnull": False})
        assert where == "n IN (?,?,?) AND n IS NOT NULL"
        assert params == [1, 2, 3]

    def test_like_wildcards_escaped(self, store):
        store.insert_record("t", "a", {"s": "100%"})
        store.insert_record("t", "b", {"s": "100x"})
        got = list(store.filter_records("t", s__contains="0%"))
        assert [r["id"] for r in got] == ["a"]

    def test_filter_record_rows(self, store):
        _seed(store)
        ids = sorted(
            r["id"] for r in store.filter_record("runs", n__gte=10).collect()
        )
        assert ids == ["r1", "r2"]
        ids = [r["id"] for r in store.filter_record("runs", name__icontains="GAM").collect()]
        assert ids == ["r3"]

    def test_null_never_matches_except_isnull(self, store):
        _seed(store)  # r3 has n = NULL
        assert {r["id"] for r in store.filter_record("runs", n__lte=10**9).collect()} == {
            "r1",
            "r2",
        }
        assert [r["id"] for r in store.filter_record("runs", n__isnull=True).collect()] == [
            "r3"
        ]

    def test_count_where_pushdown(self, store):
        _seed(store)
        assert store.count_where("runs", ok=True) == 2


class TestDataFrameSurface:
    def test_as_dataframe_schema_and_values(self, store):
        _seed(store)
        df = store.as_dataframe("runs")
        assert dict(df.dtypes) == {
            "id": "string",
            "name": "string",
            "n": "bigint",
            "ok": "boolean",
        }
        rows = {r["id"]: r for r in df.collect()}
        assert rows["r3"]["n"] is None and rows["r2"]["ok"] is False

    def test_write_table_then_filter_roundtrip(self, store, spark):
        df = spark.createDataFrame(
            [("e1", "done", 4), ("e2", "failed", 0), ("e3", "done", 9)],
            "id string, state string, rows int",
        )
        store.write_table("events_ledger", df)
        assert store.count("events_ledger") == 3
        got = [r["id"] for r in store.filter_records("events_ledger", state="done")]
        assert sorted(got) == ["e1", "e3"]

    def test_write_table_overwrite(self, store, spark):
        mk = lambda n: spark.createDataFrame([("x", n)], "id string, v int")  # noqa: E731
        store.write_table("t", mk(1))
        store.write_table("t", mk(2), mode="overwrite")
        assert store.count("t") == 1
        assert store.get_record("t", "x")["v"] == 2

    def test_fetch_cap_enforced(self, spark, tmp_path):
        s = SQLiteStore(str(tmp_path / "cap.db"), spark, fetch_cap=2)
        for i in range(3):
            s.insert_record("big", f"k{i}", {"n": i})
        with pytest.raises(RuntimeError, match="fetch_cap"):
            s.as_dataframe("big")
        s.close()


class TestPipelineLedgerIntegration:
    """The reference's default workflow: a pipeline run persists results
    through the store mixin and reads them back filtered
    (nexus/mixins/backend.py:28-71)."""

    def test_runner_results_land_and_filter_back(self, spark, tmp_path):
        from event_pipeline_spark.core.events import EventBase
        from event_pipeline_spark.plans.dag import build_dag
        from event_pipeline_spark.plans.executor import PipelineRunner

        class SqA(EventBase):
            def process(self, **params):
                return True, self.spark.range(5).withColumnRenamed("id", "n")

        class SqB(EventBase):
            def process(self, **params):
                return True, self.previous_result.where("n >= 3")

        store = SQLiteStore(str(tmp_path / "runs.db"), spark)
        res = PipelineRunner(spark).run(build_dag("SqA |-> SqB"))
        for rec in res.records:
            store.upsert_record(
                "task_results",
                f"{res.run_id}:{','.join(rec.events)}",
                {
                    "run_id": res.run_id,
                    "event": ",".join(rec.events),
                    "ok": bool(rec.success),
                    "rows": rec.result.count() if rec.result is not None else 0,
                },
            )
        assert store.count("task_results") == 2
        ok_events = sorted(
            r["event"] for r in store.filter_records("task_results", ok=True)
        )
        assert ok_events == ["SqA", "SqB"]
        # SqA emitted 5 rows, SqB (n >= 3 over range(5)) emitted 2
        assert store.count_where("task_results", rows__gte=3) == 1
        res.unpersist()
        store.close()
