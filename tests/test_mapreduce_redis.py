"""Map-with-error-split (§2.6 Hadoop-streaming parity) and RedisStore
with a fake client (reference tests mock the connector the same way)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from event_pipeline_spark.core.mapreduce import map_with_errors, split_errors
from event_pipeline_spark.stores import ObjectDoesNotExist, ObjectExistError
from event_pipeline_spark.stores.redis import RedisStore


def test_map_with_errors_splits(spark):
    df = spark.createDataFrame([(1,), (2,), (0,), (4,)], "v int")

    def ten_over(rec):
        return 10 // rec["v"]

    mapped = map_with_errors(df, ten_over, result_type="int")
    ok, bad = split_errors(mapped)
    assert {r["v"]: r["result"] for r in ok.collect()} == {1: 10, 2: 5, 4: 2}
    errs = bad.collect()
    assert len(errs) == 1 and "ZeroDivisionError" in errs[0]["error"]


def test_map_with_errors_json_encodes(spark):
    df = spark.createDataFrame([("a",)], "s string")
    mapped = map_with_errors(df, lambda rec: {"up": rec["s"].upper()})
    assert mapped.first()["result"] == '{"up": "A"}'


class FakeRedis:
    """redis-py hash-command surface over dicts (reference mocks its
    connector the same way, tests/unittests/stores/test_redis_store.py)."""

    def __init__(self):
        self.h: dict[str, dict[str, bytes]] = {}

    def hexists(self, name, key):
        return key in self.h.get(name, {})

    def hset(self, name, key, value):
        self.h.setdefault(name, {})[key] = value

    def hdel(self, name, key):
        self.h.get(name, {}).pop(key, None)

    def hget(self, name, key):
        return self.h.get(name, {}).get(key)

    def hlen(self, name):
        return len(self.h.get(name, {}))

    def hscan(self, name, cursor=0):
        return 0, dict(self.h.get(name, {}))


def test_redis_store_contract(spark):
    store = RedisStore(client=FakeRedis(), spark=spark)
    store.insert_record("runs", "a", {"event_name": "fetch", "n": 1})
    with pytest.raises(ObjectExistError):
        store.insert_record("runs", "a", {})
    store.insert_record("runs", "b", {"event_name": "parse", "n": 2})
    assert store.count("runs") == 2
    assert store.get_record("runs", "a")["event_name"] == "fetch"

    store.update_record("runs", "a", {"event_name": "fetch", "n": 9})
    assert store.get_record("runs", "a")["n"] == 9
    with pytest.raises(ObjectDoesNotExist):
        store.update_record("runs", "zz", {})

    rows = store.filter_record("runs", event_name__startswith="pa").collect()
    assert [r["id"] for r in rows] == ["b"]

    store.delete_record("runs", "b")
    assert store.count("runs") == 1
    with pytest.raises(ObjectDoesNotExist):
        store.delete_record("runs", "b")
