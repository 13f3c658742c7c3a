"""Lookup-DSL compiler tests, mirroring reference
tests/unittests/test_result_set.py:34-139 semantics on DataFrames."""

from __future__ import annotations

import pytest

from event_pipeline_spark.core.lookup import LookupError_, where
from event_pipeline_spark.core.result import MultiValueError, ResultSet


@pytest.fixture(scope="module")
def rs(spark):
    rows = [
        ("r1", False, "Fetch", {"name": "alice", "tags": ["a", "b"]}, None, 1.0),
        ("r2", False, "Process", {"name": "bob", "tags": ["b", "c"]}, "t1", 2.0),
        ("r3", True, "SaveToDB", {"name": "carol", "tags": []}, "t2", 3.0),
        ("r4", False, "fetch", {"name": "dave", "tags": ["a"]}, None, 4.0),
    ]
    import datetime as dt

    df = spark.createDataFrame(
        [
            (
                id_,
                err,
                name,
                content,
                task,
                dt.datetime(2024, 1, 1) + dt.timedelta(seconds=t),
            )
            for (id_, err, name, content, task, t) in rows
        ],
        schema="id string, error boolean, event_name string, "
        "content struct<name string, tags array<string>>, "
        "task_id string, creation_time timestamp",
    )
    return ResultSet(df)


def ids(result_set):
    return sorted(r["id"] for r in result_set.df.collect())


def test_exact_and_conjunction(rs):
    assert ids(rs.filter(event_name="Fetch", error=False)) == ["r1"]
    assert ids(rs.filter(event_name__exact="Process")) == ["r2"]


def test_nested_contains(rs):
    # content__tags__contains (reference test_result_set.py:77-86)
    assert ids(rs.filter(content__tags__contains="a")) == ["r1", "r4"]
    assert ids(rs.filter(content__name__startswith="b")) == ["r2"]


def test_comparisons_and_in(rs):
    assert ids(rs.filter(id__in=["r1", "r3"])) == ["r1", "r3"]
    assert ids(rs.filter(task_id__isnull=True)) == ["r1", "r4"]
    assert ids(rs.filter(task_id__isnull=False)) == ["r2", "r3"]


def test_icontains_endswith(rs):
    assert ids(rs.filter(event_name__icontains="FETCH")) == ["r1", "r4"]
    assert ids(rs.filter(event_name__endswith="DB")) == ["r3"]


def test_unknown_field_raises(rs):
    with pytest.raises(LookupError_):
        rs.filter(nope="x").df.collect()


def test_get_exactly_one(rs):
    row = rs.get(id="r2")
    assert row["event_name"] == "Process"
    with pytest.raises(KeyError):
        rs.get(id="missing")
    with pytest.raises(MultiValueError):
        rs.get(error=False)


def test_set_semantics(rs, spark):
    import datetime as dt

    other = ResultSet(
        spark.createDataFrame(
            [("r1",), ("r9",)], schema="id string"
        )
    )
    merged = rs.add(other)
    assert merged.count() == 5  # r1 dedups
    remaining = rs.discard(other)
    assert ids(remaining) == ["r2", "r3", "r4"]
    assert rs.contains_id("r3")
    assert not rs.contains_id("zzz")
    assert len(rs) == 4


def test_first_and_indexing(rs):
    assert rs.first()["id"] == "r1"
    assert rs[2]["id"] == "r3"
    with pytest.raises(IndexError):
        rs[99]


def test_filter_by_event_case_insensitive(rs):
    assert ids(rs.filter_by_event("FETCH")) == ["r1", "r4"]


def test_where_helper(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, "y")], schema="a int, b string"
    )
    assert where(df, a__gt=1).collect()[0]["b"] == "y"
