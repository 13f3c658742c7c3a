"""Property-based tests for the lookup-DSL compiler: the Spark predicate
must agree with a plain-Python evaluation of the same lookup on random
data (hypothesis drives the rows AND the filters)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from event_pipeline_spark.core.lookup import where

NAMES = st.sampled_from(["alpha", "beta", "gamma", "Delta", ""])
INTS = st.integers(min_value=-100, max_value=100)


@st.composite
def rows(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    return [
        {
            "name": draw(st.one_of(st.none(), NAMES)),
            "v": draw(st.one_of(st.none(), INTS)),
        }
        for _ in range(n)
    ]


def python_eval(row, key, op, value):
    x = row[key]
    if op == "isnull":
        return (x is None) if value else (x is not None)
    if x is None:
        return False  # NULL never matches (SQL three-valued logic)
    return {
        "exact": lambda: x == value,
        "gt": lambda: x > value,
        "gte": lambda: x >= value,
        "lt": lambda: x < value,
        "lte": lambda: x <= value,
        "in": lambda: x in value,
        "contains": lambda: str(value) in str(x),
        "icontains": lambda: str(value).lower() in str(x).lower(),
        "startswith": lambda: str(x).startswith(str(value)),
        "endswith": lambda: str(x).endswith(str(value)),
    }[op]()


STR_OPS = ["exact", "contains", "icontains", "startswith", "endswith", "isnull"]
INT_OPS = ["exact", "gt", "gte", "lt", "lte", "in", "isnull"]


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    data=rows(),
    str_op=st.sampled_from(STR_OPS),
    str_val=st.one_of(NAMES, st.booleans()),
    int_op=st.sampled_from(INT_OPS),
    int_val=st.one_of(INTS, st.booleans(), st.lists(INTS, max_size=3)),
)
def test_lookup_matches_python_semantics(
    spark, data, str_op, str_val, int_op, int_val
):
    # pair ops with type-appropriate values
    if str_op == "isnull":
        str_val = bool(str_val)
    elif isinstance(str_val, bool):
        str_val = "alpha"
    if int_op == "isnull":
        int_val = bool(int_val)
    elif int_op == "in":
        int_val = int_val if isinstance(int_val, list) else [0, 1]
    elif isinstance(int_val, (bool, list)):
        int_val = 7

    df = spark.createDataFrame(data, schema="name string, v long")
    filters = {f"name__{str_op}": str_val, f"v__{int_op}": int_val}
    got = sorted(
        ((r["name"], r["v"]) for r in where(df, **filters).collect()), key=str
    )
    want = sorted(
        (
            (row["name"], row["v"])
            for row in data
            if python_eval(row, "name", str_op, str_val)
            and python_eval(row, "v", int_op, int_val)
        ),
        key=str,
    )
    assert got == want
