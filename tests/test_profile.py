"""Table profiling (operators/profile.py).

Closed-form oracle: a four-row frame with known nulls, duplicates,
and a two-decimal money column, every statistic resolved by hand.
"""

from __future__ import annotations

import datetime


def _frame(spark):
    rows = [
        (1, 10.25, "b", datetime.datetime(2024, 1, 2, 3, 4, 5)),
        (2, None, "a", datetime.datetime(2024, 1, 1, 0, 0, 0)),
        (2, 0.75, None, None),
        (None, -1.50, "a", datetime.datetime(2024, 1, 2, 3, 4, 5)),
    ]
    return spark.createDataFrame(
        rows, "k long, price double, tag string, ts timestamp_ntz"
    )


def test_profile_hand_case(spark):
    from event_pipeline_spark.operators.profile import profile_table

    out = {
        r["col_name"]: r
        for r in profile_table(_frame(spark)).collect()
    }
    assert set(out) == {"k", "price", "tag", "ts"}

    k = out["k"]
    assert (k["n_rows"], k["n_null"], k["n_distinct"]) == (4, 1, 2)
    assert k["null_frac"] == 0.25
    assert (k["min_num"], k["max_num"]) == (1.0, 2.0)
    assert k["sum_units"] == 5  # integer column sums at unit 1
    assert k["min_str"] is None and k["len_sum"] is None

    p = out["price"]
    assert (p["n_null"], p["n_distinct"]) == (1, 3)
    assert (p["min_num"], p["max_num"]) == (-1.50, 10.25)
    assert p["sum_units"] == 1025 + 75 - 150  # default unit = cents

    t = out["tag"]
    assert (t["n_null"], t["n_distinct"]) == (1, 2)
    assert (t["min_str"], t["max_str"]) == ("a", "b")
    assert t["len_sum"] == 3
    assert t["min_num"] is None and t["sum_units"] is None

    ts = out["ts"]
    assert (ts["n_null"], ts["n_distinct"]) == (1, 2)
    assert ts["min_str"] == "2024-01-01 00:00:00"
    assert ts["max_str"] == "2024-01-02 03:04:05"
    assert ts["sum_units"] is None and ts["len_sum"] is None


def test_profile_unit_override(spark):
    from event_pipeline_spark.operators.profile import profile_table

    out = {
        r["col_name"]: r
        for r in profile_table(
            _frame(spark), units={"price": 10_000_000}
        ).collect()
    }
    assert out["price"]["sum_units"] == 102_500_000 + 7_500_000 - 15_000_000


def test_profile_approx_path(spark):
    """exact=False: HLL++ distinct counts, no Expand in the plan."""
    from event_pipeline_spark.operators.profile import profile_table

    prof = profile_table(_frame(spark), exact=False)
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
    out = {r["col_name"]: r for r in prof.collect()}
    # HLL++ is exact at this cardinality
    assert out["k"]["n_distinct"] == 2
