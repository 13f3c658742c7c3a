"""Snapshot-diff CDC operator: change classification and null semantics."""

from __future__ import annotations

from event_pipeline_spark.operators.cdc import snapshot_diff


def _diff_map(out):
    return {r[0]: r["change_type"] for r in out.collect()}


def test_classifies_insert_delete_update(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        schema="k int, s string, v double",
    )
    new = spark.createDataFrame(
        [(2, "b", 20.0), (3, "CHANGED", 30.0), (4, "d", 40.0)],
        schema="k int, s string, v double",
    )
    got = _diff_map(snapshot_diff(old, new, keys=["k"]))
    assert got == {1: "delete", 3: "update", 4: "insert"}


def test_null_transitions_are_updates_and_null_null_is_unchanged(spark):
    old = spark.createDataFrame(
        [(1, None), (2, "x"), (3, None), (4, "")],
        schema="k int, s string",
    )
    new = spark.createDataFrame(
        [(1, "now"), (2, None), (3, None), (4, "")],
        schema="k int, s string",
    )
    got = _diff_map(snapshot_diff(old, new, keys=["k"]))
    # null→value and value→null are updates; null==null and ''=='' unchanged
    assert got == {1: "update", 2: "update"}


def test_empty_string_differs_from_null(spark):
    old = spark.createDataFrame([(1, None)], schema="k int, s string")
    new = spark.createDataFrame([(1, "")], schema="k int, s string")
    assert _diff_map(snapshot_diff(old, new, keys=["k"])) == {1: "update"}


def test_column_boundary_is_unambiguous(spark):
    # ("ab","c") vs ("a","bc") must hash differently (separator works)
    old = spark.createDataFrame([(1, "ab", "c")], schema="k int, x string, y string")
    new = spark.createDataFrame([(1, "a", "bc")], schema="k int, x string, y string")
    assert _diff_map(snapshot_diff(old, new, keys=["k"])) == {1: "update"}


def test_key_only_tables_yield_membership_diff(spark):
    old = spark.createDataFrame([(1,), (2,)], schema="k int")
    new = spark.createDataFrame([(2,), (3,)], schema="k int")
    got = _diff_map(snapshot_diff(old, new, keys=["k"]))
    assert got == {1: "delete", 3: "insert"}


def test_compare_cols_subset_ignores_other_columns(spark):
    old = spark.createDataFrame([(1, "a", 1.0)], schema="k int, s string, v double")
    new = spark.createDataFrame([(1, "a", 999.0)], schema="k int, s string, v double")
    assert _diff_map(snapshot_diff(old, new, ["k"], compare_cols=["s"])) == {}


def test_join_shuffles_digest_not_rows(spark):
    """The pre-join projection must be (keys, 16-byte digest) only."""
    wide = spark.createDataFrame(
        [(1, "x" * 1000, "y" * 1000)], schema="k int, a string, b string"
    )
    out = snapshot_diff(wide, wide, keys=["k"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # no full-width string columns survive into the join inputs
    assert "o_digest" in plan and "n_digest" in plan
    assert out.count() == 0


def test_scd2_history_collapses_runs_and_chains_validity(spark):
    from datetime import datetime

    from event_pipeline_spark.operators.cdc import scd2_history

    t = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    df = spark.createDataFrame(
        [
            (1, "free", t(0), 10),
            (1, "free", t(1), 11),   # same state: collapses into v1
            (1, "paid", t(2), 12),
            (1, "free", t(3), 13),   # back to free: NEW version (run-based)
            (2, "paid", t(5), 14),
        ],
        "user_id long, plan string, ts timestamp, seq long",
    )
    out = scd2_history(
        df, key_col="user_id", state_col="plan", ts_col="ts",
        tiebreak_col="seq",
    ).collect()
    u1 = sorted((r for r in out if r["user_id"] == 1), key=lambda r: r["version"])
    assert [r["plan"] for r in u1] == ["free", "paid", "free"]
    assert [r["version"] for r in u1] == [1, 2, 3]
    # validity chains: each valid_to equals the next valid_from
    assert u1[0]["valid_to"] == u1[1]["valid_from"] == t(2)
    assert u1[1]["valid_to"] == u1[2]["valid_from"] == t(3)
    assert [r["is_current"] for r in u1] == [False, False, True]
    (u2,) = [r for r in out if r["user_id"] == 2]
    assert u2["version"] == 1 and u2["is_current"] and u2["valid_to"] is None
