"""Expectations operator: rule compilation, null semantics, one-scan
plan shape, referential orphans (the oracle in test_oracles pins the
registered contract against DuckDB)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from event_pipeline_spark.operators.validate import (
    check_referential,
    check_rows,
    expect,
)


def test_row_rules_count_violations_and_nulls_violate(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -1.0), (3, None), (4, 5.0)], "id long, v double"
    )
    got = {
        r["rule"]: r["violations"]
        for r in check_rows(
            df,
            {
                "v_positive": F.col("v") > 0,  # -1 and NULL violate
                "id_not_null": F.col("id").isNotNull(),
            },
        ).collect()
    }
    assert got == {"v_positive": 2, "id_not_null": 0}


def test_row_rules_evaluate_in_one_scan(spark):
    """All rules fold into a single aggregate: exactly one scan node in
    the physical plan regardless of rule count."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("m")
    )
    report = check_rows(
        df,
        {
            "a": F.col("id") >= 0,
            "b": F.col("m") < 7,
            "c": F.col("id") < 50,
            "d": F.col("m") != 3,
        },
    )
    plan = report._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") == 1 or plan.count("Range") == 1
    got = {r["rule"]: r["violations"] for r in report.collect()}
    assert got == {"a": 0, "b": 0, "c": 50, "d": 14}


def test_referential_orphans(spark):
    child = spark.createDataFrame([(1,), (2,), (9,)], "k long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "p long")
    row = check_referential(child, "k", parent, "p", "fk").first()
    assert (row["rule"], row["violations"]) == ("fk", 1)


def test_expect_unions_and_orders(spark):
    df = spark.createDataFrame([(1,), (2,)], "k long")
    parent = spark.createDataFrame([(1,)], "p long")
    rows = expect(
        df,
        {"z_rule": F.col("k") > 0},
        referential=[(df, "k", parent, "p", "a_fk")],
    ).collect()
    assert [r["rule"] for r in rows] == ["a_fk", "z_rule"]
    assert [r["violations"] for r in rows] == [1, 0]


def test_rule_names_must_be_bare_identifiers(spark):
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="not a bare identifier"):
        check_rows(df, {"bad'name": F.col("k") > 0})
    with pytest.raises(ValueError, match="not a bare identifier"):
        check_rows(df, {"back`tick": F.col("k") > 0})
    with pytest.raises(ValueError, match="must not be empty"):
        check_rows(df, {})


def test_benford_hand_digits(spark):
    from event_pipeline_spark.operators.validate import benford_digits

    df = spark.createDataFrame(
        [(1.5,), (19.0,), (150.0,), (25.0,), (0.5,)], "v double"
    )
    out = {r["digit"]: r for r in benford_digits(df, "v").collect()}
    assert set(out) == {1, 2}  # 0.5 filtered by min_value
    assert out[1]["n"] == 3 and out[2]["n"] == 1
    assert out[1]["obs_frac"] == 0.75
    import math

    assert out[1]["exp_frac"] == round(math.log10(2.0), 7)
    # chi contribution positive wherever obs != exp
    assert out[1]["chi_units"] > 0 and out[2]["chi_units"] > 0


def test_snapshot_drift_flags_exact_threshold(spark):
    """Integer cross-multiplication flag: 10% is the boundary —
    11 vs 10 (10% exactly) must NOT drift, 12 vs 10 (20%) must."""
    from pyspark.sql import functions as F

    from event_pipeline_spark.operators.validate import snapshot_drift

    old = spark.createDataFrame([(i,) for i in range(10)], "x long")
    new_ok = spark.createDataFrame([(i,) for i in range(11)], "x long")
    new_bad = spark.createDataFrame([(i,) for i in range(12)], "x long")
    metrics = {"n_rows": F.count(F.lit(1))}
    ok = snapshot_drift(old, new_ok, metrics=metrics).collect()[0]
    bad = snapshot_drift(old, new_bad, metrics=metrics).collect()[0]
    assert (ok["old_value"], ok["new_value"], ok["drifted"]) == (10, 11, False)
    assert (bad["old_value"], bad["new_value"], bad["drifted"]) == (
        10, 12, True,
    )
