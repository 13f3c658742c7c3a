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


def test_corr_ols_hand_case(spark):
    """Exact line y = 3x + 2: r = 1, slope 3, intercept 2; a noisy
    group checked against numpy-free closed form; constant x -> NULL.
    """
    from event_pipeline_spark.operators.stats import corr_ols_by_group

    rows = [("line", x, 3 * x + 2) for x in range(1, 6)]
    rows += [("flat", 4, y) for y in (1, 5, 9)]
    # hand case: x=[1,2,3], y=[2,1,4] -> n=3 sx=6 sy=7 sxx=14 syy=21
    # sxy=16 -> cov_n=6, var_x=6, var_y=14 -> r=6/sqrt(84)
    rows += [("noisy", 1, 2), ("noisy", 2, 1), ("noisy", 3, 4)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    out = {
        r["g"]: r
        for r in corr_ols_by_group(
            df, group_col="g", x_col="x", y_col="y"
        ).collect()
    }
    assert out["line"]["r"] == 1.0
    assert out["line"]["slope"] == 3.0
    assert out["line"]["intercept"] == 2.0
    assert out["flat"]["r"] is None and out["flat"]["slope"] is None
    import math

    assert out["noisy"]["r"] == round(6 / math.sqrt(84), 7)
    assert out["noisy"]["slope"] == 1.0
    assert out["noisy"]["intercept"] == round((7 - 6) / 3, 7)


def test_chi2_hand_case(spark):
    """2x2 contingency resolved by hand: rows a/b, cols x/y with
    counts a,x=30 a,y=10 b,x=10 b,y=30 -> every cell |o-e|=10, e=20."""
    from event_pipeline_spark.operators.stats import chi2_independence

    rows = (
        [("a", "x")] * 30
        + [("a", "y")] * 10
        + [("b", "x")] * 10
        + [("b", "y")] * 30
    )
    df = spark.createDataFrame(rows, "r string, c string")
    out = {
        (x["r"], x["c"]): x
        for x in chi2_independence(df, row_col="r", col_col="c").collect()
    }
    for cell, o in {("a", "x"): 30, ("a", "y"): 10,
                    ("b", "x"): 10, ("b", "y"): 30}.items():
        assert out[cell]["observed"] == o
        assert out[cell]["expected"] == 20.0
        assert out[cell]["chi_units"] == 5 * 10_000_000  # (10^2)/20
    total_chi = sum(x["chi_units"] for x in out.values()) / 1e7
    assert total_chi == 20.0  # the classic 2x2 statistic


def test_ab_test_hand_case(spark):
    """A: 2/4 convert, B: 1/4 -> z resolved by the textbook pooled
    formula; units counted once no matter how many events they emit."""
    import math

    from event_pipeline_spark.operators.stats import ab_test_proportions

    rows = []
    for u in range(4):  # bucket 0 users 0..3, users 0,1 convert
        rows.append((u, 0, 1 if u < 2 else 0))
        rows.append((u, 0, 0))  # extra event must not double-count
    for u in range(10, 14):  # bucket 1, one converter
        rows.append((u, 1, 1 if u == 10 else 0))
    df = spark.createDataFrame(rows, "u long, b int, s int")
    r = ab_test_proportions(
        df, unit_col="u", bucket_col="b", success_col="s"
    ).collect()[0]
    assert (r["n_a"], r["conv_a"], r["n_b"], r["conv_b"]) == (4, 2, 4, 1)
    assert (r["rate_a"], r["rate_b"]) == (0.5, 0.25)
    pool = 3 / 8
    se = math.sqrt(pool * (1 - pool) * (1 / 4 + 1 / 4))
    assert r["z"] == round(0.25 / se, 7)


def test_ab_test_degenerate_zero_se(spark):
    from event_pipeline_spark.operators.stats import ab_test_proportions

    df = spark.createDataFrame(
        [(1, 0, 1), (2, 1, 1)], "u long, b int, s int"
    )  # everyone converts -> pooled variance 0 -> NULL z
    r = ab_test_proportions(
        df, unit_col="u", bucket_col="b", success_col="s"
    ).collect()[0]
    assert r["z"] is None


def test_welch_hand_case(spark):
    """scipy-checkable hand case: a=[1,2,3], b=[2,4,6,8]."""
    import math

    from event_pipeline_spark.operators.stats import welch_t_test

    rows = [(0, v) for v in (1, 2, 3)] + [(1, v) for v in (2, 4, 6, 8)]
    df = spark.createDataFrame(rows, "b int, x long")
    r = welch_t_test(df, bucket_col="b", value_col="x").collect()[0]
    ma, mb = 2.0, 5.0
    va = 1.0 / 3      # s^2=1, n=3
    vb = (20 / 3) / 4  # s^2=20/3, n=4
    t = (ma - mb) / math.sqrt(va + vb)
    dfree = (va + vb) ** 2 / (va**2 / 2 + vb**2 / 3)
    assert (r["n_a"], r["n_b"]) == (3, 4)
    assert (r["mean_a"], r["mean_b"]) == (2.0, 5.0)
    assert r["t"] == round(t, 7)
    assert r["df"] == round(dfree, 7)


def test_welch_degenerate(spark):
    from event_pipeline_spark.operators.stats import welch_t_test

    df = spark.createDataFrame(
        [(0, 5), (0, 5), (1, 5), (1, 5)], "b int, x long"
    )  # zero variance both sides -> NULL t
    r = welch_t_test(df, bucket_col="b", value_col="x").collect()[0]
    assert r["t"] is None and r["df"] is None
