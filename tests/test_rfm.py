"""RFM segmentation (operators/rfm.py).

Closed-form oracle: 5 customers constructed so recency, frequency and
monetary each take 5 distinct aligned values — with quantile_cont
thresholds at (0.2, 0.4, 0.6, 0.8) over n=5 values the interpolated
boundaries fall strictly between consecutive values, so customer k
must score exactly k on all three axes.
"""

from __future__ import annotations

import datetime as dt


def _orders(spark):
    # customer k (1..5): k orders, each 100*k, last order on Jan k.
    rows = []
    key = 0
    for k in range(1, 6):
        for j in range(k):
            key += 1
            rows.append(
                (
                    key,
                    k,
                    "O",
                    100.0 * k,
                    dt.datetime(2024, 1, k - (1 if j else 0)),
                    "1-URGENT",
                )
            )
    return spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string",
    )


def test_closed_form_scores_and_segments(spark):
    from event_pipeline_spark.operators.rfm import rfm_segments

    got = {r["c_custkey"]: r for r in rfm_segments(_orders(spark)).collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    for k in range(1, 6):
        r = got[k]
        assert r["r_days"] == 5 - k
        assert r["freq"] == k
        assert r["monetary"] == 100.0 * k * k
        assert (r["r_score"], r["f_score"], r["m_score"]) == (k, k, k)
    assert got[5]["segment"] == "champions"
    assert got[4]["segment"] == "champions"  # 4/4/4 meets the >=4 rule
    assert got[3]["segment"] == "regular"
    assert got[2]["segment"] == "hibernating"
    assert got[1]["segment"] == "hibernating"


def test_gini_hand_cases(spark):
    from event_pipeline_spark.operators.rfm import gini_by_group

    rows = [("eq", 5, i) for i in range(4)]          # equality -> 0
    rows += [("uneq", 0, 1), ("uneq", 0, 2),
             ("uneq", 0, 3), ("uneq", 12, 4)]        # -> (n-1)/n
    df = spark.createDataFrame(rows, "g string, v long, id long")
    out = {
        r["g"]: r
        for r in gini_by_group(
            df, group_col="g", value_col="v", id_col="id"
        ).collect()
    }
    assert out["eq"]["gini"] == 0.0
    assert out["uneq"]["gini"] == 0.75
    assert out["uneq"]["gini_num"] == 36 and out["uneq"]["total"] == 12


def test_gini_tie_order_invariant(spark):
    """Shuffling ids among tied values must not change G (the
    consecutive-rank-block invariance the docstring claims)."""
    from event_pipeline_spark.operators.rfm import gini_by_group

    vals = [3, 3, 3, 7, 7, 10]
    a = [("g", v, i) for i, v in enumerate(vals)]
    b = [("g", v, 100 - i) for i, v in enumerate(vals)]
    df_a = spark.createDataFrame(a, "g string, v long, id long")
    df_b = spark.createDataFrame(b, "g string, v long, id long")
    ga = gini_by_group(
        df_a, group_col="g", value_col="v", id_col="id"
    ).collect()[0]["gini"]
    gb = gini_by_group(
        df_b, group_col="g", value_col="v", id_col="id"
    ).collect()[0]["gini"]
    assert ga == gb
