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
