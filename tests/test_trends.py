"""Trailing-window burst detection (operators/trends.py).

Closed-form oracle: history stats and z resolved by hand on a
constructed spike.
"""

from __future__ import annotations

import datetime as dt
import math


def _events(spark, counts, event_type="click"):
    """One event row per unit of count, on consecutive days."""
    rows = []
    eid = 0
    for day, c in enumerate(counts):
        for _ in range(c):
            eid += 1
            rows.append(
                (
                    eid,
                    dt.datetime(2024, 3, 1 + day, 12, 0, 0),
                    eid % 7,
                    event_type,
                    1.0,
                    "{}",
                )
            )
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_spike_flags_and_stats(spark):
    from event_pipeline_spark.operators.trends import daily_bursts

    counts = [5, 5, 5, 5, 50]  # flat history, then a 10x spike
    out = {
        r["day"]: r
        for r in daily_bursts(_events(spark, counts)).collect()
    }
    assert len(out) == 5
    spike = out["2024-03-05"]
    assert (spike["hist_n"], spike["hist_sum"], spike["hist_sumsq"]) == (
        4, 20, 100,
    )
    # var of [5,5,5,5] is 0 -> z undefined -> no flag even on a spike
    assert spike["z"] is None and spike["burst"] is False


def test_z_closed_form(spark):
    from event_pipeline_spark.operators.trends import daily_bursts

    counts = [4, 5, 6, 5, 30]
    out = {
        r["day"]: r
        for r in daily_bursts(_events(spark, counts)).collect()
    }
    spike = out["2024-03-05"]
    n, s, ss, c = 4, 20, 102, 30
    var = (n * ss - s * s) / (n * (n - 1))
    want = round((c - s / n) / math.sqrt(var), 7)
    assert spike["z"] == want
    assert spike["burst"] is True
    # early days have too little history
    assert out["2024-03-01"]["z"] is None
    assert out["2024-03-03"]["hist_n"] == 2


def test_window_is_partitioned(spark):
    """The window must partition by event_type — a global (empty-
    partition) window would single-task the table."""
    from event_pipeline_spark.operators.trends import daily_bursts

    plan = (
        daily_bursts(_events(spark, [1, 2]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partitionBy" not in plan or "k#" in plan  # window keyed
    assert "Window" in plan


def test_ewma_hand_case(spark):
    """Two consecutive days, counts 4 then 2: day-2 EWMA = 2 + 4/2."""
    import datetime as dt

    from event_pipeline_spark.operators.trends import daily_ewma

    rows = [
        (i, dt.datetime(2024, 1, 1, h), 1, "view")
        for i, h in enumerate((1, 2, 3, 4))
    ] + [
        (10 + i, dt.datetime(2024, 1, 2, h), 1, "view")
        for i, h in enumerate((1, 2))
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string",
    )
    out = {r["day"]: r for r in daily_ewma(ev).collect()}
    assert out["2024-01-01"]["ewma"] == 4.0
    assert out["2024-01-02"]["ewma"] == 4.0  # 2 + 4/2
    assert out["2024-01-02"]["ewma_units"] == 2 * 1024 + 4 * 512


def test_ewma_truncation_and_keys_independent(spark):
    """Decay weights halve per lag; other event types never leak into
    a key's window."""
    import datetime as dt

    from event_pipeline_spark.operators.trends import daily_ewma

    rows = [(1, dt.datetime(2024, 1, 1, 1), 1, "view")] + [
        (2 + d, dt.datetime(2024, 1, 1 + d, 1), 1, "click")
        for d in range(12)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string",
    )
    out = {
        (r["event_type"], r["day"]): r for r in daily_ewma(ev).collect()
    }
    # view saw one day: ewma == its own count
    assert out[("view", "2024-01-01")]["ewma"] == 1.0
    # click day 12: 11 in-window days of c=1 -> sum_{j=0..10} 2^-j
    exp = sum(2.0 ** -j for j in range(11))
    assert out[("click", "2024-01-12")]["ewma"] == exp


def test_cusum_matches_recursive_fold(spark):
    """The window reflection identity equals Page's textbook recursion
    S_t = max(0, S_{t-1} + x_t - ref) on a hand series."""
    import datetime as dt

    from event_pipeline_spark.operators.trends import daily_cusum

    counts = [10, 10, 12, 12, 12, 8, 8]
    rows = []
    eid = 0
    for d, c in enumerate(counts):
        for _ in range(c):
            rows.append(
                (eid, dt.datetime(2024, 1, 1 + d, 1), 1, "view")
            )
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string",
    )
    out = {
        r["day"]: r
        for r in daily_cusum(ev, threshold_units=5).collect()
    }
    ref = counts[0]
    sp = sn = 0
    for d, c in enumerate(counts):
        sp = max(0, sp + c - ref)
        sn = max(0, sn + ref - c)
        day = f"2024-01-{1 + d:02d}"
        assert out[day]["cusum_pos"] == sp
        assert out[day]["cusum_neg"] == sn
        assert out[day]["alarm"] == (sp >= 5 or sn >= 5)
    # the persistent +2 shift alarms where a z-score on any single
    # day would not be extreme
    assert out["2024-01-05"]["cusum_pos"] == 6


def test_mann_kendall_hand_cases(spark):
    """Strictly increasing series: S = C(n,2), textbook z; constant
    series: all ties, zero variance, NULL z."""
    import datetime as dt
    import math

    from event_pipeline_spark.operators.trends import mann_kendall

    rows = []
    eid = 0
    for d, c in enumerate([1, 2, 3, 4, 5]):  # increasing: view
        for _ in range(c):
            rows.append((eid, dt.datetime(2024, 1, 1 + d, 1), 1, "view"))
            eid += 1
    for d in range(3):  # constant: click
        for _ in range(2):
            rows.append((eid, dt.datetime(2024, 1, 1 + d, 1), 1, "click"))
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string",
    )
    out = {r["event_type"]: r for r in mann_kendall(ev).collect()}
    v = out["view"]
    assert (v["n_days"], v["s"]) == (5, 10)
    assert v["var_s_x18"] == 5 * 4 * 15  # no ties
    assert v["z"] == round(9.0 / math.sqrt(300 / 18.0), 7)
    c = out["click"]
    assert (c["s"], c["var_s_x18"]) == (0, 0)
    assert c["z"] is None


def test_seasonal_residuals_hand_case(spark):
    """Three Mondays at 10 events + one at 100: baseline is the
    lower-median 10, the spike's residual is 90 and flagged, while
    the normal Mondays are not."""
    from datetime import datetime

    from event_pipeline_spark.operators.trends import seasonal_residuals

    rows = []
    eid = 0
    mondays = [1, 8, 15, 22]  # 2024-01-01 is a Monday
    for i, dom in enumerate(mondays):
        n = 100 if i == 3 else 10
        for _ in range(n):
            rows.append((eid, datetime(2024, 1, dom, 12), "view"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, event_type string"
    )
    out = {
        r["day"]: r for r in seasonal_residuals(df).collect()
    }
    assert all(r["baseline"] == 10 for r in out.values())
    assert out["2024-01-22"]["residual"] == 90
    assert out["2024-01-22"]["outlier"]
    assert not out["2024-01-01"]["outlier"]
    # MAD of |c-10| = [0,0,0,90] -> lower median 0; flag uses 6745*90 > 0
    assert out["2024-01-01"]["mad"] == 0
