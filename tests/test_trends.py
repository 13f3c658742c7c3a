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


def test_theil_sen_hand_cases(spark):
    from event_pipeline_spark.operators.trends import theil_sen

    # perfect slope 2/day: counts 1,3,5,7 -> every pairwise slope is 2
    r = {
        row["event_type"]: row
        for row in theil_sen(_events(spark, [1, 3, 5, 7])).collect()
    }["click"]
    assert r["n_days"] == 4 and r["n_pairs"] == 6
    assert r["slope_units"] == 20_000_000 and r["slope"] == 2.0


def test_theil_sen_outlier_immune(spark):
    from event_pipeline_spark.operators.trends import theil_sen

    # one wild day cannot move the median slope far: 10 flat days with
    # one spike -> most pairwise slopes are 0
    counts = [5] * 5 + [500] + [5] * 5
    r = theil_sen(_events(spark, counts)).collect()[0]
    assert r["slope_units"] == 0 and r["slope"] == 0.0


def test_theil_sen_negative_slope_truncation(spark):
    from event_pipeline_spark.operators.trends import theil_sen

    # counts 7,6,4: slopes -1, -2, -3/2 -> sorted units
    # [-20000000, -15000000, -10000000], lower median (m=3 -> rank 2)
    # is -15000000; -3/2 quantizes exactly (no truncation residue),
    # and the truncating DIV matches DuckDB // by construction
    r = theil_sen(_events(spark, [7, 6, 4])).collect()[0]
    assert r["slope_units"] == -15_000_000
    assert r["slope"] == -1.5


def test_acf_alternating_series(spark):
    from event_pipeline_spark.operators.trends import daily_acf

    # alternating 2,4,2,4,... : r_1 = -1 + O(1/n) exactly computable;
    # verify against a NumPy-free reference fold
    counts = [2, 4] * 5
    rows = {
        r["lag"]: r for r in daily_acf(_events(spark, counts)).collect()
    }
    n = len(counts)
    s = sum(counts)
    ss = sum(c * c for c in counts)
    for lag in (1, 2, 3):
        a = sum(counts[t] * counts[t - lag] for t in range(lag, n))
        b = sum(counts[t] + counts[t - lag] for t in range(lag, n))
        num = n * n * a - n * s * b + (n - lag) * s * s
        den = n * n * ss - n * s * s
        assert rows[lag]["r"] == round(num / den, 7)
        assert rows[lag]["n_days"] == n
    # exact values: deviations are ±1, so r_1 = -9/10, r_2 = +8/10
    assert rows[1]["r"] == -0.9 and rows[2]["r"] == 0.8


def test_acf_constant_series_null_and_zero_fill(spark):
    from event_pipeline_spark.operators.trends import daily_acf
    import datetime as dt

    # constant series -> zero variance -> NULL r at every lag
    rows = daily_acf(_events(spark, [3, 3, 3, 3, 3])).collect()
    assert rows and all(r["r"] is None for r in rows)

    # a gap day enters as an observed zero: days 1,2,4 (day 3 empty)
    df = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 3, 1, 1), 0, "click", 1.0, "{}"),
            (2, dt.datetime(2024, 3, 2, 1), 0, "click", 1.0, "{}"),
            (3, dt.datetime(2024, 3, 4, 1), 0, "click", 1.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    r = {x["lag"]: x for x in daily_acf(df).collect()}
    assert r[1]["n_days"] == 4  # spine covers the gap


def test_holt_matches_recursive_fold(spark):
    """The matrix-power closed form equals the textbook recursion run
    in Python with the SAME quantized weights (the definitional
    check), on an irregular series."""
    from event_pipeline_spark.operators.trends import (
        HOLT_ALPHA,
        HOLT_BETA,
        HOLT_MAX_N,
        HOLT_UNIT,
        _holt_weight_tables,
        holt_linear,
    )

    counts = [3, 7, 4, 9, 2, 8, 8, 1, 6]
    r = holt_linear(_events(spark, counts)).collect()[0]

    # reference: fold the weight LITERALS the operator uses (the model
    # is Holt-with-quantized-weights; exactness claim is vs these)
    lag_rows, init_rows = _holt_weight_tables(
        HOLT_ALPHA, HOLT_BETA, HOLT_MAX_N, HOLT_UNIT
    )
    lagw = {p: (s, b) for p, s, b in lag_rows}
    initw = {row[0]: row[1:] for row in init_rows}
    n = len(counts)
    i1s, i1b, i2s, i2b = initw[n - 1]
    s_u = counts[0] * i1s + counts[1] * i2s
    b_u = counts[0] * i1b + counts[1] * i2b
    for j in range(1, n):
        ws, wb = lagw[n - 1 - j]
        s_u += counts[j] * ws
        b_u += counts[j] * wb
    assert (r["level_units"], r["trend_units"]) == (s_u, b_u)
    assert r["forecast_3"] == round((s_u + 3 * b_u) / HOLT_UNIT, 7)

    # and the un-quantized textbook recursion agrees to ~1e-6
    a, b = HOLT_ALPHA, HOLT_BETA
    s, t = counts[0], counts[1] - counts[0]
    for y in counts[1:]:
        s_new = a * y + (1 - a) * (s + t)
        t = b * (s_new - s) + (1 - b) * t
        s = s_new
    assert abs(r["level"] - s) < 1e-5 and abs(r["trend"] - t) < 1e-5


def test_holt_short_and_long_series_dropped(spark):
    from event_pipeline_spark.operators.trends import holt_linear

    # a single observed day has no defined trend -> no row
    assert holt_linear(_events(spark, [5])).collect() == []


def test_holt_year_long_series(spark):
    """A 100-day series (beyond the old 64-day cap) produces a row and
    matches the un-quantized textbook recursion — HOLT_MAX_N=366
    covers the common year-long daily case."""
    from event_pipeline_spark.operators.trends import (
        HOLT_ALPHA,
        HOLT_BETA,
        HOLT_MAX_N,
        holt_linear,
    )

    assert HOLT_MAX_N >= 366
    counts = [(i * 7 + 3) % 11 + 1 for i in range(100)]
    rows = []
    eid = 0
    for day, c in enumerate(counts):
        for _ in range(c):
            eid += 1
            rows.append(
                (
                    eid,
                    dt.datetime(2024, 3, 1, 12) + dt.timedelta(days=day),
                    eid % 7,
                    "click",
                    1.0,
                    "{}",
                )
            )
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = holt_linear(ev).collect()
    assert len(got) == 1 and got[0]["n_days"] == 100
    a, b = HOLT_ALPHA, HOLT_BETA
    s, t = counts[0], counts[1] - counts[0]
    for y in counts[1:]:
        s_new = a * y + (1 - a) * (s + t)
        t = b * (s_new - s) + (1 - b) * t
        s = s_new
    assert abs(got[0]["level"] - s) < 1e-5
    assert abs(got[0]["trend"] - t) < 1e-5


def test_changepoint_hand_case(spark):
    from event_pipeline_spark.operators.trends import changepoint_split

    # clean level shift 5 -> 15 after three days: the split lands
    # exactly at the boundary with segment means 5 and 15
    r = changepoint_split(_events(spark, [5, 5, 5, 15, 15])).collect()[0]
    assert (r["nl"], r["nr"]) == (3, 2)
    assert r["split_day"] == "2024-03-04"
    assert (r["mean_left"], r["mean_right"]) == (5.0, 15.0)
    # f(best) = 225/3 + 900/2 = 525 vs baseline 2025/5 = 405
    assert r["score_units"] == 52500 and r["gain_units"] == 12000

    # constant series: every split has zero gain; tiebreak picks the
    # earliest day
    c = changepoint_split(_events(spark, [4, 4, 4, 4])).collect()[0]
    assert c["gain_units"] == 0 and c["split_day"] == "2024-03-02"
