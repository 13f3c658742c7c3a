"""Kaplan-Meier survival (operators/survival.py).

The textbook worked example: five subjects, two event times, one
censoring between them — S resolved by hand; plus the risk-set-empties
edge case.
"""

from __future__ import annotations

import datetime as dt
import math


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string"
    )


def _t(day, h):
    return dt.datetime(2024, 1, day, h)


def test_km_hand_case(spark):
    from event_pipeline_spark.operators.survival import km_survival

    rows = [
        # A: signup 00 -> purchase +1h (event t=1)
        (1, _t(10, 0), 1, "signup"),
        (2, _t(10, 1), 1, "purchase"),
        # B, D: signup 00 -> purchase +3h (events t=3; horizon = 03:00)
        (3, _t(10, 0), 2, "signup"),
        (4, _t(10, 3), 2, "purchase"),
        (5, _t(10, 0), 4, "signup"),
        (6, _t(10, 3), 4, "purchase"),
        # C: signup 01, never purchases -> censored at horizon-1h = 2
        (7, _t(10, 1), 3, "signup"),
        # E: signup 22:00 the day before -> censored at t=5
        (8, _t(9, 22), 5, "signup"),
    ]
    out = {r["t_hours"]: r for r in km_survival(_ev(spark, rows)).collect()}
    assert set(out) == {1, 3}
    t1, t3 = out[1], out[3]
    assert (t1["n_risk"], t1["n_events"]) == (5, 1)
    # removed before t=3: the t=1 event and the t=2 censoring
    assert (t3["n_risk"], t3["n_events"]) == (3, 2)
    u1 = round(math.log(4 / 5) * 1e7)
    u3 = u1 + round(math.log(1 / 3) * 1e7)
    assert t1["log_units"] == u1
    assert t3["log_units"] == u3
    assert t1["survival"] == round(math.exp(u1 / 1e7), 6)  # ~0.8
    assert t3["survival"] == round(math.exp(u3 / 1e7), 6)  # ~0.266667


def test_km_purchase_before_signup_is_censored(spark):
    """A purchase that precedes the signup is no event: the subject
    stays, censored at the horizon."""
    from event_pipeline_spark.operators.survival import km_survival

    rows = [
        (1, _t(10, 5), 1, "signup"),
        (2, _t(10, 1), 1, "purchase"),  # before signup
        (3, _t(10, 0), 2, "signup"),
        (4, _t(10, 2), 2, "purchase"),  # event t=2, horizon 02:00
    ]
    out = km_survival(_ev(spark, rows)).collect()
    assert len(out) == 1
    # horizon = max(coalesce(p_us, s_us)) = user 1's 05:00 signup, so
    # user 1 is censored at t=0 and already removed at t=2: the t=2
    # event empties the risk set
    r = out[0]
    assert (r["t_hours"], r["n_risk"], r["n_events"]) == (2, 1, 1)
    assert r["survival"] == 0.0


def test_km_risk_set_empties_pins_zero(spark):
    """Every subject has the event at the same time: survival 0,
    log_units NULL (ln(0) guarded)."""
    from event_pipeline_spark.operators.survival import km_survival

    rows = [
        (1, _t(10, 0), 1, "signup"),
        (2, _t(10, 2), 1, "purchase"),
        (3, _t(10, 0), 2, "signup"),
        (4, _t(10, 2), 2, "purchase"),
    ]
    out = km_survival(_ev(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["t_hours"], r["n_risk"], r["n_events"]) == (2, 2, 2)
    assert r["survival"] == 0.0
    assert r["log_units"] is None


def test_km_monotone_from_one(spark, sf_dir):
    from event_pipeline_spark.operators.survival import km_survival
    from event_pipeline_spark.session import read_table

    rows = (
        km_survival(read_table(spark, sf_dir, "events"))
        .orderBy("t_hours")
        .collect()
    )
    assert rows, "no event times found"
    surv = [r["survival"] for r in rows]
    assert all(a >= b for a, b in zip(surv, surv[1:]))
    assert surv[0] < 1.0 and surv[-1] >= 0.0
    assert all(r["n_events"] > 0 for r in rows)
