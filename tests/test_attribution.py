"""Multi-touch attribution (operators/attribution.py).

Hand-resolved journey: one user with view -> click -> purchase inside
the window, a touch outside the lookback, a timestamp tie, and an
unattributed conversion.
"""

from __future__ import annotations

import datetime as dt


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string"
    )


def _t(h, m=0):
    return dt.datetime(2024, 1, 5, h, m)


def test_attribution_hand_case(spark):
    from event_pipeline_spark.operators.attribution import (
        attribute_conversions,
    )

    rows = [
        # user 1: view(9:00) -> click(10:00) -> purchase(11:00)
        (1, _t(9), 1, "view"),
        (2, _t(10), 1, "click"),
        (3, _t(11), 1, "purchase"),
        # user 2: touch 100h before conversion -> outside 72h lookback
        (4, dt.datetime(2024, 1, 1, 0), 2, "view"),
        (5, dt.datetime(2024, 1, 5, 4), 2, "purchase"),
        # user 3: signup exactly AT conversion ts -> excluded (strict <)
        (6, _t(12), 3, "signup"),
        (7, _t(12), 3, "purchase"),
    ]
    out = {
        r["channel"]: r
        for r in attribute_conversions(_ev(spark, rows)).collect()
    }
    assert set(out) == {"view", "click"}
    v, c = out["view"], out["click"]
    assert (v["first_touch"], v["last_touch"]) == (1, 0)
    assert (c["first_touch"], c["last_touch"]) == (0, 1)
    assert v["linear_units"] == round(1e7 / 2)
    assert c["linear_units"] == round(1e7 / 2)
    assert v["linear_credit"] == v["linear_units"] / 1e7


def test_attribution_tie_breaks_on_event_id(spark):
    """Two touches at the same timestamp: lower event_id is first,
    higher is last."""
    from event_pipeline_spark.operators.attribution import (
        attribute_conversions,
    )

    rows = [
        (10, _t(9), 1, "view"),
        (11, _t(9), 1, "click"),
        (12, _t(10), 1, "purchase"),
    ]
    out = {
        r["channel"]: r
        for r in attribute_conversions(_ev(spark, rows)).collect()
    }
    assert out["view"]["first_touch"] == 1
    assert out["click"]["last_touch"] == 1
    assert out["view"]["last_touch"] == 0


def test_attribution_single_touch_all_models_agree(spark):
    from event_pipeline_spark.operators.attribution import (
        attribute_conversions,
    )

    rows = [
        (1, _t(9), 1, "click"),
        (2, _t(10), 1, "purchase"),
    ]
    out = attribute_conversions(_ev(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["first_touch"], r["last_touch"]) == (1, 1)
    assert r["linear_units"] == 10_000_000


def test_attribution_conversion_mass_conservation(spark, sf_dir):
    """Across channels: first_touch totals == last_touch totals ==
    number of attributed conversions, and linear units sum to ~1e7
    per attributed conversion (floor-rounding leaks < n units)."""
    from event_pipeline_spark.operators.attribution import (
        attribute_conversions,
    )
    from event_pipeline_spark.session import read_table

    out = attribute_conversions(
        read_table(spark, sf_dir, "events")
    ).collect()
    n_first = sum(r["first_touch"] for r in out)
    n_last = sum(r["last_touch"] for r in out)
    assert n_first == n_last and n_first > 0
    lin = sum(r["linear_units"] for r in out)
    assert abs(lin - n_first * 1e7) < n_first * 10
