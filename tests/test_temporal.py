"""As-of join and binned range join: semantics vs brute force, tolerance,
and the plan shape that makes them scale (hash join, not nested loop)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from event_pipeline_spark.operators.temporal import asof_join, range_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            ("A", _ts("2026-01-01 10:00:05"), 100),
            ("A", _ts("2026-01-01 10:00:30"), 101),
            ("B", _ts("2026-01-01 10:00:10"), 200),
            ("C", _ts("2026-01-01 10:00:10"), 300),  # no quotes at all
        ],
        "sym string, ts timestamp, trade_id long",
    )


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [
            ("A", _ts("2026-01-01 10:00:00"), 9.9),
            ("A", _ts("2026-01-01 10:00:05"), 10.0),  # tie with trade 100
            ("A", _ts("2026-01-01 10:00:31"), 11.0),  # after trade 101
            ("B", _ts("2026-01-01 09:59:00"), 20.0),  # 70s before trade 200
        ],
        "sym string, ts timestamp, px double",
    )


class TestAsofJoin:
    def test_backward_match_with_ties(self, trades, quotes):
        out = {
            r["trade_id"]: r["px"]
            for r in asof_join(trades, quotes, ["sym"]).collect()
        }
        # trade 100: quote at the same instant matches (tie -> included)
        # trade 101: latest preceding is 10.0 (the 10:00:31 quote is later)
        # trade 200: the old 09:59 quote carries forward
        # trade 300: no quote for C -> NULL
        assert out == {100: 10.0, 101: 10.0, 200: 20.0, 300: None}

    def test_tolerance_voids_stale_matches(self, trades, quotes):
        out = {
            r["trade_id"]: r["px"]
            for r in asof_join(
                trades, quotes, ["sym"], tolerance_seconds=30
            ).collect()
        }
        # B's only quote is 70s old -> voided; A's matches are fresh
        assert out == {100: 10.0, 101: 10.0, 200: None, 300: None}

    def test_column_collision_raises(self, spark, trades):
        clashing = spark.createDataFrame(
            [("A", _ts("2026-01-01 10:00:00"), 1)],
            "sym string, ts timestamp, trade_id long",
        )
        with pytest.raises(ValueError, match="collide"):
            asof_join(trades, clashing, ["sym"])

    def test_matched_row_null_value_not_backfilled(self, spark, trades):
        """pandas merge_asof semantics: the matched right row's NULL
        travels — it must not be papered over with a value from an older
        right row (per-column last(ignorenulls) would do exactly that)."""
        quotes_with_null = spark.createDataFrame(
            [
                ("A", _ts("2026-01-01 10:00:00"), 9.9),
                ("A", _ts("2026-01-01 10:00:20"), None),  # matched by trade 101
            ],
            "sym string, ts timestamp, px double",
        )
        out = {
            r["trade_id"]: r["px"]
            for r in asof_join(trades, quotes_with_null, ["sym"]).collect()
        }
        assert out[100] == 9.9
        assert out[101] is None  # matched row's NULL, not the stale 9.9

    def test_single_sort_no_quadratic_join(self, trades, quotes):
        plan = (
            asof_join(trades, quotes, ["sym"])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Window" in plan
        for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
            assert bad not in plan


class TestRangeJoin:
    @pytest.fixture(scope="class")
    def points(self, spark):
        return spark.range(300).select(
            F.col("id").alias("pid"), ((F.col("id") * 37) % 100).cast("double").alias("v")
        )

    @pytest.fixture(scope="class")
    def intervals(self, spark):
        return spark.range(20).select(
            F.col("id").alias("iid"),
            (F.col("id") * 5.0).alias("lo"),
            (F.col("id") * 5.0 + 7.0).alias("hi"),
        )

    def test_inner_matches_brute_force(self, points, intervals):
        got = sorted(
            (r["pid"], r["iid"])
            for r in range_join(points, intervals, "v", "lo", "hi", 6.0).collect()
        )
        want = sorted(
            (r["pid"], r["iid"])
            for r in points.crossJoin(intervals)
            .where(F.col("v").between(F.col("lo"), F.col("hi")))
            .collect()
        )
        assert got == want and len(want) > 0

    def test_left_keeps_unmatched_points(self, spark, intervals):
        pts = spark.createDataFrame(
            [(1, 3.0), (2, 1000.0)], "pid long, v double"
        )
        out = range_join(pts, intervals, "v", "lo", "hi", 6.0, how="left")
        rows = {r["pid"]: r["iid"] for r in out.collect()}
        assert rows[1] == 0 and rows[2] is None

    def test_hash_join_not_nested_loop(self, points, intervals):
        plan = (
            range_join(points, intervals, "v", "lo", "hi", 6.0)
            ._jdf.queryExecution().executedPlan().toString()
        )
        for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
            assert bad not in plan

    def test_rejects_full(self, points, intervals):
        with pytest.raises(ValueError, match="inner/left"):
            range_join(points, intervals, "v", "lo", "hi", 6.0, how="full")


class TestAsofVsPandas:
    """Differential: asof_join == pandas merge_asof (direction=backward,
    allow_exact_matches=True) across generated shapes."""

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_merge_asof(self, spark, seed):
        import numpy as np
        import pandas as pd

        rng = np.random.default_rng(seed)
        base = pd.Timestamp("2026-01-01")
        left = pd.DataFrame({
            "k": rng.choice(["x", "y", "z"], 60),
            "ts": base + pd.to_timedelta(rng.integers(0, 3600, 60), unit="s"),
            "lid": np.arange(60),
        })
        right = pd.DataFrame({
            "k": rng.choice(["x", "y", "z"], 40),
            "ts": base + pd.to_timedelta(rng.integers(0, 3600, 40), unit="s"),
            "px": rng.random(40).round(3),
        })
        # merge_asof picks the LAST right row on ts ties arbitrarily by
        # position; dedup (k, ts) to make the expectation well-defined
        right = right.sort_values(["k", "ts"]).drop_duplicates(
            ["k", "ts"], keep="last"
        )

        want = pd.merge_asof(
            left.sort_values("ts"), right.sort_values("ts"),
            on="ts", by="k", direction="backward",
        ).set_index("lid")["px"]

        got_rows = asof_join(
            spark.createDataFrame(left), spark.createDataFrame(right), ["k"]
        ).collect()
        got = {r["lid"]: r["px"] for r in got_rows}
        assert len(got) == 60
        for lid, px in want.items():
            if pd.isna(px):
                assert got[lid] is None
            else:
                assert got[lid] == pytest.approx(px)


# -- resample + forward fill -------------------------------------------------

def test_resample_ffill_fills_gaps_and_carries_values(spark):
    from event_pipeline_spark.operators.temporal import resample_ffill

    df = spark.createDataFrame(
        [
            ("a", "2026-01-01 10:15:00", 1.0),
            ("a", "2026-01-01 13:40:00", 5.0),   # 11:00 and 12:00 are gaps
            ("b", "2026-01-01 10:05:00", 2.0),
        ],
        "k string, ts_s string, v double",
    ).select("k", F.to_timestamp("ts_s").alias("ts"), "v")
    out = resample_ffill(
        df,
        keys=["k"],
        ts="ts",
        value_exprs={"total": F.sum("v")},
    ).collect()
    rows = {(r["k"], r["h"].hour): (r["n"], r["total"]) for r in out}
    assert rows[("a", 10)] == (1, 1.0)
    assert rows[("a", 11)] == (0, 1.0)  # gap bucket: count 0, carried value
    assert rows[("a", 12)] == (0, 1.0)
    assert rows[("a", 13)] == (1, 5.0)
    assert rows[("b", 10)] == (1, 2.0)
    assert len(rows) == 5  # b's spine is one bucket; no cross-key bleed


def test_resample_ffill_non_hour_steps(spark):
    """The bucket granularity follows ``step``: a 15-minute spine
    aggregates into 15-minute buckets (no phantom always-empty rows),
    and a daily spine rolls data up to days (nothing dropped)."""
    from event_pipeline_spark.operators.temporal import resample_ffill

    df = spark.createDataFrame(
        [
            ("a", "2026-01-01 10:05:00", 1.0),
            ("a", "2026-01-01 10:20:00", 2.0),
            ("a", "2026-01-01 11:10:00", 8.0),  # 10:30 and 10:45 are gaps
            ("a", "2026-01-03 00:30:00", 4.0),
        ],
        "k string, ts_s string, v double",
    ).select("k", F.to_timestamp("ts_s").alias("ts"), "v")

    q = resample_ffill(
        df.where(F.col("ts") < "2026-01-02"),
        keys=["k"],
        ts="ts",
        value_exprs={"total": F.sum("v")},
        step="15 minutes",
    ).collect()
    quarter = {(r["h"].hour, r["h"].minute): (r["n"], r["total"]) for r in q}
    assert quarter[(10, 0)] == (1, 1.0)
    assert quarter[(10, 15)] == (1, 2.0)
    assert quarter[(10, 30)] == (0, 2.0)  # gap: count 0, carried value
    assert quarter[(10, 45)] == (0, 2.0)
    assert quarter[(11, 0)] == (1, 8.0)
    assert len(quarter) == 5  # every spine row is a real 15-min bucket

    d = resample_ffill(
        df, keys=["k"], ts="ts", value_exprs={"total": F.sum("v")},
        step="1 day",
    ).collect()
    daily = {r["h"].day: (r["n"], r["total"]) for r in d}
    assert daily[1] == (3, 11.0)  # all three Jan-1 rows roll up — none dropped
    assert daily[2] == (0, 11.0)
    assert daily[3] == (1, 4.0)
    assert len(daily) == 3


# -- asof_join vs pandas merge_asof (property differential) ------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _asof_case(draw):
    n_left = draw(st.integers(1, 12))
    n_right = draw(st.integers(0, 12))
    keys = ["k1", "k2"]
    lts = draw(st.lists(st.integers(0, 50), min_size=n_left, max_size=n_left))
    rts = draw(
        st.lists(st.integers(0, 50), min_size=n_right, max_size=n_right)
    )
    lkeys = draw(
        st.lists(st.sampled_from(keys), min_size=n_left, max_size=n_left)
    )
    rkeys = draw(
        st.lists(st.sampled_from(keys), min_size=n_right, max_size=n_right)
    )
    tol = draw(st.one_of(st.none(), st.integers(1, 20)))
    return lts, lkeys, rts, rkeys, tol


@given(case=_asof_case())
@settings(max_examples=25, deadline=None)
def test_asof_join_matches_pandas_merge_asof(spark, case):
    """Random keyed timelines: Spark's union+window as-of join must
    agree with pandas merge_asof (backward, by-key, tolerance),
    including no-match NULLs and same-instant ties."""
    import datetime as dt

    import pandas as pd

    from event_pipeline_spark.operators.temporal import asof_join

    lts, lkeys, rts, rkeys, tol = case
    base = dt.datetime(2026, 1, 1)
    sec = dt.timedelta(seconds=1)
    left_pd = pd.DataFrame(
        {
            "sym": lkeys,
            "ts": [base + t * sec for t in lts],
            "lid": range(len(lts)),
        }
    )
    # merge_asof picks an arbitrary right row among exact (key, ts)
    # duplicates; de-dupe the right side so the expectation is defined
    right_pd = pd.DataFrame(
        {
            "sym": pd.Series(rkeys, dtype="object"),
            "ts": pd.Series(
                [base + t * sec for t in rts], dtype="datetime64[ns]"
            ),
            "px": pd.Series([float(t) for t in rts], dtype="float64"),
        }
    ).drop_duplicates(["sym", "ts"], keep="last")

    left = spark.createDataFrame(left_pd)
    right = spark.createDataFrame(
        right_pd, schema="sym string, ts timestamp, px double"
    )
    got = {
        r["lid"]: r["px"]
        for r in asof_join(
            left, right, ["sym"], ts="ts",
            tolerance_seconds=float(tol) if tol else None,
        ).collect()
    }

    want_df = pd.merge_asof(
        left_pd.sort_values(["ts", "lid"]),
        right_pd.sort_values("ts"),
        on="ts",
        by="sym",
        direction="backward",
        tolerance=(pd.Timedelta(seconds=tol) if tol else None),
    )
    want = {
        int(r.lid): (None if pd.isna(r.px) else float(r.px))
        for r in want_df.itertuples()
    }
    assert got == want


def test_events_funnel_strict_order_and_horizon(spark):
    from datetime import datetime

    from event_pipeline_spark.operators.temporal import events_funnel

    t = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # u1 completes in order within the horizon
        (1, "view", t(0)), (1, "click", t(1)),
        (1, "signup", t(2)), (1, "purchase", t(3)),
        # u2: purchase BEFORE signup -> depth stops at click... then a
        # signup arrives later, then NO further purchase: depth 3
        (2, "view", t(0)), (2, "click", t(1)),
        (2, "purchase", t(2)), (2, "signup", t(4)),
        # u3: click at the SAME timestamp as view -> strict order
        # rejects it; a later click counts
        (3, "view", t(0)), (3, "click", t(0)), (3, "click", t(5)),
        # u4: click outside the 1-hour horizon -> depth 1
        (4, "view", t(0)), (4, "click", datetime(2024, 1, 1, 2, 0)),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    unbounded = events_funnel(df).collect()[0]
    assert (
        unbounded["n_view"], unbounded["n_click"],
        unbounded["n_signup"], unbounded["n_purchase"],
    ) == (4, 4, 2, 1)
    assert unbounded["conv_purchase"] == 0.25

    bounded = events_funnel(df, horizon_hours=1).collect()[0]
    assert (
        bounded["n_view"], bounded["n_click"],
        bounded["n_signup"], bounded["n_purchase"],
    ) == (4, 3, 2, 1)  # only u4's late click drops out


def test_events_retention_triangle(spark):
    from datetime import datetime

    from event_pipeline_spark.operators.temporal import events_retention

    d = lambda day, h=0: datetime(2024, 1, day, h)  # noqa: E731
    rows = [
        (1, "purchase", d(1)), (1, "purchase", d(3)),
        (1, "purchase", d(3, 5)),        # same day: one activity
        (2, "purchase", d(1)),
        (2, "view", d(3)),               # non-qualifying type: ignored
        (3, "purchase", d(2)),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    out = {
        (r["cohort_day"], r["day_offset"]): r
        for r in events_retention(df, activity_type="purchase").collect()
    }
    r0 = out[("2024-01-01", 0)]
    assert (r0["n_active"], r0["retention"]) == (2, 1.0)
    r2 = out[("2024-01-01", 2)]
    assert (r2["n_active"], r2["retention"]) == (1, 0.5)
    assert out[("2024-01-02", 0)]["n_active"] == 1
    assert ("2024-01-01", 1) not in out  # nobody active at offset 1


def test_events_transitions_counts_and_rows(spark):
    from datetime import datetime

    from event_pipeline_spark.operators.temporal import events_transitions

    t = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        (1, 1, "view", t(0)), (1, 2, "click", t(1)),
        (1, 3, "view", t(2)), (1, 4, "click", t(3)),
        (2, 5, "view", t(0)), (2, 6, "purchase", t(1)),
        # u3 has one event: no transition emitted
        (3, 7, "view", t(0)),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts timestamp"
    )
    out = {
        (r["from_type"], r["to_type"]): r
        for r in events_transitions(df).collect()
    }
    assert out[("view", "click")]["n"] == 2
    assert out[("view", "purchase")]["n"] == 1
    assert out[("view", "click")]["p"] == round(2 / 3, 6)
    assert out[("click", "view")]["n"] == 1  # within u1 only
    # total transitions = events - users-with-events (one less per user)
    assert sum(r["n"] for r in out.values()) == 7 - 3


def test_interarrival_hand_case(spark):
    """Gaps 1h, 3h for one type: mean 2h, var 2h^2 (sample), cv
    resolved by hand; a single-event type yields no row; a two-event
    type has one gap and NULL var/cv."""
    import datetime as dt
    import math

    from event_pipeline_spark.operators.temporal import (
        interarrival_stats,
    )

    h = 3_600_000_000  # µs
    rows = [
        (1, dt.datetime(2024, 1, 1, 0), 1, "view"),
        (2, dt.datetime(2024, 1, 1, 1), 1, "view"),
        (3, dt.datetime(2024, 1, 1, 4), 1, "view"),
        (4, dt.datetime(2024, 1, 1, 0), 1, "click"),   # single event
        (5, dt.datetime(2024, 1, 1, 0), 1, "error"),
        (6, dt.datetime(2024, 1, 1, 2), 1, "error"),   # one gap
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string",
    )
    out = {r["event_type"]: r for r in interarrival_stats(ev).collect()}
    assert set(out) == {"view", "error"}
    v = out["view"]
    assert v["n_gaps"] == 2
    assert v["mean_us"] == 2.0 * h
    # sample variance of {1h, 3h} = 2 h^2 (unrounded emission)
    assert v["var_us"] == 2.0 * h * h
    assert v["cv"] == math.sqrt(2.0 * h * h) / (2.0 * h)
    e = out["error"]
    assert (e["n_gaps"], e["var_us"], e["cv"]) == (1, None, None)
    assert e["mean_us"] == 2.0 * h


def test_stickiness_hand_case(spark):
    """Three users over a 10-day gap: DAU/WAU/MAU windows checked by
    hand, including a day served only by the trailing windows."""
    from datetime import datetime

    from event_pipeline_spark.operators.temporal import (
        active_user_stickiness,
    )

    rows = [
        (1, datetime(2024, 1, 1, 5)), (2, datetime(2024, 1, 1, 6)),
        (1, datetime(2024, 1, 2, 5)),
        (3, datetime(2024, 1, 10, 5)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz")
    out = {
        r["day"]: r for r in active_user_stickiness(df).collect()
    }
    # only observed days appear
    assert sorted(out) == ["2024-01-01", "2024-01-02", "2024-01-10"]
    d1 = out["2024-01-01"]
    assert (d1["dau"], d1["wau"], d1["mau"]) == (2, 2, 2)
    d2 = out["2024-01-02"]
    assert (d2["dau"], d2["wau"], d2["mau"]) == (1, 2, 2)
    d10 = out["2024-01-10"]
    # day 10: dau = {3}; wau = {3} (days 1-2 are > 6 days back);
    # mau = all three users within 30 days
    assert (d10["dau"], d10["wau"], d10["mau"]) == (1, 1, 3)
    assert d10["stickiness_m"] == 1 / 3


def test_funnel_stage_times_hand_case(spark):
    """Two converters with known latencies + one user whose purchase
    precedes signup (never counted): medians and means by hand."""
    from datetime import datetime

    from event_pipeline_spark.operators.temporal import (
        funnel_stage_times,
    )

    t = lambda m: datetime(2024, 5, 1, 10, m)  # noqa: E731
    rows = [
        # user 1: view@0, click@10, signup@20, purchase@40
        (1, t(0), "view"), (1, t(10), "click"),
        (1, t(20), "signup"), (1, t(40), "purchase"),
        # user 2: view@0, click@30
        (2, t(0), "view"), (2, t(30), "click"),
        # user 3: purchase before anything, then view only
        (3, t(0), "purchase"), (3, t(5), "view"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_type string"
    )
    out = {
        r["stage"]: r
        for r in funnel_stage_times(df, horizon_hours=6).collect()
    }
    mi = 60_000_000  # a minute in microseconds
    c = out[2]
    assert c["step"] == "click" and c["n_users"] == 2
    assert c["p50_us"] == 10 * mi  # nearest-rank median of [10m, 30m]
    assert c["mean_us"] == 20 * mi
    assert out[3]["n_users"] == 1 and out[3]["p50_us"] == 20 * mi
    assert out[4]["n_users"] == 1 and out[4]["p50_us"] == 40 * mi
    assert 5 not in out and 1 not in out


def test_resample_ohlc_hand_case(spark):
    """Open/close follow (ts, tiebreak) total order, including a tie
    on ts resolved by event_id."""
    from datetime import datetime

    from event_pipeline_spark.operators.temporal import resample_ohlc

    rows = [
        # one hour bar: open=3.00 (earliest), close=1.50 (latest,
        # tie on ts broken by higher event_id)
        (1, datetime(2024, 1, 1, 10, 0), 1, "view", 3.00, "{}"),
        (2, datetime(2024, 1, 1, 10, 20), 1, "view", 9.25, "{}"),
        (3, datetime(2024, 1, 1, 10, 40), 1, "view", 0.75, "{}"),
        (4, datetime(2024, 1, 1, 10, 40), 1, "view", 1.50, "{}"),
        # next bar, single row: OHLC all equal
        (5, datetime(2024, 1, 1, 11, 5), 1, "view", 2.00, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    out = {r["bar"].hour: r for r in resample_ohlc(ev).collect()}
    b10 = out[10]
    assert (b10["n"], b10["open_cents"], b10["close_cents"]) == (4, 300, 150)
    assert (b10["high_cents"], b10["low_cents"]) == (925, 75)
    b11 = out[11]
    assert (
        b11["open_cents"], b11["high_cents"],
        b11["low_cents"], b11["close_cents"],
    ) == (200, 200, 200, 200)


def test_event_transitions_hand_case(spark):
    """Two users' sequences, tied timestamps broken by event_id; the
    matrix counts and row-normalized shares by hand."""
    import datetime as dt

    from event_pipeline_spark.operators.temporal import event_transitions

    t0 = dt.datetime(2024, 3, 1, 9)
    rows = [
        # user 1: x -> x -> y (second/third share a timestamp: id order)
        (1, t0, 1, "x"), (2, t0.replace(hour=10), 1, "x"),
        (3, t0.replace(hour=10), 1, "y"),
        # user 2: y -> x
        (4, t0, 2, "y"), (5, t0.replace(hour=11), 2, "x"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    got = {
        (r["prev_type"], r["next_type"]): (r["n"], r["p"])
        for r in event_transitions(ev).collect()
    }
    assert got == {
        ("x", "x"): (1, 0.5),
        ("x", "y"): (1, 0.5),
        ("y", "x"): (1, 1.0),
    }


def test_markov_ksteps_hand_case(spark):
    """The integer-unit chain on a 2-state fixture, every step checked
    against the hand-computed truncating-DIV arithmetic."""
    import datetime as dt

    from event_pipeline_spark.operators.temporal import (
        markov_kstep_distribution,
    )

    t0 = dt.datetime(2024, 3, 1, 9)
    rows = [
        (1, t0, 1, "x"), (2, t0.replace(hour=10), 1, "x"),
        (3, t0.replace(hour=11), 1, "y"),
        (4, t0, 2, "y"), (5, t0.replace(hour=11), 2, "x"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    got = {
        (r["step"], r["event_type"]): r["prob_units"]
        for r in markov_kstep_distribution(ev, k_steps=3).collect()
    }
    # firsts: u1->x, u2->y  (500M units each)
    assert got[(0, "x")] == 500_000_000 and got[(0, "y")] == 500_000_000
    # trans: x->{x:1, y:1} tot 2; y->{x:1} tot 1
    assert got[(1, "x")] == 750_000_000 and got[(1, "y")] == 250_000_000
    assert got[(2, "x")] == 625_000_000 and got[(2, "y")] == 375_000_000
    assert got[(3, "x")] == 687_500_000 and got[(3, "y")] == 312_500_000


def test_event_paths_hand_case(spark):
    """First-3 journeys with a short user contributing a shorter path
    and ties broken by event_id."""
    import datetime as dt

    from event_pipeline_spark.operators.temporal import event_paths

    t0 = dt.datetime(2024, 3, 1, 9)
    rows = [
        (1, t0, 1, "x"), (2, t0, 1, "y"),      # tie: id order -> x>y
        (3, t0.replace(hour=10), 1, "z"),
        (4, t0.replace(hour=11), 1, "q"),       # 4th event: ignored
        (5, t0, 2, "x"), (6, t0.replace(hour=10), 2, "y"),
        (7, t0.replace(hour=11), 2, "z"),
        (8, t0, 3, "x"),                        # short user
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    got = {r["path"]: r["n_users"] for r in event_paths(ev, k=3).collect()}
    assert got == {"x>y>z": 2, "x": 1}
