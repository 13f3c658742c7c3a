"""Misra–Gries heavy hitters: the deterministic guarantee (recall of
items above 2n/(cap+1), bounded undercount, never overcount) on skewed
data across many partitions; interval-overlap join edges. The exact
small-domain case and the binned-join rewrite are oracle-gated via the
registered queries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from event_pipeline_spark.operators.frequent import frequent_items
from event_pipeline_spark.operators.temporal import interval_join


def test_misra_gries_guarantees_on_skewed_data(spark):
    """Zipf-ish corpus over 32 partitions: heavy items must all
    surface; estimates are lower bounds within n/(cap+1)."""
    # item i appears 2000//(i+1) times: heavy head, long-ish tail
    rows = []
    for i in range(400):
        rows.extend([(f"item_{i}",)] * (2000 // (i + 1)))
    df = spark.createDataFrame(rows, "w string").repartition(32)
    n = len(rows)
    k, cap = 10, 200
    out = frequent_items(df, "w", k=k, capacity=cap).collect()
    est = {r["item"]: r["est_count"] for r in out}
    err = n // (cap + 1)
    assert all(r["err_bound"] == err for r in out)

    true = {}
    for i in range(400):
        true[f"item_{i}"] = 2000 // (i + 1)
    # recall: every item above 2*err must appear in a k=10 listing of
    # this distribution (the top items dwarf 2*err)
    heavy = sorted(true, key=true.get, reverse=True)[:k]
    for item in heavy:
        if true[item] > 2 * err:
            assert item in est, item
    # estimates are lower bounds within the bound
    for item, e in est.items():
        assert e <= true[item]
        assert true[item] - e <= err


def test_frequent_items_exact_when_capacity_exceeds_domain(spark):
    df = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 1, "w string"
    ).repartition(4)
    out = frequent_items(df, "w", k=3, capacity=64).collect()
    assert [(r["item"], r["est_count"]) for r in out] == [
        ("a", 5), ("b", 3), ("c", 1),
    ]


def test_interval_join_matches_naive_overlap(spark):
    a = spark.createDataFrame(
        [(1, 0.0, 5.0), (2, 10.0, 20.0), (3, 4.0, 11.0)],
        "a_id long, a_lo double, a_hi double",
    )
    b = spark.createDataFrame(
        [(7, 4.5, 6.0), (8, 19.0, 30.0), (9, 100.0, 101.0)],
        "b_id long, b_lo double, b_hi double",
    )
    got = {
        (r["a_id"], r["b_id"])
        for r in interval_join(
            a, b, l_lo="a_lo", l_hi="a_hi", r_lo="b_lo", r_hi="b_hi",
            bin_width=3.0,
        ).collect()
    }
    naive = {
        (ra["a_id"], rb["b_id"])
        for ra in a.collect()
        for rb in b.collect()
        if ra["a_lo"] <= rb["b_hi"] and rb["b_lo"] <= ra["a_hi"]
    }
    assert got == naive == {(1, 7), (3, 7), (2, 8)}


def test_interval_join_broadcast_escape_is_not_bhj(spark):
    """Round-11 guard: ``broadcast_build=False`` must force a
    sort-merge bin join whatever Catalyst's static size estimate says.
    Under AQE-off (or stale stats at real scale) the estimate of the
    exploded ``Generate(Union(...))`` side can stay under the broadcast
    threshold and plan a BroadcastHashJoin over a multi-million-row
    built side; the escape pins the spill-safe plan. Results must be
    identical on both paths."""
    a = spark.createDataFrame(
        [(1, 0.0, 5.0), (2, 10.0, 20.0), (3, 4.0, 11.0)],
        "a_id long, a_lo double, a_hi double",
    )
    b = spark.createDataFrame(
        [(7, 4.5, 6.0), (8, 19.0, 30.0), (9, 100.0, 101.0)],
        "b_id long, b_lo double, b_hi double",
    )
    kw = dict(l_lo="a_lo", l_hi="a_hi", r_lo="b_lo", r_hi="b_hi",
              bin_width=3.0)
    forced = interval_join(a, b, broadcast_build=False, **kw)
    plan = forced._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan
    assert "SortMergeJoin" in plan
    got = {(r["a_id"], r["b_id"]) for r in forced.collect()}
    auto = {
        (r["a_id"], r["b_id"])
        for r in interval_join(a, b, **kw).collect()
    }
    assert got == auto == {(1, 7), (3, 7), (2, 8)}


def test_interval_join_rejects_column_collisions(spark):
    df = spark.createDataFrame([(1, 0.0, 1.0)], "id long, lo double, hi double")
    with pytest.raises(ValueError, match="collide"):
        interval_join(
            df, df, l_lo="lo", l_hi="hi", r_lo="lo", r_hi="hi", bin_width=1.0
        )


def test_frequent_items_ignores_nulls(spark):
    """Nulls must not collide with the merge protocol's count-sentinel
    null row (or surface as a 'most frequent item')."""
    df = spark.createDataFrame(
        [("a",)] * 4 + [(None,)] * 10 + [("b",)] * 2,
        "w string",
    ).repartition(3)
    out = frequent_items(df, "w", k=5, capacity=64).collect()
    assert [(r["item"], r["est_count"]) for r in out] == [("a", 4), ("b", 2)]
    # error bound excludes nulls too: n=6 non-null rows
    assert all(r["err_bound"] == 6 // 65 for r in out)


# -- binned joins vs brute force (property differential) ---------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_iv = st.tuples(
    st.floats(-20, 20, allow_nan=False), st.floats(0, 15, allow_nan=False)
)


@given(
    a_ivs=st.lists(_iv, min_size=1, max_size=8),
    b_ivs=st.lists(_iv, min_size=1, max_size=8),
    width=st.sampled_from([0.7, 3.0, 11.0]),
)
@settings(max_examples=20, deadline=None)
def test_interval_join_differential_vs_bruteforce(spark, a_ivs, b_ivs, width):
    """Random interval sets and bin widths: the binned rewrite must be
    exactly the inequality join — bin width affects cost, never the
    result."""
    a = spark.createDataFrame(
        [(i, lo, lo + ln) for i, (lo, ln) in enumerate(a_ivs)],
        "a_id long, a_lo double, a_hi double",
    )
    b = spark.createDataFrame(
        [(i, lo, lo + ln) for i, (lo, ln) in enumerate(b_ivs)],
        "b_id long, b_lo double, b_hi double",
    )
    got = {
        (r["a_id"], r["b_id"])
        for r in interval_join(
            a, b, l_lo="a_lo", l_hi="a_hi", r_lo="b_lo", r_hi="b_hi",
            bin_width=width,
        ).collect()
    }
    want = {
        (i, j)
        for i, (alo, aln) in enumerate(a_ivs)
        for j, (blo, bln) in enumerate(b_ivs)
        if alo <= blo + bln and blo <= alo + aln
    }
    assert got == want


@given(
    pts=st.lists(st.floats(-25, 25, allow_nan=False), min_size=1, max_size=10),
    ivs=st.lists(_iv, min_size=1, max_size=8),
    width=st.sampled_from([0.9, 4.0, 13.0]),
    how=st.sampled_from(["inner", "left"]),
)
@settings(max_examples=20, deadline=None)
def test_range_join_differential_vs_bruteforce(spark, pts, ivs, width, how):
    """Random points/intervals/bin widths, inner and left: the binned
    point-in-interval join equals the plain BETWEEN join, and the left
    form keeps exactly the unmatched points with NULLs."""
    from event_pipeline_spark.operators.temporal import range_join

    points = spark.createDataFrame(
        [(i, v) for i, v in enumerate(pts)], "p_id long, v double"
    )
    ivdf = spark.createDataFrame(
        [(j, lo, lo + ln) for j, (lo, ln) in enumerate(ivs)],
        "i_id long, lo double, hi double",
    )
    got = {
        (r["p_id"], r["i_id"])
        for r in range_join(
            points, ivdf, "v", "lo", "hi", bin_width=width, how=how
        ).collect()
    }
    inner = {
        (i, j)
        for i, v in enumerate(pts)
        for j, (lo, ln) in enumerate(ivs)
        if lo <= v <= lo + ln
    }
    if how == "inner":
        assert got == inner
    else:
        matched_pts = {i for i, _ in inner}
        want = inner | {
            (i, None) for i in range(len(pts)) if i not in matched_pts
        }
        assert got == want
