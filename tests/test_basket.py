"""Market-basket rules (operators/basket.py).

Closed-form oracle: co-occurrence counts and all three scores resolved
BY HAND on 4 tiny baskets.
"""

from __future__ import annotations


def _lineitem(spark):
    # baskets: o1={1,2,3} o2={1,2} o3={1,2} o4={3}; part 1 duplicated
    # inside o1 (distinct must collapse it)
    rows = [
        (1, 1), (1, 1), (1, 2), (1, 3),
        (2, 1), (2, 2),
        (3, 1), (3, 2),
        (4, 3),
    ]
    return spark.createDataFrame(
        [(o, p, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", "1996-01-01")
         for o, p in rows],
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber long, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate string",
    )


def test_closed_form(spark):
    from event_pipeline_spark.operators.basket import basket_rules

    rows = basket_rules(_lineitem(spark), min_pair_count=2).collect()
    got = {(r["p"], r["q"]): r for r in rows}
    # c(1)=3 c(2)=3 c(3)=2; pairs: (1,2):3 (1,3):1 (2,3):1; N=4
    assert set(got) == {(1, 2)}
    r = got[(1, 2)]
    assert (r["c_pq"], r["c_p"], r["c_q"]) == (3, 3, 3)
    assert r["support"] == 0.75
    assert r["conf_pq"] == 1.0
    assert r["conf_qp"] == 1.0
    assert r["lift"] == round(3 * 4 / (3 * 3), 7)


def test_pair_direction_and_min_count(spark):
    from event_pipeline_spark.operators.basket import basket_rules

    rows = basket_rules(_lineitem(spark), min_pair_count=1).collect()
    got = {(r["p"], r["q"]) for r in rows}
    # unordered pairs emitted once, p < q
    assert got == {(1, 2), (1, 3), (2, 3)}


def test_join_is_equi_on_basket_key(spark):
    """The pair join must hash on the basket key (SortMergeJoin /
    ShuffledHashJoin on o) — never a cartesian or nested-loop plan."""
    from event_pipeline_spark.operators.basket import basket_rules

    plan = (
        basket_rules(_lineitem(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
