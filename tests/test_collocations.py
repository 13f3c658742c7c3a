"""Collocation scores (operators/collocations.py).

Closed-form oracle: pair counts and scores resolved BY HAND on a
one-doc corpus, independent of the implementation.
"""

from __future__ import annotations

import math

from event_pipeline_spark.operators.collocations import collocations

# "a b a b c" -> pairs (a,b):2 (b,a):1 (b,c):1; N=4
# left: a->2 b->2; right: b->2 a->1 c->1


def test_closed_form_scores(spark):
    docs = spark.createDataFrame(
        [(0, "a b a b c")], "doc_id long, text string"
    )
    rows = collocations(docs, min_count=1, top_k=10).collect()
    got = {(r["v"], r["w"]): r for r in rows}
    assert set(got) == {("a", "b"), ("b", "a"), ("b", "c")}
    ab = got[("a", "b")]
    assert (ab["c"], ab["left_c"], ab["right_c"]) == (2, 2, 2)
    assert ab["pmi"] == round(math.log(2 * 4 / (2 * 2)), 7)
    assert ab["npmi"] == 1.0  # perfect association: pmi == -ln p(vw)
    assert ab["dice"] == 1.0  # every a is followed by b and vice versa
    ba = got[("b", "a")]
    assert ba["pmi"] == round(math.log(1 * 4 / (2 * 1)), 7)
    assert ba["npmi"] == round(math.log(2) / math.log(4), 7)
    assert ba["dice"] == round(2 / 3, 7)


def test_order_and_tiebreak(spark):
    """All three pairs tie on pmi=ln 2 -> (v, w) lexicographic order."""
    docs = spark.createDataFrame(
        [(0, "a b a b c")], "doc_id long, text string"
    )
    rows = collocations(docs, min_count=1, top_k=10).collect()
    assert [(r["v"], r["w"]) for r in rows] == [
        ("a", "b"), ("b", "a"), ("b", "c")
    ]


def test_min_count_and_topk(spark):
    docs = spark.createDataFrame(
        [(0, "a b a b c")], "doc_id long, text string"
    )
    assert collocations(docs, min_count=2, top_k=10).count() == 1
    assert collocations(docs, min_count=1, top_k=2).count() == 2


def test_topk_plans_heap_not_global_sort(spark):
    """limit-after-orderBy must plan TakeOrderedAndProject (per-
    partition heap), never a global Sort + single-partition fetch."""
    docs = spark.createDataFrame(
        [(0, "a b a b c")], "doc_id long, text string"
    )
    plan = (
        collocations(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def _llr(k11: int, k12: int, k21: int, k22: int) -> float:
    """Dunning (1993) log-likelihood ratio — the documented NON-oracle
    score (x*ln x on corpus-scale counts magnifies libm ulps past the
    1e-7 integer-unit recipe); its behavior is pinned here instead."""

    def xlx(x: float) -> float:
        return x * math.log(x) if x > 0 else 0.0

    n = k11 + k12 + k21 + k22
    r1, r2, c1, c2 = k11 + k12, k21 + k22, k11 + k21, k12 + k22
    return 2.0 * (
        xlx(k11) + xlx(k12) + xlx(k21) + xlx(k22)
        - xlx(r1) - xlx(r2) - xlx(c1) - xlx(c2) + xlx(n)
    )


def test_llr_python_pin():
    """Independence scores ~0; perfect association scores large and
    grows with evidence."""
    assert abs(_llr(25, 25, 25, 25)) < 1e-9
    strong = _llr(50, 0, 0, 50)
    assert strong > 100
    assert _llr(500, 0, 0, 500) > strong


def test_cooccurrence_window_semantics(spark):
    from event_pipeline_spark.operators.collocations import (
        cooccurrence_pmi,
    )

    # 'a b c d e': within window 3, (a,e) never pairs (distance 4),
    # (a,d) does (distance 3). Repeat the doc so min_count=5 keeps all.
    docs = spark.createDataFrame(
        [(i, "a b c d e") for i in range(5)], "doc_id long, text string"
    )
    rows = cooccurrence_pmi(docs, window=3, min_count=5, top_k=100)
    got = {(r["a"], r["b"]): r for r in rows.collect()}
    assert ("a", "d") in got and ("a", "e") not in got
    assert ("b", "e") in got and ("a", "b") in got
    # pair counts: each doc contributes exactly 1 of each in-window
    # unordered pair (no token repeats), 5 docs -> c = 5
    assert all(r["c"] == 5 for r in got.values())
    # marginals count pair-slots: 'a' is in pairs (ab)(ac)(ad) -> 15
    assert got[("a", "b")]["f_a"] == 15
    # 'c' pairs with all four others -> 20
    assert got[("b", "c")]["f_b"] == 20
