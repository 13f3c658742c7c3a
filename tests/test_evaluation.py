"""Exact AUC (operators/evaluation.py).

Hand cases against sklearn-style midrank AUC semantics: perfect
separation, ties split evenly, and the degenerate one-class group.
"""

from __future__ import annotations


def _auc(spark, rows):
    from event_pipeline_spark.operators.evaluation import auc_by_group

    df = spark.createDataFrame(
        rows, "g string, score double, label int"
    )
    return {
        r["g"]: r
        for r in auc_by_group(
            df, group_col="g", score_col="score", label_col="label"
        ).collect()
    }


def test_auc_perfect_and_inverted(spark):
    rows = [("p", float(s), 1 if s >= 3 else 0) for s in range(1, 5)]
    rows += [("i", float(s), 0 if s >= 3 else 1) for s in range(1, 5)]
    out = _auc(spark, rows)
    assert out["p"]["auc"] == 1.0
    assert out["i"]["auc"] == 0.0


def test_auc_midrank_ties(spark):
    """One positive tied with one negative at the top: the tied pair
    contributes 1/2 — AUC = (1*1 + 0.5) / 2... resolved by hand:
    scores [1-, 2+, 2-, 3+]: pairs (2+,1-)=1 (2+,2-)=.5 (3+,1-)=1
    (3+,2-)=1 -> AUC = 3.5/4."""
    rows = [
        ("t", 1.0, 0),
        ("t", 2.0, 1),
        ("t", 2.0, 0),
        ("t", 3.0, 1),
    ]
    out = _auc(spark, rows)
    assert out["t"]["auc"] == 3.5 / 4
    assert out["t"]["n_pos"] == 2 and out["t"]["n_neg"] == 2
    # doubled-unit numerator: auc * 2 * np * nn
    assert out["t"]["auc_num"] == 7


def test_auc_random_matches_pair_counting(spark):
    """Exact pair-counting reference on a pseudo-random set."""
    import hashlib

    pts = []
    for i in range(200):
        h = hashlib.md5(f"auc{i}".encode()).hexdigest()
        score = int(h[:4], 16) % 50  # heavy ties
        label = 1 if int(h[4:6], 16) % 3 == 0 else 0
        pts.append((float(score), label))
    wins = ties = 0
    pos = [s for s, y in pts if y == 1]
    neg = [s for s, y in pts if y == 0]
    for p in pos:
        for n in neg:
            if p > n:
                wins += 1
            elif p == n:
                ties += 1
    expected = (wins + 0.5 * ties) / (len(pos) * len(neg))
    out = _auc(spark, [("r", s, y) for s, y in pts])
    assert out["r"]["auc"] == expected


def test_auc_one_class_group_is_null(spark):
    out = _auc(spark, [("o", 1.0, 1), ("o", 2.0, 1)])
    assert out["o"]["auc"] is None
    assert out["o"]["n_neg"] == 0
