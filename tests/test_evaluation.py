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


# -- retrieval metrics (nDCG@k / MRR) ----------------------------------------


def _py_ndcg(rels_retrieved, rels_all, k=10):
    import math

    disc = {r: round(1e7 / math.log2(r + 1)) for r in range(1, k + 1)}
    dcg = sum(
        (2 ** rel - 1) * disc[i + 1]
        for i, rel in enumerate(rels_retrieved[:k])
    )
    ideal = sorted(rels_all, reverse=True)[:k]
    idcg = sum((2 ** rel - 1) * disc[i + 1] for i, rel in enumerate(ideal))
    return dcg / idcg if idcg else None


def test_ndcg_matches_python_reference(spark):
    """nDCG@k and MRR over a small corpus must equal a sequential
    Python computation with the same tf>=2 graded relevance and the
    same BM25 ranking."""
    from event_pipeline_spark.operators.evaluation import ndcg_mrr
    from event_pipeline_spark.operators.ranking import bm25_topk

    terms = ["alpha", "beta"]
    docs = spark.createDataFrame(
        [
            # rel 2: both terms twice
            (1, "alpha alpha beta beta filler"),
            # rel 1: alpha twice, beta once
            (2, "alpha alpha beta filler filler"),
            # rel 0 but retrievable (terms present once)
            (3, "alpha beta filler filler filler"),
            # rel 1: beta twice
            (4, "beta beta filler filler filler"),
            # unjudged, irrelevant
            (5, "gamma delta epsilon zeta eta"),
        ],
        "doc_id long, text string",
    )
    row = ndcg_mrr(docs, "q", terms, k=10).collect()[0]

    ranked = bm25_topk(docs, terms, top_k=10).orderBy("rank").collect()
    rel_by_doc = {1: 2, 2: 1, 4: 1}
    rels_retrieved = [rel_by_doc.get(r["doc_id"], 0) for r in ranked]
    want = _py_ndcg(rels_retrieved, list(rel_by_doc.values()))
    assert row["n_rel"] == 3
    assert abs(row["ndcg_at_k"] - want) < 1e-12
    first = next(
        i + 1 for i, r in enumerate(ranked) if rel_by_doc.get(r["doc_id"], 0)
    )
    assert row["first_rel_rank"] == first
    assert row["rr"] == 1.0 / first


def test_ndcg_no_relevant_docs_is_zero_idcg(spark):
    from event_pipeline_spark.operators.evaluation import ndcg_mrr

    docs = spark.createDataFrame(
        [(1, "alpha filler"), (2, "beta filler")],  # no tf>=2 anywhere
        "doc_id long, text string",
    )
    row = ndcg_mrr(docs, "q", ["alpha", "beta"], k=10).collect()[0]
    assert row["n_rel"] == 0
    assert row["idcg_units"] == 0
    assert row["ndcg_at_k"] is None
    assert row["first_rel_rank"] is None and row["rr"] is None


def test_calibration_bins_exact_small_case(spark):
    """Hand-computed reliability bins: perfectly calibrated bin vs a
    maximally miscalibrated one, plus Brier arithmetic."""
    from event_pipeline_spark.operators.evaluation import calibration_bins

    P = 10**7
    rows = (
        # bin 2 (p=0.25): 4 rows, 1 positive -> frac 0.25, gap 0
        [(int(0.25 * P), 1)] + [(int(0.25 * P), 0)] * 3
        # bin 9 (p=0.95): 2 rows, 0 positives -> gap +0.95
        + [(int(0.95 * P), 0)] * 2
        # p=1.0 folds into bin 9
        + [(P, 1)]
    )
    df = spark.createDataFrame(rows, "p_units long, label int")
    out = {r["bin"]: r for r in calibration_bins(
        df, p_units_col="p_units", label_col="label").collect()}
    b2, b9 = out[2], out[9]
    assert b2["n"] == 4 and b2["n_pos"] == 1
    assert abs(b2["mean_p"] - 0.25) < 1e-12 and b2["gap"] == 0.0
    # Brier for bin 2: (0.25-1)^2 + 3*(0.25-0)^2 over 4 = 0.75^2/4*... 
    assert abs(b2["brier"] - ((0.75**2 + 3 * 0.25**2) / 4)) < 1e-12
    assert b9["n"] == 3 and b9["n_pos"] == 1  # includes folded p=1.0
    assert abs(b9["mean_p"] - (0.95 * 2 + 1.0) / 3) < 1e-12


# -- PR/ROC curve (threshold sweep) -------------------------------------------


def _curve(spark, rows):
    from event_pipeline_spark.operators.evaluation import pr_curve_by_group

    df = spark.createDataFrame(rows, "g string, score double, label int")
    return pr_curve_by_group(
        df, group_col="g", score_col="score", label_col="label"
    )


def test_pr_curve_exact_points(spark):
    """Hand case: scores [1-, 2+, 2-, 3+] — three thresholds, counts
    checked against the confusion matrix at each."""
    rows = [("t", 1.0, 0), ("t", 2.0, 1), ("t", 2.0, 0), ("t", 3.0, 1)]
    pts = {
        r["threshold"]: r
        for r in _curve(spark, rows).collect()
    }
    assert pts[3.0]["tp"] == 1 and pts[3.0]["fp"] == 0
    assert pts[3.0]["precision"] == 1.0 and pts[3.0]["recall"] == 0.5
    assert pts[2.0]["tp"] == 2 and pts[2.0]["fp"] == 1
    assert pts[2.0]["precision"] == 2 / 3 and pts[2.0]["recall"] == 1.0
    assert pts[1.0]["tp"] == 2 and pts[1.0]["fp"] == 2
    assert pts[1.0]["fn"] == 0 and pts[1.0]["fpr"] == 1.0


def test_pr_curve_trapezoid_equals_midrank_auc(spark):
    """Trapezoid integration of the curve's tie-collapsed ROC points
    reproduces auc_by_group's midrank Mann-Whitney AUC EXACTLY — the
    identity holds in integer units (sum of (Δfp)·(tp+tp_prev) equals
    the doubled-unit auc_num), so the assert is ==, not approx."""
    import hashlib

    from event_pipeline_spark.operators.evaluation import auc_by_group

    rows = []
    for i in range(300):
        h = hashlib.md5(f"prc{i}".encode()).hexdigest()
        score = float(int(h[:4], 16) % 40)  # heavy ties
        label = 1 if int(h[4:6], 16) % 3 == 0 else 0
        rows.append(("r", score, label))
    df = spark.createDataFrame(rows, "g string, score double, label int")
    pts = sorted(
        (r["threshold"], r["tp"], r["fp"])
        for r in _curve(spark, rows).collect()
    )[::-1]  # descending threshold = ROC sweep order
    num2 = 0
    prev_tp = prev_fp = 0
    for _, tp, fp in pts:
        num2 += (fp - prev_fp) * (tp + prev_tp)
        prev_tp, prev_fp = tp, fp
    ref = auc_by_group(
        df, group_col="g", score_col="score", label_col="label"
    ).collect()[0]
    assert num2 == ref["auc_num"]
    assert num2 / (2 * ref["n_pos"] * ref["n_neg"]) == ref["auc"]


def test_pr_curve_grades_minhash_estimates(spark):
    """The intended application: sweep MinHash-estimated Jaccard as a
    scorer of true near-duplicates (exact Jaccard >= 0.5) and read the
    threshold choice off exact confusion counts. The top-scoring
    threshold bucket must be pure (precision 1.0) and recall must be
    monotone non-decreasing as the threshold drops."""
    from pyspark.sql import functions as F

    from event_pipeline_spark.operators.dedup import (
        jaccard,
        minhash_signature,
        shingles,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = [(i, base) for i in range(6)]
    docs += [(10 + i, base + f" variant tail number {i}") for i in range(6)]
    docs += [
        (20 + i, f"completely different text about topic {i} "
                 f"with unrelated words {i * 7}")
        for i in range(8)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string").select(
        "doc_id",
        minhash_signature(F.col("text"), 32, 3).alias("sig"),
        shingles(F.col("text"), 3).alias("sh"),
    )
    a, b = df.alias("a"), df.alias("b")
    pairs = a.join(
        b, F.col("a.doc_id") < F.col("b.doc_id")
    ).select(
        # estimated Jaccard = fraction of matching minhash slots
        (
            F.size(
                F.filter(
                    F.zip_with("a.sig", "b.sig", lambda x, y: x == y),
                    lambda m: m,
                )
            )
            / F.size("a.sig")
        ).alias("score"),
        (jaccard(F.col("a.sh"), F.col("b.sh")) >= 0.5).cast("int").alias(
            "label"
        ),
        F.lit("mh").alias("g"),
    )
    from event_pipeline_spark.operators.evaluation import pr_curve_by_group

    pts = (
        pr_curve_by_group(
            pairs, group_col="g", score_col="score", label_col="label"
        )
        .orderBy(F.desc("threshold"))
        .collect()
    )
    assert pts[0]["precision"] == 1.0  # identical docs agree on all slots
    recalls = [p["recall"] for p in pts]
    assert recalls == sorted(recalls)
    assert recalls[-1] == 1.0  # threshold 0 recovers every true pair


# -- gain / lift deciles -------------------------------------------------------


def test_gain_deciles_hand_case(spark):
    """20 rows, perfect separation in the top two deciles: gains and
    lifts checked by hand, tile sizes balanced."""
    from event_pipeline_spark.operators.evaluation import (
        gain_deciles_by_group,
    )

    rows = [("g", float(100 - i), 1 if i < 4 else 0, i) for i in range(20)]
    out = {
        r["decile"]: r
        for r in gain_deciles_by_group(
            spark.createDataFrame(
                rows, "g string, score double, label int, id int"
            ),
            group_col="g", score_col="score", label_col="label",
            id_col="id",
        ).collect()
    }
    assert all(out[d]["n_rows"] == 2 for d in range(10))
    assert out[0]["n_pos"] == 2 and out[1]["n_pos"] == 2
    assert out[1]["gain"] == 1.0 and out[2]["n_pos"] == 0
    # top decile: captured 2/4 positives holding 2/20 rows -> lift 5
    assert out[0]["lift"] == 5.0
    assert out[9]["gain"] == 1.0 and out[9]["lift"] == 1.0


def test_gain_deciles_tie_break_is_deterministic(spark):
    """All-equal scores: tiles follow the id tie-break, so reruns and
    different partitionings give identical tables."""
    from event_pipeline_spark.operators.evaluation import (
        gain_deciles_by_group,
    )

    rows = [("g", 1.0, i % 2, i) for i in range(30)]
    df1 = spark.createDataFrame(
        rows, "g string, score double, label int, id int"
    )
    df2 = df1.repartition(13)
    t1 = sorted(
        map(tuple, gain_deciles_by_group(
            df1, group_col="g", score_col="score",
            label_col="label", id_col="id").collect())
    )
    t2 = sorted(
        map(tuple, gain_deciles_by_group(
            df2, group_col="g", score_col="score",
            label_col="label", id_col="id").collect())
    )
    assert t1 == t2


def test_rouge_hand_case(spark):
    from event_pipeline_spark.operators.evaluation import rouge_n_pairs

    # a: 'x y x z'  (uni: x2 y1 z1, t=4; bi: 'x y','y x','x z', t=3)
    # b: 'x y x'    (uni: x2 y1,    t=3; bi: 'x y','y x',      t=2)
    docs = spark.createDataFrame(
        [(1, "x y x z"), (2, "x y x")], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    rows = {r["n"]: r for r in rouge_n_pairs(docs, pairs).collect()}
    r1, r2 = rows[1], rows[2]
    # unigram overlap = min(2,2)+min(1,1) = 3 (clipped multiset)
    assert (r1["overlap"], r1["total_a"], r1["total_b"]) == (3, 4, 3)
    assert r1["p"] == 1.0 and r1["r"] == 0.75
    assert r1["f1"] == round(2 * 3 / 7, 7)
    # bigram overlap = 2 ('x y', 'y x')
    assert (r2["overlap"], r2["total_a"], r2["total_b"]) == (2, 3, 2)
    assert r2["p"] == 1.0 and r2["r"] == round(2 / 3, 7)
    assert r2["f1"] == 0.8


def test_rouge_disjoint_pair_zero(spark):
    from event_pipeline_spark.operators.evaluation import rouge_n_pairs

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "d e f")], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    for r in rouge_n_pairs(docs, pairs).collect():
        assert r["overlap"] == 0 and r["f1"] == 0.0


def test_ips_uniform_hand_case(spark):
    """Uniform-policy IPS on a skewed log: the rare action's rewards
    up-weight; the total equals the mean of per-action mean rewards."""
    from event_pipeline_spark.operators.evaluation import (
        ips_uniform_value,
    )

    # action A logged 3x with rewards 1.00; action B once with 4.00
    df = spark.createDataFrame(
        [("A", 1.0), ("A", 1.0), ("A", 1.0), ("B", 4.0)],
        "a string, r double",
    )
    rows = {
        r["action"]: r
        for r in ips_uniform_value(
            df, action_col="a", reward_col="r"
        ).collect()
    }
    a, b = rows["A"], rows["B"]
    assert (a["n_a"], a["n"], a["k"], a["sum_cents"]) == (3, 4, 2, 300)
    assert a["p_hat"] == 0.75 and a["w"] == round(4 / 6, 7)
    # contrib = sum_r/(K*n_a): A -> 300/6 = 50; B -> 400/2 = 200
    assert a["contrib_cents"] == 50.0 and b["contrib_cents"] == 200.0
    # total 250 cents == mean of per-action means (100 + 400)/2
    assert a["contrib_cents"] + b["contrib_cents"] == 250.0
