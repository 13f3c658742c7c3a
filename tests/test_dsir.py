"""DSIR hashed-n-gram importance weighting (operators/dsir.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_pipeline_spark.operators.dsir import (
    dsir_log_weights,
    hashed_gram_buckets,
)


def test_target_like_docs_score_higher(spark):
    """Docs written in the target's vocabulary must out-weigh docs in
    a disjoint vocabulary — the operator's one-sentence contract."""
    target_rows = [(100 + i, "alpha beta gamma delta epsilon zeta") for i in range(5)]
    target = spark.createDataFrame(target_rows, "doc_id long, text string")
    raw = spark.createDataFrame(
        target_rows
        + [(200 + i, "uno dos tres cuatro cinco seis") for i in range(5)],
        "doc_id long, text string",
    )
    w = {r["doc_id"]: r["logw"] for r in dsir_log_weights(raw, target).collect()}
    in_domain = min(w[k] for k in w if k < 200)
    out_domain = max(w[k] for k in w if k >= 200)
    assert in_domain > out_domain


def test_uniform_target_equals_raw_gives_zero(spark):
    """target == raw -> p_t == p_r bucket-for-bucket -> logw == 0."""
    df = spark.createDataFrame(
        [(1, "one two three"), (2, "four five six")],
        "doc_id long, text string",
    )
    out = dsir_log_weights(df, df).collect()
    assert all(abs(r["logw"]) < 1e-9 for r in out)


def test_gram_features_are_unigrams_then_bigrams(spark):
    df = spark.createDataFrame([("a b c",)], "text string")
    n = df.select(
        F.size(hashed_gram_buckets(F.col("text"))).alias("n")
    ).first()["n"]
    assert n == 3 + 2  # 3 unigrams + 2 bigrams


def test_no_python_in_plan(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    plan = (
        dsir_log_weights(df, df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan


def test_gumbel_topk_is_deterministic_and_weight_biased(spark):
    """Same salt -> identical draw; the draw favors high-logw docs
    (the in-domain half dominates the selection)."""
    from event_pipeline_spark.operators.dsir import dsir_gumbel_topk

    target_rows = [(100 + i, "alpha beta gamma delta epsilon zeta")
                   for i in range(20)]
    raw = spark.createDataFrame(
        target_rows
        + [(200 + i, "uno dos tres cuatro cinco seis") for i in range(20)],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        target_rows, "doc_id long, text string"
    )
    w = dsir_log_weights(raw, target)
    a = [r["doc_id"] for r in dsir_gumbel_topk(w, k=10).collect()]
    b = [r["doc_id"] for r in dsir_gumbel_topk(w, k=10).collect()]
    assert a == b  # reproducible draw
    assert sum(1 for d in a if d < 200) >= 8  # in-domain dominates
    c = [r["doc_id"] for r in dsir_gumbel_topk(w, k=10, salt="s2").collect()]
    assert set(c) != set(a) or c != a  # a different salt is a new draw
