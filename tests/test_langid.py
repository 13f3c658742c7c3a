"""Language identification: hand-computed closed form, fixture holdout
accuracy, and contract edges."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from event_pipeline_spark.operators.langid import (
    FIXTURE_PATH,
    char_ngrams,
    langid_predict,
    langid_score,
)


def test_scores_match_hand_computation(spark):
    """Closed-form check with n=2: train x='aaa' (grams aa,aa) and
    y='abab' (grams ab,ba,ab); score doc 'aab' (grams aa,ab).

    V = |{aa,ab,ba}| = 3, N_x = 2, N_y = 3:
      score_x = ln(3/5) + ln(1/5)   (aa seen twice, ab unseen in x)
      score_y = ln(1/6) + ln(3/6)   (aa unseen in y, ab seen twice)
    summed as exact integer 1e-7 units (the engine-portable form).
    """
    train = spark.createDataFrame(
        [("x", "aaa"), ("y", "abab")], "lang string, text string"
    )
    docs = spark.createDataFrame([(1, "aab")], "doc_id long, text string")
    rows = {
        r["lang"]: r["score"]
        for r in langid_score(docs, train, n=2).collect()
    }
    units = lambda v: int(round(v * 1e7))  # noqa: E731
    exp_x = round(
        (units(math.log(3 / 5)) + units(math.log(1 / 5))) / 1e7, 3
    )
    exp_y = round(
        (units(math.log(1 / 6)) + units(math.log(3 / 6))) / 1e7, 3
    )
    assert rows == {"x": pytest.approx(exp_x), "y": pytest.approx(exp_y)}
    pred = langid_predict(docs, train, n=2).collect()[0]
    # score_y = ln(1/12) > score_x = ln(3/25)? ln(3/25)=-2.12, ln(1/12)=-2.48
    assert pred["pred_lang"] == "x"


def test_fixture_holdout_accuracy(spark):
    """Real multilingual sentences: train on is_train, predict the
    holdout — accuracy >= 0.9. (Observed: 19/20; the one miss is a
    short German sentence whose grams are mostly unseen in the German
    profile, so the smallest-N_lang language wins the add-one OOV
    comparison — the standard unbalanced-prior artifact of add-one
    smoothing, accepted here rather than papered over.)"""
    sents = spark.read.parquet(FIXTURE_PATH)
    train = sents.where(F.col("is_train"))
    holdout = sents.where(~F.col("is_train"))
    pred = langid_predict(holdout, train, id_col="sent_id")
    joined = pred.join(
        holdout.select("sent_id", F.col("lang").alias("truth")), "sent_id"
    ).collect()
    assert len(joined) == 20
    acc = sum(1 for r in joined if r["pred_lang"] == r["truth"]) / len(joined)
    assert acc >= 0.9
    # every Chinese holdout sentence is identified (disjoint script)
    assert all(
        r["pred_lang"] == "zh" for r in joined if r["truth"] == "zh"
    )


def test_short_docs_drop_out_and_ngram_edges(spark):
    train = spark.createDataFrame(
        [("x", "abcdef")], "lang string, text string"
    )
    docs = spark.createDataFrame(
        [(1, "ab"), (2, "abc")], "doc_id long, text string"
    )
    out = langid_score(docs, train, n=3).collect()
    assert {r["doc_id"] for r in out} == {2}
    # char_ngrams: exact-length text yields one gram; unicode by chars
    row = spark.range(1).select(
        char_ngrams(F.lit("abc"), 3).alias("a"),
        char_ngrams(F.lit("ab"), 3).alias("b"),
        char_ngrams(F.lit("汉字文本"), 3).alias("c"),
    ).collect()[0]
    assert row["a"] == ["abc"]
    assert row["b"] == []
    assert row["c"] == ["汉字文", "字文本"]


def test_tie_breaks_to_smallest_lang_code(spark):
    """Two languages with identical training text produce identical
    scores; the argmax must settle on the lexically smaller code."""
    train = spark.createDataFrame(
        [("bb", "hello world"), ("aa", "hello world")],
        "lang string, text string",
    )
    docs = spark.createDataFrame(
        [(7, "hello there")], "doc_id long, text string"
    )
    pred = langid_predict(docs, train).collect()[0]
    assert pred["pred_lang"] == "aa"


def test_profile_is_broadcast_and_plan_is_arrow_free(spark):
    """The scoring plan joins the profile as a broadcast and contains
    no Python evaluation at all (pure JVM expressions)."""
    train = spark.createDataFrame(
        [("x", "abcabc"), ("y", "defdef")], "lang string, text string"
    )
    docs = spark.createDataFrame(
        [(1, "abcdef")], "doc_id long, text string"
    )
    plan = langid_score(docs, train)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan and "InPandas" not in plan
