"""Trained quality classifier: heuristic-seeded labels generalize to a
held-out split (AUC far above chance), scoring is a pure map with a
stable schema, and training is deterministic for fixed input."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from event_pipeline_spark.operators.classify import (
    quality_filter,
    score_documents,
    train_quality_classifier,
)
from event_pipeline_spark.session import read_table


@pytest.fixture(scope="module")
def labeled(spark, sf_dir):
    """Documents labeled by a lexical rule the model must rediscover:
    'good' documents are those whose text mentions spark-y vocabulary.
    (The synthetic corpus mixes technical and lorem-style text, so the
    signal is real but not trivially separable by length.)"""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    rule = (
        F.col("text").contains("data")
        | F.col("text").contains("pipeline")
        | F.col("text").contains("spark")
    )
    df = docs.withColumn("label", rule.cast("double"))
    # deterministic split on doc_id parity: train on evens, hold out odds
    return (
        df.where(F.col("doc_id") % 2 == 0),
        df.where(F.col("doc_id") % 2 == 1),
    )


def test_classifier_recovers_rule_on_holdout(spark, labeled):
    train, hold = labeled
    n_pos = train.where("label = 1.0").count()
    assert 0 < n_pos < train.count()  # both classes present

    model = train_quality_classifier(train)
    scored = score_documents(model, hold)
    assert scored.columns == ["doc_id", "text", "label", "p_good"]

    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    pred = model.transform(hold)
    auc = BinaryClassificationEvaluator(
        labelCol="label", metricName="areaUnderROC"
    ).evaluate(pred)
    assert auc > 0.8  # generalizes, not memorizes

    # threshold filter keeps mostly-positive docs
    kept = quality_filter(model, hold, threshold=0.5)
    precision = kept.agg(F.avg("label")).first()[0]
    base_rate = hold.agg(F.avg("label")).first()[0]
    assert precision > base_rate


def test_scoring_is_deterministic_and_bounded(spark, labeled):
    train, hold = labeled
    model = train_quality_classifier(train)
    a = {r["doc_id"]: r["p_good"] for r in score_documents(model, hold).collect()}
    b = {r["doc_id"]: r["p_good"] for r in score_documents(model, hold).collect()}
    assert a == b
    assert all(0.0 <= p <= 1.0 for p in a.values())
