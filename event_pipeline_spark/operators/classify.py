"""Model-based document scoring: a trained quality classifier over the
corpus (the fastText-style filter step of CCNet/Gopher-era pipelines,
where heuristic rules seed labels and a linear model generalizes them).

Spark-first shape — every stage is the scale-correct choice:

- **HashingTF, not CountVectorizer**: the featurizer is stateless (no
  vocabulary shuffle, no driver-held dictionary); 2^18 hashed dims is
  the standard quality-classifier size and each document becomes one
  sparse vector in a single narrow map.
- **LogisticRegression (MLlib)**: distributed L-BFGS over the hashed
  features; the model is a single dense coefficient vector that
  broadcasts for scoring.
- **Scoring is a map**: ``score_documents`` adds one probability
  column; no shuffle, composes with any downstream filter
  (``WHERE p_good >= t`` stays before the expensive operators).

No registry entry: model training is iterative and not SQL-expressible,
so the gate is behavioral — tests seed labels from the repo's heuristic
quality score, train on one half, and require the model to recover the
rule on the held-out half (AUC well above chance) and to be
deterministic for a fixed seed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUERIES: dict = {}
ORACLES: dict = {}


def train_quality_classifier(
    df: DataFrame,
    *,
    text_col: str = "text",
    label_col: str = "label",
    num_features: int = 1 << 18,
    reg_param: float = 1e-3,
    max_iter: int = 50,
):
    """Fit tokenize → HashingTF → LogisticRegression on labeled
    documents (``label_col`` ∈ {0.0, 1.0}). Returns a fitted
    ``PipelineModel`` whose ``transform`` adds ``probability`` /
    ``prediction`` columns."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, RegexTokenizer

    tokenizer = RegexTokenizer(
        inputCol=text_col, outputCol="__tokens", pattern="\\s+"
    )
    tf = HashingTF(
        inputCol="__tokens", outputCol="__features",
        numFeatures=num_features,
    )
    lr = LogisticRegression(
        featuresCol="__features", labelCol=label_col,
        regParam=reg_param, maxIter=max_iter,
    )
    return Pipeline(stages=[tokenizer, tf, lr]).fit(df)


def score_documents(
    model, df: DataFrame, *, out_col: str = "p_good"
) -> DataFrame:
    """Add the classifier's P(label=1) as ``out_col``; drops the
    intermediate token/feature/raw columns so the output schema is the
    input plus one double."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(df)
    p1 = F.element_at(vector_to_array(F.col("probability")), 2)
    keep = [c for c in df.columns]
    return scored.select(*keep, p1.alias(out_col))


def quality_filter(
    model, df: DataFrame, *, threshold: float = 0.5
) -> DataFrame:
    """Keep documents the model scores at or above ``threshold`` —
    the one-line filter step a 100 TB corpus pass actually runs."""
    return score_documents(model, df).where(F.col("p_good") >= threshold)
