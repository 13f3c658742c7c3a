"""Model-evaluation metrics at corpus scale: exact AUC.

Every quality/langid/decontam classifier in this repo ends in a score
column; this module grades those scores distributively. AUC is
computed by the Mann–Whitney rank-sum identity (the exact form, not a
sampled ROC sweep):

    AUC = (Σ_{positives} rank(score) − n_pos(n_pos+1)/2)
          / (n_pos · n_neg)

with AVERAGE ranks for tied scores (the statistically correct tie
rule — midrank — which a naive row_number silently gets wrong).

Spark-first, exactness-first:

- ranks never materialize per row: group to DISTINCT (group, score)
  cells (corpus → |score domain| rows), then one per-GROUP ordered
  window gives each cell its midrank — windows are partitioned by the
  evaluation group, so there is NO global sort anywhere;
- midranks are half-integers, so everything runs in DOUBLED units:
  ``rank2 = 2·cum_before + cnt + 1`` is exactly integral, the
  positive-rank total is an order-free BIGINT sum, and

    auc_num = Σ pos·rank2 − n_pos(n_pos+1),
    auc     = auc_num / (2·n_pos·n_neg)

  leaves ONE correctly-rounded division for presentation — both
  engines replay the whole computation bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

QUERIES = {}
ORACLES = {}


def auc_by_group(
    df: DataFrame,
    *,
    group_col: str,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """(group, n_pos, n_neg, auc_num, auc) per group; ``label_col``
    must be 0/1 int, higher score should mean more positive. Groups
    lacking both classes emit NULL auc (undefined)."""
    per = df.groupBy(
        F.col(group_col).alias("g"), F.col(score_col).alias("s")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum(F.col(label_col).cast("long")).cast("bigint").alias("pos"),
    )
    before = (
        Window.partitionBy("g")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rank2 = (
        F.lit(2) * F.coalesce(F.sum("cnt").over(before), F.lit(0))
        + F.col("cnt")
        + F.lit(1)
    )
    agg = (
        per.withColumn("r2", rank2.cast("bigint"))
        .groupBy("g")
        .agg(
            F.sum("pos").cast("bigint").alias("n_pos"),
            (F.sum("cnt") - F.sum("pos")).cast("bigint").alias("n_neg"),
            F.sum(F.col("pos") * F.col("r2"))
            .cast("bigint")
            .alias("spr2"),
        )
    )
    num = F.col("spr2") - F.col("n_pos") * (F.col("n_pos") + F.lit(1))
    return agg.select(
        F.col("g").alias(group_col),
        "n_pos",
        "n_neg",
        num.cast("bigint").alias("auc_num"),
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            num / (F.lit(2.0) * F.col("n_pos") * F.col("n_neg")),
        ).alias("auc"),
    )


def q_eval_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source AUC of document length predicting lang == 'en' —
    the evaluation harness shape (the scores under test are
    interchangeable)."""
    from event_pipeline_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents").select(
        "source",
        F.col("n_chars").alias("score"),
        (F.col("lang") == "en").cast("int").alias("label"),
    )
    return auc_by_group(
        docs, group_col="source", score_col="score", label_col="label"
    ).orderBy("source")


QUERIES["eval_auc_by_source"] = q_eval_auc
ORACLES["eval_auc_by_source"] = """
WITH base AS (
  SELECT source AS g, n_chars AS s,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents),
per AS (
  SELECT g, s, count(*)::BIGINT AS cnt, sum(y)::BIGINT AS pos
  FROM base GROUP BY g, s),
ranked AS (
  SELECT g, pos, cnt,
         (2 * coalesce(sum(cnt) OVER (PARTITION BY g ORDER BY s
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0)
          + cnt + 1)::BIGINT AS r2
  FROM per),
agg AS (
  SELECT g, sum(pos)::BIGINT AS n_pos,
         (sum(cnt) - sum(pos))::BIGINT AS n_neg,
         sum(pos * r2)::BIGINT AS spr2
  FROM ranked GROUP BY g)
SELECT g AS source, n_pos, n_neg,
       (spr2 - n_pos * (n_pos + 1))::BIGINT AS auc_num,
       CASE WHEN n_pos > 0 AND n_neg > 0
            THEN (spr2 - n_pos * (n_pos + 1))::DOUBLE
                 / (2 * n_pos * n_neg)::DOUBLE END AS auc
FROM agg ORDER BY source
"""
