"""Rolling-origin cross-validation folds (leakage-safe label windows).

The ML-ops data-prep operator every churn/propensity model needs:
for a grid of cutoff instants, features come from a window strictly
AT-OR-BEFORE the cutoff and the label from a window strictly AFTER it
— the temporal split that makes offline evaluation honest
(rolling-origin evaluation, Tashman 2000; the time-series form of
k-fold CV). Getting this wrong — any feature reading past the cutoff
— is the classic leakage bug; here the windows are disjoint by
construction and pinned by a test.

Spark-first: the cutoff grid is a literal array exploded per event
(grid × events stays linear — |cutoffs| is a handful), one
(user, cutoff) groupBy with conditional aggregates computes every
fold in a single shuffle; durations compare in integer microseconds
(``unix_micros``, the `survival.py` contract) so both engines agree
exactly on window membership.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

QUERIES = {}
ORACLES = {}

_US_PER_DAY = 86_400_000_000


def rolling_folds(
    events: DataFrame,
    cutoff_days: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    label_type: str = "purchase",
    feature_days: int = 7,
    label_days: int = 7,
) -> DataFrame:
    """(cutoff_day, user, n_feat, n_feat_label_type, label): one row
    per (cutoff, user observed in the feature window); label = 1 iff
    the user emits ``label_type`` inside (cutoff, cutoff+label_days].
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    cut = F.explode(
        F.array(*[F.lit(d) for d in cutoff_days])
    ).alias("cutoff_day")
    base = events.select(
        F.col(user_col).alias("u"),
        us.alias("e_us"),
        F.col(type_col).alias("et"),
        cut,
    ).withColumn(
        "c_us",
        F.unix_micros(
            F.to_timestamp(F.col("cutoff_day"), "yyyy-MM-dd")
        ),
    )
    in_feat = (F.col("e_us") > F.col("c_us") - feature_days * _US_PER_DAY) & (
        F.col("e_us") <= F.col("c_us")
    )
    in_label = (F.col("e_us") > F.col("c_us")) & (
        F.col("e_us") <= F.col("c_us") + label_days * _US_PER_DAY
    )
    agg = base.groupBy("cutoff_day", "u").agg(
        F.sum(in_feat.cast("long")).cast("bigint").alias("n_feat"),
        F.sum((in_feat & (F.col("et") == label_type)).cast("long"))
        .cast("bigint")
        .alias("n_feat_label"),
        F.max(
            (in_label & (F.col("et") == label_type)).cast("int")
        ).alias("label"),
    )
    return agg.where(F.col("n_feat") > 0).select(
        "cutoff_day",
        F.col("u").alias(user_col),
        "n_feat",
        "n_feat_label",
        F.col("label").cast("int").alias("label"),
    )


_CUTOFFS = ["2024-01-10", "2024-01-17", "2024-01-24"]


def q_ml_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_pipeline_spark.session import read_table

    return rolling_folds(
        read_table(spark, sf_dir, "events"), _CUTOFFS
    ).orderBy("cutoff_day", "user_id")


_CUTS_SQL = ", ".join(f"'{d}'" for d in _CUTOFFS)

QUERIES["ml_rolling_folds"] = q_ml_folds
ORACLES["ml_rolling_folds"] = f"""
WITH grid AS (
  SELECT e.user_id AS u, epoch_us(e.ts) AS e_us, e.event_type AS et,
         c.cutoff_day,
         epoch_us(strptime(c.cutoff_day, '%Y-%m-%d')) AS c_us
  FROM events e,
       (SELECT unnest([{_CUTS_SQL}]) AS cutoff_day) c),
agg AS (
  SELECT cutoff_day, u,
         sum(CASE WHEN e_us > c_us - {7 * _US_PER_DAY}
                   AND e_us <= c_us THEN 1 ELSE 0 END)::BIGINT AS n_feat,
         sum(CASE WHEN e_us > c_us - {7 * _US_PER_DAY}
                   AND e_us <= c_us AND et = 'purchase'
                  THEN 1 ELSE 0 END)::BIGINT AS n_feat_label,
         max(CASE WHEN e_us > c_us
                   AND e_us <= c_us + {7 * _US_PER_DAY}
                   AND et = 'purchase' THEN 1 ELSE 0 END)::INT AS label
  FROM grid GROUP BY cutoff_day, u)
SELECT cutoff_day, u AS user_id, n_feat, n_feat_label, label
FROM agg WHERE n_feat > 0
ORDER BY cutoff_day, user_id
"""


# ---------------------------------------------------------------------------
# stratified k-fold assignment
# ---------------------------------------------------------------------------


def stratified_folds(
    df: DataFrame,
    *,
    stratum_col: str,
    key_col: str,
    k: int = 5,
    salt: str = "",
) -> DataFrame:
    """Input columns + ``fold`` (0..k−1): deterministic stratified
    k-fold assignment — within each stratum, rows rank by
    (md5(key‖salt), key) and fold = (rank−1) mod k, so every stratum's
    rows split across folds with EXACT ±1 balance (a plain
    hash-mod-k only balances in expectation, and on a rare stratum
    can starve a fold entirely — the classic stratified-CV bug).
    The time-ordered sibling is :func:`rolling_folds`; this is the
    exchangeable-rows form.

    Scale shape: one window shuffle partitioned by the stratum; the
    fold arithmetic is a pure map."""
    from event_pipeline_spark.operators.sampling import hash_hex

    w = Window.partitionBy(stratum_col).orderBy(
        hash_hex(F.col(key_col), salt), F.col(key_col)
    )
    return df.withColumn(
        "fold",
        ((F.row_number().over(w) - 1) % k).cast("int"),
    )


FOLD_K = 5


def q_ml_stratified_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-stratified 5-fold assignment of documents."""
    from event_pipeline_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang"
    )
    return stratified_folds(
        docs, stratum_col="lang", key_col="doc_id", k=FOLD_K, salt="f8"
    ).orderBy("doc_id")


QUERIES["ml_stratified_folds"] = q_ml_stratified_folds
ORACLES["ml_stratified_folds"] = f"""
SELECT doc_id, lang,
       ((row_number() OVER (
             PARTITION BY lang
             ORDER BY substring(md5(doc_id::VARCHAR || 'f8'), 1, 8),
                      doc_id) - 1) % {FOLD_K})::INT AS fold
FROM documents ORDER BY doc_id
"""
