"""Feature engineering at corpus scale: categorical encoders + scaling.

The tabular side of a training pipeline: high-cardinality categorical
columns become dense numerics (target / frequency encoding) and
numeric columns become comparable across features (robust scaling).
All three are one map-side-combinable aggregate producing a SMALL
encoder table that broadcasts back onto the corpus — the classic
fit/transform split, expressed so the "fit" is a DataFrame anyone can
persist (and ``ANALYZE`` — see operators/tablestats.py) and the
"transform" is a broadcast equi-join, never a shuffle of the corpus.

Exactness: targets arrive pre-quantized in integer units (cents — the
``stats.py`` contract); sums run in DECIMAL(38,0) ≡ HUGEINT; every
emitted double is ONE correctly-rounded IEEE division of exact
integers, so the DuckDB oracle matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

QUERIES = {}
ORACLES = {}

_DEC = "decimal(38,0)"


def target_encode(
    df: DataFrame,
    *,
    cat_col: str,
    target_col: str,
    prior_weight: int = 20,
) -> DataFrame:
    """(category, n, sum_units, encoding): smoothed mean target
    encoding — the standard high-cardinality categorical encoder,

        enc(c) = (Σ_c y + m·global_mean) / (n_c + m)

    with integer prior weight m (micci-barreca smoothing): rare
    categories shrink toward the global mean instead of memorizing
    noise. Algebra keeps it one exact division:

        enc(c) = (Σ_c·N + m·Σ_all) / (N·(n_c + m))

    — numerator and denominator are exact DECIMAL(38,0) products of
    BIGINT aggregates, so the emitted double is a single IEEE op.

    Scale shape: one aggregate to |categories| rows + one one-row
    global total joined in (broadcast by construction); the encoder
    table is what joins back onto the corpus."""
    y = F.col(target_col).cast("bigint").cast(_DEC)
    per = df.groupBy(F.col(cat_col).alias("category")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(y).alias("s"),
    )
    tot = per.agg(
        F.sum("n").cast(_DEC).alias("n_all"),
        F.sum("s").cast(_DEC).alias("s_all"),
    )
    m = F.lit(prior_weight).cast(_DEC)
    num = F.col("s") * F.col("n_all") + m * F.col("s_all")
    den = F.col("n_all") * (F.col("n").cast(_DEC) + m)
    return per.crossJoin(F.broadcast(tot)).select(
        "category",
        "n",
        F.col("s").cast(_DEC).cast("string").alias("sum_units"),
        (num.cast("double") / den.cast("double")).alias("encoding"),
    )


def leave_one_out_encode(
    df: DataFrame,
    *,
    cat_col: str,
    target_col: str,
    prior_weight: int = 20,
) -> DataFrame:
    """Row-level leave-one-out variant of :func:`target_encode` — each
    row is encoded EXCLUDING its own target (the train-time form that
    avoids target leakage):

        enc_i = ((Σ_c − y_i)·N + m·Σ_all) / (N·(n_c − 1 + m))

    Appends ``loo_encoding`` to ``df``. Same one-aggregate scale shape
    as the fit table; the per-row arithmetic is a broadcast join plus
    pure column math (no window over the corpus)."""
    y = F.col(target_col).cast("bigint")
    per = df.groupBy(F.col(cat_col).alias("__cat")).agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum(y.cast(_DEC)).alias("__s"),
    )
    tot = per.agg(
        F.sum("__n").cast(_DEC).alias("__n_all"),
        F.sum("__s").cast(_DEC).alias("__s_all"),
    )
    m = F.lit(prior_weight).cast(_DEC)
    joined = df.join(
        F.broadcast(per), df[cat_col] == per["__cat"]
    ).crossJoin(F.broadcast(tot))
    num = (F.col("__s") - y.cast(_DEC)) * F.col("__n_all") + m * F.col(
        "__s_all"
    )
    den = F.col("__n_all") * (
        F.col("__n").cast(_DEC) - F.lit(1).cast(_DEC) + m
    )
    return joined.select(
        *[df[c] for c in df.columns],
        (num.cast("double") / den.cast("double")).alias("loo_encoding"),
    )


def frequency_encode(
    df: DataFrame, *, cat_col: str
) -> DataFrame:
    """(category, n, frequency): occurrence-share encoding — the
    cheapest useful categorical numeric (one aggregate; frequency is
    one exact division of BIGINTs)."""
    per = df.groupBy(F.col(cat_col).alias("category")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = Window.partitionBy()
    return per.select(
        "category",
        "n",
        (
            F.col("n").cast("double")
            / F.sum("n").over(tot).cast("double")
        ).alias("frequency"),
    )


def robust_scale_params(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """(group, n, median_units, q1_units, q3_units, iqr_units):
    per-group robust-scaler fit — median and exact type-1 quartiles of
    a pre-quantized integer column (the ``percentiles_exact``
    machinery: rank = ceil(p·n), deterministic under ties). Transform
    is then (x − median)/iqr, outlier-immune where z-scoring is not.

    One per-group sort window over the value — no global sort. The
    row_number tie order within equal values is partition-dependent,
    but any rank inside a tie run reads the SAME value, so the picked
    quartiles are deterministic (the ``percentiles_exact`` argument)."""
    n_w = Window.partitionBy("g")
    ranked = df.select(
        F.col(group_col).alias("g"),
        F.col(value_col).cast("bigint").alias("v"),
    ).select(
        "g",
        "v",
        F.row_number().over(
            Window.partitionBy("g").orderBy("v")
        ).alias("rn"),
        F.count(F.lit(1)).over(n_w).alias("n"),
    )
    pick = lambda p: F.min(  # noqa: E731
        F.when(
            F.col("rn") == F.ceil(F.lit(p) * F.col("n")).cast("bigint"),
            F.col("v"),
        )
    ).cast("bigint")
    return (
        ranked.groupBy("g")
        .agg(
            F.max("n").cast("bigint").alias("n"),
            pick(0.50).alias("median_units"),
            pick(0.25).alias("q1_units"),
            pick(0.75).alias("q3_units"),
        )
        .select(
            F.col("g").alias(group_col),
            "n",
            "median_units",
            "q1_units",
            "q3_units",
            (F.col("q3_units") - F.col("q1_units"))
            .cast("bigint")
            .alias("iqr_units"),
        )
    )


# ---------------------------------------------------------------------------
# registered queries
# ---------------------------------------------------------------------------

_M = 20


def q_feat_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode customer market segment by smoothed mean order value
    (cents) — the canonical segment-value feature."""
    from event_pipeline_spark.session import read_table

    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    base = orders.join(
        cust, orders.o_custkey == cust.c_custkey
    ).select(
        F.col("c_mktsegment").alias("segment"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    return target_encode(
        base, cat_col="segment", target_col="cents", prior_weight=_M
    ).orderBy("category")


QUERIES["feat_target_encode"] = q_feat_target_encode
ORACLES["feat_target_encode"] = f"""
WITH base AS (
  SELECT c_mktsegment AS category,
         CAST(round(o_totalprice * 100) AS BIGINT) AS y
  FROM orders JOIN customer ON o_custkey = c_custkey),
per AS (
  SELECT category, count(*)::BIGINT AS n, sum(y::HUGEINT) AS s
  FROM base GROUP BY category),
tot AS (
  SELECT sum(n)::HUGEINT AS n_all, sum(s)::HUGEINT AS s_all FROM per)
SELECT category, n, s::VARCHAR AS sum_units,
       (s * n_all + {_M}::HUGEINT * s_all)::DOUBLE
         / (n_all * (n::HUGEINT + {_M}))::DOUBLE AS encoding
FROM per, tot ORDER BY category
"""


def q_feat_robust_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type robust-scaler fit over event value cents."""
    from event_pipeline_spark.session import read_table

    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias(
            "cents"
        ),
    )
    return robust_scale_params(
        ev, group_col="event_type", value_col="cents"
    ).orderBy("event_type")


QUERIES["feat_robust_scale"] = q_feat_robust_scale
ORACLES["feat_robust_scale"] = """
WITH base AS (
  SELECT event_type AS g, floor(value * 100 + 0.5)::BIGINT AS v
  FROM events),
ranked AS (
  SELECT g, v,
         row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
         count(*) OVER (PARTITION BY g) AS n
  FROM base)
SELECT g AS event_type, max(n)::BIGINT AS n,
       min(CASE WHEN rn = ceil(0.50 * n) THEN v END)::BIGINT
         AS median_units,
       min(CASE WHEN rn = ceil(0.25 * n) THEN v END)::BIGINT AS q1_units,
       min(CASE WHEN rn = ceil(0.75 * n) THEN v END)::BIGINT AS q3_units,
       (min(CASE WHEN rn = ceil(0.75 * n) THEN v END)
        - min(CASE WHEN rn = ceil(0.25 * n) THEN v END))::BIGINT
         AS iqr_units
FROM ranked GROUP BY g ORDER BY event_type
"""


def woe_iv(
    df: DataFrame,
    *,
    cat_col: str,
    label_col: str,
) -> DataFrame:
    """(category, n_pos, n_neg, woe, iv): Weight-of-Evidence per
    category and its Information-Value contribution — the scorecard
    industry's feature-screening pair (total IV < 0.02 → drop the
    feature; per-category WoE is the monotone encoding a logistic
    scorecard consumes). WoE = ln(dist_pos/dist_neg) with add-one
    smoothing (the ``stats.psi_bins`` convention) so single-class
    categories stay defined; iv = (dist_pos − dist_neg)·woe.

    Exactness: counts are BIGINT; each ln argument is ONE division of
    exact integer products; woe/iv round to 7dp per category before
    any consumer sums (the repo log contract). One aggregate to
    |categories| cells; the totals window runs over that cell table."""
    y = F.col(label_col).cast("long")
    per = df.groupBy(F.col(cat_col).alias("category")).agg(
        F.sum(y).cast("bigint").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum(y)).cast("bigint").alias("n_neg"),
    )
    tot = Window.partitionBy()
    k = F.count(F.lit(1)).over(tot)
    gp = F.sum("n_pos").over(tot) + k
    gn = F.sum("n_neg").over(tot) + k
    dp = (F.col("n_pos") + 1).cast("double") / gp.cast("double")
    dn = (F.col("n_neg") + 1).cast("double") / gn.cast("double")
    ratio = ((F.col("n_pos") + 1) * gn).cast("double") / (
        (F.col("n_neg") + 1) * gp
    ).cast("double")
    woe = F.log(ratio)
    return per.select(
        "category",
        "n_pos",
        "n_neg",
        F.round(woe, 7).alias("woe"),
        F.round((dp - dn) * woe, 7).alias("iv"),
    )


def q_feat_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WoE/IV of market segment predicting fulfilled order status —
    the scorecard screening readout over the same join as
    feat_target_encode."""
    from event_pipeline_spark.session import read_table

    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    base = orders.join(
        cust, orders.o_custkey == cust.c_custkey
    ).select(
        F.col("c_mktsegment").alias("segment"),
        (F.col("o_orderstatus") == "F").cast("int").alias("label"),
    )
    return woe_iv(base, cat_col="segment", label_col="label").orderBy(
        "category"
    )


QUERIES["feat_woe_iv"] = q_feat_woe_iv
ORACLES["feat_woe_iv"] = """
WITH base AS (
  SELECT c_mktsegment AS category,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders JOIN customer ON o_custkey = c_custkey),
per AS (
  SELECT category, sum(y)::BIGINT AS n_pos,
         (count(*) - sum(y))::BIGINT AS n_neg
  FROM base GROUP BY category),
tot AS (
  SELECT category, n_pos, n_neg,
         count(*) OVER () AS k,
         sum(n_pos) OVER () + count(*) OVER () AS gp,
         sum(n_neg) OVER () + count(*) OVER () AS gn
  FROM per)
SELECT category, n_pos, n_neg,
       round(ln(((n_pos + 1) * gn)::DOUBLE
                / ((n_neg + 1) * gp)::DOUBLE), 7) AS woe,
       round(((n_pos + 1)::DOUBLE / gp::DOUBLE
              - (n_neg + 1)::DOUBLE / gn::DOUBLE)
             * ln(((n_pos + 1) * gn)::DOUBLE
                  / ((n_neg + 1) * gp)::DOUBLE), 7) AS iv
FROM tot ORDER BY category
"""


# ---------------------------------------------------------------------------
# feature hashing (the hashing trick)
# ---------------------------------------------------------------------------

FH_BUCKETS = 64


def hashed_features(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = FH_BUCKETS,
) -> DataFrame:
    """(id, bucket, n_terms, v): the hashing-trick text vectorizer
    (Weinberger et al. 2009) — each token maps to bucket
    md5("fh|"‖token) mod B with sign ± from an independent hash bit,
    and a document's feature vector is the per-bucket SIGNED count.
    THE vocabulary-free featurizer for 100 TB corpora: no fitted
    vocab object, no OOV path, every executor hashes independently
    and the vector space is fixed at B dims forever.

    Determinism: both hashes ride the repo's md5-low-64 contract
    (== DuckDB ``md5_number_lower``), so the oracle recomputes the
    exact vectors. All outputs BIGINT.

    Scale shape: ONE explode + groupBy (map-side combinable) —
    tokens shuffle as ((id, bucket), partial) pairs; output is at
    most B cells per document regardless of vocabulary size."""
    from event_pipeline_spark.operators.sketches import _md5_low64_col

    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w"),
    ).where(F.col("w") != "")
    cells = toks.select(
        "id",
        F.pmod(_md5_low64_col(F.concat(F.lit("fh|"), F.col("w"))), F.lit(n_buckets))
        .cast("int")
        .alias("bucket"),
        F.when(
            F.pmod(
                _md5_low64_col(F.concat(F.lit("fhs|"), F.col("w"))),
                F.lit(2),
            )
            == 0,
            F.lit(1),
        )
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("sgn"),
    )
    return cells.groupBy("id", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        F.sum("sgn").cast("bigint").alias("v"),
    )


def q_feat_hashing_trick(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_pipeline_spark.session import read_table

    return (
        hashed_features(read_table(spark, sf_dir, "documents"))
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "bucket")
    )


QUERIES["feat_hashing_trick"] = q_feat_hashing_trick
ORACLES["feat_hashing_trick"] = f"""
WITH toks AS (
  SELECT doc_id, w FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
    FROM documents)
  WHERE w <> ''),
cells AS (
  SELECT doc_id,
         (md5_number_lower('fh|' || w)::HUGEINT
          % {FH_BUCKETS})::INT AS bucket,
         CASE WHEN md5_number_lower('fhs|' || w)::HUGEINT % 2 = 0
              THEN 1 ELSE -1 END AS sgn
  FROM toks)
SELECT doc_id, bucket, count(*)::BIGINT AS n_terms,
       sum(sgn)::BIGINT AS v
FROM cells GROUP BY doc_id, bucket
ORDER BY doc_id, bucket
"""
