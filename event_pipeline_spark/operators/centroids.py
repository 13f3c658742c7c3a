"""Per-label embedding centroids and their pairwise cosine matrix.

The corpus-cartography operator (source/cluster drift analysis —
"how close are my data sources in embedding space?"): average each
label's vectors into a centroid, then score every label pair by
centroid cosine. Used to spot redundant sources before mixing and to
sanity-check cluster assignments.

Spark-first, scale-first: vectors never pairwise-join — the quadratic
object is the LABEL pair matrix (tiny: #labels^2), reached through
two linear passes:

1. ``posexplode`` each vector once; per-(label, dim) integer sums of
   1e-7-quantized coordinates (map-side combine; the shuffle carries
   (label, dim, partial-sum) — never vectors);
2. centroid coordinate = sum div n (integer division — exact);
3. label-pair join ON DIM ONLY across the centroid table (labels^2 x
   dims rows — small by construction), integer dot/norm sums, one
   fixed-shape cosine expression.

Everything before the final cosine is exact BIGINT arithmetic
(coordinate units <= ~1e8, squared <= 1e16, 64-dim sums < 2^63), so
both engines agree bit-for-bit and the single division/sqrt at the
end is correctly rounded — the full matrix hash-matches DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES = {}
ORACLES = {}


def label_centroid_units(
    emb: DataFrame, *, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """(label, d, cu, n): 1e-7-unit integer centroid coordinates."""
    ex = emb.select(
        F.col(label_col).alias("label"),
        F.posexplode(vec_col).alias("d", "v"),
    )
    per = ex.groupBy("label", "d").agg(
        F.sum(
            F.round(F.col("v").cast("double") * 1e7).cast("bigint")
        ).alias("su"),
        F.count(F.lit(1)).alias("n"),
    )
    return per.select(
        "label", "d", F.expr("su div n").alias("cu"), "n"
    )


def centroid_cosine_matrix(
    emb: DataFrame, *, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """(label_a, label_b, n_a, n_b, dot_units, norm_a_units,
    norm_b_units, cosine) for every label pair a < b."""
    cent = label_centroid_units(emb, label_col=label_col, vec_col=vec_col)
    a = cent.select(
        F.col("label").alias("label_a"),
        F.col("d"),
        F.col("cu").alias("ca"),
        F.col("n").alias("n_a"),
    )
    b = cent.select(
        F.col("label").alias("label_b"),
        F.col("d").alias("db"),
        F.col("cu").alias("cb"),
        F.col("n").alias("n_b"),
    )
    pairs = a.join(
        b, (F.col("d") == F.col("db")) & (F.col("label_a") < F.col("label_b"))
    )
    agg = pairs.groupBy("label_a", "label_b").agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.sum(F.col("ca") * F.col("cb")).alias("dot_units"),
        F.sum(F.col("ca") * F.col("ca")).alias("norm_a_units"),
        F.sum(F.col("cb") * F.col("cb")).alias("norm_b_units"),
    )
    return agg.select(
        "label_a",
        "label_b",
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.col("dot_units").cast("bigint").alias("dot_units"),
        F.col("norm_a_units").cast("bigint").alias("norm_a_units"),
        F.col("norm_b_units").cast("bigint").alias("norm_b_units"),
        F.round(
            F.col("dot_units").cast("double")
            / (
                F.sqrt(F.col("norm_a_units").cast("double"))
                * F.sqrt(F.col("norm_b_units").cast("double"))
            ),
            7,
        ).alias("cosine"),
    ).orderBy("label_a", "label_b")


def q_centroid_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_pipeline_spark.session import read_table

    return centroid_cosine_matrix(read_table(spark, sf_dir, "embeddings"))


QUERIES["sim_centroid_matrix"] = q_centroid_matrix
ORACLES["sim_centroid_matrix"] = """
WITH ex AS (
  SELECT label, i - 1 AS d,
         CAST(round(embedding[i]::DOUBLE * 10000000) AS BIGINT) AS u
  FROM embeddings,
       LATERAL unnest(generate_series(1, len(embedding))) AS t(i)),
per AS (
  SELECT label, d, sum(u)::BIGINT AS su, count(*) AS n
  FROM ex GROUP BY label, d),
cent AS MATERIALIZED (
  SELECT label, d, su // n AS cu, n FROM per),
agg AS (
  SELECT a.label AS label_a, b.label AS label_b,
         max(a.n) AS n_a, max(b.n) AS n_b,
         sum(a.cu * b.cu)::BIGINT AS dot_units,
         sum(a.cu * a.cu)::BIGINT AS norm_a_units,
         sum(b.cu * b.cu)::BIGINT AS norm_b_units
  FROM cent a JOIN cent b ON a.d = b.d AND a.label < b.label
  GROUP BY a.label, b.label)
SELECT label_a, label_b, n_a::BIGINT AS n_a, n_b::BIGINT AS n_b,
       dot_units, norm_a_units, norm_b_units,
       round(dot_units::DOUBLE
             / (sqrt(norm_a_units::DOUBLE)
                * sqrt(norm_b_units::DOUBLE)), 7) AS cosine
FROM agg ORDER BY label_a, label_b
"""
