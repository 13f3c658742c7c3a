"""Collocation extraction: PMI / NPMI / Dice over adjacent bigrams.

The standard corpus-analytics surface (Church & Hanks 1990 for PMI;
Bouma 2009 for the normalized variant; Smadja 1993 for Dice-ranked
collocations): count adjacent-token bigrams, score each against the
independence assumption, return the strongest associations.

    pmi(v,w)  = ln( (c(vw) * N) / (left(v) * right(w)) )
    npmi(v,w) = pmi / (ln N - ln c(vw))        in (-1, 1]
    dice(v,w) = 2 c(vw) / (left(v) + right(w))

where ``left``/``right`` are the pair-table marginals (sum of counts
with v on the left / w on the right) and ``N`` the total pair count —
self-consistent with the joint, so probabilities sum to 1 by
construction (token-count marginals would not: a document's last token
starts no bigram).

Spark-first: the pair table is ``lm._kn_pair_table`` (one JVM pass,
digest-free narrow explode; the shuffle carries (v, w, partial-count)).
Marginals are two more count-shuffles over the PAIR TABLE (vocabulary-
sized, not corpus-sized); N is one scalar. Scoring is a projection
after two vocabulary-sized joins that AQE broadcasts. Top-k is
``orderBy().limit()`` — Spark plans ``TakeOrderedAndProject``, a
per-partition heap + driver merge of k rows, never a global sort
exchange.

Oracle safety: every score is ONE fixed-shape double expression over
exact integers, parenthesized identically in DuckDB; single ``ln`` /
division results are correctly rounded so both engines produce the
same double (sums of data-dependent doubles are the order hazard —
none here), then rounded to 7 dp. The top-k ORDER is on the ROUNDED
pmi with (v, w) tiebreak — a total order both engines agree on, so
the returned SET is stable even at the k boundary. A Dunning
log-likelihood-ratio score is deliberately NOT an oracle surface: its
x*ln(x) terms on corpus-scale counts magnify a 1-ulp libm difference
to ~0.1 of a 1e-7 quantum, past the repo's integer-unit recipe;
``tests/test_collocations.py`` pins LLR's ranking behavior in Python
instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES = {}
ORACLES = {}


def collocations(
    docs: DataFrame,
    *,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 200,
) -> DataFrame:
    """Top-k adjacent-bigram collocations by PMI.

    Returns (v, w, c, left_c, right_c, pmi, npmi, dice) — counts
    integer-exact, scores rounded to 7 dp, ordered by (pmi desc, v, w)
    and limited to ``top_k``.
    """
    from event_pipeline_spark.operators.lm import _kn_pair_table

    pairs = _kn_pair_table(docs, text_col=text_col)
    n_total = pairs.agg(F.sum("c").alias("n")).collect()[0]["n"] or 0
    n_d = F.lit(float(n_total))
    left = pairs.groupBy("v").agg(F.sum("c").alias("left_c"))
    right = pairs.groupBy("w").agg(F.sum("c").alias("right_c"))
    joined = (
        pairs.where(F.col("c") >= min_count)
        .join(left, "v")
        .join(right, "w")
    )
    c_d = F.col("c").cast("double")
    pmi_raw = F.log(
        (c_d * n_d)
        / (F.col("left_c").cast("double") * F.col("right_c").cast("double"))
    )
    return (
        joined.select(
            F.col("v"),
            F.col("w"),
            F.col("c").cast("bigint").alias("c"),
            F.col("left_c").cast("bigint").alias("left_c"),
            F.col("right_c").cast("bigint").alias("right_c"),
            F.round(pmi_raw, 7).alias("pmi"),
            F.round(pmi_raw / (F.log(n_d) - F.log(c_d)), 7).alias("npmi"),
            F.round(
                (F.lit(2.0) * c_d)
                / (F.col("left_c") + F.col("right_c")).cast("double"),
                7,
            ).alias("dice"),
        )
        .orderBy(F.desc("pmi"), "v", "w")
        .limit(top_k)
    )


def q_text_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-200 PMI collocations over the documents corpus."""
    from event_pipeline_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents")
    return collocations(docs)


QUERIES["text_collocations"] = q_text_collocations
ORACLES["text_collocations"] = """
WITH base AS (
  SELECT regexp_split_to_array(trim(text), '\\s+') AS a FROM documents),
pairs AS MATERIALIZED (
  SELECT a[i-1] AS v, a[i] AS w, count(*) AS c
  FROM base, LATERAL unnest(generate_series(2, len(a))) AS t(i)
  GROUP BY a[i-1], a[i]),
tot AS (SELECT sum(c)::BIGINT AS n FROM pairs),
lft AS (SELECT v, sum(c)::BIGINT AS left_c FROM pairs GROUP BY v),
rgt AS (SELECT w, sum(c)::BIGINT AS right_c FROM pairs GROUP BY w),
scored AS (
  SELECT p.v, p.w, p.c::BIGINT AS c, l.left_c, r.right_c,
         round(ln((p.c::DOUBLE * n::DOUBLE)
                  / (l.left_c::DOUBLE * r.right_c::DOUBLE)), 7) AS pmi,
         round(ln((p.c::DOUBLE * n::DOUBLE)
                  / (l.left_c::DOUBLE * r.right_c::DOUBLE))
               / (ln(n::DOUBLE) - ln(p.c::DOUBLE)), 7) AS npmi,
         round((CAST(2 AS DOUBLE) * p.c::DOUBLE)
               / (l.left_c + r.right_c)::DOUBLE, 7) AS dice
  FROM pairs p
  JOIN lft l ON l.v = p.v
  JOIN rgt r ON r.w = p.w
  CROSS JOIN tot
  WHERE p.c >= 5)
SELECT * FROM scored ORDER BY pmi DESC, v, w LIMIT 200
"""
