"""RAKE keyphrase extraction (Rapid Automatic Keyword Extraction).

Rose et al. 2010: candidate phrases are maximal runs of non-stopword
tokens; each word scores degree/frequency (degree = summed length of
the phrases it appears in, frequency = its occurrence count across
phrase instances), and a phrase scores the sum of its words' scores.
The complementary keyword surface to ``ranking.tfidf_top_terms`` —
RAKE finds multi-word phrases without document-frequency statistics.

Spark-first:

- phrase segmentation is the gaps-and-islands idiom: a running count
  of stopwords (window PARTITIONED BY doc — never global) numbers the
  runs, ``groupBy(doc, run)`` rebuilds each phrase with an
  order-by-position ``array_sort(collect_list(struct(i, w)))`` (the
  deterministic form of collect_list);
- word statistics are integer groupBys over the exploded phrase
  tokens;
- the RAKE word score ``degree/freq`` is quantized to 1e-7 BIGINT
  units immediately after its single division, so the PHRASE score —
  a sum over member words, the one data-dependent fold in the
  algorithm — is an order-free integer sum (summing raw doubles here
  would be engine-order-dependent);
- top-k is ``orderBy().limit()`` on (score_units desc, phrase) — a
  total order both engines agree on exactly.

The stopword list is a frozen constant (the corpus's function words),
the same pinned-artifact contract as ``bpe.FROZEN_MERGES``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

QUERIES = {}
ORACLES = {}

#: frozen stopword list — the synthetic corpus's function words
STOPWORDS = ("the", "a")


def rake_keyphrases(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: tuple[str, ...] = STOPWORDS,
    top_k: int = 200,
) -> DataFrame:
    """(phrase, n_occ, n_words, score_units, score): corpus-level
    RAKE phrases, strongest first."""
    from event_pipeline_spark.operators.lm import _position_table

    pos = _position_table(docs, id_col=id_col, text_col=text_col, order=1)
    is_stop = F.col("w").isin(*stopwords)
    run = Window.partitionBy(id_col).orderBy("i")
    pos2 = pos.withColumn("stop", is_stop).withColumn(
        "grp", F.sum(F.when(F.col("stop"), 1).otherwise(0)).over(run)
    )
    inst = (
        pos2.where(~F.col("stop"))
        .groupBy(id_col, "grp")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "w"))),
                    lambda x: x["w"],
                ),
                " ",
            ).alias("phrase"),
            F.count(F.lit(1)).alias("len"),
        )
    )
    toks = inst.select(
        "len", F.explode(F.split("phrase", " ")).alias("w")
    )
    wu = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"), F.sum("len").alias("deg"))
        .select(
            "w",
            F.round(
                F.col("deg").cast("double")
                / F.col("freq").cast("double")
                * 1e7
            )
            .cast("bigint")
            .alias("wu"),
        )
    )
    ph = inst.groupBy("phrase").agg(
        F.count(F.lit(1)).alias("n_occ"), F.max("len").alias("n_words")
    )
    sc = (
        ph.select("phrase", F.explode(F.split("phrase", " ")).alias("w"))
        .join(wu, "w")
        .groupBy("phrase")
        .agg(F.sum("wu").alias("score_units"))
    )
    return (
        ph.join(sc, "phrase")
        .select(
            "phrase",
            F.col("n_occ").cast("bigint").alias("n_occ"),
            F.col("n_words").cast("bigint").alias("n_words"),
            F.col("score_units").cast("bigint").alias("score_units"),
            (F.col("score_units") / F.lit(1e7)).alias("score"),
        )
        .orderBy(F.desc("score_units"), "phrase")
        .limit(top_k)
    )


def q_rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_pipeline_spark.session import read_table

    return rake_keyphrases(read_table(spark, sf_dir, "documents"))


QUERIES["text_rake_keyphrases"] = q_rake_keyphrases
ORACLES["text_rake_keyphrases"] = """
WITH base AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS a
  FROM documents),
pos AS (
  SELECT doc_id, i::INT AS i, a[i] AS w
  FROM base, LATERAL unnest(generate_series(1, len(a))) AS t(i)),
pos2 AS MATERIALIZED (
  SELECT doc_id, i, w, (w IN ('the', 'a')) AS stop,
         sum(CASE WHEN w IN ('the', 'a') THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY i) AS grp
  FROM pos),
inst AS MATERIALIZED (
  SELECT doc_id, grp, string_agg(w, ' ' ORDER BY i) AS phrase,
         count(*) AS len
  FROM pos2 WHERE NOT stop GROUP BY doc_id, grp),
toks AS (SELECT len, unnest(string_split(phrase, ' ')) AS w FROM inst),
wu AS MATERIALIZED (
  SELECT w, CAST(round(deg::DOUBLE / freq::DOUBLE * 10000000) AS BIGINT)
            AS wu
  FROM (SELECT w, count(*) AS freq, sum(len)::BIGINT AS deg
        FROM toks GROUP BY w)),
ph AS MATERIALIZED (
  SELECT phrase, count(*) AS n_occ, max(len) AS n_words
  FROM inst GROUP BY phrase),
sc AS (
  SELECT p.phrase, sum(u.wu)::BIGINT AS score_units
  FROM (SELECT phrase, unnest(string_split(phrase, ' ')) AS w FROM ph) p
  JOIN wu u ON u.w = p.w
  GROUP BY p.phrase)
SELECT ph.phrase, n_occ::BIGINT AS n_occ, n_words::BIGINT AS n_words,
       score_units, score_units / CAST(10000000 AS DOUBLE) AS score
FROM ph JOIN sc ON sc.phrase = ph.phrase
ORDER BY score_units DESC, ph.phrase LIMIT 200
"""
