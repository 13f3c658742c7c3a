"""Language identification by character n-gram profiles.

The first filter of every public web-corpus pipeline (CCNet §2.1, C4,
Gopher, RefinedWeb all langid-gate before any other processing). The
public recipe — char n-gram statistics per language, score a document
by how well each language's profile predicts its n-grams (Cavnar &
Trenkle 1994 rank profiles; CLD and fastText refine the same idea) —
is implemented here as a multinomial n-gram model with add-one
smoothing:

    score(doc, lang) = sum over positions i of
        ln( (count_lang(gram_i) + 1) / (N_lang + V) )

with ``N_lang`` the language's total training-gram count and ``V`` the
training vocabulary size (distinct grams across ALL languages, so the
smoothing denominator is shared and the argmax is well-defined for
unseen grams). Prediction is the argmax language, ties to the
lexically smallest code.

Spark-first architecture (the exact ``lm.py`` shape, transplanted from
word n-grams to char n-grams):

- the profile table is one JVM counting pass over the labeled
  training slice (``substr`` inside a ``transform``'d sequence, then
  explode + groupBy — map-side partial aggregation);
- the char-n-gram vocabulary is bounded by charset^n regardless of
  corpus size, so the profile rides the scoring plan as a BROADCAST
  (the fastText/CLD posture: the model is a small frozen artifact, the
  corpus pass is a pure map stage);
- scoring keeps the per-language terms in ONE array column per
  position (no per-language row blowup): each position contributes an
  ``array<long>`` of INTEGER 1e-7-unit log terms, folded per document
  with ``aggregate``+``zip_with`` — integer addition is exact and
  order-independent, so Spark's fold and DuckDB's plain SUM agree
  bit-for-bit (a round-7 double variant flipped a final digit on a
  5e-4 boundary at sf0.1; see ``langid_score``);
- ``N_lang``/``V`` are bounded driver scalars (|langs|+1 values),
  inlined as literals like every threshold in this repo.

Corpus caveat, discovered while building this operator: the synthetic
``documents`` table draws text from ONE shared English vocabulary for
every ``lang`` label, so ``documents.lang`` is statistically
independent of ``documents.text`` — the corpus-scale queries below are
exact correctness surfaces (the math is fully oracle-checked), but no
identifier could recover those labels from that text. The operator's
actual discriminative power is therefore gated on a pinned fixture of
real hand-written sentences in the five corpus languages
(``tests/fixtures/langid_sentences.parquet``), where holdout accuracy
is asserted in ``tests/test_langid.py``.

Registered queries:
- ``langid_score`` [oracle] — per (doc, lang) score over ``documents``
  under profiles trained on the even-doc_id slice;
- ``langid_predict`` [oracle] — the per-doc argmax of the same;
- ``langid_fixture_predict`` [oracle] — train on the fixture's
  ``is_train`` sentences, predict the holdout; DuckDB recomputes
  training, scoring, and argmax from the same parquet.

Reference parity: the reference repo has no langid stage; this is the
round-7 north-star LLM-pipeline family (VERDICT r6 task 1).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

QUERIES = {}
ORACLES = {}

#: pinned fixture parquet of real multilingual sentences
FIXTURE_PATH = str(
    Path(__file__).resolve().parents[2]
    / "tests/fixtures/langid_sentences.parquet"
)


def char_ngrams(col: Column, n: int = 3) -> Column:
    """Array of all character ``n``-grams of ``col`` (empty when the
    text is shorter than ``n``). Character-code-point semantics on both
    engines (Spark ``substr`` == DuckDB ``substring``); no casefolding
    — Unicode case mapping differs subtly across engines and real
    langid profiles are case-sensitive anyway."""
    return F.when(
        F.length(col) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(col) - (n - 1)),
            lambda i: col.substr(i, F.lit(n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def langid_profiles(
    train: DataFrame,
    *,
    label_col: str = "lang",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """(g, lang, c): char n-gram counts per language — one counting
    pass, map-side combined; bounded by charset^n x |langs| rows."""
    return (
        train.select(
            F.col(label_col).alias("lang"),
            F.explode(char_ngrams(F.col(text_col), n)).alias("g"),
        )
        .groupBy("g", "lang")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _profile_scalars(
    profiles: DataFrame,
) -> tuple[list[str], dict[str, int], int]:
    """(sorted langs, N_lang totals, vocabulary size) — |langs|+1
    driver scalars, the model's frozen hyper-state."""
    totals = {
        r["lang"]: r["n"]
        for r in profiles.groupBy("lang")
        .agg(F.sum("c").alias("n"))
        .collect()
    }
    vocab = profiles.select("g").distinct().count()
    return sorted(totals), totals, vocab


def langid_score(
    docs: DataFrame,
    train: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
    n: int = 3,
) -> DataFrame:
    """(id, lang, score) for every document x training language.

    score = round(sum_positions round(ln((c+1)/(N_lang+V)) * 1e7)
    / 1e7, 3) — the add-one multinomial log-likelihood with each term
    quantized to an INTEGER count of 1e-7 units, so the per-document
    sum is exact and order-independent (a round-7 DOUBLE term was
    observed to flip the final displayed digit between Spark's sorted
    fold and DuckDB's unordered SUM when a score lands on a 5e-4
    boundary — sf0.1 doc 263/fr; integer units make the two engines
    bit-identical by construction, the same trade the PQ ADC LUT
    makes). Documents shorter than ``n`` characters emit no positions
    and drop out (nothing to identify)."""
    profiles = langid_profiles(
        train, label_col=label_col, text_col=text_col, n=n
    )
    langs, totals, vocab = _profile_scalars(profiles)
    if not langs:
        raise ValueError("training slice has no labeled text")
    gram_map = profiles.groupBy("g").agg(
        F.map_from_entries(F.collect_list(F.struct("lang", "c"))).alias("m")
    )
    pos = docs.where(F.length(F.col(text_col)) >= n).select(
        F.col(id_col).alias("_id"),
        F.explode(char_ngrams(F.col(text_col), n)).alias("g"),
    )
    # per-position array of integer 1e-7-unit log terms, one slot per
    # language
    terms = F.array(
        *[
            F.round(
                F.log(
                    (
                        F.coalesce(F.element_at("m", F.lit(lg)), F.lit(0))
                        + F.lit(1)
                    ).cast("double")
                    / F.lit(float(totals[lg] + vocab))
                )
                * 1e7
            ).cast("long")
            for lg in langs
        ]
    )
    joined = pos.join(F.broadcast(gram_map), "g", "left").select(
        "_id", "g", terms.alias("t")
    )
    zero = F.array(*[F.lit(0).cast("long")] * len(langs))
    folded = (
        joined.groupBy("_id")
        .agg(F.collect_list(F.col("t")).alias("_a"))
        .withColumn(
            "_s",
            F.aggregate(
                "_a",
                zero,
                lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
            ),
        )
    )
    lang_arr = F.array(*[F.lit(lg) for lg in langs])
    return folded.select(
        F.col("_id").alias(id_col),
        F.posexplode("_s").alias("_p", "_v"),
    ).select(
        id_col,
        F.element_at(lang_arr, F.col("_p") + 1).alias("lang"),
        F.round(F.col("_v") / 1e7, 3).alias("score"),
    )


def langid_predict(
    docs: DataFrame,
    train: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
    n: int = 3,
) -> DataFrame:
    """(id, pred_lang, score): the argmax language per document —
    ranked on the ROUNDED score (so the winner is engine-portable),
    ties to the lexically smallest language code."""
    scores = langid_score(
        docs, train, id_col=id_col, text_col=text_col,
        label_col=label_col, n=n,
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("lang"))
    return (
        scores.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select(id_col, F.col("lang").alias("pred_lang"), "score")
    )


# -- registered queries ------------------------------------------------------


def _split(spark: SparkSession, sf_dir: str):
    from event_pipeline_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents")
    return docs, docs.where(F.col("doc_id") % 2 == 0)


def q_langid_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (doc, lang) trigram-profile scores; profiles trained on the
    even-doc_id slice (exact math surface — see module caveat on the
    synthetic corpus's label/text independence)."""
    docs, train = _split(spark, sf_dir)
    return langid_score(docs, train).orderBy("doc_id", "lang")


_SCORE_CTES = """
tr AS (
  SELECT lang, substring(text, i, 3) AS g
  FROM documents,
       LATERAL unnest(generate_series(1, length(text) - 2)) AS t(i)
  WHERE doc_id % 2 = 0 AND length(text) >= 3),
langs AS (SELECT DISTINCT lang FROM tr),
cnt AS (SELECT lang, g, count(*) AS c FROM tr GROUP BY lang, g),
nl AS (SELECT lang, count(*) AS n FROM tr GROUP BY lang),
v AS (SELECT count(DISTINCT g) AS v FROM tr),
pos AS (
  SELECT doc_id, substring(text, i, 3) AS g
  FROM documents,
       LATERAL unnest(generate_series(1, length(text) - 2)) AS t(i)
  WHERE length(text) >= 3),
scores AS (
  SELECT p.doc_id, l.lang,
         round(sum(CAST(round(ln((coalesce(c.c, 0) + 1.0) / (nl.n + v.v))
                              * 10000000) AS BIGINT)) / 10000000.0,
               3) AS score
  FROM pos p
  CROSS JOIN langs l
  JOIN nl ON nl.lang = l.lang
  CROSS JOIN v
  LEFT JOIN cnt c ON c.g = p.g AND c.lang = l.lang
  GROUP BY p.doc_id, l.lang)
"""

QUERIES["langid_score"] = q_langid_score
ORACLES["langid_score"] = (
    f"WITH {_SCORE_CTES} "
    "SELECT doc_id, lang, score FROM scores ORDER BY doc_id, lang"
)


def q_langid_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc argmax language under the even-doc-trained profiles."""
    docs, train = _split(spark, sf_dir)
    return langid_predict(docs, train).orderBy("doc_id")


QUERIES["langid_predict"] = q_langid_predict
ORACLES["langid_predict"] = (
    f"WITH {_SCORE_CTES} "
    """
SELECT doc_id, lang AS pred_lang, score FROM (
  SELECT doc_id, lang, score,
         row_number() OVER (
           PARTITION BY doc_id ORDER BY score DESC, lang ASC) AS rk
  FROM scores)
WHERE rk = 1 ORDER BY doc_id
"""
)


def q_langid_fixture_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real multilingual sentences: train on the fixture's is_train
    rows, predict the holdout — the query where langid demonstrably
    identifies languages (100%% holdout accuracy, gated in pytest)."""
    sents = spark.read.parquet(FIXTURE_PATH)
    train = sents.where(F.col("is_train"))
    holdout = sents.where(~F.col("is_train"))
    pred = langid_predict(holdout, train, id_col="sent_id")
    return (
        pred.join(holdout.select("sent_id", F.col("lang").alias("truth")),
                  "sent_id")
        .select("sent_id", "truth", "pred_lang", "score")
        .orderBy("sent_id")
    )


QUERIES["langid_fixture_predict"] = q_langid_fixture_predict
ORACLES["langid_fixture_predict"] = f"""
WITH sents AS (SELECT * FROM read_parquet('{FIXTURE_PATH}')),
tr AS (
  SELECT lang, substring(text, i, 3) AS g
  FROM sents,
       LATERAL unnest(generate_series(1, length(text) - 2)) AS t(i)
  WHERE is_train AND length(text) >= 3),
langs AS (SELECT DISTINCT lang FROM tr),
cnt AS (SELECT lang, g, count(*) AS c FROM tr GROUP BY lang, g),
nl AS (SELECT lang, count(*) AS n FROM tr GROUP BY lang),
v AS (SELECT count(DISTINCT g) AS v FROM tr),
pos AS (
  SELECT sent_id, substring(text, i, 3) AS g
  FROM sents,
       LATERAL unnest(generate_series(1, length(text) - 2)) AS t(i)
  WHERE NOT is_train AND length(text) >= 3),
scores AS (
  SELECT p.sent_id, l.lang,
         round(sum(CAST(round(ln((coalesce(c.c, 0) + 1.0) / (nl.n + v.v))
                              * 10000000) AS BIGINT)) / 10000000.0,
               3) AS score
  FROM pos p
  CROSS JOIN langs l
  JOIN nl ON nl.lang = l.lang
  CROSS JOIN v
  LEFT JOIN cnt c ON c.g = p.g AND c.lang = l.lang
  GROUP BY p.sent_id, l.lang),
pred AS (
  SELECT sent_id, lang AS pred_lang, score FROM (
    SELECT sent_id, lang, score,
           row_number() OVER (
             PARTITION BY sent_id ORDER BY score DESC, lang ASC) AS rk
    FROM scores)
  WHERE rk = 1)
SELECT p.sent_id, s.lang AS truth, p.pred_lang, p.score
FROM pred p JOIN sents s USING (sent_id)
ORDER BY p.sent_id
"""
