"""Corpus-level lexical statistics: Zipf fit, Heaps curve, type/token.

Before mixing or sampling decisions, large-corpus curation pipelines
look at the corpus's lexical shape: does the token rank-frequency
distribution follow the expected Zipf power law (slope ~ -1 on
log-log), how fast does vocabulary grow with corpus size (Heaps' law
V ~ K * N^beta), and what do type/token ratios and hapax counts say
about duplication and noise? (A corpus whose Zipf slope flattens or
whose hapax share collapses is usually contaminated or over-duplicated
— these are standard public diagnostics, e.g. in corpus-linguistics
literature and web-corpus reports.)

All three registered queries are exact integer/rounded-double
aggregates with full DuckDB oracles:

- ``corpus_type_token`` — types, tokens, type/token ratio, hapax and
  dis legomena counts, top-token coverage. Pure groupBy aggregates.
- ``corpus_zipf_fit`` — least-squares slope/intercept of
  ln(freq) ~ ln(rank) over the top-K tokens. Both engines compute the
  same closed form (covar_pop/var_pop over round-7 logs), so the
  rounded result is engine-portable.
- ``corpus_heaps_curve`` — cumulative (tokens, types) at fixed
  document checkpoints: types at checkpoint c = tokens whose FIRST
  occurrence (min doc_id) lands at or before c — an exact-integer
  reformulation that needs no per-document scan ordering.

Scale shape: everything reduces through token-keyed partial
aggregates (explode -> groupBy token), then tiny follow-up aggregates
over at most top-K or n_docs/bucket rows. The one window over
checkpoint rows runs on a bounded domain (documented plan-audit
allowance); nothing shuffles documents themselves after the explode.

Reference: the reference repo has no corpus statistics; [ext]
LLM-pipeline surface per SURVEY §2 (corpus analytics family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

QUERIES = {}
ORACLES = {}


def _tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc id, token) rows under the repo-wide ASCII \\s+ rule."""
    return df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")


def type_token_stats(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row: n_tokens, n_types, ttr, hapax/dis counts, top-token
    coverage share (all ratios rounded to 6)."""
    freqs = _tokens(df, id_col, text_col).groupBy("tok").agg(
        F.count(F.lit(1)).alias("freq")
    )
    return freqs.agg(
        F.sum("freq").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.round(F.count(F.lit(1)) / F.sum("freq"), 6).alias("ttr"),
        F.sum(F.when(F.col("freq") == 1, 1).otherwise(0)).alias("hapax"),
        F.sum(F.when(F.col("freq") == 2, 1).otherwise(0)).alias("dis"),
        F.round(F.max("freq") / F.sum("freq"), 6).alias("top1_share"),
    )


def zipf_fit(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 100,
) -> DataFrame:
    """One row (slope, intercept, r2) of the least-squares fit
    ln(freq) ~ ln(rank) over the ``top_k`` most frequent tokens.

    Rank ties break by token so both engines rank identically; logs
    are rounded to 7 before the moment sums (the repo's portability
    idiom), results to 4 (the quotient of ~top_k-term double sums is
    reproducible well past that)."""
    freqs = (
        _tokens(df, id_col, text_col)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = Window.orderBy(F.desc("freq"), F.asc("tok"))
    ranked = (
        freqs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select(
            F.round(F.log("rank"), 7).alias("x"),
            F.round(F.log("freq"), 7).alias("y"),
        )
    )
    return ranked.agg(
        F.round(F.covar_pop("x", "y") / F.var_pop("x"), 4).alias("slope"),
        F.round(
            F.avg("y") - F.covar_pop("x", "y") / F.var_pop("x") * F.avg("x"),
            4,
        ).alias("intercept"),
        F.round(
            F.covar_pop("x", "y")
            * F.covar_pop("x", "y")
            / (F.var_pop("x") * F.var_pop("y")),
            4,
        ).alias("r2"),
    )


def heaps_curve(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket: int = 250,
) -> DataFrame:
    """(checkpoint, cum_tokens, cum_types) rows: corpus prefix sizes in
    ``id_col`` order at every ``bucket`` documents. cum_types counts
    tokens whose first occurrence (min id) falls inside the prefix —
    exact integers, no per-document state."""
    toks = _tokens(df, id_col, text_col)
    ck = (F.floor(F.col("_id") / bucket) + 1).alias("checkpoint")
    per_bucket_tokens = toks.groupBy(ck).agg(
        F.count(F.lit(1)).alias("toks")
    )
    first = toks.groupBy("tok").agg(F.min("_id").alias("first_id"))
    per_bucket_types = first.groupBy(
        (F.floor(F.col("first_id") / bucket) + 1).alias("checkpoint")
    ).agg(F.count(F.lit(1)).alias("types"))
    joined = per_bucket_tokens.join(per_bucket_types, "checkpoint", "left")
    wc = Window.orderBy("checkpoint").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return joined.select(
        "checkpoint",
        F.sum("toks").over(wc).alias("cum_tokens"),
        F.sum(F.coalesce("types", F.lit(0))).over(wc).alias("cum_types"),
    )


# -- registered queries ------------------------------------------------------


def q_corpus_type_token(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_pipeline_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents")
    return type_token_stats(docs)


QUERIES["corpus_type_token"] = q_corpus_type_token
ORACLES["corpus_type_token"] = r"""
WITH toks AS (
  SELECT t.tok FROM documents,
       LATERAL unnest(string_split_regex(trim(text), '\s+')) AS t(tok)
  WHERE t.tok != ''),
freqs AS (SELECT tok, count(*) AS freq FROM toks GROUP BY tok)
SELECT CAST(sum(freq) AS BIGINT) AS n_tokens,
       count(*) AS n_types,
       round(count(*) / CAST(sum(freq) AS DOUBLE), 6) AS ttr,
       CAST(sum(CASE WHEN freq = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
       CAST(sum(CASE WHEN freq = 2 THEN 1 ELSE 0 END) AS BIGINT) AS dis,
       round(max(freq) / CAST(sum(freq) AS DOUBLE), 6) AS top1_share
FROM freqs
"""


def q_corpus_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_pipeline_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents")
    return zipf_fit(docs, top_k=100)


QUERIES["corpus_zipf_fit"] = q_corpus_zipf_fit
ORACLES["corpus_zipf_fit"] = r"""
WITH toks AS (
  SELECT t.tok FROM documents,
       LATERAL unnest(string_split_regex(trim(text), '\s+')) AS t(tok)
  WHERE t.tok != ''),
freqs AS (SELECT tok, count(*) AS freq FROM toks GROUP BY tok),
ranked AS (
  SELECT round(ln(row_number() OVER (ORDER BY freq DESC, tok ASC)), 7) AS x,
         round(ln(freq), 7) AS y,
         row_number() OVER (ORDER BY freq DESC, tok ASC) AS rk
  FROM freqs QUALIFY rk <= 100)
SELECT round(covar_pop(x, y) / var_pop(x), 4) AS slope,
       round(avg(y) - covar_pop(x, y) / var_pop(x) * avg(x), 4) AS intercept,
       round(covar_pop(x, y) * covar_pop(x, y)
             / (var_pop(x) * var_pop(y)), 4) AS r2
FROM ranked
"""


def q_corpus_heaps_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_pipeline_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents")
    return heaps_curve(docs, bucket=250).orderBy("checkpoint")


QUERIES["corpus_heaps_curve"] = q_corpus_heaps_curve
ORACLES["corpus_heaps_curve"] = r"""
WITH toks AS (
  SELECT doc_id, t.tok FROM documents,
       LATERAL unnest(string_split_regex(trim(text), '\s+')) AS t(tok)
  WHERE t.tok != ''),
per_tok AS (
  SELECT floor(doc_id / 250) + 1 AS checkpoint, count(*) AS toks
  FROM toks GROUP BY 1),
first AS (SELECT tok, min(doc_id) AS first_id FROM toks GROUP BY tok),
per_typ AS (
  SELECT floor(first_id / 250) + 1 AS checkpoint, count(*) AS types
  FROM first GROUP BY 1)
SELECT CAST(t.checkpoint AS BIGINT) AS checkpoint,
       CAST(sum(t.toks) OVER (ORDER BY t.checkpoint
                              ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_tokens,
       CAST(sum(coalesce(y.types, 0)) OVER (ORDER BY t.checkpoint
                                            ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS cum_types
FROM per_tok t LEFT JOIN per_typ y USING (checkpoint)
ORDER BY checkpoint
"""


# ---------------------------------------------------------------------------
# Per-language unigram divergence (round 7b): KL(P_lang || P_corpus)
# over token distributions — the standard mixing diagnostic for "how
# far does each slice's vocabulary usage sit from the pooled corpus"
# (domain-relevance weighting à la DSIR uses exactly this quantity at
# the feature level). Smoothing-free by construction: every token of a
# slice exists in the pooled corpus, so Q(tok) > 0 wherever P > 0.
#
# Portability: each token's contribution P*ln(P/Q) closes over four
# integers (slice count, slice total, corpus count, corpus total) and
# is quantized to an INTEGER count of 1e-7 units, so the per-language
# sum is a plain exact integer aggregate — order-independent on both
# engines by construction (the langid_score lesson: a round-7 double
# fold flipped a final digit on a 5e-4 boundary at sf0.1).
# ---------------------------------------------------------------------------


def lang_unigram_divergence(
    df: DataFrame,
    *,
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """(lang, n_tokens, kl_bits) — KL divergence (natural log,
    rounded 4) of each language slice's unigram distribution from the
    pooled corpus distribution."""
    toks = df.select(
        F.col(lang_col).alias("lang"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")
    slice_counts = toks.groupBy("lang", "tok").agg(
        F.count(F.lit(1)).alias("c")
    )
    slice_totals = slice_counts.groupBy("lang").agg(
        F.sum("c").alias("nt")
    )
    corpus_counts = slice_counts.groupBy("tok").agg(
        F.sum("c").alias("cc")
    )
    corpus_total = corpus_counts.agg(F.sum("cc").alias("ct"))
    term = F.round(
        (F.col("c") / F.col("nt"))
        * F.log(
            (F.col("c") / F.col("nt")) / (F.col("cc") / F.col("ct"))
        )
        * 1e7
    ).cast("long")
    joined = (
        slice_counts.join(slice_totals, "lang")
        .join(corpus_counts, "tok")
        .crossJoin(F.broadcast(corpus_total))
        .select("lang", "nt", term.alias("t"))
    )
    return (
        joined.groupBy("lang", "nt")
        .agg(F.sum("t").alias("kl_units"))
        .select(
            "lang",
            F.col("nt").alias("n_tokens"),
            F.round(F.col("kl_units") / 1e7, 4).alias("kl_nats"),
        )
    )


def q_corpus_lang_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_pipeline_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents")
    return lang_unigram_divergence(docs).orderBy("lang")


QUERIES["corpus_lang_divergence"] = q_corpus_lang_divergence
ORACLES["corpus_lang_divergence"] = r"""
WITH toks AS (
  SELECT lang, t.tok FROM documents,
       LATERAL unnest(string_split_regex(trim(text), '\s+')) AS t(tok)
  WHERE t.tok != ''),
sc AS (SELECT lang, tok, count(*) AS c FROM toks GROUP BY lang, tok),
st AS (SELECT lang, CAST(sum(c) AS BIGINT) AS nt FROM sc GROUP BY lang),
cc AS (SELECT tok, CAST(sum(c) AS BIGINT) AS cc FROM sc GROUP BY tok),
ct AS (SELECT CAST(sum(cc) AS BIGINT) AS ct FROM cc),
terms AS (
  SELECT sc.lang, st.nt,
         CAST(round((sc.c / CAST(st.nt AS DOUBLE))
                    * ln((sc.c / CAST(st.nt AS DOUBLE))
                         / (cc.cc / CAST(ct.ct AS DOUBLE)))
                    * 10000000) AS BIGINT) AS t
  FROM sc JOIN st USING (lang) JOIN cc USING (tok) CROSS JOIN ct)
SELECT lang, nt AS n_tokens, round(sum(t) / 10000000.0, 4) AS kl_nats
FROM terms GROUP BY lang, nt ORDER BY lang
"""


# -- per-document n-gram novelty ----------------------------------------------


def ngram_novelty(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """(id, n_grams, n_novel, novelty): the share of a document's
    DISTINCT word n-grams that appear in no other document — the
    diversity signal curation uses to prioritize documents under a
    budget (a doc whose grams all recur elsewhere adds little).

    Scale shape: grams travel as md5 digests (fixed 32-byte shuffle
    keys, never raw text); the document-frequency pass is a map-side-
    combinable groupBy over digests; the novelty join fans each doc
    gram back once. Docs shorter than ``n`` words emit one whole-text
    gram (the ``dedup.py`` shingle rule).
    """
    from event_pipeline_spark.operators.text import bind

    # bind(): the token array must be a lambda variable, not a repeated
    # expression — Catalyst re-evaluates the split per window otherwise
    # (quadratic in document length; see text.bind).
    grams_arr = bind(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda toks: F.when(
            F.size(toks) >= n,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                    lambda i: F.md5(F.array_join(F.slice(toks, i, n), " ")),
                )
            ),
        ).otherwise(F.array(F.md5(F.array_join(toks, " ")))),
    )
    dg = docs.select(
        F.col(id_col).alias("_id"), F.explode(grams_arr).alias("_g")
    )
    df_counts = dg.groupBy("_g").agg(
        F.count(F.lit(1)).alias("_df")
    )  # dg is per-doc distinct already
    return (
        dg.join(df_counts, "_g")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_grams"),
            F.sum(F.when(F.col("_df") == 1, 1).otherwise(0))
            .cast("int")
            .alias("n_novel"),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_grams",
            "n_novel",
            F.round(
                F.col("n_novel").cast("double") / F.col("n_grams"), 6
            ).alias("novelty"),
        )
    )


def q_corpus_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_pipeline_spark.session import read_table

    return ngram_novelty(read_table(spark, sf_dir, "documents")).orderBy(
        "doc_id"
    )


QUERIES["corpus_ngram_novelty"] = q_corpus_ngram_novelty
ORACLES["corpus_ngram_novelty"] = """
WITH dg AS (
  SELECT DISTINCT doc_id,
         md5(CASE WHEN len(toks) >= 3
                  THEN array_to_string(toks[i : i + 2], ' ')
                  ELSE array_to_string(toks, ' ') END) AS g
  FROM (SELECT doc_id,
               string_split_regex(lower(trim(text)), '\\s+') AS toks
        FROM documents),
       LATERAL unnest(generate_series(1, greatest(len(toks) - 2, 1)))
           AS t(i)),
dfc AS (SELECT g, count(*) AS df FROM dg GROUP BY g)
SELECT dg.doc_id,
       count(*)::INT AS n_grams,
       sum(CASE WHEN dfc.df = 1 THEN 1 ELSE 0 END)::INT AS n_novel,
       round(sum(CASE WHEN dfc.df = 1 THEN 1 ELSE 0 END)::DOUBLE
             / count(*), 6) AS novelty
FROM dg JOIN dfc USING (g)
GROUP BY dg.doc_id
ORDER BY dg.doc_id
"""


# -- cross-source exact-overlap matrix ----------------------------------------


def source_overlap(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """(source_a, source_b, n_shared): count of distinct content units
    (md5 digests of ``unit``) present in BOTH sources, for every
    unordered source pair with nonzero overlap — the provenance-
    contamination matrix a multi-dump corpus audit starts with (two
    crawls sharing content double-count training data). ``unit`` is a
    Column of an array of strings per document: whole-doc (exact
    overlap) or lines/shingles (partial overlap — what real dumps
    actually share).

    Scale shape: one distinct over (source, digest), then a self-join
    keyed on the digest — digests only, never text; the output is at
    most |sources|² rows."""
    units = F.split(F.col(text_col), "\n")
    sh = docs.select(
        F.col(group_col).alias("_grp"),
        F.explode(F.transform(units, F.md5)).alias("_h"),
    ).distinct()
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(
            b,
            (F.col("a._h") == F.col("b._h"))
            & (F.col("a._grp") < F.col("b._grp")),
        )
        .groupBy(
            F.col("a._grp").alias("source_a"),
            F.col("b._grp").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )


def q_corpus_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level overlap (6-word lines, the dedup_lines_docs prep):
    whole-doc exact overlap is empty below sf0.1 on this corpus, while
    shared lines exist at every SF — and shared lines are what real
    dumps actually have in common (boilerplate, syndicated content)."""
    from event_pipeline_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.regexp_replace(
            F.trim(F.col("text")), r"((?:\S+ ){5}\S+) ", "$1\n"
        ).alias("text"),
    )
    return source_overlap(docs).orderBy("source_a", "source_b")


QUERIES["corpus_source_overlap"] = q_corpus_source_overlap
ORACLES["corpus_source_overlap"] = r'''
WITH prepared AS (
  SELECT source,
         regexp_replace(trim(text), '((?:\S+ ){5}\S+) ', '\1' || chr(10),
                        'g') AS text
  FROM documents),
sh AS (
  SELECT DISTINCT source, md5(unnest(string_split(text, chr(10)))) AS h
  FROM prepared)
SELECT a.source AS source_a, b.source AS source_b,
       count(*)::BIGINT AS n_shared
FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
GROUP BY a.source, b.source
ORDER BY source_a, source_b
'''


# ---------------------------------------------------------------------------
# per-document lexical entropy & richness (quality signals)
# ---------------------------------------------------------------------------

ENTROPY_UNIT = 10_000_000


def doc_lexical_stats(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens, n_types, ttr, hapax_share, entropy): per-document
    token-level Shannon entropy and lexical-richness signals — the
    repetitive/templated-text detectors a quality funnel thresholds on
    (low entropy = keyword stuffing / boilerplate; TTR and hapax share
    are the classic richness measures; entropy is the principled
    summary the Gopher repetition rules approximate).

    Exactness: H = ln(n) − (Σ_types c·ln c)/n is computed with each
    per-type term QUANTIZED to integer 1e-7 units first
    (round(c·ln(c)·1e7)), so the sum is an exact BIGINT and the final
    expression is a fixed shape over exact integers; ttr and
    hapax_share are single exact divisions. All rounded 7 dp.

    WEAKER contract than the shared-integer-literal discipline
    (ndcg's DISCOUNT_UNITS): each engine computes ln(c) with its own
    libm, so a one-ulp difference at a value landing exactly on a
    x.5e-7 rounding tie COULD flip one unit across engines. No such
    tie exists for any c the test corpora produce (and a single-unit
    flip is absorbed by the 7-dp final rounding except at another
    exact tie), but unlike the integer-literal operators this is
    probabilistic, not structural, cross-engine equality.

    Scale shape: one explode + two map-side-combinable groupBys
    ((doc, token) then doc) — the corpus never pairs with anything."""
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")
    per_type = toks.groupBy("id", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    u = F.round(
        F.col("c").cast("double") * F.log(F.col("c").cast("double"))
        * F.lit(float(ENTROPY_UNIT))
    ).cast("bigint")
    agg = per_type.groupBy("id").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("hapax_types"),
        F.sum(u).cast("bigint").alias("sum_clnc_units"),
    )
    n = F.col("n_tokens").cast("double")
    return agg.select(
        "id",
        "n_tokens",
        "n_types",
        F.round(F.col("n_types").cast("double") / n, 7).alias("ttr"),
        F.round(
            F.col("hapax_types").cast("double")
            / F.col("n_types").cast("double"),
            7,
        ).alias("hapax_share"),
        F.round(
            F.log(n)
            - F.col("sum_clnc_units").cast("double")
            / (n * F.lit(float(ENTROPY_UNIT))),
            7,
        ).alias("entropy"),
    )


def q_corpus_doc_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_pipeline_spark.session import read_table

    return doc_lexical_stats(
        read_table(spark, sf_dir, "documents")
    ).orderBy("id")


QUERIES["corpus_doc_entropy"] = q_corpus_doc_entropy
ORACLES["corpus_doc_entropy"] = rf"""
WITH toks AS (
  SELECT doc_id AS id, t.tok FROM documents,
       LATERAL unnest(string_split_regex(trim(text), '\s+')) AS t(tok)
  WHERE t.tok <> ''),
per_type AS (
  SELECT id, tok, count(*)::BIGINT AS c FROM toks GROUP BY id, tok),
agg AS (
  SELECT id, sum(c)::BIGINT AS n_tokens, count(*)::BIGINT AS n_types,
         sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS hapax_types,
         sum(CAST(round(c::DOUBLE * ln(c::DOUBLE) * {ENTROPY_UNIT})
                  AS BIGINT))::BIGINT AS su
  FROM per_type GROUP BY id)
SELECT id, n_tokens, n_types,
       round(n_types::DOUBLE / n_tokens::DOUBLE, 7) AS ttr,
       round(hapax_types::DOUBLE / n_types::DOUBLE, 7) AS hapax_share,
       round(ln(n_tokens::DOUBLE)
             - su::DOUBLE / (n_tokens::DOUBLE * {ENTROPY_UNIT}), 7)
         AS entropy
FROM agg ORDER BY id
"""


# ---------------------------------------------------------------------------
# per-source token concentration (Gini + head coverage)
# ---------------------------------------------------------------------------


def token_concentration(
    docs: DataFrame,
    *,
    group_col: str = "source",
    text_col: str = "text",
    top_k: int = 10,
) -> DataFrame:
    """(source, n_tokens, n_types, gini, top_share): how concentrated
    each slice's token mass is — the templated/boilerplate-source
    detector at corpus granularity (a crawler stuck on one template
    shows near-1 Gini and a fat head; per-doc ``doc_lexical_stats`` is
    the document-level sibling). ``gini`` is the Gini coefficient over
    type frequencies; ``top_share`` the token share of the ``top_k``
    most frequent types.

    Exactness: with frequencies ranked ascending by the (count, token)
    TOTAL order, G = (2·Σ i·c_i − (m+1)·Σc) / (m·Σc) — all-BIGINT
    numerator/denominator, ONE division each, rounded 7 dp.

    Scale shape: corpus collapses to (source, type) counts
    (map-side-combinable); rank windows partition by source over the
    vocabulary-sized frequency table — never the corpus."""
    toks = docs.select(
        F.col(group_col).alias("g"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")
    types = toks.groupBy("g", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    w_asc = Window.partitionBy("g").orderBy("c", "tok")
    w_desc = Window.partitionBy("g").orderBy(F.desc("c"), "tok")
    ranked = types.withColumn(
        "i", F.row_number().over(w_asc).cast("bigint")
    ).withColumn("rd", F.row_number().over(w_desc))
    dec = "decimal(38,0)"
    agg = ranked.groupBy("g").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum((F.col("i") * F.col("c")).cast(dec)).alias("sic"),
        F.sum(
            F.when(F.col("rd") <= top_k, F.col("c")).otherwise(0)
        )
        .cast("bigint")
        .alias("c_top"),
    )
    num = (
        F.lit(2) * F.col("sic")
        - (F.col("n_types").cast(dec) + F.lit(1))
        * F.col("n_tokens").cast(dec)
    ).cast("double")
    den = (
        F.col("n_types").cast(dec) * F.col("n_tokens").cast(dec)
    ).cast("double")
    return agg.select(
        F.col("g").alias(group_col),
        "n_tokens",
        "n_types",
        F.round(num / den, 7).alias("gini"),
        F.round(
            F.col("c_top").cast("double")
            / F.col("n_tokens").cast("double"),
            7,
        ).alias("top_share"),
    )


def q_corpus_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_pipeline_spark.session import read_table

    return token_concentration(
        read_table(spark, sf_dir, "documents")
    ).orderBy("source")


QUERIES["corpus_token_concentration"] = q_corpus_concentration
ORACLES["corpus_token_concentration"] = r"""
WITH toks AS (
  SELECT source AS g, t.tok FROM documents,
       LATERAL unnest(string_split_regex(trim(text), '\s+')) AS t(tok)
  WHERE t.tok <> ''),
types AS (
  SELECT g, tok, count(*)::BIGINT AS c FROM toks GROUP BY g, tok),
ranked AS (
  SELECT g, c,
         row_number() OVER (PARTITION BY g ORDER BY c, tok) AS i,
         row_number() OVER (PARTITION BY g ORDER BY c DESC, tok) AS rd
  FROM types),
agg AS (
  SELECT g, sum(c)::BIGINT AS n_tokens, count(*)::BIGINT AS n_types,
         sum(i::HUGEINT * c::HUGEINT)::HUGEINT AS sic,
         sum(CASE WHEN rd <= 10 THEN c ELSE 0 END)::BIGINT AS c_top
  FROM ranked GROUP BY g)
SELECT g AS source, n_tokens, n_types,
       round((2::HUGEINT * sic
              - (n_types::HUGEINT + 1) * n_tokens::HUGEINT)::DOUBLE
             / (n_types::HUGEINT * n_tokens::HUGEINT)::DOUBLE, 7)
         AS gini,
       round(c_top::DOUBLE / n_tokens::DOUBLE, 7) AS top_share
FROM agg ORDER BY source
"""
