"""Corpus ranking / retrieval operators for LLM-data pipelines.

The retrieval-adjacent surface a training-data engine needs next to
dedup: corpus vocabulary statistics, an inverted index, TF-IDF term
weighting, and BM25 scoring for decontamination-style "which documents
match this benchmark query" sweeps.

Scale shape (the point at 100 TB):

- Every shuffle key here is a (token|gram, doc_id) pair or a bare
  token — never document text. Token explosion is a flatMap with no
  shuffle; the aggregations are partial (map-side combine) by
  construction since they are plain ``groupBy().count()``.
- Posting lists are BOUNDED (``slice`` after ``sort_array``): an
  inverted index over a web corpus has power-law postings ("the" →
  every doc); an unbounded ``collect_list`` is a driver-killer. The cap
  is the operator contract, not an optimization.
- Per-document top-n uses ``row_number`` over a per-doc window —
  Spark's WindowGroupLimit pushes the rank filter into the sort, so no
  full per-doc term ranking materializes.
- Corpus-wide scalars (doc count, average doc length) travel as a
  broadcast 1-row crossJoin, never a driver ``collect()``.

All five registered queries are exact-oracle-gated: tokenization is the
corpus contract shared with dedup/filtering (``lower(trim(text))`` split
on ``\\s+``), counts are BIGINT on both engines, and floating scores are
rounded to 6 dp with ranking performed ON the rounded score with a total
deterministic tie-break, so both engines rank identically.

Re-expresses (reference parity): result aggregation/scoring surfaces of
``nexus/result.py`` (ResultSet statistics) generalized to corpus scale;
the reference has no retrieval operators — these extend SURVEY §2.11.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

QUERIES = {}
ORACLES = {}


def _register(name: str, fn, oracle: str | None = None) -> None:
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_pipeline_spark.session import read_table

    return read_table(spark, sf_dir, "documents")


def corpus_tokens(col: Column) -> Column:
    """The shared corpus tokenization contract: lowercase, trim, split
    on whitespace runs (identical to the dedup/filtering oracles)."""
    return F.split(F.lower(F.trim(col)), r"\s+")


# SQL twin of corpus_tokens, spliced into every oracle below.
_TOKS_SQL = "string_split_regex(lower(trim(text)), '\\s+')"


# ---------------------------------------------------------------------------
# document frequency + inverted index
# ---------------------------------------------------------------------------


def document_frequency(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(token, df) — number of distinct documents containing each token.
    Distinct-per-doc BEFORE exploding, so the shuffle carries one row
    per (doc, distinct token), not per occurrence."""
    return (
        df.select(
            F.explode(F.array_distinct(corpus_tokens(F.col(text_col)))).alias(
                "token"
            )
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )


def inverted_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_postings: int = 20,
) -> DataFrame:
    """(token, df, postings_csv): full df count plus the first
    ``max_postings`` doc ids ascending, comma-joined. Bounding the
    posting list is the contract — power-law tokens would otherwise
    materialize postings the size of the corpus."""
    exploded = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(corpus_tokens(F.col(text_col)))).alias("token"),
    )
    # Rank within token BEFORE collecting: collect_list-then-slice would
    # still buffer the full power-law posting list per group; with the
    # row_number filter the aggregation buffer holds <= max_postings ids.
    # Window and groupBy share the same key, so the partitioning from the
    # window sort is reused — one shuffle total.
    rn = F.row_number().over(Window.partitionBy("token").orderBy(id_col))
    return (
        exploded.withColumn("rn", rn)
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.concat_ws(
                ",",
                F.sort_array(
                    F.collect_list(
                        F.when(F.col("rn") <= max_postings, F.col(id_col))
                    )
                ).cast("array<string>"),
            ).alias("postings_csv"),
        )
    )


# ---------------------------------------------------------------------------
# TF-IDF
# ---------------------------------------------------------------------------


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 3,
) -> DataFrame:
    """Per-document top-n terms by TF-IDF (tf * ln(N/df)), score rounded
    to 6 dp, ranked on the ROUNDED score with term-ascending tie-break —
    a total deterministic order any engine reproduces."""
    toks = df.select(
        F.col(id_col), F.explode(corpus_tokens(F.col(text_col))).alias("token")
    )
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = (
        toks.select(id_col, "token")
        .distinct()
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    # dfreq is vocabulary-sized (can be huge on a web corpus) — leave the
    # join strategy to Catalyst/AQE rather than forcing a broadcast; the
    # 1-row n_docs crossJoin IS broadcast.
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_n)
        .select(id_col, "token", "score", "rank")
    )


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
) -> DataFrame:
    """BM25 retrieval for a fixed term set (Robertson +1 idf variant):
    score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)).

    The query side is a literal broadcast; the corpus side shuffles only
    (doc_id, term, tf) rows for terms IN the query — the explode is
    filtered before any aggregation, so corpus-scale tokens for
    non-query terms never leave their partitions."""
    toks = df.select(
        F.col(id_col),
        F.size(corpus_tokens(F.col(text_col))).alias("dl"),
        F.explode(corpus_tokens(F.col(text_col))).alias("token"),
    ).where(F.col("token").isin(query_terms))
    tf = toks.groupBy(id_col, "dl", "token").agg(F.count(F.lit(1)).alias("tf"))
    # r12: document frequency DERIVED from the tf table — tf holds
    # exactly one row per (doc, query-term) with >= 1 occurrence, so
    # counting its rows per token IS the document frequency (identical
    # integers; the former separate tokenize + array_distinct + explode
    # pass over the whole corpus is gone: 3 corpus tokenize passes ->
    # 2). The count is phrased as sum(tf > 0) — always 1 per row — ON
    # PURPOSE: a plain count(1) makes the inner tf aggregate's count
    # unused, and RemoveRedundantAggregates then rewrites this branch's
    # tf subtree into a keys-only distinct whose exchange no longer
    # hash-equals the contrib branch's — the scan+tokenize would run
    # twice again (observed in the static plan). Referencing ``tf``
    # keeps both branches' subtrees identical, so the broadcast build
    # reads the ReusedExchange instead of re-scanning the corpus.
    dfreq = tf.groupBy("token").agg(
        F.sum(F.when(F.col("tf") > 0, 1).otherwise(0))
        .cast("long")
        .alias("df")
    )
    stats = df.select(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size(corpus_tokens(F.col(text_col)))).alias("avgdl"),
    )
    contrib = (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
                + F.lit(1.0)
            ),
        )
        .withColumn(
            "c",
            F.col("idf")
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    scored = contrib.groupBy(id_col).agg(F.round(F.sum("c"), 6).alias("score"))
    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select(id_col, "score", "rank")
    )


# ---------------------------------------------------------------------------
# corpus n-gram statistics
# ---------------------------------------------------------------------------


def corpus_top_ngrams(
    df: DataFrame, text_col: str = "text", k: int = 2, top: int = 50
) -> DataFrame:
    """Most frequent word k-grams corpus-wide (occurrence counts, not
    per-doc distinct) — the frequent-boilerplate diagnostic run before
    choosing dedup thresholds. Total order (count desc, gram asc) makes
    the LIMIT deterministic."""
    toks = df.select(corpus_tokens(F.col(text_col)).alias("t"))
    grams = toks.select(
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(1),
                    F.greatest(F.size("t") - F.lit(k - 1), F.lit(0)),
                ),
                lambda i: F.array_join(F.slice("t", i, k), " "),
            )
        ).alias("gram")
    )
    return (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("gram"))
        .limit(top)
    )


# ---------------------------------------------------------------------------
# registered queries
# ---------------------------------------------------------------------------


def _q_doc_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    return document_frequency(_docs(spark, sf_dir)).orderBy("token")


_register(
    "rank_doc_frequency",
    _q_doc_frequency,
    f"""SELECT t AS token, COUNT(*)::BIGINT AS df
        FROM (SELECT doc_id, unnest(list_distinct({_TOKS_SQL})) AS t
              FROM documents)
        GROUP BY t ORDER BY token""",
)


def _q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    return inverted_index(_docs(spark, sf_dir)).orderBy("token")


_register(
    "rank_inverted_index",
    _q_inverted_index,
    f"""SELECT t AS token, COUNT(*)::BIGINT AS df,
               array_to_string(list_sort(list(doc_id))[1:20], ',') AS postings_csv
        FROM (SELECT doc_id, unnest(list_distinct({_TOKS_SQL})) AS t
              FROM documents)
        GROUP BY t ORDER BY token""",
)


def _q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tfidf_top_terms(_docs(spark, sf_dir)).orderBy("doc_id", "rank")


_register(
    "rank_tfidf_topterms",
    _q_tfidf,
    f"""WITH toks AS (SELECT doc_id, unnest({_TOKS_SQL}) AS token FROM documents),
       tf AS (SELECT doc_id, token, COUNT(*)::BIGINT AS tf
              FROM toks GROUP BY doc_id, token),
       dfreq AS (SELECT token, COUNT(DISTINCT doc_id)::BIGINT AS df
                 FROM toks GROUP BY token),
       n AS (SELECT COUNT(*)::BIGINT AS n_docs FROM documents),
       scored AS (SELECT tf.doc_id, tf.token,
                         ROUND(tf.tf * ln(n.n_docs::DOUBLE / dfreq.df), 6) AS score
                  FROM tf JOIN dfreq USING (token) CROSS JOIN n),
       ranked AS (SELECT doc_id, token, score,
                         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY score DESC, token) AS INT) AS rank
                  FROM scored)
       SELECT doc_id, token, score, rank FROM ranked
       WHERE rank <= 3 ORDER BY doc_id, rank""",
)

_BM25_TERMS = ["spark", "table", "shuffle", "join"]


def bm25_ctes(terms: list[str], *, top_k: int = 10, prefix: str = "") -> str:
    """DuckDB CTE chain replaying :func:`bm25_topk` for ``terms``,
    ``prefix``-ed so multiple query chains compose into one oracle
    (the retrieval-metrics harness embeds one chain per query). The
    final CTE ``{prefix}ranked`` exposes (doc_id, score, rank)."""
    p = prefix
    in_list = ", ".join(f"'{t}'" for t in terms)
    return f"""{p}toks AS (SELECT doc_id, len({_TOKS_SQL})::BIGINT AS dl,
                             unnest({_TOKS_SQL}) AS token
                      FROM documents),
       {p}qt AS (SELECT doc_id, dl, token, COUNT(*)::BIGINT AS tf
              FROM {p}toks
              WHERE token IN ({in_list})
              GROUP BY doc_id, dl, token),
       {p}dfreq AS (SELECT token, COUNT(DISTINCT doc_id)::BIGINT AS df
                 FROM {p}toks
                 WHERE token IN ({in_list})
                 GROUP BY token),
       {p}stats AS (SELECT COUNT(*)::BIGINT AS n_docs,
                        AVG(len({_TOKS_SQL})) AS avgdl
                 FROM documents),
       {p}contrib AS (
         SELECT qt.doc_id,
                ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
                  * (qt.tf * 2.2)
                  / (qt.tf + 1.2 * (0.25 + 0.75 * qt.dl / s.avgdl)) AS c
         FROM {p}qt qt JOIN {p}dfreq d USING (token) CROSS JOIN {p}stats s),
       {p}scored AS (SELECT doc_id, ROUND(SUM(c), 6) AS score
                  FROM {p}contrib GROUP BY doc_id),
       {p}ranked AS (SELECT doc_id, score,
                         CAST(ROW_NUMBER() OVER
                              (ORDER BY score DESC, doc_id) AS INT) AS rank
                  FROM {p}scored
                  QUALIFY rank <= {top_k})"""


def _q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_topk(_docs(spark, sf_dir), _BM25_TERMS).orderBy("rank")


_register(
    "rank_bm25_topk",
    _q_bm25,
    f"""WITH {bm25_ctes(_BM25_TERMS)}
       SELECT doc_id, score, rank FROM ranked ORDER BY rank""",
)


def _q_corpus_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus_top_ngrams(_docs(spark, sf_dir))


_register(
    "rank_corpus_ngrams",
    _q_corpus_ngrams,
    f"""SELECT g AS gram, COUNT(*)::BIGINT AS cnt
        FROM (SELECT unnest(list_transform(
                  generate_series(1, greatest(len(t) - 1, 0)),
                  i -> array_to_string(t[i:i+1], ' '))) AS g
              FROM (SELECT {_TOKS_SQL} AS t FROM documents))
        GROUP BY g ORDER BY cnt DESC, gram LIMIT 50""",
)


# ---------------------------------------------------------------------------
# phrase search over positional postings
# ---------------------------------------------------------------------------
#
# Exact-phrase retrieval the way a search engine executes it: positional
# postings (token, doc_id, pos) filtered to the phrase's terms, then ONE
# groupBy on the anchor position — a posting matching phrase offset i
# votes for anchor ``pos - i``; an anchor collecting all m distinct
# offsets is a match. One narrow shuffle regardless of phrase length
# (the m-way self-join formulation would shuffle m times), postings for
# non-phrase tokens are pruned at the scan, and repeated phrase terms
# are handled correctly because votes are per-offset, not per-term.
# The oracle takes the OPPOSITE strategy — a direct windowed slice
# comparison per document — so the differential crosses two genuinely
# different execution plans.


def phrase_search(
    df: DataFrame,
    phrase: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_matches, first_pos): documents containing the exact
    token sequence ``phrase`` (corpus tokenization), with the count of
    match start positions and the first one (1-based)."""
    terms = phrase.lower().split()
    m = len(terms)
    if m == 0:
        raise ValueError("empty phrase")
    postings = df.select(
        F.col(id_col),
        F.posexplode(corpus_tokens(F.col(text_col))).alias("_p0", "token"),
    ).select(id_col, (F.col("_p0") + 1).alias("pos"), "token")
    votes = None
    for i, t in enumerate(terms):
        v = postings.where(F.col("token") == t).select(
            id_col,
            (F.col("pos") - i).alias("anchor"),
            F.lit(i).alias("offset"),
        )
        votes = v if votes is None else votes.unionByName(v)
    anchors = (
        votes.where(F.col("anchor") >= 1)
        .groupBy(id_col, "anchor")
        .agg(F.count_distinct("offset").alias("_n_off"))
        .where(F.col("_n_off") == m)
    )
    return anchors.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_matches"),
        F.min("anchor").cast("long").alias("first_pos"),
    )


_PHRASE = "big order scan"


def _q_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    return phrase_search(_docs(spark, sf_dir), _PHRASE).orderBy("doc_id")


_register(
    "rank_phrase_search",
    _q_phrase,
    f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_SQL} AS a FROM documents),
hits AS (
  SELECT doc_id, i AS pos
  FROM toks,
       LATERAL unnest(generate_series(1, greatest(len(a) - 2, 1))) AS t(i)
  WHERE array_to_string(a[i : i + 2], ' ') = '{_PHRASE}')
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_matches,
       CAST(min(pos) AS BIGINT) AS first_pos
FROM hits GROUP BY doc_id ORDER BY doc_id
""",
)


# ---------------------------------------------------------------------------
# query-likelihood retrieval (Dirichlet smoothing)
# ---------------------------------------------------------------------------
#
# The third classic ranking model next to TF-IDF and BM25: score(q,d) =
# Σ_t log p(t|d) under Dirichlet smoothing (Zhai & Lafferty 2001),
# decomposed the standard way so only PRESENT terms join postings:
#   Σ_{t ∈ q ∩ d} log(1 + tf·|C| / (μ·cf(t)))  +  |q|·log(μ / (|d|+μ))
# Every log term quantizes to exact BIGINT 1e-7 units before summing
# (the lm.py cross-engine recipe — sums of rounded doubles are engine-
# order-dependent, integer sums are not), so ranking is exact on both
# engines. Plan shape mirrors ``bm25_topk``: the explode is filtered to
# query terms before any aggregation, corpus frequencies are a
# |q|-row broadcast, the corpus token total is a one-row broadcast
# (the rank_bm25 one-row-stats shape).


def ql_dirichlet_topk(
    df: DataFrame,
    query_terms: list[str],
    *,
    mu: float = 100.0,
    top_k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, score, rank): top-k docs containing >= 1 query term, ranked
    by the full smoothed query-likelihood (absent terms contribute via
    the length normalizer, so longer docs are properly penalized)."""
    m = len(query_terms)
    matched = df.select(
        F.col(id_col),
        F.size(corpus_tokens(F.col(text_col))).alias("dl"),
        F.explode(corpus_tokens(F.col(text_col))).alias("token"),
    ).where(F.col("token").isin(query_terms))
    cf = matched.groupBy("token").agg(F.count(F.lit(1)).alias("cf"))
    total = df.select(
        F.sum(F.size(corpus_tokens(F.col(text_col))))
        .cast("long")
        .alias("c_total")
    )
    tf = matched.groupBy(id_col, "dl", "token").agg(
        F.count(F.lit(1)).alias("tf")
    )
    contrib = (
        tf.join(F.broadcast(cf), "token")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "_u",
            F.round(
                F.log(
                    F.lit(1.0)
                    + (F.col("tf") * F.col("c_total"))
                    / (F.lit(float(mu)) * F.col("cf"))
                )
                * F.lit(1e7)
            ).cast("long"),
        )
    )
    scored = contrib.groupBy(id_col, "dl").agg(
        F.sum("_u").cast("long").alias("_sum_u")
    )
    norm_u = (
        F.lit(m)
        * F.round(
            F.log(
                F.lit(float(mu)) / (F.col("dl") + F.lit(float(mu)))
            )
            * F.lit(1e7)
        ).cast("long")
    )
    units = (F.col("_sum_u") + norm_u).alias("_units")
    ranked = scored.select(id_col, units)
    w = Window.orderBy(F.desc("_units"), F.asc(id_col))
    return (
        ranked.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select(
            id_col,
            F.round(F.col("_units") / F.lit(1e7), 4).alias("score"),
            "rank",
        )
    )


_QL_TERMS = ["spark", "window", "merge"]
_QL_MU = 100.0


def _q_ql(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ql_dirichlet_topk(
        _docs(spark, sf_dir), _QL_TERMS, mu=_QL_MU
    ).orderBy("rank")


_QL_TERMS_SQL = ", ".join(f"'{t}'" for t in _QL_TERMS)

_register(
    "rank_ql_dirichlet",
    _q_ql,
    f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_SQL} AS a FROM documents),
total AS (SELECT CAST(sum(len(a)) AS BIGINT) AS c_total FROM toks),
matched AS (
  SELECT doc_id, len(a) AS dl, t.token
  FROM toks, LATERAL unnest(a) AS t(token)
  WHERE t.token IN ({_QL_TERMS_SQL})),
cf AS (
  SELECT token, CAST(count(*) AS BIGINT) AS cf
  FROM matched GROUP BY token),
tf AS (
  SELECT doc_id, dl, token, CAST(count(*) AS BIGINT) AS tf
  FROM matched GROUP BY doc_id, dl, token),
contrib AS (
  SELECT tf.doc_id, tf.dl,
         CAST(round(ln(1.0 + (tf.tf * total.c_total)
                             / ({_QL_MU} * cf.cf)) * 1e7) AS BIGINT) AS u
  FROM tf JOIN cf USING (token), total),
scored AS (
  SELECT doc_id,
         CAST(sum(u) AS BIGINT)
         + {len(_QL_TERMS)}
           * CAST(round(ln({_QL_MU} / (dl + {_QL_MU})) * 1e7) AS BIGINT)
             AS units
  FROM contrib GROUP BY doc_id, dl),
ranked AS (
  SELECT doc_id, units,
         row_number() OVER (ORDER BY units DESC, doc_id ASC) AS rank
  FROM scored)
SELECT doc_id, round(units / 1e7, 4) AS score, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 10 ORDER BY rank
""",
)


# ---------------------------------------------------------------------------
# TF-IDF cosine document-similarity join
# ---------------------------------------------------------------------------
#
# The vector-space complement of the set-similarity joins in dedup.py
# (Jaccard/containment ignore term WEIGHTS; two docs sharing one rare
# technical term are closer than two sharing five stopwords). Candidate
# generation uses rare-term blocking — only terms with df <= max_df
# propose pairs, the same boilerplate-cap rationale as the winnow pair
# report (a pair sharing ONLY ubiquitous terms is noise by definition,
# and ubiquitous terms would force a quadratic join). The cosine itself
# is then EXACT over all shared terms of each candidate. Weights are
# integer 1e-7-unit idf scaled by tf, so dot products are exact BIGINT
# sums (order-independent on both engines); norms take one sqrt of an
# exact BIGINT sum — the lm.py recipe applied to a bilinear form.


def tfidf_cosine_pairs(
    df: DataFrame,
    *,
    threshold: float,
    max_df: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_a, id_b, cosine): candidate pairs sharing >= 1 rare BIGRAM
    (bigram df <= max_df) whose full unigram TF-IDF cosine reaches
    ``threshold``. Bigram blocking keeps candidates distinctive even on
    small-vocabulary corpora where no single term is rare; the verify
    stage is the classic unigram vector cosine."""
    from event_pipeline_spark.operators.text import bind

    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(corpus_tokens(F.col(text_col))).alias("token"),
    )
    tf = toks.groupBy("_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.count(F.lit(1)).alias("n"))
    w = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "_id",
            "token",
            (
                F.col("tf")
                * F.round(
                    F.log(F.col("n") / F.col("df")) * F.lit(1e7)
                ).cast("long")
            ).alias("wu"),
        )
    )
    norms = w.groupBy("_id").agg(
        F.sqrt(F.sum(F.col("wu") * F.col("wu"))).alias("norm")
    )
    bigrams = df.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.array_distinct(
                bind(
                    corpus_tokens(F.col(text_col)),
                    lambda a: F.transform(
                        F.sequence(
                            F.lit(1), F.greatest(F.size(a) - 1, F.lit(1))
                        ),
                        # concat_ws over 2 element lookups, not
                        # array_join(slice(...)) — no per-position array
                        # allocation; try_element_at past the end is
                        # NULL, which concat_ws skips, matching the
                        # slice's clamp on 1-token docs exactly (winnow
                        # r12 micro-form)
                        lambda i: F.concat_ws(
                            " ",
                            F.try_element_at(a, i),
                            F.try_element_at(a, i + F.lit(1)),
                        ),
                    ),
                )
            )
        ).alias("bg"),
    )
    # bigram df cap as a COUNT WINDOW over the join key (the winnow
    # ``max_df`` discipline): a separate groupBy("bg") subtree gets
    # column-pruned to bg-only, which defeats exchange reuse against
    # the (_id, bg) self-join sides — the bigram explode then re-runs
    # per consumer. The window needs exactly the clustering both
    # self-join sides need, so the whole candidate stage holds ONE
    # exchange over the bigram explode (ReusedExchange on the other
    # join side) and the explode runs once per execution.
    rare = (
        bigrams.repartition("bg")
        .withColumn(
            "_bdf", F.count(F.lit(1)).over(Window.partitionBy("bg"))
        )
        .where(F.col("_bdf") <= max_df)
        .drop("_bdf")
    )
    cand = (
        rare.alias("ra")
        .join(
            rare.alias("rb"),
            (F.col("ra.bg") == F.col("rb.bg"))
            & (F.col("ra._id") < F.col("rb._id")),
        )
        .select(
            F.col("ra._id").alias("id_a"), F.col("rb._id").alias("id_b")
        )
        .distinct()
    )
    wa = w.select(F.col("_id").alias("id_a"), "token", F.col("wu").alias("wa"))
    wb = w.select(F.col("_id").alias("id_b"), "token", F.col("wu").alias("wb"))
    dots = (
        cand.join(wa, "id_a")
        .join(wb, ["id_b", "token"])
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = norms.select(F.col("_id").alias("id_a"), F.col("norm").alias("na"))
    nb = norms.select(F.col("_id").alias("id_b"), F.col("norm").alias("nb"))
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("dot") / (F.col("na") * F.col("nb")), 6
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


_DOCSIM_THRESHOLD = 0.85
_DOCSIM_MAX_DF = 10


def _q_docsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tfidf_cosine_pairs(
        _docs(spark, sf_dir),
        threshold=_DOCSIM_THRESHOLD,
        max_df=_DOCSIM_MAX_DF,
    ).orderBy("id_a", "id_b")


_register(
    "rank_tfidf_docsim",
    _q_docsim,
    f"""
WITH toks AS (
  SELECT doc_id AS id, t.token
  FROM (SELECT doc_id, {_TOKS_SQL} AS a FROM documents),
       LATERAL unnest(a) AS t(token)),
tf AS (
  SELECT id, token, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY id, token),
dfreq AS (
  SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token),
n_docs AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
w AS MATERIALIZED (
  SELECT tf.id, tf.token,
         tf.tf * CAST(round(ln(n_docs.n::DOUBLE / dfreq.df::DOUBLE) * 1e7)
                      AS BIGINT) AS wu
  FROM tf JOIN dfreq USING (token), n_docs),
norms AS (
  SELECT id, sqrt(CAST(sum(wu * wu) AS BIGINT)::DOUBLE) AS nrm
  FROM w GROUP BY id),
bigrams AS MATERIALIZED (
  SELECT DISTINCT doc_id AS id, array_to_string(a[i : i + 1], ' ') AS bg
  FROM (SELECT doc_id, {_TOKS_SQL} AS a FROM documents),
       LATERAL unnest(generate_series(1, greatest(len(a) - 1, 1))) AS t(i)),
rare AS MATERIALIZED (
  SELECT id, bg FROM bigrams
  WHERE bg IN (SELECT bg FROM bigrams GROUP BY bg
               HAVING count(*) <= {_DOCSIM_MAX_DF})),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM rare a JOIN rare b ON a.bg = b.bg AND a.id < b.id),
dots AS (
  SELECT c.id_a, c.id_b, CAST(sum(wa.wu * wb.wu) AS BIGINT) AS dot
  FROM cand c
  JOIN w wa ON wa.id = c.id_a
  JOIN w wb ON wb.id = c.id_b AND wb.token = wa.token
  GROUP BY c.id_a, c.id_b)
SELECT d.id_a, d.id_b,
       round(d.dot::DOUBLE / (na.nrm * nb.nrm), 6) AS cosine
FROM dots d
JOIN norms na ON na.id = d.id_a
JOIN norms nb ON nb.id = d.id_b
WHERE round(d.dot::DOUBLE / (na.nrm * nb.nrm), 6) >= {_DOCSIM_THRESHOLD}
ORDER BY id_a, id_b
""",
)


# ---------------------------------------------------------------------------
# reciprocal-rank fusion (hybrid retrieval)
# ---------------------------------------------------------------------------


def rrf_fuse(
    rankings: list[DataFrame],
    *,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    top_k: int = 10,
) -> DataFrame:
    """(id, n_lists, rrf_units, rrf_score, rank): reciprocal-rank
    fusion (Cormack, Clarke & Buettcher 2009) of R ranked lists —
    score(d) = Σ_lists 1/(k + rank_list(d)), the standard way hybrid
    retrieval merges a lexical ranker (BM25) with a dense/ANN ranker
    without score calibration (rank positions are comparable where raw
    scores never are; k=60 is the published constant).

    Ranker-agnostic: each input needs only (id, rank) columns, so any
    of this module's retrievers — or `similarity.py`'s ANN top-k
    surfaces — can feed it.

    Spark-first: each list contributes ``round(1e7/(k+rank))`` as a
    BIGINT unit (one correctly-rounded division per row — never a
    data-dependent double fold), the union groups by id with map-side
    combine, and the final order is (units desc, id) — a total order.
    The fused set is bounded by Σ top-k of the inputs, so the final
    window is constant-size by construction. The presentation score is
    the UNROUNDED ``units / 1e7`` (one exact-integer division —
    re-rounding would land on half-decimal boundaries, the
    `graphrank.py` rule).
    """
    parts = [
        r.select(
            F.col(id_col),
            F.round(F.lit(1e7) / (F.lit(k) + F.col(rank_col)))
            .cast("long")
            .alias("_u"),
        )
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lists"),
        F.sum("_u").cast("bigint").alias("rrf_units"),
    )
    w = Window.orderBy(F.desc("rrf_units"), F.asc(id_col))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select(
            id_col,
            "n_lists",
            "rrf_units",
            (F.col("rrf_units") / F.lit(1e7)).alias("rrf_score"),
            "rank",
        )
    )


def _q_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return rrf_fuse(
        [
            bm25_topk(docs, _BM25_TERMS),
            ql_dirichlet_topk(docs, _QL_TERMS, mu=_QL_MU),
        ]
    ).orderBy("rank")


_register(
    "rank_rrf_fusion",
    _q_rrf,
    f"""
WITH r1 AS (SELECT doc_id, rank FROM ({ORACLES["rank_bm25_topk"]})),
r2 AS (SELECT doc_id, rank FROM ({ORACLES["rank_ql_dirichlet"]})),
u AS (
  SELECT doc_id, CAST(round(1e7 / (60 + rank)) AS BIGINT) AS uu FROM r1
  UNION ALL
  SELECT doc_id, CAST(round(1e7 / (60 + rank)) AS BIGINT) AS uu FROM r2),
fused AS (
  SELECT doc_id, count(*)::BIGINT AS n_lists, sum(uu)::BIGINT AS rrf_units
  FROM u GROUP BY doc_id),
ranked AS (
  SELECT doc_id, n_lists, rrf_units,
         CAST(row_number() OVER (ORDER BY rrf_units DESC, doc_id) AS INT)
           AS rank
  FROM fused)
SELECT doc_id, n_lists, rrf_units, rrf_units / 1e7 AS rrf_score, rank
FROM ranked WHERE rank <= 10 ORDER BY rank
""",
)


def expand_query_prf(
    df: DataFrame,
    query_terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    fb_k: int = 10,
    top_terms: int = 5,
) -> DataFrame:
    """Pseudo-relevance feedback (Rocchio/RM1-lite): take the BM25
    top-``fb_k`` documents as the feedback set and rank candidate
    expansion terms by feedback-frequency x idf. Returns
    (token, tf_fb, df, score, rank) for the ``top_terms`` best new
    terms (query terms excluded).

    Scale shape: the feedback set is ``fb_k`` rows (a broadcast
    semi-join against the corpus); candidate counting explodes ONLY
    the feedback documents' tokens; document frequency reuses the
    corpus-wide aggregation (vocabulary-sized). The idf ln() is a
    single correctly-rounded transcendental per distinct term — the
    rank_tfidf contract."""
    fb = bm25_topk(
        df, query_terms, id_col=id_col, text_col=text_col, top_k=fb_k
    ).select(id_col)
    fbtoks = (
        df.join(F.broadcast(fb), id_col)
        .select(F.explode(corpus_tokens(F.col(text_col))).alias("token"))
        .where(~F.col("token").isin(query_terms))
    )
    cand = fbtoks.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf_fb")
    )
    dfreq = (
        df.select(
            F.explode(F.array_distinct(corpus_tokens(F.col(text_col)))).alias(
                "token"
            )
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    )
    n = df.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    scored = (
        cand.join(dfreq, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "token",
            "tf_fb",
            "df",
            F.round(
                F.col("tf_fb")
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ).alias("score"),
        )
    )
    w = Window.orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_terms)
    )


def _q_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return expand_query_prf(_docs(spark, sf_dir), _BM25_TERMS).orderBy("rank")


_register(
    "rank_query_expansion",
    _q_prf,
    f"""WITH {bm25_ctes(_BM25_TERMS, top_k=10, prefix="fb_")},
       fbtoks AS (
         SELECT d.doc_id, unnest({_TOKS_SQL}) AS token
         FROM documents d JOIN fb_ranked r ON r.doc_id = d.doc_id),
       cand AS (
         SELECT token, count(*)::BIGINT AS tf_fb
         FROM fbtoks
         WHERE token NOT IN ('spark', 'table', 'shuffle', 'join')
         GROUP BY token),
       dfreq AS (
         SELECT token, count(DISTINCT doc_id)::BIGINT AS df
         FROM (SELECT doc_id, unnest(list_distinct({_TOKS_SQL})) AS token
               FROM documents)
         GROUP BY token),
       n AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
       scored AS (
         SELECT c.token, c.tf_fb, d.df,
                round(c.tf_fb * ln(n.n_docs::DOUBLE / d.df), 6) AS score
         FROM cand c JOIN dfreq d USING (token) CROSS JOIN n)
       SELECT token, tf_fb, df, score,
              CAST(row_number() OVER (ORDER BY score DESC, token) AS INT)
                AS rank
       FROM scored QUALIFY rank <= 5 ORDER BY rank""",
)
