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


# ---------------------------------------------------------------------------
# Retrieval metrics: nDCG@k and MRR over the BM25 ranker
#
# The ranking stack (BM25 / QL-Dirichlet / RRF in operators/ranking.py)
# produces rankings; this harness grades them — the loop every search
# or RAG pipeline closes before shipping a ranker change. Graded
# relevance is derived deterministically from the corpus (rel(doc) =
# number of distinct query terms present), so the whole evaluation is
# recomputable by the oracle.
#
# Exactness: the DCG discount 1/log2(rank+1) is transcendental, but the
# rank domain is the fixed set 1..k — so the k discount constants are
# precomputed in PYTHON as 1e-7-unit integer literals and embedded in
# BOTH engines (a rank -> units map). DCG/IDCG are then pure BIGINT
# sums of gain * discount_units (gain = 2^rel - 1, integral), and
# ndcg = dcg_units / idcg_units is ONE correctly-rounded division.
# MRR likewise: first_rank is an integer, rr = 1/first_rank.
# IDCG@k uses the corpus-wide ideal: the k highest relevance grades of
# ANY judged document, not just retrieved ones (the standard
# definition — a ranker that misses every relevant doc scores 0, not
# NULL).
# ---------------------------------------------------------------------------

import math as _math

#: (query_id, term list) — fixed literal queries, the bm25 registered
#: query's term set first
EVAL_QUERIES: list[tuple[str, list[str]]] = [
    ("q_spark", ["spark", "table", "shuffle", "join"]),
    ("q_stream", ["data", "stream"]),
    ("q_sortmerge", ["query", "sort", "merge"]),
]

EVAL_K = 10

#: rank -> round(1e7 / log2(rank+1)) — identical literals both engines
DISCOUNT_UNITS: dict[int, int] = {
    r: round(1e7 / _math.log2(r + 1)) for r in range(1, EVAL_K + 1)
}


def _rel_counts(docs: DataFrame, terms: list[str]) -> DataFrame:
    """(doc_id, rel): distinct query terms occurring AT LEAST TWICE in
    the document (rel = 0 rows dropped — unjudged). The tf >= 2 bar
    makes the judgment strictly harder than term presence — BM25
    optimizes tf-weighted presence, so the two disagree on real
    rankings and the metric discriminates (with presence-relevance
    every query here scored a saturated 1.0). One filtered explode —
    corpus tokens for non-query terms never shuffle (the bm25_topk
    shape)."""
    from event_pipeline_spark.operators.ranking import corpus_tokens

    return (
        docs.select(
            "doc_id",
            F.explode(corpus_tokens(F.col("text"))).alias("token"),
        )
        .where(F.col("token").isin(terms))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .where(F.col("tf") >= 2)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("int").alias("rel"))
    )


def ndcg_mrr(
    docs: DataFrame,
    query_id: str,
    terms: list[str],
    *,
    k: int = EVAL_K,
) -> DataFrame:
    """One row: (query_id, n_rel, dcg_units, idcg_units, ndcg_at_k,
    first_rel_rank, rr) for the BM25 top-k ranking of ``terms``."""
    from event_pipeline_spark.operators.ranking import bm25_topk

    discount = F.create_map(
        *[
            c
            for r in range(1, k + 1)
            for c in (F.lit(r), F.lit(DISCOUNT_UNITS[r]).cast("long"))
        ]
    )
    gain = F.pow(F.lit(2.0), F.col("rel")).cast("long") - F.lit(1)

    ranked = bm25_topk(docs, terms, top_k=k)
    rel = _rel_counts(docs, terms)
    hits = ranked.join(rel, "doc_id", "left").select(
        "rank", F.coalesce(F.col("rel"), F.lit(0)).alias("rel")
    )
    dcg = hits.select(
        F.sum(gain * F.element_at(discount, F.col("rank")))
        .cast("bigint")
        .alias("dcg_units"),
        F.min(F.when(F.col("rel") > 0, F.col("rank"))).alias(
            "first_rel_rank"
        ),
    )
    # ideal: the k highest corpus-wide grades (tie order irrelevant —
    # the gain multiset determines IDCG; doc_id tiebreak keeps the
    # plan deterministic anyway)
    iw = Window.orderBy(F.desc("rel"), F.asc("doc_id"))
    ideal = (
        rel.withColumn("rank", F.row_number().over(iw))
        .where(F.col("rank") <= k)
        .select(
            F.sum(gain * F.element_at(discount, F.col("rank")))
            .cast("bigint")
            .alias("idcg_units"),
            F.count(F.lit(1)).cast("bigint").alias("n_rel_topk"),
        )
    )
    n_rel = rel.agg(F.count(F.lit(1)).cast("bigint").alias("n_rel"))
    return (
        dcg.crossJoin(ideal)
        .crossJoin(n_rel)
        .select(
            F.lit(query_id).alias("query_id"),
            "n_rel",
            F.coalesce("dcg_units", F.lit(0)).alias("dcg_units"),
            F.coalesce("idcg_units", F.lit(0)).alias("idcg_units"),
            F.when(
                F.col("idcg_units") > 0,
                F.col("dcg_units").cast("double")
                / F.col("idcg_units").cast("double"),
            ).alias("ndcg_at_k"),
            F.col("first_rel_rank").cast("int").alias("first_rel_rank"),
            F.when(
                F.col("first_rel_rank").isNotNull(),
                F.lit(1.0) / F.col("first_rel_rank").cast("double"),
            ).alias("rr"),
        )
    )


def q_eval_ndcg_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_pipeline_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents")
    out = None
    for qid, terms in EVAL_QUERIES:
        part = ndcg_mrr(docs, qid, terms)
        out = part if out is None else out.unionByName(part)
    return out.orderBy("query_id")


def _ndcg_oracle_sql() -> str:
    from event_pipeline_spark.operators.ranking import _TOKS_SQL, bm25_ctes

    discount_rows = ", ".join(
        f"({r}, {DISCOUNT_UNITS[r]}::BIGINT)" for r in range(1, EVAL_K + 1)
    )
    chains, selects = [], []
    for idx, (qid, terms) in enumerate(EVAL_QUERIES):
        p = f"e{idx}_"
        in_list = ", ".join(f"'{t}'" for t in terms)
        chains.append(bm25_ctes(terms, top_k=EVAL_K, prefix=p))
        chains.append(f"""{p}rel AS (
  SELECT doc_id, count(*)::INT AS rel
  FROM (SELECT doc_id, token, count(*) AS tf
        FROM (SELECT doc_id, unnest({_TOKS_SQL}) AS token
              FROM documents)
        WHERE token IN ({in_list})
        GROUP BY doc_id, token)
  WHERE tf >= 2
  GROUP BY doc_id),
{p}hits AS (
  SELECT r.rank, coalesce(l.rel, 0) AS rel
  FROM {p}ranked r LEFT JOIN {p}rel l USING (doc_id)),
{p}dcg AS (
  SELECT sum(((2 ** rel)::BIGINT - 1) * d.u)::BIGINT AS dcg_units,
         min(CASE WHEN rel > 0 THEN rank END) AS first_rel_rank
  FROM {p}hits JOIN disc d ON d.r = {p}hits.rank),
{p}ideal AS (
  SELECT sum(((2 ** rel)::BIGINT - 1) * d.u)::BIGINT AS idcg_units
  FROM (SELECT rel, row_number() OVER (ORDER BY rel DESC, doc_id) AS rank
        FROM {p}rel QUALIFY rank <= {EVAL_K}) i
  JOIN disc d ON d.r = i.rank),
{p}nrel AS (SELECT count(*)::BIGINT AS n_rel FROM {p}rel)""")
        selects.append(f"""SELECT '{qid}' AS query_id, n_rel,
       coalesce(dcg_units, 0) AS dcg_units,
       coalesce(idcg_units, 0) AS idcg_units,
       CASE WHEN idcg_units > 0
            THEN dcg_units::DOUBLE / idcg_units::DOUBLE END AS ndcg_at_k,
       first_rel_rank::INT AS first_rel_rank,
       CASE WHEN first_rel_rank IS NOT NULL
            THEN CAST(1 AS DOUBLE) / first_rel_rank::DOUBLE END AS rr
FROM {p}dcg, {p}ideal, {p}nrel""")
    return (
        f"WITH disc(r, u) AS (VALUES {discount_rows}),\n"
        + ",\n".join(chains)
        + "\n"
        + "\nUNION ALL\n".join(selects)
        + "\nORDER BY query_id"
    )


QUERIES["eval_ndcg_mrr"] = q_eval_ndcg_mrr
ORACLES["eval_ndcg_mrr"] = _ndcg_oracle_sql()


# ---------------------------------------------------------------------------
# Calibration: reliability bins + Brier components
#
# The companion to AUC: AUC grades a scorer's ORDERING, calibration
# grades whether its probabilities mean what they say (a quality
# classifier that says 0.9 should be right ~90% of the time — data
# pipelines threshold on these scores, so miscalibration silently
# shifts every acceptance rate). Standard reliability-diagram
# decomposition: equal-width probability bins, per bin the mean
# predicted probability vs the empirical positive rate, plus the
# bin's Brier contribution.
#
# Exactness: probabilities are quantized per row to 1e-7 units
# (BIGINT), so every per-bin aggregate (n, sum of units, positives,
# Brier numerator Σ(p_units − y·1e7)² in DECIMAL(38,0)) is exact
# integer arithmetic in both engines; mean_p / frac_pos / gap / the
# bin Brier are single correctly-rounded divisions. The score under
# test is interchangeable (here the eval_auc convention: a capped
# linear length score predicting lang == 'en').
# ---------------------------------------------------------------------------

#: probability quantization (1e-7 units) and bin count
_P_ONE = 10**7
N_BINS = 10


def calibration_bins(
    df: DataFrame,
    *,
    p_units_col: str,
    label_col: str,
    n_bins: int = N_BINS,
) -> DataFrame:
    """(bin, p_lo, n, sum_p_units, n_pos, brier_num, mean_p, frac_pos,
    gap, brier): equal-width reliability bins over a probability
    column given in 1e-7 integer units (callers quantize once per row
    — the float-oracle contract). The top edge (p = 1.0) folds into
    the last bin."""
    width = _P_ONE // n_bins
    p = F.col(p_units_col).cast("long")
    y = F.col(label_col).cast("long")
    b = F.least(
        F.floor(p / F.lit(width)).cast("int"), F.lit(n_bins - 1)
    )
    dec = "decimal(38,0)"
    res = (p - y * F.lit(_P_ONE)).cast(dec)
    agg = (
        df.select(b.alias("bin"), p.alias("p"), y.alias("y"), res.alias("r"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("p").cast("bigint").alias("sum_p_units"),
            F.sum("y").cast("bigint").alias("n_pos"),
            F.sum(F.col("r") * F.col("r")).cast(dec).alias("brier_num"),
        )
    )
    n = F.col("n").cast("double")
    return agg.select(
        F.col("bin"),
        (F.col("bin") * width).cast("bigint").alias("p_lo"),
        "n",
        "sum_p_units",
        "n_pos",
        F.col("brier_num").cast("decimal(38,0)").cast("string").alias(
            "brier_num"
        ),
        (F.col("sum_p_units").cast("double") / (n * _P_ONE)).alias("mean_p"),
        (F.col("n_pos").cast("double") / n).alias("frac_pos"),
        (
            (
                F.col("sum_p_units").cast(dec)
                - F.col("n_pos").cast(dec) * F.lit(_P_ONE)
            ).cast("double")
            / (n * _P_ONE)
        ).alias("gap"),
        (
            F.col("brier_num").cast("double")
            / (n * F.lit(float(_P_ONE)) * F.lit(float(_P_ONE)))
        ).alias("brier"),
    )


def q_eval_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability bins of the capped length score predicting
    lang == 'en' (the eval_auc scorer, now graded for calibration)."""
    from event_pipeline_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents").select(
        F.least(
            F.col("n_chars").cast("long") * 10000, F.lit(_P_ONE)
        ).alias("p_units"),
        (F.col("lang") == "en").cast("int").alias("label"),
    )
    return calibration_bins(
        docs, p_units_col="p_units", label_col="label"
    ).orderBy("bin")


QUERIES["eval_calibration"] = q_eval_calibration
ORACLES["eval_calibration"] = f"""
WITH base AS (
  SELECT least(n_chars::BIGINT * 10000, {_P_ONE}) AS p,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents),
binned AS (
  SELECT least((p // {_P_ONE // N_BINS})::INT, {N_BINS - 1}) AS bin,
         p, y, (p - y * {_P_ONE})::HUGEINT AS r
  FROM base),
agg AS (
  SELECT bin, count(*)::BIGINT AS n, sum(p)::BIGINT AS sum_p_units,
         sum(y)::BIGINT AS n_pos, sum(r * r)::HUGEINT AS brier_num
  FROM binned GROUP BY bin)
SELECT bin, (bin * {_P_ONE // N_BINS})::BIGINT AS p_lo, n, sum_p_units,
       n_pos, brier_num::VARCHAR AS brier_num,
       sum_p_units::DOUBLE / (n::DOUBLE * {_P_ONE}) AS mean_p,
       n_pos::DOUBLE / n::DOUBLE AS frac_pos,
       (sum_p_units::HUGEINT - n_pos::HUGEINT * {_P_ONE})::DOUBLE
         / (n::DOUBLE * {_P_ONE}) AS gap,
       brier_num::DOUBLE
         / (n::DOUBLE * {_P_ONE}.0 * {_P_ONE}.0) AS brier
FROM agg ORDER BY bin
"""


# ---------------------------------------------------------------------------
# exact precision/recall curve (threshold sweep)
# ---------------------------------------------------------------------------


def pr_curve_by_group(
    df: DataFrame,
    *,
    group_col: str,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """(group, threshold, tp, fp, fn, precision, recall, fpr): one
    exact operating point per DISTINCT score value — the full
    precision/recall (and ROC) sweep of a scorer, the readout a
    dedup/classifier parameter choice is actually made from. At
    ``threshold`` = s the classifier predicts positive iff score >= s,
    so the point lists its exact confusion counts.

    Exactness: counts are BIGINT cumulative sums over tie-collapsed
    (group, score) cells; precision/recall/fpr are each ONE correctly
    rounded IEEE division of exact integers — bit-identical across
    engines (the ``auc_by_group`` contract). Trapezoid integration of
    the (fpr, recall) points reproduces the midrank Mann-Whitney AUC
    exactly (pinned by a test).

    Scale shape: corpus rows collapse to |score domain| cells in one
    map-side-combinable aggregate; the cumulative windows partition by
    the evaluation group, so there is NO global sort. Output is
    |domain| rows per group — the curve, not the corpus."""
    per = df.groupBy(
        F.col(group_col).alias("g"), F.col(score_col).alias("s")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum(F.col(label_col).cast("long")).cast("bigint").alias("pos"),
    )
    cum = (
        Window.partitionBy("g")
        .orderBy(F.desc("s"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = Window.partitionBy("g")
    cells = per.select(
        "g",
        "s",
        F.sum("pos").over(cum).cast("bigint").alias("tp"),
        (F.sum("cnt").over(cum) - F.sum("pos").over(cum))
        .cast("bigint")
        .alias("fp"),
        F.sum("pos").over(tot).cast("bigint").alias("np"),
        (F.sum("cnt").over(tot) - F.sum("pos").over(tot))
        .cast("bigint")
        .alias("nn"),
    )
    return cells.select(
        F.col("g").alias(group_col),
        F.col("s").alias("threshold"),
        "tp",
        "fp",
        (F.col("np") - F.col("tp")).cast("bigint").alias("fn"),
        (
            F.col("tp").cast("double")
            / (F.col("tp") + F.col("fp")).cast("double")
        ).alias("precision"),
        F.when(
            F.col("np") > 0, F.col("tp").cast("double") / F.col("np")
        ).alias("recall"),
        F.when(
            F.col("nn") > 0, F.col("fp").cast("double") / F.col("nn")
        ).alias("fpr"),
    )


def q_eval_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PR/ROC sweep of document length predicting
    lang == 'en' — the same scorer ``eval_auc_by_source`` grades, now
    exposed as its full operating curve."""
    from event_pipeline_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents").select(
        "source",
        F.col("n_chars").alias("score"),
        (F.col("lang") == "en").cast("int").alias("label"),
    )
    return pr_curve_by_group(
        docs, group_col="source", score_col="score", label_col="label"
    ).orderBy("source", "threshold")


QUERIES["eval_pr_curve"] = q_eval_pr_curve
ORACLES["eval_pr_curve"] = """
WITH base AS (
  SELECT source AS g, n_chars AS s,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents),
per AS (
  SELECT g, s, count(*)::BIGINT AS cnt, sum(y)::BIGINT AS pos
  FROM base GROUP BY g, s),
cells AS (
  SELECT g, s,
         sum(pos) OVER (PARTITION BY g ORDER BY s DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW)::BIGINT AS tp,
         (sum(cnt) OVER (PARTITION BY g ORDER BY s DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)
          - sum(pos) OVER (PARTITION BY g ORDER BY s DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW))::BIGINT AS fp,
         sum(pos) OVER (PARTITION BY g)::BIGINT AS np,
         (sum(cnt) OVER (PARTITION BY g)
          - sum(pos) OVER (PARTITION BY g))::BIGINT AS nn
  FROM per)
SELECT g AS source, s AS threshold, tp, fp,
       (np - tp)::BIGINT AS fn,
       tp::DOUBLE / (tp + fp)::DOUBLE AS precision,
       CASE WHEN np > 0 THEN tp::DOUBLE / np::DOUBLE END AS recall,
       CASE WHEN nn > 0 THEN fp::DOUBLE / nn::DOUBLE END AS fpr
FROM cells ORDER BY source, threshold
"""


# ---------------------------------------------------------------------------
# cumulative gain / lift table (decile ranking diagnostic)
# ---------------------------------------------------------------------------


def gain_deciles_by_group(
    df: DataFrame,
    *,
    group_col: str,
    score_col: str,
    label_col: str,
    id_col: str,
    n_tiles: int = 10,
) -> DataFrame:
    """(group, decile, n_rows, n_pos, cum_rows, cum_pos, gain, lift):
    the gain/lift table — rank by score descending, cut into
    ``n_tiles`` equal-population tiles, and ask of each prefix "what
    share of all positives has the model captured by here?" (gain)
    and "how much better than random is that?" (lift). THE campaign /
    triage readout: the PR curve (``pr_curve_by_group``) grades every
    threshold; this grades the budgeted top-k% operating points.

    Determinism: ties broken by ``id_col`` ascending — tile membership
    is a function of the data, not of partitioning. Tile of rank r
    (1-based) is ``(r−1)·n_tiles div N`` (integer floor, balanced to
    ±1 row). gain = cum_pos/total_pos and lift =
    (cum_pos·N)/(total_pos·cum_rows) are each ONE correctly rounded
    division of exact BIGINT products.

    Scale shape: the rank window partitions by the evaluation group
    (NO global sort); rows then collapse to n_tiles cells per group."""
    rn = F.row_number().over(
        Window.partitionBy(F.col(group_col)).orderBy(
            F.desc(score_col), F.col(id_col)
        )
    )
    n = F.count(F.lit(1)).over(Window.partitionBy(F.col(group_col)))
    # integer DIV (truncating == floor on the non-negative numerator),
    # exact for the full BIGINT product — not double-divide-then-floor
    tiled = df.select(
        F.col(group_col).alias("g"),
        F.col(label_col).cast("long").alias("y"),
        (rn - F.lit(1)).cast("bigint").alias("rank0"),
        n.cast("bigint").alias("nrows"),
    ).select(
        "g",
        "y",
        F.expr(f"CAST((rank0 * {n_tiles}) DIV nrows AS INT)").alias(
            "decile"
        ),
    )
    per = tiled.groupBy("g", "decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("y").cast("bigint").alias("n_pos"),
    )
    cum = (
        Window.partitionBy("g")
        .orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = Window.partitionBy("g")
    cells = per.select(
        "g",
        "decile",
        "n_rows",
        "n_pos",
        F.sum("n_rows").over(cum).cast("bigint").alias("cum_rows"),
        F.sum("n_pos").over(cum).cast("bigint").alias("cum_pos"),
        F.sum("n_pos").over(tot).cast("bigint").alias("tp"),
        F.sum("n_rows").over(tot).cast("bigint").alias("nn"),
    )
    return cells.select(
        F.col("g").alias(group_col),
        "decile",
        "n_rows",
        "n_pos",
        "cum_rows",
        "cum_pos",
        F.when(
            F.col("tp") > 0,
            F.col("cum_pos").cast("double") / F.col("tp"),
        ).alias("gain"),
        F.when(
            (F.col("tp") > 0) & (F.col("cum_rows") > 0),
            (F.col("cum_pos") * F.col("nn")).cast("double")
            / (F.col("tp") * F.col("cum_rows")).cast("double"),
        ).alias("lift"),
    )


def q_eval_gain_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source gain/lift of document length predicting lang == 'en'
    — the budgeted-prefix readout of the eval_auc scorer."""
    from event_pipeline_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents").select(
        "source",
        F.col("n_chars").alias("score"),
        (F.col("lang") == "en").cast("int").alias("label"),
        "doc_id",
    )
    return gain_deciles_by_group(
        docs,
        group_col="source",
        score_col="score",
        label_col="label",
        id_col="doc_id",
    ).orderBy("source", "decile")


QUERIES["eval_gain_deciles"] = q_eval_gain_deciles
ORACLES["eval_gain_deciles"] = """
WITH base AS (
  SELECT source AS g, n_chars AS s, doc_id,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents),
tiled AS (
  SELECT g, y,
         ((row_number() OVER (PARTITION BY g ORDER BY s DESC, doc_id)
           - 1) * 10
          // count(*) OVER (PARTITION BY g))::INT AS decile
  FROM base),
per AS (
  SELECT g, decile, count(*)::BIGINT AS n_rows, sum(y)::BIGINT AS n_pos
  FROM tiled GROUP BY g, decile),
cells AS (
  SELECT g, decile, n_rows, n_pos,
         sum(n_rows) OVER (PARTITION BY g ORDER BY decile
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW)::BIGINT AS cum_rows,
         sum(n_pos) OVER (PARTITION BY g ORDER BY decile
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW)::BIGINT AS cum_pos,
         sum(n_pos) OVER (PARTITION BY g)::BIGINT AS tp,
         sum(n_rows) OVER (PARTITION BY g)::BIGINT AS nn
  FROM per)
SELECT g AS source, decile, n_rows, n_pos, cum_rows, cum_pos,
       CASE WHEN tp > 0 THEN cum_pos::DOUBLE / tp::DOUBLE END AS gain,
       CASE WHEN tp > 0 AND cum_rows > 0
            THEN (cum_pos * nn)::DOUBLE / (tp * cum_rows)::DOUBLE
       END AS lift
FROM cells ORDER BY source, decile
"""


# ---------------------------------------------------------------------------
# ROUGE-N overlap grading of near-duplicate pairs
# ---------------------------------------------------------------------------


def rouge_n_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    orders: tuple[int, ...] = (1, 2),
) -> DataFrame:
    """(id_a, id_b, n, overlap, total_a, total_b, p, r, f1): ROUGE-N
    (Lin 2004) between each candidate pair's texts — MULTISET n-gram
    overlap (clipped counts, the real ROUGE, not the set Jaccard the
    dedup join thresholds on). The dedup-diagnostics readout: a pair
    with Jaccard 0.5 but ROUGE-2 recall 0.95 is a quote-plus-commentary
    containment, not a paraphrase.

    With ov = Σ_g min(c_a(g), c_b(g)), t_x = Σ_g c_x(g): recall =
    ov/t_a (a is the reference), precision = ov/t_b, and F1 collapses
    algebraically to 2·ov/(t_a+t_b) — each ONE exact BIGINT division.

    Scale shape: gram counting is explode + map-side-combinable
    groupBy; the overlap join fans each pair out by the grams of ONE
    side and equi-joins the other on (id, gram) — work is Σ_pairs
    |grams|, linear in the (already bounded) candidate list, never
    all-pairs."""
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.filter(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
            lambda w: w != "",
        ).alias("toks"),
    )
    spark = docs.sparkSession
    # ONE unioned gram table over all orders, shared via EXCHANGE REUSE
    # (r12 — pin dropped): it feeds both pair sides and the totals (3
    # references), and the tokenize + explode + count chain would
    # otherwise recompute per reference (honest re-execution measured
    # 12s at sf0.1 before sharing vs ~2s shared). The r11 pin paid a
    # full re-cache per execution under the bench's honest block
    # eviction AND holds the gram table memory-resident at any corpus
    # size; the winnow discipline below shares the shuffle instead:
    # every consumer's subtree is made IDENTICAL (the explicit
    # isNotNull filter states the superset of every consumer's pushed
    # join predicates, so pushdown cannot differentiate the subtrees —
    # the triangle-orientation trick), and the trailing
    # ``repartition("id")`` gives them one hash exchange to fold onto:
    # hashpartitioning(id) satisfies the totals aggregate's (n, id)
    # clustering (subset) and the id_a pair-side join outright, so the
    # gram pipeline below the exchange runs once per execution with no
    # cache at any scale.
    def _gram_fn(width: int):
        # one-arg closure: a two-parameter lambda would make
        # F.transform pass the ARRAY INDEX as the second argument.
        # concat_ws over ``width`` element lookups, not
        # array_join(slice(...)): no per-position array allocation
        # (the winnow r12 micro-form; the size >= n guard above keeps
        # every lookup in bounds, and concat_ws would skip a null
        # exactly as the slice clamps)
        return lambda i: F.concat_ws(
            " ", *[F.try_element_at("toks", i + d) for d in range(width)]
        )

    gram_tbls = []
    for n in orders:
        gram_tbls.append(
            toks.select(
                F.lit(n).cast("int").alias("n"),
                "id",
                F.explode(
                    F.when(
                        F.size("toks") >= n,
                        F.transform(
                            F.sequence(F.lit(1), F.size("toks") - n + 1),
                            _gram_fn(n),
                        ),
                    ).otherwise(F.array().cast("array<string>"))
                ).alias("g"),
            )
            .groupBy("n", "id", "g")
            .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        )
    grams = gram_tbls[0]
    for t in gram_tbls[1:]:
        grams = grams.unionByName(t)
    grams = grams.where(
        F.col("id").isNotNull() & F.col("g").isNotNull()
    ).repartition("id")
    # bounded candidate list, referenced twice (the overlap join and
    # the spine re-attach) — same exchange-sharing discipline, keyed by
    # the first join's key; both consumers push the same {id_a, id_b}
    # null guards, stated explicitly so the subtrees stay identical
    pairs = pairs.where(
        F.col("id_a").isNotNull() & F.col("id_b").isNotNull()
    ).repartition("id_a")
    totals = grams.groupBy("n", "id").agg(
        F.sum("c").cast("bigint").alias("t")
    )
    ga = grams.select(
        "n", F.col("id").alias("id_a"), "g", F.col("c").alias("ca")
    )
    gb = grams.select(
        "n", F.col("id").alias("id_b"), "g", F.col("c").alias("cb")
    )
    ov = (
        pairs.join(ga, "id_a")
        .join(gb, ["id_b", "n", "g"])
        .groupBy("id_a", "id_b", "n")
        .agg(F.sum(F.least("ca", "cb")).cast("bigint").alias("overlap"))
    )
    order_spine = spark.createDataFrame(
        [(int(n),) for n in orders], "n int"
    )
    out = (
        pairs.crossJoin(F.broadcast(order_spine))  # |orders|-row spine
        .join(ov, ["id_a", "id_b", "n"], "left")
        .join(
            totals.select(
                "n", F.col("id").alias("id_a"), F.col("t").alias("total_a")
            ),
            ["id_a", "n"],
        )
        .join(
            totals.select(
                "n", F.col("id").alias("id_b"), F.col("t").alias("total_b")
            ),
            ["id_b", "n"],
        )
        .select(
            "id_a",
            "id_b",
            "n",
            F.coalesce("overlap", F.lit(0)).cast("bigint").alias("overlap"),
            "total_a",
            "total_b",
        )
    )
    ovc = F.col("overlap").cast("double")
    return out.select(
        "id_a",
        "id_b",
        "n",
        "overlap",
        "total_a",
        "total_b",
        F.when(
            F.col("total_b") > 0,
            F.round(ovc / F.col("total_b").cast("double"), 7),
        ).alias("p"),
        F.when(
            F.col("total_a") > 0,
            F.round(ovc / F.col("total_a").cast("double"), 7),
        ).alias("r"),
        F.when(
            (F.col("total_a") + F.col("total_b")) > 0,
            F.round(
                F.lit(2.0)
                * ovc
                / (F.col("total_a") + F.col("total_b")).cast("double"),
                7,
            ),
        ).alias("f1"),
    )


def q_eval_rouge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-1/2 grading of the exact n-gram-Jaccard near-dup pairs —
    the chained-oracle discipline: the oracle recomputes BOTH the pair
    list and the ROUGE arithmetic."""
    from event_pipeline_spark.operators.dedup import ngram_jaccard_pairs
    from event_pipeline_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents")
    # the pair chain appears once per union branch, but the subtrees
    # are identical and ReuseExchange shares them — pinning measured
    # slower (4.8s vs 3.6s at sf0.1)
    pairs = ngram_jaccard_pairs(
        docs, threshold=0.5, group_col="source"
    ).select("id_a", "id_b")
    return rouge_n_pairs(docs, pairs).orderBy("id_a", "id_b", "n")


QUERIES["eval_rouge_pairs"] = q_eval_rouge_pairs
ORACLES["eval_rouge_pairs"] = """
WITH sh AS (
  SELECT doc_id, source,
         list_distinct(list_transform(
             generate_series(1, greatest(len(toks) - 2, 0)),
             i -> array_to_string(toks[i:i+2], ' '))) AS grams
  FROM (SELECT doc_id, source,
               string_split_regex(lower(trim(text)), '\\s+') AS toks
        FROM documents)),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_intersect(a.grams, b.grams)) AS inter,
         len(a.grams) + len(b.grams)
             - len(list_intersect(a.grams, b.grams)) AS uni
  FROM sh a JOIN sh b
    ON a.source = b.source AND a.doc_id < b.doc_id),
pairs AS (
  SELECT id_a, id_b FROM cand
  WHERE inter > 0 AND ROUND(inter::DOUBLE / uni, 6) >= 0.5),
toks AS (
  SELECT doc_id AS id,
         list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                     w -> w <> '') AS toks
  FROM documents),
orders AS (SELECT unnest([1, 2]) AS n),
grams AS (
  SELECT id, n, g, count(*)::BIGINT AS c FROM (
    SELECT id, n,
           unnest(list_transform(
               generate_series(1, greatest(len(toks) - n + 1, 0)),
               i -> array_to_string(toks[i:i+n-1], ' '))) AS g
    FROM toks CROSS JOIN orders)
  GROUP BY id, n, g),
totals AS (SELECT id, n, sum(c)::BIGINT AS t FROM grams GROUP BY id, n),
ov AS (
  SELECT p.id_a, p.id_b, ga.n,
         sum(least(ga.c, gb.c))::BIGINT AS overlap
  FROM pairs p
  JOIN grams ga ON ga.id = p.id_a
  JOIN grams gb ON gb.id = p.id_b AND gb.n = ga.n AND gb.g = ga.g
  GROUP BY p.id_a, p.id_b, ga.n),
base AS (
  SELECT p.id_a, p.id_b, o.n,
         coalesce(ov.overlap, 0)::BIGINT AS overlap,
         ta.t AS total_a, tb.t AS total_b
  FROM pairs p CROSS JOIN orders o
  LEFT JOIN ov ON ov.id_a = p.id_a AND ov.id_b = p.id_b AND ov.n = o.n
  JOIN totals ta ON ta.id = p.id_a AND ta.n = o.n
  JOIN totals tb ON tb.id = p.id_b AND tb.n = o.n)
SELECT id_a, id_b, n::INT AS n, overlap, total_a, total_b,
       CASE WHEN total_b > 0
            THEN round(overlap::DOUBLE / total_b::DOUBLE, 7) END AS p,
       CASE WHEN total_a > 0
            THEN round(overlap::DOUBLE / total_a::DOUBLE, 7) END AS r,
       CASE WHEN total_a + total_b > 0
            THEN round(2 * overlap::DOUBLE
                       / (total_a + total_b)::DOUBLE, 7) END AS f1
FROM base ORDER BY id_a, id_b, n
"""


# ---------------------------------------------------------------------------
# Off-policy evaluation: inverse-propensity scoring (replay)
# ---------------------------------------------------------------------------


def ips_uniform_value(
    df: DataFrame,
    *,
    action_col: str,
    reward_col: str,
) -> DataFrame:
    """(action, n_a, n, k, sum_cents, p_hat, w, contrib_cents): the
    inverse-propensity-scoring estimate of a UNIFORM target policy's
    value from logged bandit data (Li et al. 2011 replay; Horvitz–
    Thompson weighting) — the offline answer to "what would we earn if
    we served all K actions equally?" without an online test. Behavior
    propensities are the empirical action shares p̂(a) = n_a/n (the
    logged-policy-is-stationary assumption, stated); the importance
    weight w = (1/K)/p̂ then collapses per action to

        contrib(a) = Σ_{i: a_i=a} r_i / (K·n_a)

    — ONE exact division of BIGINT cents per action. The total IPS
    value is the SUM over rows (left to the consumer so every emitted
    number stays a single correctly-rounded division). Rewards are
    integer cents; n, n_a, K exact.

    Scale shape: one map-side-combinable groupBy to K cells + two
    broadcast scalars; nothing per-row after the aggregate."""
    cents = F.floor(F.col(reward_col) * 100 + F.lit(0.5)).cast("bigint")
    per = df.groupBy(F.col(action_col).alias("action")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_a"),
        F.sum(cents).cast("bigint").alias("sum_cents"),
    )
    tot = per.agg(
        F.sum("n_a").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    j = per.crossJoin(F.broadcast(tot))  # one-row totals (bm25 shape)
    return j.select(
        "action",
        "n_a",
        "n",
        "k",
        "sum_cents",
        F.round(
            F.col("n_a").cast("double") / F.col("n").cast("double"), 7
        ).alias("p_hat"),
        F.round(
            F.col("n").cast("double")
            / (F.col("k") * F.col("n_a")).cast("double"),
            7,
        ).alias("w"),
        F.round(
            F.col("sum_cents").cast("double")
            / (F.col("k") * F.col("n_a")).cast("double"),
            7,
        ).alias("contrib_cents"),
    )


def q_eval_ips_uniform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPS replay value of serving event types uniformly, from the
    logged event stream (action = event_type, reward = value)."""
    from event_pipeline_spark.session import read_table

    return ips_uniform_value(
        read_table(spark, sf_dir, "events"),
        action_col="event_type",
        reward_col="value",
    ).orderBy("action")


QUERIES["eval_ips_uniform"] = q_eval_ips_uniform
ORACLES["eval_ips_uniform"] = """
WITH per AS (
  SELECT event_type AS action, count(*)::BIGINT AS n_a,
         sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS sum_cents
  FROM events GROUP BY event_type),
tot AS (SELECT sum(n_a)::BIGINT AS n, count(*)::BIGINT AS k FROM per)
SELECT action, n_a, tot.n, tot.k, sum_cents,
       round(n_a::DOUBLE / tot.n::DOUBLE, 7) AS p_hat,
       round(tot.n::DOUBLE / (tot.k * n_a)::DOUBLE, 7) AS w,
       round(sum_cents::DOUBLE / (tot.k * n_a)::DOUBLE, 7)
         AS contrib_cents
FROM per CROSS JOIN tot ORDER BY action
"""


# ---------------------------------------------------------------------------
# Murphy decomposition of the Brier score
# ---------------------------------------------------------------------------


def brier_decomposition(
    df: DataFrame,
    *,
    p_units_col: str,
    label_col: str,
    n_bins: int = N_BINS,
) -> DataFrame:
    """One row (n, brier, reliability, resolution, uncertainty,
    within_bin_var): Murphy (1973) decomposition of the Brier score
    over equal-width forecast bins — brier ≈ REL − RES + UNC, the
    standard split of "how wrong" into "mis-calibrated" (REL, lower
    better), "discriminating" (RES, higher better), and the
    irreducible base-rate term (UNC). ``within_bin_var`` is the exact
    remainder brier − (REL − RES + UNC) ≥ 0 — zero when forecasts are
    constant within bins, i.e. the decomposition's identity error from
    binning continuous forecasts, reported rather than hidden.

    Exactness: probabilities arrive in 1e-7 integer units (the
    ``calibration_bins`` contract). Per-bin rational terms are
    quantized by TRUNCATING decimal DIV (verified Spark ``div`` ==
    DuckDB ``//`` on non-negative DECIMAL/HUGEINT), summed exactly,
    and divided ONCE by N·P1² — never a float sum over bins (a 10-row
    double sum has engine-dependent order). All outputs rounded 7 dp.

    Scale shape: one map-side-combinable groupBy to ≤n_bins cells, a
    one-row total cross (documented allowance), fixed-shape
    arithmetic."""
    width = _P_ONE // n_bins
    p = F.col(p_units_col).cast("long")
    y = F.col(label_col).cast("long")
    b = F.least(
        F.floor(p / F.lit(width)).cast("int"), F.lit(n_bins - 1)
    )
    dec = "decimal(38,0)"
    r = (p - y * F.lit(_P_ONE)).cast(dec)
    cells = (
        df.select(b.alias("bin"), p.alias("p"), y.alias("y"), r.alias("r"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("nk"),
            F.sum(F.col("p").cast(dec)).alias("sk"),
            F.sum("y").cast("bigint").alias("yk"),
            F.sum(F.col("r") * F.col("r")).cast(dec).alias("bk"),
        )
    )
    # per-bin integer units: rel_k = (S_k - Y_k P1)^2 div n_k,
    # res-part_k = (Y_k P1)^2 div n_k (the Y^2/N term subtracts after)
    d = (F.col("sk") - F.col("yk").cast(dec) * F.lit(_P_ONE)).cast(dec)
    yp = (F.col("yk").cast(dec) * F.lit(_P_ONE)).cast(dec)
    per = cells.select(
        "nk",
        "yk",
        "bk",
        d.alias("dnum"),
        yp.alias("ypnum"),
    ).select(
        "nk",
        "yk",
        "bk",
        F.expr(f"CAST(dnum * dnum AS {dec}) div CAST(nk AS {dec})").alias(
            "rel_u"
        ),
        F.expr(
            f"CAST(ypnum * ypnum AS {dec}) div CAST(nk AS {dec})"
        ).alias("res_u"),
    )
    tot = per.agg(
        F.sum("nk").cast("bigint").alias("n"),
        F.sum("yk").cast("bigint").alias("ny"),
        F.sum(F.col("rel_u")).cast(dec).alias("rel_sum"),
        F.sum(F.col("res_u")).cast(dec).alias("res_sum"),
        F.sum("bk").cast(dec).alias("brier_sum"),
    )
    nn = F.col("n").cast("double")
    p1sq = F.lit(float(_P_ONE)) * F.lit(float(_P_ONE))
    ybar_num = F.col("ny").cast("double")
    brier = F.col("brier_sum").cast("double") / (nn * p1sq)
    rel = F.col("rel_sum").cast("double") / (nn * p1sq)
    # RES = (Σ_k (Y_k P1)^2/n_k - (Y P1)^2/N) / (N P1^2)
    res = (
        F.col("res_sum").cast("double")
        - (ybar_num * F.lit(float(_P_ONE))) ** 2 / nn
    ) / (nn * p1sq)
    unc = (ybar_num * (nn - ybar_num)) / (nn * nn)
    return tot.select(
        "n",
        F.round(brier, 7).alias("brier"),
        F.round(rel, 7).alias("reliability"),
        F.round(res, 7).alias("resolution"),
        F.round(unc, 7).alias("uncertainty"),
        F.round(brier - rel + res - unc, 7).alias("within_bin_var"),
    )


def q_eval_brier_decomposition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Murphy decomposition of the capped length score predicting
    lang == 'en' (the eval_calibration fixture, now summarized)."""
    from event_pipeline_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents").select(
        F.least(
            F.col("n_chars").cast("long") * 10000, F.lit(_P_ONE)
        ).alias("p_units"),
        (F.col("lang") == "en").cast("int").alias("label"),
    )
    return brier_decomposition(
        docs, p_units_col="p_units", label_col="label"
    )


QUERIES["eval_brier_decomposition"] = q_eval_brier_decomposition
ORACLES["eval_brier_decomposition"] = f"""
WITH base AS (
  SELECT least(n_chars::BIGINT * 10000, {_P_ONE}) AS p,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents),
binned AS (
  SELECT least((p // {_P_ONE // N_BINS})::INT, {N_BINS - 1}) AS bin,
         p, y, (p - y * {_P_ONE})::HUGEINT AS r
  FROM base),
cells AS (
  SELECT bin, count(*)::HUGEINT AS nk, sum(p)::HUGEINT AS sk,
         sum(y)::HUGEINT AS yk, sum(r * r)::HUGEINT AS bk
  FROM binned GROUP BY bin),
per AS (
  SELECT nk, yk, bk,
         ((sk - yk * {_P_ONE}) * (sk - yk * {_P_ONE})) // nk AS rel_u,
         ((yk * {_P_ONE}) * (yk * {_P_ONE})) // nk AS res_u
  FROM cells),
tot AS (
  SELECT sum(nk)::BIGINT AS n, sum(yk)::BIGINT AS ny,
         sum(rel_u)::HUGEINT AS rel_sum, sum(res_u)::HUGEINT AS res_sum,
         sum(bk)::HUGEINT AS brier_sum
  FROM per)
SELECT n,
       round(brier_sum::DOUBLE / (n::DOUBLE * {_P_ONE}::DOUBLE
             * {_P_ONE}::DOUBLE), 7) AS brier,
       round(rel_sum::DOUBLE / (n::DOUBLE * {_P_ONE}::DOUBLE
             * {_P_ONE}::DOUBLE), 7) AS reliability,
       round((res_sum::DOUBLE
              - (ny::DOUBLE * {_P_ONE}::DOUBLE)
                * (ny::DOUBLE * {_P_ONE}::DOUBLE) / n::DOUBLE)
             / (n::DOUBLE * {_P_ONE}::DOUBLE * {_P_ONE}::DOUBLE), 7)
         AS resolution,
       round(ny::DOUBLE * (n::DOUBLE - ny::DOUBLE)
             / (n::DOUBLE * n::DOUBLE), 7) AS uncertainty,
       round(brier_sum::DOUBLE / (n::DOUBLE * {_P_ONE}::DOUBLE
               * {_P_ONE}::DOUBLE)
             - rel_sum::DOUBLE / (n::DOUBLE * {_P_ONE}::DOUBLE
               * {_P_ONE}::DOUBLE)
             + (res_sum::DOUBLE
                - (ny::DOUBLE * {_P_ONE}::DOUBLE)
                  * (ny::DOUBLE * {_P_ONE}::DOUBLE) / n::DOUBLE)
               / (n::DOUBLE * {_P_ONE}::DOUBLE * {_P_ONE}::DOUBLE)
             - ny::DOUBLE * (n::DOUBLE - ny::DOUBLE)
               / (n::DOUBLE * n::DOUBLE), 7) AS within_bin_var
FROM tot
"""
