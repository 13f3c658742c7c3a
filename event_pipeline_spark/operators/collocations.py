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


# ---------------------------------------------------------------------------
# windowed co-occurrence PMI (the skip-gram context statistic)
# ---------------------------------------------------------------------------


def cooccurrence_pmi(
    docs: DataFrame,
    *,
    text_col: str = "text",
    window: int = 3,
    min_count: int = 5,
    top_k: int = 200,
) -> DataFrame:
    """(a, b, c, f_a, f_b, pmi): top-k UNORDERED word pairs by PMI over
    co-occurrence within ±``window`` token positions — the skip-gram
    context statistic word2vec/GloVe factorize (Levy & Goldberg 2014:
    SGNS ≈ shifted PMI matrix), distinct from the adjacent-bigram
    collocations above (a phrase detector; this measures topical
    association at distance).

    With c = pair count, f_x = pairs containing x (marginal), and
    P = total pairs: pmi = ln(c·P / (f_a·f_b)) — the ln argument is
    ONE division of exact BIGINT products, rounded 7 dp; ordering is
    the total order (pmi desc, a, b) both engines agree on.

    Scale shape: positions fan out ``window`` offset keys each via
    ``explode(sequence(1, window))`` — NOT a broadcast-spine cross
    join: a BroadcastNestedLoopJoin breaks whole-stage codegen and
    leaves every downstream expression interpreted (the round-10
    stats_bootstrap_ci lesson: identical arithmetic 43.7s vs 6.0s at
    sf0.1) — and pair up by EQUI-join on (doc, position); no range
    predicate, no per-doc quadratic blowup; everything after is
    map-side-combinable counting."""
    # doc identity must be deterministic (pos joins against itself);
    # monotonically_increasing_id would re-draw per join branch
    pos = docs.select(
        F.col("doc_id").alias("did"),
        F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias(
            "i", "w"
        ),
    ).where(F.col("w") != "")
    a = pos.select(
        "did",
        "i",
        "w",
        F.explode(F.sequence(F.lit(1), F.lit(window))).alias("d"),
    ).select(
        "did", (F.col("i") + F.col("d")).alias("j"), F.col("w").alias("wa")
    )
    b = pos.select("did", F.col("i").alias("j"), F.col("w").alias("wb"))
    pairs = (
        a.join(b, ["did", "j"])
        .select(
            F.least("wa", "wb").alias("a"),
            F.greatest("wa", "wb").alias("b"),
        )
        # no-op at runtime (least/greatest of non-null split tokens),
        # but load-bearing for exchange reuse (r12 — pin dropped): the
        # downstream marginal/score joins push isnotnull(a) /
        # isnotnull(b) below the aggregate, and each of the pair
        # table's consumers would otherwise carry a DIFFERENT pushed
        # subset — distinct subtrees, no ReusedExchange, and the
        # tokenize -> offset-join -> partial-count pipeline would
        # re-run once per consumer. Stating both guards here makes
        # every consumer's subtree identical, so the count aggregate's
        # one (a, b) hash exchange is planned once and reused: the
        # expensive pipeline below it runs once per execution, with no
        # cache at any scale (the r11 pin also paid a full re-cache
        # per execution under the bench's honest block eviction). Only
        # the cheap final count merge above the reused exchange
        # re-evaluates per consumer.
        .where(F.col("a").isNotNull() & F.col("b").isNotNull())
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    total = pairs.agg(F.sum("c").cast("bigint").alias("p")).collect()[0][
        "p"
    ] or 0
    # single-pass marginal (r12): explode((a, b)) reads the pair table
    # ONCE where the former two-branch unionAll read it twice — with
    # the pin gone, that is one fewer re-evaluation of the count merge
    # above the reused exchange per execution
    marg = (
        pairs.select(
            F.explode(F.array(F.col("a"), F.col("b"))).alias("x"), "c"
        )
        .groupBy("x")
        .agg(F.sum("c").cast("bigint").alias("f"))
    )
    j = (
        pairs.where(F.col("c") >= min_count)
        .join(marg.select(F.col("x").alias("a"), F.col("f").alias("f_a")), "a")
        .join(marg.select(F.col("x").alias("b"), F.col("f").alias("f_b")), "b")
    )
    pmi = F.round(
        F.log(
            (F.col("c") * F.lit(int(total))).cast("double")
            / (F.col("f_a") * F.col("f_b")).cast("double")
        ),
        7,
    )
    return (
        j.select("a", "b", "c", "f_a", "f_b", pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), "a", "b")
        .limit(top_k)
    )


def q_text_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_pipeline_spark.session import read_table

    return cooccurrence_pmi(read_table(spark, sf_dir, "documents"))


QUERIES["text_cooccurrence_pmi"] = q_text_cooccurrence
ORACLES["text_cooccurrence_pmi"] = """
WITH pos AS (
  SELECT did, i, w FROM (
    SELECT doc_id AS did,
           generate_subscripts(regexp_split_to_array(trim(text), '\\s+'),
                               1) - 1 AS i,
           unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
    FROM documents)
  WHERE w <> ''),
pairs AS (
  SELECT least(a.w, b.w) AS a, greatest(a.w, b.w) AS b,
         count(*)::BIGINT AS c
  FROM pos a
  JOIN (SELECT unnest(generate_series(1, 3)) AS d) offs ON true
  JOIN pos b ON b.did = a.did AND b.i = a.i + offs.d
  GROUP BY 1, 2),
tot AS (SELECT sum(c)::BIGINT AS p FROM pairs),
marg AS (
  SELECT x, sum(c)::BIGINT AS f FROM (
    SELECT a AS x, c FROM pairs UNION ALL SELECT b AS x, c FROM pairs)
  GROUP BY x)
SELECT p.a, p.b, p.c, ma.f AS f_a, mb.f AS f_b,
       round(ln((p.c * tot.p)::DOUBLE / (ma.f * mb.f)::DOUBLE), 7) AS pmi
FROM pairs p CROSS JOIN tot
JOIN marg ma ON ma.x = p.a JOIN marg mb ON mb.x = p.b
WHERE p.c >= 5
ORDER BY pmi DESC, a, b LIMIT 200
"""
