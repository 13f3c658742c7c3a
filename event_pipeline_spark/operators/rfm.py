"""RFM customer segmentation (recency / frequency / monetary).

The classic marketing-analytics operator (Hughes 1994; the standard
formulation scores each customer 1-5 on how recently they ordered,
how often, and how much they spent, then names segments from the
score triple). Reference parity: the reference engine's analytics
suite covers per-entity aggregation + bucketed scoring (cf.
``nexus/telemetry/reporter.py``-style rollups); RFM is the canonical
customer-side instance of that shape.

Spark-first, scale-first:

- one shuffle: ``groupBy(o_custkey)`` with map-side partial
  aggregation — recency/frequency/monetary in a single pass;
- monetary is summed in integer CENTS (``round(price*100)`` per row,
  BIGINT sum): ``o_totalprice`` is a double, and a double SUM is
  engine-order-dependent — the repo-standard quantize-then-integer-sum
  recipe closes that, here losslessly since prices carry 2 dp;
- quintile thresholds are ONE scalar aggregate row (exact
  ``percentile``) inlined as literals — never ``ntile() OVER (ORDER
  BY ...)``, which plans a global sort into a single partition and
  dies at 100 TB. Exact percentile buffers per-aggregate values
  (fine at test scale); production corpora swap in
  ``approx_percentile`` (t-digest, bounded memory) and accept label
  noise only within the sketch's rank error of a boundary — the
  ``lm.lm_bucket_select`` trade, documented there;
- scoring/labeling is then a pure codegen projection.

Oracle safety: thresholds are either an exact data value or strictly
between two (integer inputs), and both engines interpolate
``quantile_cont`` identically, so every ``>=`` comparison agrees;
monetary re-emerges as one exact division (``cents / 100.0``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

QUERIES = {}
ORACLES = {}

#: quintile fractions, shared by both engines
_QS = (0.2, 0.4, 0.6, 0.8)


def _score(col, ts, *, invert: bool = False):
    """1-5 bucket of ``col`` against ascending thresholds ``ts``;
    ``invert`` flips (recency: smaller is better)."""
    s = F.lit(1)
    for t in ts:
        s = F.when(F.col(col) > F.lit(t), s + 1).otherwise(s)
    return (F.lit(6) - s) if invert else s


def rfm_segments(orders: DataFrame) -> DataFrame:
    """(c_custkey, r_days, freq, monetary, r_score, f_score, m_score,
    segment) for every customer with at least one order."""
    ref = orders.agg(
        F.max(F.to_date("o_orderdate")).alias("d")
    ).collect()[0]["d"]
    per_cust = orders.groupBy(
        F.col("o_custkey").alias("c_custkey")
    ).agg(
        F.datediff(
            F.lit(ref), F.max(F.to_date("o_orderdate"))
        ).cast("bigint").alias("r_days"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(
            F.round(F.col("o_totalprice") * 100).cast("bigint")
        ).alias("m_cents"),
    )
    th = per_cust.agg(
        F.percentile(F.col("r_days"), F.lit(list(_QS))).alias("r"),
        F.percentile(F.col("freq"), F.lit(list(_QS))).alias("f"),
        F.percentile(F.col("m_cents"), F.lit(list(_QS))).alias("m"),
    ).collect()[0]
    r_s = _score("r_days", th["r"], invert=True)
    f_s = _score("freq", th["f"])
    m_s = _score("m_cents", th["m"])
    seg = (
        F.when((r_s >= 4) & (f_s >= 4) & (m_s >= 4), F.lit("champions"))
        .when((r_s >= 4) & (f_s <= 2), F.lit("new"))
        .when((r_s <= 2) & (f_s >= 4), F.lit("at_risk"))
        .when((r_s <= 2) & (f_s <= 2), F.lit("hibernating"))
        .when(f_s >= 4, F.lit("loyal"))
        .when(m_s >= 4, F.lit("big_spender"))
        .otherwise(F.lit("regular"))
    )
    return per_cust.select(
        "c_custkey",
        "r_days",
        "freq",
        (F.col("m_cents") / 100.0).alias("monetary"),
        r_s.cast("int").alias("r_score"),
        f_s.cast("int").alias("f_score"),
        m_s.cast("int").alias("m_score"),
        seg.alias("segment"),
    )


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_pipeline_spark.session import read_table

    return rfm_segments(read_table(spark, sf_dir, "orders")).orderBy(
        "c_custkey"
    )


QUERIES["analytics_rfm"] = q_rfm_segments
ORACLES["analytics_rfm"] = """
WITH ref AS (SELECT max(o_orderdate::DATE) AS d FROM orders),
per_cust AS MATERIALIZED (
  SELECT o_custkey AS c_custkey,
         date_diff('day', max(o_orderdate::DATE),
                   (SELECT d FROM ref))::BIGINT AS r_days,
         count(*)::BIGINT AS freq,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT
           AS m_cents
  FROM orders GROUP BY o_custkey),
th AS (
  SELECT quantile_cont(r_days, [0.2, 0.4, 0.6, 0.8]) AS r,
         quantile_cont(freq,   [0.2, 0.4, 0.6, 0.8]) AS f,
         quantile_cont(m_cents,[0.2, 0.4, 0.6, 0.8]) AS m
  FROM per_cust),
scored AS (
  SELECT c_custkey, r_days, freq, m_cents,
         6 - (1 + (CASE WHEN r_days > r[1] THEN 1 ELSE 0 END)
                + (CASE WHEN r_days > r[2] THEN 1 ELSE 0 END)
                + (CASE WHEN r_days > r[3] THEN 1 ELSE 0 END)
                + (CASE WHEN r_days > r[4] THEN 1 ELSE 0 END))
           AS r_score,
         1 + (CASE WHEN freq > f[1] THEN 1 ELSE 0 END)
           + (CASE WHEN freq > f[2] THEN 1 ELSE 0 END)
           + (CASE WHEN freq > f[3] THEN 1 ELSE 0 END)
           + (CASE WHEN freq > f[4] THEN 1 ELSE 0 END) AS f_score,
         1 + (CASE WHEN m_cents > m[1] THEN 1 ELSE 0 END)
           + (CASE WHEN m_cents > m[2] THEN 1 ELSE 0 END)
           + (CASE WHEN m_cents > m[3] THEN 1 ELSE 0 END)
           + (CASE WHEN m_cents > m[4] THEN 1 ELSE 0 END) AS m_score
  FROM per_cust CROSS JOIN th)
SELECT c_custkey, r_days, freq,
       m_cents / 100.0 AS monetary,
       r_score::INT AS r_score, f_score::INT AS f_score,
       m_score::INT AS m_score,
       CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
              THEN 'champions'
            WHEN r_score >= 4 AND f_score <= 2 THEN 'new'
            WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
            WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
            WHEN f_score >= 4 THEN 'loyal'
            WHEN m_score >= 4 THEN 'big_spender'
            ELSE 'regular' END AS segment
FROM scored ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# Gini concentration of customer spend
# ---------------------------------------------------------------------------


def gini_by_group(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str,
    id_col: str,
) -> DataFrame:
    """(group, n, total, gini_num, gini): the Gini coefficient of
    ``value_col`` per group — revenue-concentration analytics ("do 20%
    of customers carry 80% of spend?"), the distributional complement
    of RFM's per-customer scores.

    Rank formulation over integer values:

        G = (2·Σ i·x_(i) ) / (n·Σ x) − (n + 1)/n

    Tie-safe determinism: tied values occupy a CONSECUTIVE rank block,
    and Σ i over a fixed block is invariant to the order within it —
    so any total order extending the value order yields the same G;
    the implementation still pins (value, id) for a reproducible plan.
    With integer values the single-denominator form

        G = (2·Σ i·x − (n+1)·Σx) / (n·Σx)

    keeps the numerator ``gini_num`` exact BIGINT with headroom
    (≤ 2·n·Σx — no n² products); ``gini`` is the one final division.

    Scale: ranks come from a window PARTITIONED BY group (no global
    sort); everything after is a per-group aggregate with map-side
    combine.
    """
    w = (
        Window.partitionBy(F.col(group_col))
        .orderBy(F.col(value_col), F.col(id_col))
    )
    ranked = df.select(
        F.col(group_col).alias("g"),
        F.col(value_col).cast("bigint").alias("x"),
        F.row_number().over(w).cast("bigint").alias("i"),
    )
    agg = ranked.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("i") * F.col("x")).cast("bigint").alias("six"),
    )
    num = F.lit(2) * F.col("six") - (F.col("n") + 1) * F.col("sx")
    den = F.col("n") * F.col("sx")
    return agg.select(
        F.col("g").alias(group_col),
        "n",
        F.col("sx").alias("total"),
        num.cast("bigint").alias("gini_num"),
        F.when(
            F.col("sx") > 0, num.cast("double") / den.cast("double")
        ).alias("gini"),
    )


def q_gini_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini of per-customer spend (integer cents) within each nation-
    sized customer segment (custkey % 10 — the synthetic corpus has no
    nation FK on customers' orders side worth a join here; the modulo
    segment keeps group sizes meaningful at every SF)."""
    from event_pipeline_spark.session import read_table

    orders = read_table(spark, sf_dir, "orders")
    spend = orders.groupBy(F.col("o_custkey").alias("cust")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    seg = spend.select(
        (F.col("cust") % 10).alias("segment"), "cents", "cust"
    )
    return gini_by_group(
        seg, group_col="segment", value_col="cents", id_col="cust"
    ).orderBy("segment")


QUERIES["analytics_gini"] = q_gini_spend
ORACLES["analytics_gini"] = """
WITH spend AS (
  SELECT o_custkey AS cust,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS cents
  FROM orders GROUP BY o_custkey),
ranked AS (
  SELECT cust % 10 AS g, cents AS x,
         row_number() OVER (PARTITION BY cust % 10
                            ORDER BY cents, cust)::BIGINT AS i
  FROM spend),
agg AS (
  SELECT g, count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
         sum(i * x)::BIGINT AS six
  FROM ranked GROUP BY g)
SELECT g AS segment, n, sx AS total,
       (2 * six - (n + 1) * sx)::BIGINT AS gini_num,
       CASE WHEN sx > 0
            THEN (2 * six - (n + 1) * sx)::DOUBLE
                 / (n * sx)::DOUBLE END AS gini
FROM agg ORDER BY segment
"""
