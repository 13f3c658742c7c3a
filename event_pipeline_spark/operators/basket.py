"""Market-basket association rules (support / confidence / lift).

The Agrawal-Srikant (1994) frequent-itemset surface at the 2-itemset
level: treat each order as a basket of parts, count pair
co-occurrence, and score rules p=>q by

    support(p,q)  = c(pq) / N
    conf(p=>q)    = c(pq) / c(p)
    lift(p,q)     = c(pq) * N / (c(p) * c(q))

Spark-first, scale-first:

- baskets are ``distinct(l_orderkey, l_partkey)`` — one shuffle;
- candidate pairs come from a SELF-EQUI-JOIN on the basket key with
  ``p < q`` (each unordered pair once). Both sides hash-partition on
  ``l_orderkey`` in the SAME shuffle, so the join is co-located; the
  output per basket is (size choose 2), and basket size is bounded by
  the domain (a TPC-H order has <= 7 lineitems), so the expansion is
  a small constant factor — linear in orders at any corpus size. This
  is the A-Priori candidate-generation shape: NEVER a part-by-part
  cross join (parts x parts would be quadratic in the catalog);
- item and pair counts are map-side-combined groupBys; N is one
  scalar;
- scores are single integer divisions (correctly rounded doubles,
  identical in both engines), rounded to 7 dp.

One row per unordered pair (p < q) with both rule directions'
confidences, min-count filtered, ordered by (p, q).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES = {}
ORACLES = {}


def basket_rules(
    lineitem: DataFrame, *, min_pair_count: int = 3
) -> DataFrame:
    """(p, q, c_pq, c_p, c_q, support, conf_pq, conf_qp, lift) for
    every part pair co-occurring in >= ``min_pair_count`` orders."""
    items = lineitem.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    n = items.select("o").distinct().count()
    n_d = F.lit(float(n))
    ic = items.groupBy("p").agg(F.count(F.lit(1)).alias("c_item"))
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.o") == F.col("b.o"))
            & (F.col("a.p") < F.col("b.p")),
        )
        .groupBy(
            F.col("a.p").alias("p"), F.col("b.p").alias("q")
        )
        .agg(F.count(F.lit(1)).alias("c_pq"))
        .where(F.col("c_pq") >= min_pair_count)
    )
    joined = (
        pairs.join(ic.select(F.col("p"), F.col("c_item").alias("c_p")), "p")
        .join(
            ic.select(
                F.col("p").alias("q"), F.col("c_item").alias("c_q")
            ),
            "q",
        )
    )
    c_pq = F.col("c_pq").cast("double")
    return joined.select(
        F.col("p").cast("bigint").alias("p"),
        F.col("q").cast("bigint").alias("q"),
        F.col("c_pq").cast("bigint").alias("c_pq"),
        F.col("c_p").cast("bigint").alias("c_p"),
        F.col("c_q").cast("bigint").alias("c_q"),
        F.round(c_pq / n_d, 7).alias("support"),
        F.round(c_pq / F.col("c_p").cast("double"), 7).alias("conf_pq"),
        F.round(c_pq / F.col("c_q").cast("double"), 7).alias("conf_qp"),
        F.round(
            (c_pq * n_d)
            / (F.col("c_p").cast("double") * F.col("c_q").cast("double")),
            7,
        ).alias("lift"),
    ).orderBy("p", "q")


def q_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_pipeline_spark.session import read_table

    return basket_rules(read_table(spark, sf_dir, "lineitem"))


QUERIES["basket_rules"] = q_basket_rules
ORACLES["basket_rules"] = """
WITH items AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
tot AS (SELECT count(DISTINCT o) AS n FROM items),
ic AS (SELECT p, count(*) AS c_item FROM items GROUP BY p),
pairs AS (
  SELECT a.p AS p, b.p AS q, count(*) AS c_pq
  FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
  GROUP BY a.p, b.p
  HAVING count(*) >= 3)
SELECT pr.p::BIGINT AS p, pr.q::BIGINT AS q,
       pr.c_pq::BIGINT AS c_pq,
       cp.c_item::BIGINT AS c_p, cq.c_item::BIGINT AS c_q,
       round(pr.c_pq::DOUBLE / n::DOUBLE, 7) AS support,
       round(pr.c_pq::DOUBLE / cp.c_item::DOUBLE, 7) AS conf_pq,
       round(pr.c_pq::DOUBLE / cq.c_item::DOUBLE, 7) AS conf_qp,
       round((pr.c_pq::DOUBLE * n::DOUBLE)
             / (cp.c_item::DOUBLE * cq.c_item::DOUBLE), 7) AS lift
FROM pairs pr
JOIN ic cp ON cp.p = pr.p
JOIN ic cq ON cq.p = pr.q
CROSS JOIN tot
ORDER BY p, q
"""
