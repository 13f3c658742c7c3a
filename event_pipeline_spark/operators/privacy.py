"""Right-to-erasure cascade purge (GDPR Art. 17 / CCPA delete).

The compliance operator every data platform must run: given a set of
data subjects, delete their rows from the root table AND every table
reachable through foreign keys — here the two-hop chain
``customer → orders → lineitem`` (lineitem carries no customer key;
its membership is derived through the orders hop, which is the part
naive per-table deletes get wrong).

Spark-first, scale-first:

- the subject set is TINY relative to the corpus (deletion requests),
  so every hop is a broadcast-able semi/anti join — ``LEFT ANTI`` for
  the retained remainder, ``LEFT SEMI`` to derive the next hop's key
  set; nothing ever collects to the driver;
- hop keys propagate as DataFrames (orders' purged keys feed
  lineitem's semi join), so the cascade is a join DAG Catalyst can
  broadcast per AQE stats, not a driver loop;
- the audit report (one row per table: rows before / purged / after)
  is what a deletion-compliance log must retain; ``n_purged + n_after
  == n_before`` is asserted by tests as the conservation identity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES = {}
ORACLES = {}


def purge_cascade(
    subjects: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
) -> tuple[dict[str, DataFrame], DataFrame]:
    """(cleaned tables by name, audit report). ``subjects`` holds one
    ``c_custkey`` column of subjects to forget."""
    subj = subjects.select("c_custkey").distinct()
    cust_clean = customer.join(subj, "c_custkey", "left_anti")
    purged_orders = orders.join(
        subj, orders.o_custkey == subj.c_custkey, "left_semi"
    )
    orders_clean = orders.join(
        subj, orders.o_custkey == subj.c_custkey, "left_anti"
    )
    li_clean = lineitem.join(
        purged_orders.select("o_orderkey"),
        lineitem.l_orderkey == purged_orders.o_orderkey,
        "left_anti",
    )

    def report(name: str, before: DataFrame, after: DataFrame) -> DataFrame:
        nb = before.agg(F.count(F.lit(1)).alias("n_before"))
        na = after.agg(F.count(F.lit(1)).alias("n_after"))
        return nb.crossJoin(na).select(
            F.lit(name).alias("table_name"),
            F.col("n_before").cast("bigint"),
            (F.col("n_before") - F.col("n_after"))
            .cast("bigint")
            .alias("n_purged"),
            F.col("n_after").cast("bigint"),
        )

    rep = (
        report("customer", customer, cust_clean)
        .unionByName(report("orders", orders, orders_clean))
        .unionByName(report("lineitem", lineitem, li_clean))
    )
    return (
        {
            "customer": cust_clean,
            "orders": orders_clean,
            "lineitem": li_clean,
        },
        rep,
    )


def q_privacy_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forget every customer with custkey % 101 == 0 (a deterministic
    stand-in for a deletion-request batch); report the cascade."""
    from event_pipeline_spark.session import read_table

    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    subjects = customer.where(F.col("c_custkey") % 101 == 0).select(
        "c_custkey"
    )
    _, rep = purge_cascade(subjects, customer, orders, lineitem)
    return rep.orderBy("table_name")


QUERIES["privacy_purge_cascade"] = q_privacy_purge
ORACLES["privacy_purge_cascade"] = """
WITH subj AS (SELECT c_custkey FROM customer WHERE c_custkey % 101 = 0),
purged_orders AS (
  SELECT o_orderkey FROM orders
  WHERE o_custkey IN (SELECT c_custkey FROM subj))
SELECT * FROM (
  SELECT 'customer' AS table_name,
         (SELECT count(*) FROM customer)::BIGINT AS n_before,
         (SELECT count(*) FROM customer
          WHERE c_custkey IN (SELECT c_custkey FROM subj))::BIGINT
           AS n_purged,
         (SELECT count(*) FROM customer
          WHERE c_custkey NOT IN (SELECT c_custkey FROM subj))::BIGINT
           AS n_after
  UNION ALL
  SELECT 'orders',
         (SELECT count(*) FROM orders)::BIGINT,
         (SELECT count(*) FROM purged_orders)::BIGINT,
         (SELECT count(*) FROM orders
          WHERE o_custkey NOT IN (SELECT c_custkey FROM subj))::BIGINT
  UNION ALL
  SELECT 'lineitem',
         (SELECT count(*) FROM lineitem)::BIGINT,
         (SELECT count(*) FROM lineitem
          WHERE l_orderkey IN (SELECT o_orderkey FROM purged_orders))
           ::BIGINT,
         (SELECT count(*) FROM lineitem
          WHERE l_orderkey NOT IN
                (SELECT o_orderkey FROM purged_orders))::BIGINT)
ORDER BY table_name
"""
