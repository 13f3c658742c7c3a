"""Data validation / expectations: declarative quality contracts over
tables, evaluated in one scan.

A 100 TB ingestion run needs its contract checks ("no null keys", "qty
in [1,50]", "every order references a customer") to cost one pass, not
one job per rule. Row-level rules compile to conditional-count
aggregates folded into a SINGLE aggregate over one scan (map-side
partials, a one-row shuffle); referential rules are anti-join counts
whose shuffle carries only key columns. The report is a tiny
``(rule, violations)`` table — the thing a pipeline gate reads.

Maps the reference's field validation (``InputDataField.__set__``
isinstance checks, /root/reference/nexus/fields.py:322-354) from
per-assignment Python checks onto set-oriented contract evaluation.

Registered queries:
- ``validate_orders`` [oracle] — a six-rule contract over orders and
  customer with exact per-rule violation counts (one rule deliberately
  fails, so the report shows non-zero counts alongside passing rules).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES = {}
ORACLES = {}

_RULE_NAME = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def check_rows(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Evaluate row-level expectations in ONE aggregate over one scan.

    ``rules`` maps rule name → a boolean Column that is True when the
    row SATISFIES the expectation (NULL counts as a violation, as in
    SQL constraint semantics). Returns ``rule, violations`` rows.

    Rule names are interpolated into a ``stack(...)`` expression, so
    they must be bare identifiers; anything else (or an empty rules
    dict) raises ``ValueError`` up front rather than producing a
    malformed SQL expression.
    """
    if not rules:
        raise ValueError("check_rows: rules dict must not be empty")
    for name in rules:
        if not _RULE_NAME.match(name):
            raise ValueError(
                f"check_rows: rule name {name!r} is not a bare identifier"
            )
    counts = df.agg(
        *[
            F.sum(
                F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1)
            ).alias(name)
            for name, cond in rules.items()
        ]
    )
    # unpivot the one-row wide aggregate to (rule, violations)
    stack_args = ", ".join(f"'{n}', `{n}`" for n in rules)
    return counts.select(
        F.expr(
            f"stack({len(rules)}, {stack_args}) AS (rule, violations)"
        )
    )


def check_referential(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    rule_name: str,
) -> DataFrame:
    """Orphan count: child rows whose key has no parent. The anti join
    shuffles only the key columns; Catalyst picks broadcast-anti when
    the parent's key projection fits."""
    orphans = child.select(F.col(child_key).alias("__k")).join(
        parent.select(F.col(parent_key).alias("__k")),
        on="__k",
        how="left_anti",
    )
    return orphans.agg(
        F.lit(rule_name).alias("rule"),
        F.count("*").alias("violations"),
    )


def expect(
    df: DataFrame,
    rules: dict[str, Column],
    referential: list[tuple[DataFrame, str, DataFrame, str, str]] = (),
) -> DataFrame:
    """Full contract: row rules (one scan) + referential rules (one
    anti join each), unioned into one report ordered by rule name."""
    report = check_rows(df, rules)
    for child, ck, parent, pk, name in referential:
        report = report.unionByName(
            check_referential(child, ck, parent, pk, name)
        )
    return report.orderBy("rule")


def q_validate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract over the orders fact: key present, positive price,
    status in its domain, priority well-formed, and referential
    integrity to customer."""
    from event_pipeline_spark.session import read_table

    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    rules = {
        "orderkey_not_null": F.col("o_orderkey").isNotNull(),
        "price_positive": F.col("o_totalprice") > 0,
        "status_in_domain": F.col("o_orderstatus").isin("O", "F", "P"),
        # deliberately tight bound: a rule that FAILS on real data, so
        # the report exhibits non-zero counts alongside passing rules
        "price_under_450k": F.col("o_totalprice") < 450000.0,
        "priority_wellformed": F.col("o_orderpriority").rlike("^[1-5]-"),
    }
    return expect(
        orders,
        rules,
        referential=[
            (orders, "o_custkey", customer, "c_custkey", "custkey_references_customer")
        ],
    )


QUERIES["validate_orders"] = q_validate_orders
ORACLES["validate_orders"] = """
    SELECT rule, violations FROM (
      SELECT 'orderkey_not_null' AS rule,
             CAST(SUM(CASE WHEN o_orderkey IS NOT NULL THEN 0 ELSE 1 END)
                  AS BIGINT) AS violations
      FROM orders
      UNION ALL
      SELECT 'price_positive',
             CAST(SUM(CASE WHEN COALESCE(o_totalprice > 0, FALSE)
                           THEN 0 ELSE 1 END) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'price_under_450k',
             CAST(SUM(CASE WHEN COALESCE(o_totalprice < 450000.0, FALSE)
                           THEN 0 ELSE 1 END) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'status_in_domain',
             CAST(SUM(CASE WHEN COALESCE(o_orderstatus IN ('O','F','P'), FALSE)
                           THEN 0 ELSE 1 END) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'priority_wellformed',
             CAST(SUM(CASE WHEN COALESCE(regexp_matches(o_orderpriority,
                               '^[1-5]-'), FALSE) THEN 0 ELSE 1 END) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'custkey_references_customer', COUNT(*)
      FROM orders o WHERE NOT EXISTS
        (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    ) ORDER BY rule
"""
