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

from pyspark.sql import Column, DataFrame, SparkSession, Window
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


# ---------------------------------------------------------------------------
# Benford first-digit audit
# ---------------------------------------------------------------------------


def benford_digits(
    df: DataFrame, col: str, *, min_value: float = 1.0
) -> DataFrame:
    """(digit, n, obs_frac, exp_frac, chi_units): first-significant-
    digit distribution of ``col`` against Benford's law — the
    forensic-accounting screen for fabricated or truncated numeric
    columns (Nigrini 1996; a standard data-quality audit beside
    `check_rows`' rule counts).

    The first digit comes from string math (``substring`` of the
    non-scientific rendering via ``format_number``-free integer
    flooring): digit = floor(x / 10^floor(log10 x)) — one log10 +
    floor per row, exact for the audited range. Expected mass is
    log10(1 + 1/d). The chi-square contribution
    ``n·(obs−exp)²/exp`` is quantized per digit to 1e-7 BIGINT units
    so any cross-digit total stays an order-free integer sum.

    One groupBy(digit) shuffle of 9 keys; everything else is scalar
    expressions over the 9-row result (window total, no broadcast).
    """
    x = F.col(col).cast("double")
    base = df.where(x >= min_value).select(
        F.floor(x / F.pow(F.lit(10.0), F.floor(F.log10(x))))
        .cast("int")
        .alias("digit")
    )
    per = base.groupBy("digit").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    w = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    total = F.sum("n").over(w)
    obs = F.col("n").cast("double") / total.cast("double")
    exp = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
    chi = (
        total.cast("double")
        * (obs - exp)
        * (obs - exp)
        / exp
    )
    return per.select(
        "digit",
        "n",
        F.round(obs, 7).alias("obs_frac"),
        F.round(exp, 7).alias("exp_frac"),
        F.round(chi * F.lit(1e7)).cast("bigint").alias("chi_units"),
    )


def q_benford_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_pipeline_spark.session import read_table

    return benford_digits(
        read_table(spark, sf_dir, "orders"), "o_totalprice"
    ).orderBy("digit")


QUERIES["validate_benford"] = q_benford_totalprice
ORACLES["validate_benford"] = """
WITH base AS (
  SELECT CAST(floor(o_totalprice
                    / power(10.0, floor(log10(o_totalprice))))
              AS INT) AS digit
  FROM orders WHERE o_totalprice >= 1.0),
per AS (SELECT digit, count(*)::BIGINT AS n FROM base GROUP BY digit),
tot AS (SELECT sum(n)::BIGINT AS total FROM per)
SELECT digit, n,
       round(n::DOUBLE / total::DOUBLE, 7) AS obs_frac,
       round(log10(1.0 + 1.0 / digit::DOUBLE), 7) AS exp_frac,
       CAST(round(total::DOUBLE
                  * (n::DOUBLE / total::DOUBLE
                     - log10(1.0 + 1.0 / digit::DOUBLE))
                  * (n::DOUBLE / total::DOUBLE
                     - log10(1.0 + 1.0 / digit::DOUBLE))
                  / log10(1.0 + 1.0 / digit::DOUBLE) * 1e7)
            AS BIGINT) AS chi_units
FROM per, tot ORDER BY digit
"""


# ---------------------------------------------------------------------------
# Snapshot drift detection: the data-quality monitor every production
# pipeline runs between loads — compare per-column statistics of a new
# snapshot against the previous one and flag metrics whose profile
# moved. One aggregation pass per snapshot (map-side combinable), a
# stack + 2-value pivot per metric; all statistics are exact integers
# (cents / counts), so the report is oracle-recomputable and the flag
# is an exact integer cross-multiplication — no double division in the
# DECISION: |new − old| · 100 > tol_pct · |old|.
# ---------------------------------------------------------------------------


def snapshot_drift(
    old: DataFrame,
    new: DataFrame,
    *,
    metrics: dict[str, Column],
    tol_pct: int = 10,
) -> DataFrame:
    """(metric, old_value, new_value, drifted): exact integer metrics
    evaluated on both snapshots; ``drifted`` = relative change above
    ``tol_pct`` percent."""
    def agg(df: DataFrame, tag: str) -> DataFrame:
        row = df.agg(*[m.cast("long").alias(k) for k, m in metrics.items()])
        return row.select(F.lit(tag).alias("_t"), *metrics.keys())

    both = agg(old, "old").unionByName(agg(new, "new"))
    stack = ", ".join(f"'{k}', {k}" for k in metrics)
    melted = both.selectExpr(
        "_t", f"stack({len(metrics)}, {stack}) as (metric, value)"
    )
    pivoted = (
        melted.groupBy("metric")
        .pivot("_t", ["old", "new"])
        .agg(F.first("value"))
        .select(
            "metric",
            F.col("old").alias("old_value"),
            F.col("new").alias("new_value"),
        )
    )
    drifted = (
        F.abs(F.col("new_value") - F.col("old_value")) * 100
        > F.lit(tol_pct) * F.abs(F.col("old_value"))
    )
    return pivoted.withColumn("drifted", drifted)


def q_validate_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders drift: orders before 1998 (the standing snapshot) vs from
    1998 on (the new load) — row counts, null counts, distinct
    customers, total/max cents, F-status counts, all exact integers."""
    from event_pipeline_spark.session import read_table

    orders = read_table(spark, sf_dir, "orders")
    cut = "1998-01-01"
    old = orders.where(F.col("o_orderdate") < cut)
    new = orders.where(F.col("o_orderdate") >= cut)
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    metrics = {
        "n_rows": F.count(F.lit(1)),
        "n_null_price": F.count(F.lit(1)) - F.count("o_totalprice"),
        "n_customers": F.countDistinct("o_custkey"),
        "total_cents": F.sum(cents),
        "max_cents": F.max(cents),
        "n_status_f": F.sum((F.col("o_orderstatus") == "F").cast("long")),
    }
    return snapshot_drift(old, new, metrics=metrics).orderBy("metric")


QUERIES["validate_drift"] = q_validate_drift
ORACLES["validate_drift"] = """
WITH halves AS (
  SELECT CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
              THEN 'old' ELSE 'new' END AS t,
         o_custkey, o_totalprice, o_orderstatus
  FROM orders),
agg AS (
  SELECT t,
         count(*)::BIGINT AS n_rows,
         (count(*) - count(o_totalprice))::BIGINT AS n_null_price,
         count(DISTINCT o_custkey)::BIGINT AS n_customers,
         sum(floor(o_totalprice * 100 + 0.5)::BIGINT)::BIGINT AS total_cents,
         max(floor(o_totalprice * 100 + 0.5)::BIGINT)::BIGINT AS max_cents,
         sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)::BIGINT
           AS n_status_f
  FROM halves GROUP BY t),
melted AS (
  SELECT t, m.metric, m.value FROM agg,
  LATERAL (VALUES ('n_rows', n_rows), ('n_null_price', n_null_price),
                  ('n_customers', n_customers),
                  ('total_cents', total_cents), ('max_cents', max_cents),
                  ('n_status_f', n_status_f)) AS m(metric, value))
SELECT metric,
       max(CASE WHEN t = 'old' THEN value END)::BIGINT AS old_value,
       max(CASE WHEN t = 'new' THEN value END)::BIGINT AS new_value,
       abs(max(CASE WHEN t = 'new' THEN value END)
           - max(CASE WHEN t = 'old' THEN value END)) * 100
         > 10 * abs(max(CASE WHEN t = 'old' THEN value END)) AS drifted
FROM melted GROUP BY metric ORDER BY metric
"""
