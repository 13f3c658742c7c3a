"""Table profiling: per-column summary statistics in one scan.

The data-quality operator every ingest pipeline runs first (the
dbt/Deequ/Great-Expectations "profile" step; cf. the reference's
validation surface, ``nexus/validators/`` — this is its table-level
statistical complement): row count, null count/fraction, exact
distinct count, min/max, and an exactness-safe sum per column, one
output row per column.

Spark-first, scale-first:

- ONE scan, ONE aggregate: every column's statistics are expressions
  of the same global ``agg`` — Catalyst plans the multi-distinct via
  ``Expand`` (one row per distinct-aggregate group) with partial
  aggregation upstream, so the single-partition exchange moves ONE
  row of finals, never data;
- the per-column presentation rows come from ``inline(array(struct
  ...))`` over that one row — driver-free pivot, no second pass;
- double columns are summed in integer units (``round(x * unit)``
  cast BIGINT per row, then an order-free integer SUM) — the
  repo-standard quantization recipe (`rfm.py` cents): a raw double
  SUM is engine-order-dependent and would never hash-match;
- timestamps min/max are emitted as formatted strings (oracle
  contract: DuckDB ``fetchdf`` renders naive timestamps differently
  from Spark's collect — strings are the stable interchange).

100 TB notes: exact multi-column distinct counts via ``Expand``
multiply scan rows by the number of profiled columns before the
partial aggregate — affordable for a profiling pass but the knob is
``exact=False``, which swaps every NDV to ``approx_count_distinct``
(HyperLogLog++, one pass, no Expand, mergeable partials) and is the
production default at corpus scale; the registered query keeps
``exact=True`` so the whole row hash-matches DuckDB. Integer-unit
sums bound: |sum| < 2^63 ⇒ unit * Σ|x| < 9.2e18 — the caller picks
the unit per column (cents for money) with that budget in mind.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

QUERIES = {}
ORACLES = {}

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


def profile_table(
    df: DataFrame,
    *,
    units: dict[str, int] | None = None,
    exact: bool = True,
) -> DataFrame:
    """One row per column: (col_name, n_rows, n_null, null_frac,
    n_distinct, min_num, max_num, sum_units, min_str, max_str,
    len_sum).

    ``units`` maps double-typed columns to their integer-sum
    multiplier (default 100 — two-decimal money); integer columns
    sum at unit 1. ``exact=False`` switches distinct counts to
    HyperLogLog++ (the 100 TB path; no longer oracle-exact).
    """
    units = units or {}
    aggs: list[Column] = [F.count(F.lit(1)).alias("_n")]
    fields = df.schema.fields
    for f in fields:
        c, name = F.col(f.name), f.name
        aggs.append(F.count(c).alias(f"_nn_{name}"))
        aggs.append(
            (
                F.count_distinct(c)
                if exact
                else F.approx_count_distinct(c)
            ).alias(f"_nd_{name}")
        )
        if isinstance(f.dataType, (T.DoubleType, T.FloatType)):
            unit = units.get(name, 100)
            aggs.append(F.min(c).cast("double").alias(f"_min_{name}"))
            aggs.append(F.max(c).cast("double").alias(f"_max_{name}"))
            aggs.append(
                F.sum(F.round(c * unit).cast("bigint")).alias(
                    f"_sum_{name}"
                )
            )
        elif isinstance(
            f.dataType, (T.LongType, T.IntegerType, T.ShortType)
        ):
            aggs.append(F.min(c).cast("double").alias(f"_min_{name}"))
            aggs.append(F.max(c).cast("double").alias(f"_max_{name}"))
            aggs.append(
                F.sum(c.cast("bigint")).alias(f"_sum_{name}")
            )
        elif isinstance(f.dataType, T.StringType):
            aggs.append(F.min(c).alias(f"_mins_{name}"))
            aggs.append(F.max(c).alias(f"_maxs_{name}"))
            aggs.append(
                F.sum(F.length(c).cast("bigint")).alias(f"_len_{name}")
            )
        elif isinstance(
            f.dataType, (T.TimestampType, T.TimestampNTZType, T.DateType)
        ):
            aggs.append(
                F.date_format(F.min(c), _TS_FMT).alias(f"_mins_{name}")
            )
            aggs.append(
                F.date_format(F.max(c), _TS_FMT).alias(f"_maxs_{name}")
            )

    stats = df.agg(*aggs)

    null_s = F.lit(None).cast("string")
    null_d = F.lit(None).cast("double")
    null_l = F.lit(None).cast("bigint")
    rows = []
    for f in fields:
        name = f.name
        has = lambda p: f"{p}_{name}" in stats.columns  # noqa: E731
        rows.append(
            F.struct(
                F.lit(name).alias("col_name"),
                F.col("_n").cast("bigint").alias("n_rows"),
                (F.col("_n") - F.col(f"_nn_{name}"))
                .cast("bigint")
                .alias("n_null"),
                F.round(
                    (F.col("_n") - F.col(f"_nn_{name}")).cast("double")
                    / F.col("_n").cast("double"),
                    7,
                ).alias("null_frac"),
                F.col(f"_nd_{name}").cast("bigint").alias("n_distinct"),
                (F.col(f"_min_{name}") if has("_min") else null_d).alias(
                    "min_num"
                ),
                (F.col(f"_max_{name}") if has("_max") else null_d).alias(
                    "max_num"
                ),
                (
                    F.col(f"_sum_{name}").cast("bigint")
                    if has("_sum")
                    else null_l
                ).alias("sum_units"),
                (
                    F.col(f"_mins_{name}") if has("_mins") else null_s
                ).alias("min_str"),
                (
                    F.col(f"_maxs_{name}") if has("_maxs") else null_s
                ).alias("max_str"),
                (
                    F.col(f"_len_{name}").cast("bigint")
                    if has("_len")
                    else null_l
                ).alias("len_sum"),
            )
        )
    return stats.select(F.inline(F.array(*rows)))


def q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_pipeline_spark.session import read_table

    return profile_table(
        read_table(spark, sf_dir, "orders")
    ).orderBy("col_name")


QUERIES["profile_orders"] = q_profile_orders
ORACLES["profile_orders"] = f"""
WITH s AS (
  SELECT count(*) AS n,
         count(o_orderkey) AS nn1, count(DISTINCT o_orderkey) AS nd1,
         min(o_orderkey)::DOUBLE AS mi1, max(o_orderkey)::DOUBLE AS ma1,
         sum(o_orderkey)::BIGINT AS su1,
         count(o_custkey) AS nn2, count(DISTINCT o_custkey) AS nd2,
         min(o_custkey)::DOUBLE AS mi2, max(o_custkey)::DOUBLE AS ma2,
         sum(o_custkey)::BIGINT AS su2,
         count(o_orderstatus) AS nn3,
         count(DISTINCT o_orderstatus) AS nd3,
         min(o_orderstatus) AS mis3, max(o_orderstatus) AS mas3,
         sum(length(o_orderstatus))::BIGINT AS le3,
         count(o_totalprice) AS nn4, count(DISTINCT o_totalprice) AS nd4,
         min(o_totalprice)::DOUBLE AS mi4, max(o_totalprice)::DOUBLE AS ma4,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS su4,
         count(o_orderdate) AS nn5, count(DISTINCT o_orderdate) AS nd5,
         strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S') AS mis5,
         strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') AS mas5,
         count(o_orderpriority) AS nn6,
         count(DISTINCT o_orderpriority) AS nd6,
         min(o_orderpriority) AS mis6, max(o_orderpriority) AS mas6,
         sum(length(o_orderpriority))::BIGINT AS le6
  FROM orders)
SELECT * FROM (
  SELECT 'o_orderkey' AS col_name, n::BIGINT AS n_rows,
         (n - nn1)::BIGINT AS n_null,
         round((n - nn1)::DOUBLE / n::DOUBLE, 7) AS null_frac,
         nd1::BIGINT AS n_distinct, mi1 AS min_num, ma1 AS max_num,
         su1 AS sum_units, NULL::VARCHAR AS min_str,
         NULL::VARCHAR AS max_str, NULL::BIGINT AS len_sum FROM s
  UNION ALL
  SELECT 'o_custkey', n::BIGINT, (n - nn2)::BIGINT,
         round((n - nn2)::DOUBLE / n::DOUBLE, 7), nd2::BIGINT,
         mi2, ma2, su2, NULL, NULL, NULL FROM s
  UNION ALL
  SELECT 'o_orderstatus', n::BIGINT, (n - nn3)::BIGINT,
         round((n - nn3)::DOUBLE / n::DOUBLE, 7), nd3::BIGINT,
         NULL, NULL, NULL, mis3, mas3, le3 FROM s
  UNION ALL
  SELECT 'o_totalprice', n::BIGINT, (n - nn4)::BIGINT,
         round((n - nn4)::DOUBLE / n::DOUBLE, 7), nd4::BIGINT,
         mi4, ma4, su4, NULL, NULL, NULL FROM s
  UNION ALL
  SELECT 'o_orderdate', n::BIGINT, (n - nn5)::BIGINT,
         round((n - nn5)::DOUBLE / n::DOUBLE, 7), nd5::BIGINT,
         NULL, NULL, NULL, mis5, mas5, NULL FROM s
  UNION ALL
  SELECT 'o_orderpriority', n::BIGINT, (n - nn6)::BIGINT,
         round((n - nn6)::DOUBLE / n::DOUBLE, 7), nd6::BIGINT,
         NULL, NULL, NULL, mis6, mas6, le6 FROM s)
ORDER BY col_name
"""
