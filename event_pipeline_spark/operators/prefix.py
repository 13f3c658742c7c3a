"""Distributed running totals and token-budget corpus selection.

``SUM(x) OVER (ORDER BY ...)`` with no PARTITION BY is the classic
Spark scale trap: an unpartitioned window collapses the whole table
into ONE task. The distributed form here is the textbook two-phase
prefix sum:

1. range-partition on the order keys (so partition i holds a
   contiguous key range, already globally ordered across partitions),
2. one tiny aggregate of per-partition totals → the driver computes
   the ~``num_partitions`` prefix offsets (KBs of data),
3. a window partitioned BY PARTITION ID (fully parallel) computes the
   local cumulative sum, plus the broadcast offset.

Built on it: ``select_token_budget`` — "fill a token budget with the
best-scoring documents" — orders by (score desc, id) and keeps rows
while the running token count fits, the selection step between quality
scoring and training-data packing.

Registered queries (exact-value oracles):
- ``running_total_by_day`` [oracle] — distributed cumsum vs DuckDB's
  ``SUM() OVER (ORDER BY ...)``.
- ``select_token_budget`` [oracle] — budget-filling selection vs the
  windowed form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from event_pipeline_spark.cache import pin

QUERIES = {}
ORACLES = {}

_PID = "__pid"
_LOCAL = "__local_run"


def running_total(
    df: DataFrame,
    order_by: list[Column],
    value_col: str,
    *,
    out_col: str = "running",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global running total of ``value_col`` in ``order_by``
    order, computed without ever forming a single-partition window.

    ``order_by`` must be a TOTAL order (include a unique tiebreaker) —
    otherwise "the running total at a row" is ill-defined on any
    engine. Output = input columns + ``out_col``.
    """
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    # pin: the ranged layout is consumed twice (totals pass + final
    # pass) and range partitioning samples boundaries — recomputing
    # could re-sample and re-assign pids after offsets were collected.
    # Released by cache.release_pins() once the caller materializes.
    ranged = pin(
        df.repartitionByRange(n, *order_by).withColumn(
            _PID, F.spark_partition_id()
        )
    )
    # per-partition totals → driver → broadcast prefix offsets.
    # len(totals) == n: KB-scale regardless of table size.
    # coalesce: a partition whose values are all NULL yields SUM=NULL;
    # NULL rows contribute 0 (SQL SUM semantics — the row is kept, its
    # value drops out of the running total, same as the window oracle).
    totals = {
        r[_PID]: r["t"]
        for r in ranged.groupBy(_PID)
        .agg(F.coalesce(F.sum(value_col), F.lit(0)).alias("t"))
        .collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    w = (
        Window.partitionBy(_PID)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn(_LOCAL, F.sum(value_col).over(w))
    if len(offsets) <= 128:
        # small partition count: inline literal map, no extra operator
        offset_col = F.coalesce(
            F.element_at(
                F.create_map(
                    *[
                        x
                        for pid, off in offsets.items()
                        for x in (F.lit(pid), F.lit(off))
                    ]
                ),
                F.col(_PID),
            )
            if offsets
            else F.lit(0),
            F.lit(0),
        )
        summed = local.withColumn(
            out_col, (F.col(_LOCAL) + offset_col).cast("bigint")
        )
    else:
        # thousands of partitions: a giant literal map bloats codegen;
        # broadcast-join the (pid, offset) table instead
        offsets_df = spark.createDataFrame(
            [(int(p), int(o)) for p, o in offsets.items()],
            f"{_PID} int, __off long",
        )
        summed = local.join(F.broadcast(offsets_df), _PID, "left").withColumn(
            out_col,
            (F.col(_LOCAL) + F.coalesce("__off", F.lit(0))).cast("bigint"),
        ).drop("__off")
    return summed.drop(_PID, _LOCAL)


def select_token_budget(
    df: DataFrame,
    *,
    score_col: str,
    tokens_col: str,
    budget: int,
    id_col: str,
) -> DataFrame:
    """Best-first selection under a global token budget: order by
    (score desc, id) and keep each document while the running token
    count INCLUDING it fits. Adds ``running_tokens``."""
    order = [F.col(score_col).desc(), F.col(id_col).asc()]
    with_run = running_total(
        df, order, tokens_col, out_col="running_tokens"
    )
    return with_run.where(F.col("running_tokens") <= budget)


# -- registered queries ------------------------------------------------------


def q_running_total_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative order value in (o_orderdate, o_orderkey) order over a
    one-year slice — the distributed prefix sum vs DuckDB's window."""
    from event_pipeline_spark.session import read_table

    orders = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1995-01-01")
        & (F.col("o_orderdate") < "1996-01-01")
    )
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast(
        "bigint"
    )
    out = running_total(
        orders.select("o_orderkey", "o_orderdate", cents.alias("cents")),
        [F.col("o_orderdate").asc(), F.col("o_orderkey").asc()],
        "cents",
        out_col="run_cents",
    )
    return out.select("o_orderkey", "run_cents").orderBy("o_orderkey")


QUERIES["running_total_by_day"] = q_running_total_by_day
ORACLES["running_total_by_day"] = """
    SELECT o_orderkey,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
               OVER (ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS run_cents
    FROM orders
    WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1996-01-01'
    ORDER BY o_orderkey
"""


def q_select_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill a 20k-token budget with the longest documents (length as
    the stand-in score; whitespace tokens) — exact row set + running
    counts against the windowed oracle."""
    from event_pipeline_spark.operators.text import token_count
    from event_pipeline_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    out = select_token_budget(
        docs,
        score_col="n_tokens",
        tokens_col="n_tokens",
        budget=20_000,
        id_col="doc_id",
    )
    return out.select("doc_id", "n_tokens", "running_tokens").orderBy(
        "doc_id"
    )


QUERIES["select_token_budget"] = q_select_token_budget
ORACLES["select_token_budget"] = """
    WITH toks AS (
      SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INT)
                 AS n_tokens
      FROM documents),
    ranked AS (
      SELECT doc_id, n_tokens,
             CAST(SUM(n_tokens) OVER (ORDER BY n_tokens DESC, doc_id)
                  AS BIGINT) AS running_tokens
      FROM toks)
    SELECT doc_id, n_tokens, running_tokens
    FROM ranked WHERE running_tokens <= 20000
    ORDER BY doc_id
"""
