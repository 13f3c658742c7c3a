"""Fuzzy string matching: blocked Levenshtein self-join.

The reference's dedup surface is identity-keyed (ResultSet collapses on
``id`` — /root/reference/nexus/result.py:180-186); a training-data
pipeline also needs *approximate* string matching (near-identical names,
titles, URLs differing by typos). The scale recipe is the same as
MinHash-LSH (operators/dedup.py): never materialize the n² pair space —
join within cheap blocks, prefilter by length, and only then pay for the
edit-distance kernel.

Plan shape at 100 TB:
- one shuffle of ``(block_key, id, text)`` — narrow rows, hash-spread;
- within a block, the self-join is bounded by block cardinality
  (choose block keys so p99 block size is O(10³));
- ``abs(len(a) - len(b)) <= d`` prunes before the kernel (a length gap
  greater than d already implies distance > d);
- Spark's ``levenshtein(l, r, threshold)`` abandons a pair early once
  the running distance exceeds d (returns -1) — cost O(d·min(m,n)) per
  surviving pair instead of O(m·n).

Registered queries:
- ``fuzzy_name_pairs`` [oracle] — customer-name pairs within edit
  distance 2, blocked by nation; DuckDB recomputes the same block-local
  pairs with its own ``levenshtein`` (integer distances, exact compare).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES = {}
ORACLES = {}


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_dist: int,
    block_cols: list[str],
    broadcast_build: bool | None = None,
) -> DataFrame:
    """All within-block pairs with ``levenshtein(text_a, text_b) <=
    max_dist``; each unordered pair appears once (``id_a < id_b``).

    Blocking is part of the declared semantics (as with LSH bands): a
    pair in different blocks is never compared. Returns
    ``id_a, id_b, dist``.

    ``broadcast_build`` is three-state, defaulting to the scale-safe
    choice — let Catalyst decide from statistics:

    - ``None`` (default): no hint. Catalyst broadcasts the build side
      when its estimated size is under ``autoBroadcastJoinThreshold``
      (and AQE re-checks at runtime), otherwise plans a shuffled
      block-key join. A 100 TB corpus can never be accidentally
      broadcast.
    - ``True``: force broadcast — only when the caller KNOWS the
      ``(block, id, text)`` projection fits executor memory.
    - ``False``: force a sort-merge block join (spill-safe for
      past-memory corpora; parallelism bounded by |blocks|, so
      pre-salt huge blocks or LSH first — an all-pairs block of
      millions is wrong at any setting).
    """
    # Round-robin repartition the probe side under a broadcast plan: the
    # edit-distance kernel runs inside the join's output pipeline, so
    # its parallelism is the probe side's partition count — a small
    # input file would otherwise serialize millions of kernel calls onto
    # a few cores (measured 15s → 1s at sf0.1). Round-robin (not by
    # block key) so a hot block cannot skew a partition. Under a FORCED
    # shuffle join the block-key exchange re-partitions anyway, so the
    # round-robin pass would be a pure extra scan of the probe side —
    # skipped.
    left = df.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("id_a"),
        F.col(text_col).alias("text_a"),
    )
    if broadcast_build is not False:
        parallelism = df.sparkSession.sparkContext.defaultParallelism
        left = left.repartition(parallelism)
    right = df.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("id_b"),
        F.col(text_col).alias("text_b"),
    )
    # Under a broadcast plan the kernel's parallelism is the probe
    # side's round-robin partitioning above; under a shuffled plan both
    # sides hash by block key and the repartition is re-shuffled away.
    if broadcast_build is True:
        right = F.broadcast(right)
    elif broadcast_build is False:
        right = right.hint("merge")
    dist: Column = F.levenshtein("text_a", "text_b", max_dist)
    return (
        left.join(right, on=block_cols)
        .where(F.col("id_a") < F.col("id_b"))
        # length gap > d already implies distance > d — prunes before
        # the O(d·n) kernel runs
        .where(
            F.abs(F.length("text_a") - F.length("text_b")) <= max_dist
        )
        .where(dist >= 0)  # threshold form returns -1 above max_dist
        .select("id_a", "id_b", dist.alias("dist"))
    )


def _customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_pipeline_spark.session import read_table

    return read_table(spark, sf_dir, "customer")


def q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer names within edit distance 2 of each other, blocked by
    nation (p99 block ≈ |customers| / 25 — bounded, never global n²)."""
    cust = _customer(spark, sf_dir).select(
        "c_custkey", "c_name", "c_nationkey"
    )
    return fuzzy_pairs(
        cust,
        "c_custkey",
        "c_name",
        max_dist=2,
        block_cols=["c_nationkey"],
    ).orderBy("id_a", "id_b")


QUERIES["fuzzy_name_pairs"] = q_fuzzy_name_pairs
ORACLES["fuzzy_name_pairs"] = """
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           levenshtein(a.c_name, b.c_name) AS dist
    FROM customer a JOIN customer b
      ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 2
    ORDER BY id_a, id_b
"""
