"""Runtime filter features pinned by plan: dynamic partition pruning
and runtime bloom-filter join injection.

At 100 TB these are the difference between scanning a partition's worth
of a fact table and scanning all of it: DPP turns a selective dim
filter into a partition filter on the fact scan at runtime; the bloom
filter does the row-level analogue for non-partition join keys on
shuffle joins. Both are Catalyst features the engine's declarative
plans inherit — these tests pin that our session configuration and
plan shapes actually receive them (and document the selectivity
contract: a bare boolean filter does NOT count as selective for DPP)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def star(spark, tmp_path_factory):
    """A partitioned fact (50 partitions) and a filterable dim."""
    d = tmp_path_factory.mktemp("star")
    spark.range(500_000).select(
        (F.col("id") % 50).cast("int").alias("r"),
        F.col("id").alias("v"),
    ).write.partitionBy("r").parquet(str(d / "fact"))
    spark.range(50).select(
        F.col("id").cast("int").alias("r"),
        F.concat(F.lit("nm"), F.col("id")).alias("name"),
    ).write.parquet(str(d / "dim"))
    return str(d)


def test_dynamic_partition_pruning_reaches_fact_scan(spark, star):
    """A selective dim predicate becomes a runtime PartitionFilter on
    the partitioned fact scan — the fact side reads 3 partitions, not
    50, without the query mentioning them."""
    fact = spark.read.parquet(f"{star}/fact")
    dim = spark.read.parquet(f"{star}/dim").where(
        F.col("name").isin("nm0", "nm7", "nm20")
    )
    q = fact.join(dim, "r").groupBy("r").agg(F.sum("v").alias("s"))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan.lower()
    rows = q.collect()
    assert {r["r"] for r in rows} == {0, 7, 20}


def test_dpp_requires_a_selective_predicate(spark, star, tmp_path):
    """The documented contract: filtering on a STORED boolean column is
    not 'likely selective' to Catalyst (the filter is a bare attribute,
    not a comparison), so no DPP subquery is inserted — write dim
    filters as explicit comparisons/IN lists when pruning matters.
    (A computed boolean collapses to an EqualTo and DOES qualify.)"""
    fact = spark.read.parquet(f"{star}/fact")
    spark.range(50).select(
        F.col("id").cast("int").alias("r"),
        (F.col("id") % 10 == 0).alias("keep"),
    ).write.parquet(str(tmp_path / "dim_bool"))
    dim = spark.read.parquet(str(tmp_path / "dim_bool")).where("keep")
    q = fact.join(dim, "r").groupBy("r").count()
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" not in plan.lower()


def test_runtime_bloom_filter_injected_on_shuffle_join(spark, star):
    """With the fact side too big to broadcast-prune, Spark injects a
    bloom filter built from the filtered dim into the fact side of the
    shuffle join — rows that can't match never reach the exchange."""
    old_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a shuffle join and make the fact side big enough for
        # the injection heuristics at test scale
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "100MB",
        )
        fact = spark.read.parquet(f"{star}/fact").select("r", "v")
        dim = spark.read.parquet(f"{star}/dim").where(
            F.col("name").isin("nm3", "nm14")
        )
        q = fact.join(dim, fact["v"] % 97 == dim["r"])
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan.lower()  # bloom probe on fact side
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bcast)
        spark.conf.unset(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        )
        spark.conf.unset(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"
        )
