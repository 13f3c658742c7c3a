"""Bucketed co-located joins: the zero-shuffle plan must actually appear."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from event_pipeline_spark.operators.bucketing import (
    assert_colocated_join,
    bucketed_table,
    exchange_count,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    facts = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    dims = spark.range(0, 10_000, 7).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    write_bucketed(facts, "b_facts", "k", 8, path=str(base / "facts"))
    write_bucketed(dims, "b_dims", "k", 8, path=str(base / "dims"))
    yield "b_facts", "b_dims"
    spark.sql("DROP TABLE IF EXISTS b_facts")
    spark.sql("DROP TABLE IF EXISTS b_dims")


def test_bucketed_join_has_zero_exchanges(spark, bucketed):
    ft, dt = bucketed
    joined = bucketed_table(spark, ft).join(bucketed_table(spark, dt), "k")
    assert exchange_count(joined) == 0
    assert_colocated_join(joined)  # no raise


def test_bucketed_join_correct_results(spark, bucketed):
    ft, dt = bucketed
    joined = bucketed_table(spark, ft).join(bucketed_table(spark, dt), "k")
    assert joined.count() == len(range(0, 10_000, 7))
    row = joined.where(F.col("k") == 7).first()
    assert row["v"] == 7 % 97 and row["name"] == "d7"


def test_unbucketed_join_does_shuffle(spark, bucketed):
    ft, _ = bucketed
    facts = bucketed_table(spark, ft)
    # strip the bucket layout by reading the same rows as a plain frame
    plain = facts.sparkSession.createDataFrame(
        [(0, "x")], "k long, name string"
    )
    joined = facts.join(plain, "k")
    # broadcast may kick in (no shuffle); force sort-merge to see the contrast
    smj = facts.join(plain.hint("merge"), "k")
    assert exchange_count(smj) >= 1
    with pytest.raises(AssertionError, match="shuffle exchange"):
        assert_colocated_join(smj)


def test_bucketed_groupby_has_zero_exchanges(spark, bucketed):
    ft, _ = bucketed
    agg = bucketed_table(spark, ft).groupBy("k").agg(F.sum("v").alias("s"))
    assert exchange_count(agg) == 0
