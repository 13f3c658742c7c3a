"""Salting helpers: result parity with the unsalted plan, refusal of
non-decomposable shapes, and the skew diagnostic."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from event_pipeline_spark.operators.skew import (
    SALT_COL,
    key_skew,
    salted_agg,
    salted_join,
)


@pytest.fixture(scope="module")
def skewed(spark):
    """~5k rows on one hot key, a tail of 50 uniform keys."""
    hot = spark.range(5000).select(
        F.lit("hot").alias("k"), (F.col("id") % 97).cast("double").alias("v")
    )
    tail = spark.range(500).select(
        F.concat(F.lit("k"), (F.col("id") % 50)).alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    return hot.unionAll(tail)


def _rows(df, *order):
    return [tuple(r) for r in df.orderBy(*order).collect()]


class TestSaltedAgg:
    def test_matches_plain_groupby(self, spark, skewed):
        got = salted_agg(
            skewed,
            ["k"],
            [("v", "count", "n"), ("v", "sum", "s"),
             ("v", "min", "mn"), ("v", "max", "mx")],
            n_salts=8,
        )
        want = skewed.groupBy("k").agg(
            F.count("v").alias("n"), F.sum("v").alias("s"),
            F.min("v").alias("mn"), F.max("v").alias("mx"),
        )
        assert _rows(got, "k") == _rows(want, "k")

    def test_avg_decomposition(self, spark, skewed):
        got = {r["k"]: r["a"] for r in salted_agg(
            skewed, ["k"], [("v", "avg", "a")], n_salts=8).collect()}
        want = {r["k"]: r["a"] for r in
                skewed.groupBy("k").agg(F.avg("v").alias("a")).collect()}
        assert got.keys() == want.keys()
        for k in want:
            assert got[k] == pytest.approx(want[k])

    def test_rejects_non_algebraic(self, skewed):
        with pytest.raises(ValueError, match="not algebraic"):
            salted_agg(skewed, ["k"], [("v", "median", "m")])

    def test_partial_phase_shuffles_on_salt(self, skewed):
        plan = salted_agg(
            skewed, ["k"], [("v", "count", "n")], n_salts=8
        )._jdf.queryExecution().executedPlan().toString()
        assert SALT_COL in plan  # first exchange keyed on (k, __salt)


class TestSaltedJoin:
    def test_inner_matches_plain(self, spark, skewed):
        dim = spark.createDataFrame(
            [("hot", "H"), ("k1", "A"), ("k2", "B")], "k string, label string"
        )
        got = _rows(salted_join(skewed, dim, ["k"], n_salts=4), "k", "v")
        want = _rows(skewed.join(dim, ["k"]), "k", "v")
        assert got == want and len(got) > 5000

    def test_left_keeps_unmatched_probe_rows(self, spark, skewed):
        dim = spark.createDataFrame([("hot", "H")], "k string, label string")
        got = salted_join(skewed, dim, ["k"], n_salts=4, how="left")
        want = skewed.join(dim, ["k"], "left")
        assert got.count() == want.count() == skewed.count()

    def test_refuses_replication_unsafe_sides(self, spark, skewed):
        dim = spark.createDataFrame([("hot", "H")], "k string, label string")
        with pytest.raises(ValueError, match="inner/left"):
            salted_join(skewed, dim, ["k"], how="full")


def test_key_skew_diagnostic(spark, skewed):
    top = key_skew(skewed, ["k"], top=3).collect()
    assert top[0]["k"] == "hot" and top[0]["n"] == 5000
    # 51 groups, hot holds ~91% of rows -> ratio ~46x uniform
    assert top[0]["skew_ratio"] > 10
    assert abs(top[0]["share"] - 5000 / 5500) < 0.001


def test_aqe_splits_skewed_sort_merge_join(spark):
    """The no-code-change skew path: AQE detects a skewed partition in a
    sort-merge join at runtime and splits it (the plan marks the join
    skew=true). Salting (above) is for the cases this can't fix —
    aggregations and broadcast-ineligible shapes — so this test pins
    where the built-in path takes over."""
    from pyspark.sql import functions as F

    old = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.coalescePartitions.enabled",
        )
    }
    try:
        # force SMJ + make the skew detector fire on test-sized data
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64k"
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "64k"
        )
        # coalescing would merge the small partitions and mask the skew
        # decision on test-sized data
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        # 95% of the left side lands on key 0; right side is uniform
        left = spark.range(400_000).select(
            F.when(F.col("id") % 20 != 0, 0).otherwise(F.col("id") % 1000).alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        joined = left.join(right, "k")
        assert len(joined.toPandas()) == 400_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin(skew=true)" in plan
        assert "AQEShuffleRead skewed" in plan
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


# -- hypothesis parity: salted ops == plain ops -------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    keys=st.lists(st.integers(0, 3), min_size=1, max_size=40),
    vals=st.lists(st.integers(-50, 50), min_size=1, max_size=40),
    salts=st.sampled_from([2, 5, 16]),
)
@settings(max_examples=15, deadline=None)
def test_salted_agg_property_parity(spark, keys, vals, salts):
    """Random skewed data at random salt factors: the two-phase salted
    aggregation is invisible in results."""
    from event_pipeline_spark.operators.skew import salted_agg

    n = min(len(keys), len(vals))
    df = spark.createDataFrame(
        list(zip(keys[:n], vals[:n])), "k int, v int"
    )
    got = {
        (r["k"]): (r["n"], r["s"])
        for r in salted_agg(
            df, ["k"],
            [("v", "count", "n"), ("v", "sum", "s")],
            n_salts=salts,
        ).collect()
    }
    want = {
        r["k"]: (r["n"], r["s"])
        for r in df.groupBy("k")
        .agg(F.count("v").alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    assert got == want
