"""Deterministic epoch shuffle: reproducible per-(seed, epoch)
permutations in both the global-sort and bucketed (scale) modes; the
exact order is oracle-gated by the registered ``shuffle_epoch`` query.
(Sampling/mix/stratified tests live in test_filtering_sampling.py.)"""

from __future__ import annotations

from pyspark.sql import functions as F



# -- deterministic epoch shuffle ---------------------------------------------

def test_shuffle_epoch_is_deterministic_and_epoch_sensitive(spark):
    from event_pipeline_spark.operators.sampling import shuffle_epoch

    df = spark.range(200).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    order = lambda epoch: [  # noqa: E731
        r["k"] for r in shuffle_epoch(
            df, "k", epoch=epoch, seed="s", global_sort=True
        ).orderBy("pos").collect()
    ]
    e0a, e0b, e1 = order(0), order(0), order(1)
    assert e0a == e0b  # same (seed, epoch) -> identical permutation
    assert sorted(e0a) == list(range(200))  # a permutation, nothing lost
    assert e0a != e1  # different epoch -> different order
    assert e0a != list(range(200))  # actually shuffled


def test_shuffle_epoch_bucketed_mode_is_a_stable_permutation(spark):
    """The scale path (no global sort): partition-ordered consumption
    yields the same permutation every run, and every row survives."""
    from event_pipeline_spark.operators.sampling import shuffle_epoch

    df = spark.range(500).select(F.col("id").alias("k"))

    def consume():
        out = shuffle_epoch(df, "k", epoch=2, seed="x", buckets=8)
        parts = out.rdd.glom().collect()
        return [r["k"] for part in parts for r in part]

    a, b = consume(), consume()
    assert a == b
    assert sorted(a) == list(range(500))
    assert a != sorted(a)
