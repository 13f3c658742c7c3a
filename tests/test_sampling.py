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


def test_sample_k_exact_size_uniform_and_deterministic(spark):
    from event_pipeline_spark.operators.sampling import sample_k

    df = spark.range(5000).select(F.col("id").alias("k"))
    a = sorted(r["k"] for r in sample_k(df, 100, "k", "s1").collect())
    b = sorted(r["k"] for r in sample_k(df, 100, "k", "s1").collect())
    c = sorted(r["k"] for r in sample_k(df, 100, "k", "s2").collect())
    assert len(a) == 100 and a == b  # exact size, deterministic
    assert a != c  # salt changes the draw
    # uniformity smoke: mean of a uniform 100-draw from [0,5000) is
    # within a few hundred of 2500
    assert abs(sum(a) / 100 - 2500) < 500


def test_temperature_mix_rebalances_toward_small_sources(spark):
    from event_pipeline_spark.operators.sampling import temperature_mix

    rows = [(i, "big") for i in range(9000)] + [
        (i + 100_000, "small") for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "k long, src string")
    out = temperature_mix(
        df, "src", "k", alpha=0.5, target_rows=2000, salt="t"
    )
    got = {r["src"]: r["n"] for r in out.groupBy("src").agg(
        F.count("*").alias("n")).collect()}
    total = sum(got.values())
    assert abs(total - 2000) < 200  # hits the target within hash noise
    # alpha=0.5: weights sqrt(9000):sqrt(1000) ~ 3:1 instead of 9:1
    ratio = got["big"] / got["small"]
    assert 2.0 < ratio < 4.5
    # deterministic
    again = temperature_mix(
        df, "src", "k", alpha=0.5, target_rows=2000, salt="t"
    ).count()
    assert again == total


def test_md5_sampling_is_partition_invariant(spark):
    """The deterministic draws must select the SAME rows no matter how
    the data is partitioned — the property that makes re-runs on a
    re-bucketed 100 TB table reproducible."""
    from event_pipeline_spark.operators.sampling import (
        sample_fraction,
        sample_k,
    )

    df = spark.range(3000).select(F.col("id").alias("k"))
    frac = lambda d: sorted(  # noqa: E731
        r["k"] for r in sample_fraction(d, "k", 0.2, "pi").collect()
    )
    topk = lambda d: sorted(  # noqa: E731
        r["k"] for r in sample_k(d, 50, "k", "pi").collect()
    )
    assert frac(df) == frac(df.repartition(17)) == frac(df.coalesce(1))
    assert topk(df) == topk(df.repartition(17)) == topk(df.coalesce(1))


def test_group_split_never_straddles_groups(spark):
    """Every (source, group) lands entirely in ONE split, and quotas
    cut over groups: with 20 groups per source, exactly 2 val + 2 test
    groups regardless of how many rows each group holds."""
    from collections import defaultdict

    from event_pipeline_spark.operators.sampling import (
        group_split_assign,
        split_assign,
    )

    rows = []
    for s in ("s1", "s2"):
        for g in range(20):
            for r in range((g % 5) + 1):  # skewed group sizes
                rows.append((f"{s}-{g}-{r}", s, f"grp{g}"))
    df = spark.createDataFrame(rows, "id string, source string, g string")
    out = group_split_assign(df, "source", "g").collect()
    seen = defaultdict(set)
    for r in out:
        seen[(r["source"], r["g"])].add(r["split"])
    assert all(len(v) == 1 for v in seen.values())
    per_split = defaultdict(set)
    for (src, g), v in seen.items():
        per_split[(src, next(iter(v)))].add(g)
    for s in ("s1", "s2"):
        assert len(per_split[(s, "val")]) == 2
        assert len(per_split[(s, "test")]) == 2
        assert len(per_split[(s, "train")]) == 16
    # contrast: the row split CAN straddle a group (that's the bug the
    # grouped form exists for) — same data, key = id
    row_out = split_assign(df, "source", "id").collect()
    straddled = defaultdict(set)
    for r in row_out:
        straddled[(r["source"], r["g"])].add(r["split"])
    assert any(len(v) > 1 for v in straddled.values())


def test_weighted_sample_k_proportional_and_deterministic(spark):
    """A 100x-weight item is essentially always kept; inclusion rates
    across salts track weights; zero-weight rows never appear; the
    draw is rerun- and repartition-stable."""
    from event_pipeline_spark.operators.sampling import weighted_sample_k

    rows = [("heavy", 1000)] + [(f"w{i}", 10) for i in range(60)]
    rows += [("zero", 0)]
    df = spark.createDataFrame(rows, "k string, w long")
    heavy_in = light_rate = 0
    trials = 12
    for t in range(trials):
        kept = {
            r["k"]
            for r in weighted_sample_k(
                df, 10, "k", "w", salt=f"s{t}"
            ).collect()
        }
        assert len(kept) == 10 and "zero" not in kept
        heavy_in += "heavy" in kept
        light_rate += sum(1 for x in kept if x.startswith("w"))
    assert heavy_in >= trials - 1  # weight 1000 vs field of 10s
    # light items fill the remaining ~9 slots uniformly
    assert light_rate / trials >= 8.5
    a = weighted_sample_k(df, 10, "k", "w", salt="s0").collect()
    b = weighted_sample_k(
        df.repartition(7), 10, "k", "w", salt="s0"
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_leakage_report_hand_case(spark):
    from event_pipeline_spark.operators.sampling import leakage_report

    docs = spark.createDataFrame(
        [(i,) for i in range(1, 7)], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6), (2, 5)], "id_a long, id_b long"
    )
    splits = spark.createDataFrame(
        [
            (1, "train"), (2, "train"), (3, "train"),
            (4, "test"), (5, "val"), (6, "val"),
        ],
        "doc_id long, split string",
    )
    rows = {
        (r["split_a"], r["split_b"]): r
        for r in leakage_report(docs, pairs, splits).collect()
    }
    # (1,2) within train; (3,4) test<->train leak; (5,6) within val;
    # (2,5) train<->val leak (canonicalized regardless of member order)
    assert rows[("train", "train")]["n_pairs"] == 1
    assert rows[("train", "train")]["leak"] is False
    assert rows[("test", "train")]["n_pairs"] == 1
    assert rows[("test", "train")]["leak"] is True
    assert rows[("train", "val")]["n_pairs"] == 1
    assert rows[("val", "val")]["n_pairs"] == 1
    assert all(r["share"] == 0.25 for r in rows.values())
