"""Blocked Levenshtein matching: pair semantics, blocking contract, and
the length prefilter's no-loss guarantee (the oracle in test_oracles
pins the full result against DuckDB; these pin the operator's edges)."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_pipeline_spark.operators.fuzzy import fuzzy_pairs


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, s string, blk int")


def test_pairs_within_threshold_and_once_each(spark):
    df = _df(
        spark,
        [
            (1, "kitten", 0),
            (2, "sitten", 0),  # dist 1 from kitten
            (3, "sitting", 0),  # dist 2 from sitten, 3 from kitten
            (4, "zebra", 0),
        ],
    )
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in fuzzy_pairs(
            df, "id", "s", max_dist=2, block_cols=["blk"]
        ).collect()
    }
    assert got == {(1, 2): 1, (2, 3): 2}  # (1,3) is dist 3; zebra matches none


def test_blocking_prevents_cross_block_pairs(spark):
    df = _df(spark, [(1, "same", 0), (2, "same", 1)])
    assert (
        fuzzy_pairs(df, "id", "s", max_dist=2, block_cols=["blk"]).count() == 0
    )


def test_length_prefilter_loses_nothing(spark):
    """Rows whose length gap exceeds max_dist must already be beyond the
    threshold — the prefilter is pure pruning. Verified by comparing
    against the unfiltered kernel."""
    rows = [
        (i, w, 0)
        for i, w in enumerate(
            ["a", "ab", "abc", "abcd", "abcde", "xyz", "xyzzy", "ab-cd"]
        )
    ]
    df = _df(spark, rows)
    fast = fuzzy_pairs(df, "id", "s", max_dist=2, block_cols=["blk"])
    left = df.select(F.col("id").alias("id_a"), F.col("s").alias("sa"), "blk")
    right = df.select(F.col("id").alias("id_b"), F.col("s").alias("sb"), "blk")
    naive = (
        left.join(right, "blk")
        .where(F.col("id_a") < F.col("id_b"))
        .where(F.levenshtein("sa", "sb") <= 2)
        .select("id_a", "id_b", F.levenshtein("sa", "sb").alias("dist"))
    )
    assert sorted(map(tuple, fast.collect())) == sorted(
        map(tuple, naive.collect())
    )


def test_nonbroadcast_path_plans_shuffled_join_same_pairs(spark):
    """broadcast_build=False must plan a shuffled (sort-merge) block
    join — no BroadcastExchange anywhere — and produce pairs identical
    to the forced-broadcast plan. This is the past-executor-memory
    corpus path."""
    df = _df(
        spark,
        [(1, "kitten", 0), (2, "sitten", 0), (3, "mitten", 0),
         (4, "banana", 1), (5, "bananas", 1), (6, "zebra", 1)],
    )
    kw = dict(max_dist=2, block_cols=["blk"])
    shuffled = fuzzy_pairs(df, "id", "s", broadcast_build=False, **kw)
    plan = shuffled._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" not in plan
    assert "SortMergeJoin" in plan
    bcast = fuzzy_pairs(df, "id", "s", broadcast_build=True, **kw)
    bplan = bcast._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in bplan
    assert sorted(map(tuple, shuffled.collect())) == sorted(
        map(tuple, bcast.collect())
    )


def test_default_lets_catalyst_choose_by_statistics(spark, sf_dir):
    """With no flag, a small parquet build side is auto-broadcast from
    its size statistics — the scale-safe default can never broadcast a
    corpus whose stats exceed the threshold."""
    from event_pipeline_spark.session import read_table

    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    auto = fuzzy_pairs(
        cust, "c_custkey", "c_name", max_dist=2, block_cols=["c_nationkey"]
    )
    plan = auto._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan  # sf0.001 stats are under threshold


def test_salted_form_is_exact_every_salt(spark):
    """The triangle-salted join must produce exactly the unsalted pair
    set — every within-block pair once, none duplicated — for salt
    counts spanning 1..8 (covers same-cell and cross-cell pairings)."""
    rows = [
        (i, w, i % 3)
        for i, w in enumerate(
            ["kitten", "sitten", "sitting", "mitten", "bitten", "kitchen",
             "smitten", "witten", "kittens", "zebra", "yakpack", "mutton"]
            * 3
        )
    ]
    df = _df(spark, rows)
    base = sorted(
        tuple(r) for r in fuzzy_pairs(
            df, "id", "s", max_dist=2, block_cols=["blk"]
        ).collect()
    )
    assert base  # sanity: the fixture produces pairs
    for salt in (1, 2, 3, 8):
        salted = sorted(
            tuple(r) for r in fuzzy_pairs(
                df, "id", "s", max_dist=2, block_cols=["blk"],
                block_salt=salt,
            ).collect()
        )
        assert salted == base, f"salt={salt}"


def test_sub_block_cols_narrow_the_declared_semantics(spark):
    """Pairs disagreeing on a sub-block value are never compared."""
    df = _df(spark, [(1, "kitten", 0), (2, "sitten", 0), (3, "mitten", 0)])
    got = {
        (r["id_a"], r["id_b"])
        for r in fuzzy_pairs(
            df, "id", "s", max_dist=2, block_cols=["blk"],
            sub_block_cols={"first": F.substring("s", 1, 1)},
        ).collect()
    }
    assert got == set()  # k/s/m initials all differ
    got2 = {
        (r["id_a"], r["id_b"])
        for r in fuzzy_pairs(
            df, "id", "s", max_dist=2, block_cols=["blk"],
            sub_block_cols={"tail": F.substring("s", 2, 5)},
        ).collect()
    }
    assert got2 == {(1, 2), (1, 3), (2, 3)}  # all share 'itten'


def test_salted_plan_is_hash_join_on_compound_key(spark):
    df = _df(spark, [(1, "kitten", 0), (2, "sitten", 0)])
    plan = (
        fuzzy_pairs(
            df, "id", "s", max_dist=2, block_cols=["blk"], block_salt=4
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sorted_neighborhood_hand_case(spark):
    """Window w=2 over one block: each record pairs with up to two
    sort-order predecessors; only close names survive the verify."""
    from pyspark.sql import functions as F

    from event_pipeline_spark.operators.fuzzy import (
        sorted_neighborhood_pairs,
    )

    rows = [
        (1, "anna"),
        (2, "anne"),   # dist 1 to anna
        (3, "annex"),  # dist 1 to anne, 2 to anna
        (4, "zzzzz"),  # sorts last, far from everything
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    out = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in sorted_neighborhood_pairs(
            df,
            id_col="id",
            sort_col="name",
            block_col=F.lit(0),
            window=2,
            max_dist=2,
        ).collect()
    }
    assert out == {(1, 2): 1, (2, 3): 1, (1, 3): 2}


def test_sorted_neighborhood_window_bounds_candidates(spark):
    """w=1 only pairs adjacent records: the (1,3) pair disappears."""
    from pyspark.sql import functions as F

    from event_pipeline_spark.operators.fuzzy import (
        sorted_neighborhood_pairs,
    )

    df = spark.createDataFrame(
        [(1, "anna"), (2, "anne"), (3, "annex")], "id long, name string"
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in sorted_neighborhood_pairs(
            df,
            id_col="id",
            sort_col="name",
            block_col=F.lit(0),
            window=1,
            max_dist=2,
        ).collect()
    }
    assert pairs == {(1, 2), (2, 3)}


def test_fellegi_sunter_weights_and_decisions(spark):
    """Hand-built pairs hit every agreement pattern; scores must equal
    the frozen integer weights and decisions must follow the
    thresholds."""
    from event_pipeline_spark.operators.fuzzy import (
        FS_MATCH_UNITS,
        FS_WEIGHTS,
        fellegi_sunter_pairs,
    )

    rows = [
        # ids 1..3 share block 0 (id div 50)
        (1, "Customer#XYZ1aaaa", 1, "AUTO", 100.00),
        (2, "Customer#XYZ1aaab", 1, "AUTO", 102.00),   # all agree vs 1
        (3, "Customer#XYZ1zzzz", 1, "FURN", 900.00),   # all disagree vs 1
        # different range block: never paired
        (60, "Customer#XYZ1aaaa", 2, "AUTO", 100.00),
    ]
    df = spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, "
        "c_mktsegment string, c_acctbal double",
    )
    out = {
        (r["id_a"], r["id_b"]): r
        for r in fellegi_sunter_pairs(df).collect()
    }
    assert set(out) == {(1, 2), (1, 3), (2, 3)}
    full_agree = sum(w[0] for w in FS_WEIGHTS.values())
    full_dis = sum(w[1] for w in FS_WEIGHTS.values())
    assert out[(1, 2)]["score_units"] == full_agree
    assert out[(1, 2)]["decision"] == "match"
    assert full_agree >= FS_MATCH_UNITS
    assert out[(1, 3)]["score_units"] == full_dis
    assert out[(1, 3)]["decision"] == "nonmatch"
