"""Cascade purge (operators/privacy.py) and IVM merge
(operators/cdc.py::ivm_merge) hand cases.
"""

from __future__ import annotations


def test_purge_cascade_hand_case(spark):
    from event_pipeline_spark.operators.privacy import purge_cascade

    customer = spark.createDataFrame(
        [(1,), (2,), (3,)], "c_custkey long"
    )
    orders = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 2), (13, 3)],
        "o_orderkey long, o_custkey long",
    )
    lineitem = spark.createDataFrame(
        [(10, 1), (11, 1), (11, 2), (13, 1), (99, 1)],
        "l_orderkey long, l_linenumber long",
    )
    subjects = spark.createDataFrame([(2,)], "c_custkey long")
    tables, rep = purge_cascade(subjects, customer, orders, lineitem)
    r = {x["table_name"]: x for x in rep.collect()}
    assert (r["customer"]["n_purged"], r["customer"]["n_after"]) == (1, 2)
    # orders 11, 12 belong to customer 2
    assert (r["orders"]["n_purged"], r["orders"]["n_after"]) == (2, 2)
    # lineitems of order 11 go (two rows); order 99 is FK-orphan, kept
    assert (r["lineitem"]["n_purged"], r["lineitem"]["n_after"]) == (2, 3)
    # the cleaned tables contain no subject traces
    assert tables["customer"].where("c_custkey = 2").count() == 0
    assert tables["orders"].where("o_custkey = 2").count() == 0
    assert tables["lineitem"].where("l_orderkey in (11, 12)").count() == 0


def test_purge_conservation(spark, sf_dir):
    from event_pipeline_spark.operators.privacy import q_privacy_purge

    for r in q_privacy_purge(spark, sf_dir).collect():
        assert r["n_purged"] + r["n_after"] == r["n_before"]
        assert r["n_purged"] > 0  # the subject set is non-empty


def test_ivm_merge_hand_case(spark):
    """insert, delete, update-as-pair, and a key that empties."""
    from event_pipeline_spark.operators.cdc import ivm_merge

    base = spark.createDataFrame(
        [("a", 2, 100), ("b", 1, 50)], "k string, n long, s long"
    )
    delta = spark.createDataFrame(
        [
            ("a", 30, 1),    # insert into existing key
            ("b", 50, -1),   # delete the only b row -> key vanishes
            ("c", 7, 1),     # brand-new key
            ("a", 100, -1),  # update pair: retract old ...
            ("a", 110, 1),   # ... insert new
        ],
        "k string, s long, _sign int",
    )
    out = {
        r["k"]: r
        for r in ivm_merge(
            base, delta, key_cols=["k"], count_col="n", sum_cols=["s"]
        ).collect()
    }
    assert set(out) == {"a", "c"}  # b emptied
    assert (out["a"]["n"], out["a"]["s"]) == (3, 140)
    assert (out["c"]["n"], out["c"]["s"]) == (1, 7)


def test_pit_join_hand_case(spark):
    """Versions v1@t1, v2@t3 for user 1: facts at t0 (before all ->
    NULL), t2 (sees v1), t3 (equal ts -> sees v2), t9 (sees v2)."""
    import datetime as dt

    from event_pipeline_spark.operators.cdc import pit_join

    def t(h):
        return dt.datetime(2024, 1, 1, h)

    dim = spark.createDataFrame(
        [(1, "bronze", t(1), 1), (1, "gold", t(3), 2)],
        "user_id long, state string, valid_from timestamp_ntz,"
        " version long",
    )
    facts = spark.createDataFrame(
        [(1, 100, t(0)), (1, 101, t(2)), (1, 102, t(3)), (1, 103, t(9))],
        "user_id long, event_id long, ts timestamp_ntz",
    )
    out = {
        r["event_id"]: r
        for r in pit_join(
            facts, dim, key_col="user_id", ts_col="ts"
        ).collect()
    }
    assert out[100]["state"] is None and out[100]["version"] is None
    assert (out[101]["state"], out[101]["version"]) == ("bronze", 1)
    assert (out[102]["state"], out[102]["version"]) == ("gold", 2)
    assert (out[103]["state"], out[103]["version"]) == ("gold", 2)

    # strict bound: the t3 fact now sees the state just BEFORE t3
    from event_pipeline_spark.operators.cdc import pit_join as pj

    strict = {
        r["event_id"]: r
        for r in pj(
            facts, dim, key_col="user_id", ts_col="ts", inclusive=False
        ).collect()
    }
    assert (strict[102]["state"], strict[102]["version"]) == ("bronze", 1)
    assert (strict[103]["state"], strict[103]["version"]) == ("gold", 2)


def test_pit_join_never_sees_the_future(spark, sf_dir):
    """Point-in-time correctness over the real log: every attached
    version starts at or before its fact's timestamp."""
    from event_pipeline_spark.operators.cdc import q_cdc_pit_purchases

    rows = q_cdc_pit_purchases(spark, sf_dir).collect()
    assert rows
    # strict bound: the state is what held BEFORE the purchase, so the
    # column discriminates (an inclusive bound would pin every row to
    # 'purchase' — the purchase is its own change point)
    states = {r["state"] for r in rows}
    assert len(states - {None}) > 1
    # 'purchase' appears only via a preceding purchase run
    assert any(r["state"] != "purchase" for r in rows if r["state"])


def test_k_anonymity_report_hand_case(spark):
    """Four quasi-classes of sizes 1/2/3/3: histogram rows, below-k
    mass, and the l-diversity minimum checked by hand."""
    from event_pipeline_spark.operators.privacy import k_anonymity_report

    rows = (
        [("a", "x", "s1")]
        + [("b", "x", v) for v in ("s1", "s2")]
        + [("c", "x", v) for v in ("s1", "s1", "s1")]  # no diversity
        + [("c", "y", v) for v in ("s1", "s2", "s3")]
    )
    df = spark.createDataFrame(rows, "q1 string, q2 string, sens string")
    out = {
        r["group_size"]: r
        for r in k_anonymity_report(
            df, quasi_cols=["q1", "q2"], sensitive_col="sens", k=3, l=2
        ).collect()
    }
    assert out[1]["n_groups"] == 1 and out[1]["n_below_k"] == 1
    assert out[1]["min_l"] == 1 and out[1]["n_low_diversity"] == 1
    assert out[2]["n_below_k"] == 2  # size-2 class is below k=3
    assert out[3]["n_groups"] == 2 and out[3]["n_below_k"] == 0
    # the all-s1 size-3 class drags min_l to 1 and counts as low-div
    assert out[3]["min_l"] == 1 and out[3]["n_low_diversity"] == 1
    assert sum(r["n_rows"] for r in out.values()) == len(rows)


def test_dp_counts_noise_is_laplace_shaped(spark):
    """Across many keys the seeded noise behaves like Laplace(1/eps):
    mean near 0, mean |noise| near b, both signs, deterministic across
    reruns, and different under a rotated salt."""
    from event_pipeline_spark.operators.privacy import dp_counts

    rows = [(f"key{i}",) for i in range(400) for _ in range(10)]
    df = spark.createDataFrame(rows, "k string")
    out = dp_counts(df, key_col="k", epsilon=1.0, salt="s1").collect()
    noises = [r["noisy_count"] - 10 for r in out]
    assert len(noises) == 400
    b = 1.0
    mean = sum(noises) / len(noises)
    mean_abs = sum(abs(x) for x in noises) / len(noises)
    assert abs(mean) < 0.2  # E[noise] = 0
    assert abs(mean_abs - b) < 0.25  # E|Laplace(b)| = b
    assert any(x > 0 for x in noises) and any(x < 0 for x in noises)
    again = dp_counts(df, key_col="k", epsilon=1.0, salt="s1").collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    rotated = dp_counts(df, key_col="k", epsilon=1.0, salt="s2").collect()
    assert sorted(map(tuple, out)) != sorted(map(tuple, rotated))


def test_dp_counts_epsilon_scales_noise(spark):
    from event_pipeline_spark.operators.privacy import dp_counts

    rows = [(f"key{i}",) for i in range(300) for _ in range(5)]
    df = spark.createDataFrame(rows, "k string")
    tight = dp_counts(df, key_col="k", epsilon=2.0, salt="s").collect()
    loose = dp_counts(df, key_col="k", epsilon=0.5, salt="s").collect()
    ma_tight = sum(abs(r["noisy_count"] - 5) for r in tight) / len(tight)
    ma_loose = sum(abs(r["noisy_count"] - 5) for r in loose) / len(loose)
    # same uniforms, scale differs by exactly 4x (up to rounding)
    assert abs(ma_loose / ma_tight - 4.0) < 0.01


def test_dp_topk_mechanism(spark):
    from event_pipeline_spark.operators.privacy import dp_topk

    # widely separated counts: gumbel noise (stddev ~1.28 on scores
    # eps*c/2) cannot reorder 1000 vs 10 -> the true top-2 release
    rows = (
        [("big",)] * 1000 + [("mid",)] * 500 + [("small",)] * 10
    )
    df = spark.createDataFrame(rows, "k string")
    out = [r["k"] for r in dp_topk(df, key_col="k", k=2).collect()]
    assert out == ["big", "mid"]

    # deterministic replay: same salt, same release
    again = [r["k"] for r in dp_topk(df, key_col="k", k=2).collect()]
    assert again == out

    # near-ties: the release is noise-determined and salt rotation can
    # flip it — assert both salts give a valid 2-subset, not equality
    tie = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 5 + [("c",)] * 5, "k string"
    )
    for salt in ("s1", "s2"):
        rel = [
            r["k"]
            for r in dp_topk(tie, key_col="k", k=2, salt=salt).collect()
        ]
        assert len(rel) == 2 and len(set(rel)) == 2
