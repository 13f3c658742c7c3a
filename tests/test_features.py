"""Feature encoders and robust scaling (operators/features.py)."""

from __future__ import annotations

from fractions import Fraction


def test_target_encode_matches_fraction_reference(spark):
    from event_pipeline_spark.operators.features import target_encode

    rows = [("a", 100), ("a", 200), ("a", 300), ("b", 1000), ("c", 50)]
    df = spark.createDataFrame(rows, "cat string, y long")
    out = {
        r["category"]: r
        for r in target_encode(
            df, cat_col="cat", target_col="y", prior_weight=4
        ).collect()
    }
    s_all, n_all = sum(y for _, y in rows), len(rows)
    for cat in "abc":
        ys = [y for c, y in rows if c == cat]
        want = Fraction(
            sum(ys) * n_all + 4 * s_all, n_all * (len(ys) + 4)
        )
        assert out[cat]["n"] == len(ys)
        assert out[cat]["encoding"] == float(want)
    # rare category shrinks toward the global mean
    gmean = s_all / n_all
    assert abs(out["c"]["encoding"] - gmean) < abs(50 - gmean)


def test_leave_one_out_excludes_own_target(spark):
    from event_pipeline_spark.operators.features import (
        leave_one_out_encode,
    )

    rows = [("a", 100), ("a", 200), ("b", 1000)]
    df = spark.createDataFrame(rows, "cat string, y long")
    out = leave_one_out_encode(
        df, cat_col="cat", target_col="y", prior_weight=2
    ).collect()
    s_all, n_all = 1300, 3
    for r in out:
        ys = [y for c, y in rows if c == r["cat"]]
        want = Fraction(
            (sum(ys) - r["y"]) * n_all + 2 * s_all,
            n_all * (len(ys) - 1 + 2),
        )
        assert r["loo_encoding"] == float(want)
    # two rows of 'a' get DIFFERENT encodings (leakage removed)
    a_encs = {r["loo_encoding"] for r in out if r["cat"] == "a"}
    assert len(a_encs) == 2


def test_frequency_encode_and_robust_scale(spark):
    from event_pipeline_spark.operators.features import (
        frequency_encode,
        robust_scale_params,
    )

    rows = [("a", v) for v in [1, 2, 3, 4, 100]] + [("b", 7)]
    df = spark.createDataFrame(rows, "g string, v long")
    freq = {
        r["category"]: r["frequency"]
        for r in frequency_encode(df, cat_col="g").collect()
    }
    assert freq == {"a": 5 / 6, "b": 1 / 6}
    rs = {
        r["event_type"] if "event_type" in r else r["g"]: r
        for r in robust_scale_params(
            df, group_col="g", value_col="v"
        ).collect()
    }
    a = rs["a"]
    # type-1 quartiles of [1,2,3,4,100]: ranks ceil(.25*5)=2, ceil(.5*5)=3,
    # ceil(.75*5)=4 -> 2, 3, 4; the outlier never touches the IQR
    assert (a["q1_units"], a["median_units"], a["q3_units"]) == (2, 3, 4)
    assert a["iqr_units"] == 2


def test_woe_iv_matches_python_reference(spark):
    import math

    from event_pipeline_spark.operators.features import woe_iv

    rows = (
        [("a", 1)] * 30 + [("a", 0)] * 10
        + [("b", 1)] * 5 + [("b", 0)] * 25
        + [("c", 1)] * 3  # single-class: smoothing keeps it defined
    )
    df = spark.createDataFrame(rows, "cat string, y int")
    out = {
        r["category"]: r
        for r in woe_iv(df, cat_col="cat", label_col="y").collect()
    }
    gp, gn, k = 38 + 3, 35 + 3, 3
    for cat in "abc":
        np_ = sum(1 for c, y in rows if c == cat and y == 1)
        nn = sum(1 for c, y in rows if c == cat and y == 0)
        woe = math.log(((np_ + 1) * gn) / ((nn + 1) * gp))
        iv = ((np_ + 1) / gp - (nn + 1) / gn) * woe
        assert out[cat]["woe"] == round(woe, 7), cat
        assert out[cat]["iv"] == round(iv, 7), cat
    assert out["a"]["woe"] > 0 > out["b"]["woe"]
    assert all(r["iv"] >= 0 or abs(r["iv"]) < 1e-9 for r in out.values())


def test_hashing_trick_determinism_and_shape(spark):
    from event_pipeline_spark.operators.features import (
        FH_BUCKETS,
        hashed_features,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "alpha gamma")],
        "doc_id long, text string",
    )
    rows = hashed_features(docs).collect()
    by_doc = {}
    for r in rows:
        assert 0 <= r["bucket"] < FH_BUCKETS
        by_doc.setdefault(r["id"], {})[r["bucket"]] = r
    # doc 1: alpha x2 + beta; doc 2: alpha + gamma. Token counts add up.
    assert sum(r["n_terms"] for r in rows) == 5
    # v is a SIGNED count: |v| <= n_terms cell-wise
    assert all(abs(r["v"]) <= r["n_terms"] for r in rows)
    # determinism: a second run hashes identically
    again = sorted(
        (r["id"], r["bucket"], r["n_terms"], r["v"])
        for r in hashed_features(docs).collect()
    )
    assert again == sorted(
        (r["id"], r["bucket"], r["n_terms"], r["v"]) for r in rows
    )
