"""Rolling-origin CV folds (operators/folds.py): leakage-safety and
window-boundary semantics.
"""

from __future__ import annotations

import datetime as dt


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string"
    )


def test_folds_hand_case(spark):
    from event_pipeline_spark.operators.folds import rolling_folds

    cutoff = "2024-01-10"  # cutoff instant = midnight starting Jan 10
    rows = [
        # user 1: 2 feature-window events, purchase in label window
        (1, dt.datetime(2024, 1, 8, 5), 1, "view"),
        (2, dt.datetime(2024, 1, 9, 5), 1, "click"),
        (3, dt.datetime(2024, 1, 12, 5), 1, "purchase"),
        # user 2: feature event exactly AT the cutoff (inclusive),
        # purchase AFTER the label window (exclusive) -> label 0
        (4, dt.datetime(2024, 1, 10, 0), 2, "view"),
        (5, dt.datetime(2024, 1, 17, 0, 0, 1), 2, "purchase"),
        # user 3: active only AFTER the cutoff -> no fold row at all
        (6, dt.datetime(2024, 1, 11, 0), 3, "view"),
        # user 4: feature event exactly 7 days BEFORE cutoff ->
        # exclusive lower bound, not observed
        (7, dt.datetime(2024, 1, 3, 0), 4, "view"),
    ]
    out = {
        r["user_id"]: r
        for r in rolling_folds(_ev(spark, rows), [cutoff]).collect()
    }
    assert set(out) == {1, 2}
    assert (out[1]["n_feat"], out[1]["label"]) == (2, 1)
    assert (out[2]["n_feat"], out[2]["label"]) == (1, 0)


def test_folds_no_leakage(spark, sf_dir):
    """The feature counts must be computable from data at-or-before
    the cutoff only: recompute n_feat on the TRUNCATED log (events
    after each cutoff dropped) and demand equality."""
    from event_pipeline_spark.operators.folds import rolling_folds
    from event_pipeline_spark.session import read_table
    from pyspark.sql import functions as F

    ev = read_table(spark, sf_dir, "events")
    cutoffs = ["2024-01-15"]
    full = {
        (r["cutoff_day"], r["user_id"]): (r["n_feat"], r["n_feat_label"])
        for r in rolling_folds(ev, cutoffs).collect()
    }
    truncated = ev.where(
        F.col("ts") <= F.to_timestamp(F.lit("2024-01-15"), "yyyy-MM-dd")
    )
    trunc = {
        (r["cutoff_day"], r["user_id"]): (r["n_feat"], r["n_feat_label"])
        for r in rolling_folds(truncated, cutoffs).collect()
    }
    assert full == trunc  # features identical without any future data
    assert full  # non-empty


def test_stratified_folds_exact_balance(spark):
    """Every stratum splits with +-1 balance across folds even when a
    stratum is smaller than k; assignment is repartition-stable."""
    from collections import Counter

    from event_pipeline_spark.operators.folds import stratified_folds

    rows = [(f"r{i}", "big") for i in range(103)]
    rows += [(f"s{i}", "small") for i in range(3)]
    df = spark.createDataFrame(rows, "id string, s string")
    out = stratified_folds(
        df, stratum_col="s", key_col="id", k=5, salt="t"
    ).collect()
    per = Counter((r["s"], r["fold"]) for r in out)
    big = [per[("big", f)] for f in range(5)]
    assert max(big) - min(big) <= 1 and sum(big) == 103
    small = [per.get(("small", f), 0) for f in range(5)]
    assert sorted(small, reverse=True) == [1, 1, 1, 0, 0]
    again = stratified_folds(
        df.repartition(9), stratum_col="s", key_col="id", k=5, salt="t"
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
