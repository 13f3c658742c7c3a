"""Mergeable sketch operators: HLL cardinality, Theta set algebra, KLL
quantiles (Apache DataSketches, built into Spark's function library).

At 100 TB the only viable shape for "distinct users per X", "overlap
between corpus A and B", or "p95 per key, refreshed hourly" is a
*mergeable summary*: build tiny sketches per partition/day, union them —
never re-shuffle raw values, never rescan history. These are the
aggregation-side siblings of the digest tricks in operators/dedup.py.

Maps the reference's queryable metrics (success/failure counts over
results — /root/reference/nexus/telemetry/reporter.py:38-94) to the
sketch forms those metrics take when the result stream no longer fits a
driver dict.

Accuracy contracts are tested in tests/test_sketches.py (error bounds
vs exact answers, and merge-consistency: union of daily sketches ==
sketch of the whole), not DuckDB-checked — the estimates are
approximate by design, so these register as rows-only queries
(sim_lsh_topk precedent).

Registered queries (rows-only):
- ``sketch_hll_daily_users`` — daily HLL sketches of user_id per
  event_type, unioned to per-type totals + estimates.
- ``sketch_theta_overlap`` — distinct-user union / intersection /
  difference between event types via Theta sketch algebra.
- ``sketch_kll_value_quantiles`` — mergeable p50/p95 of ``value`` per
  event_type from KLL sketches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES = {}
ORACLES = {}


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_pipeline_spark.session import read_table

    return read_table(spark, sf_dir, "events")


# -- HLL: mergeable distinct counts -----------------------------------------


def hll_partial(
    df: DataFrame, value_col: str, group_cols: list[str], lg_k: int = 12
) -> DataFrame:
    """One HLL sketch per group — the partial a rollup stores. A day's
    sketch is ~2^lg_k bytes regardless of row count; re-aggregation to
    any coarser grouping is ``hll_union_agg`` over these, never a rescan
    of the raw data."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("hll")
    )


def hll_merge(
    partials: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Union partial sketches up to a coarser grouping and estimate."""
    return partials.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg("hll")).alias("approx_distinct")
    )


def q_sketch_hll_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily user sketches per event_type, merged to per-type distinct
    estimates — the incremental form of ``COUNT(DISTINCT user_id)``."""
    events = _events(spark, sf_dir)
    daily = hll_partial(
        events.withColumn("day", F.to_date("ts")),
        "user_id",
        ["event_type", "day"],
    )
    return hll_merge(daily, ["event_type"]).orderBy("event_type")


# -- Theta: set algebra over sketches ---------------------------------------


def theta_overlap(
    df: DataFrame, value_col: str, tag_col: str, tag_a: str, tag_b: str
) -> DataFrame:
    """|A|, |B|, |A ∪ B|, |A ∩ B|, |A \\ B| over distinct ``value_col``
    sets — one pass to build two Theta sketches, then constant-time
    driver-side algebra. The decontamination / audience-overlap
    primitive: no id ever crosses the network, only two ~4 KB sketches.
    """
    sk = df.agg(
        F.theta_sketch_agg(
            F.when(F.col(tag_col) == tag_a, F.col(value_col))
        ).alias("a"),
        F.theta_sketch_agg(
            F.when(F.col(tag_col) == tag_b, F.col(value_col))
        ).alias("b"),
    )
    return sk.select(
        F.theta_sketch_estimate("a").alias("n_a"),
        F.theta_sketch_estimate("b").alias("n_b"),
        F.theta_sketch_estimate(F.theta_union("a", "b")).alias("n_union"),
        F.theta_sketch_estimate(F.theta_intersection("a", "b")).alias(
            "n_intersect"
        ),
        F.theta_sketch_estimate(F.theta_difference("a", "b")).alias(
            "n_a_only"
        ),
    )


def q_sketch_theta_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user overlap between 'click' and 'purchase' events."""
    return theta_overlap(
        _events(spark, sf_dir), "user_id", "event_type", "click", "purchase"
    )


# -- KLL: mergeable quantiles ------------------------------------------------


def kll_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    probs: list[float],
    k: int = 200,
) -> DataFrame:
    """Mergeable per-group quantiles: a KLL sketch per group, queried at
    ``probs``. Unlike ``percentile()`` (exact, needs the full sorted
    group), KLL partials stream, merge across days, and hold o(n)
    memory — the rollup-able form of q34."""
    sk = df.groupBy(*group_cols).agg(
        F.kll_sketch_agg_double(value_col, F.lit(k)).alias("kll")
    )
    cols = [
        F.kll_sketch_get_quantile_double(
            "kll", F.lit(p)
        ).alias(f"p{int(p * 100)}")
        for p in probs
    ]
    return sk.select(*group_cols, *cols)


def kll_merge_partials(
    partials: DataFrame, sketch_col: str, group_cols: list[str]
) -> DataFrame:
    """Merge per-partition/per-day KLL sketches up to ``group_cols``.
    Spark exposes the pairwise ``kll_sketch_merge_double`` scalar (no
    merge-aggregate), so partials are gathered per group and folded with
    a higher-order ``aggregate`` — a few hundred ~KB buffers per group,
    no raw values move. Output column: ``kll``."""
    return (
        partials.groupBy(*group_cols)
        .agg(F.collect_list(sketch_col).alias("_ks"))
        .select(
            *group_cols,
            F.expr(
                "aggregate(slice(_ks, 2, size(_ks) - 1), _ks[0],"
                " (acc, x) -> kll_sketch_merge_double(acc, x))"
            ).alias("kll"),
        )
    )


def q_sketch_kll_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kll_quantiles(
        _events(spark, sf_dir), "value", ["event_type"], [0.5, 0.95]
    ).orderBy("event_type")


QUERIES["sketch_hll_daily_users"] = q_sketch_hll_daily_users
QUERIES["sketch_theta_overlap"] = q_sketch_theta_overlap
QUERIES["sketch_kll_value_quantiles"] = q_sketch_kll_value_quantiles
