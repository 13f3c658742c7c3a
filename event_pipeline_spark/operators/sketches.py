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

Registered queries (rows-only — opaque builtin hashing):
- ``sketch_hll_daily_users`` — daily HLL sketches of user_id per
  event_type, unioned to per-type totals + estimates.
- ``sketch_theta_overlap`` — distinct-user union / intersection /
  difference between event types via Theta sketch algebra.
- ``sketch_kll_value_quantiles`` — mergeable p50/p95 of ``value`` per
  event_type from KLL sketches.

Registered queries (full external oracle — the deterministic-parameter
exact modes, same estimator families on the repo's portable md5 hash
contract, every intermediate recomputed by DuckDB):
- ``sketch_theta_kmv_exact`` — KMV theta set algebra over distinct
  order customers (URGENT vs HIGH).
- ``sketch_hll_md5_exact`` — HLL distinct parts per lineitem return
  flag (exact integer register series; both estimator branches
  exercised across SFs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
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


# -- KMV theta, md5-derived: the deterministic-parameter exact mode ----------
#
# The builtin DataSketches forms above hash with an opaque JVM seed, so
# their estimates register rows-only. This variant is the same
# estimator family (k minimum values / theta set algebra, Beyer et al.
# 2007) built on the repo's portable hash contract — md5-low-64
# little-endian == DuckDB ``md5_number_lower`` — so the ENTIRE sketch
# (retained hash sets, thetas, every estimate) is recomputable by the
# oracle, the sim_lsh_topk_exact / pq_topk_exact pattern applied to
# sketches. Same trick as operators/dedup.py's minhash.

#: retained-values budget per KMV sketch
KMV_K = 64

#: 2^64 — the hash-space size; theta for an unsaturated sketch
_HASH_SPACE = "18446744073709551616"


def _md5_low64_col(col: Column) -> Column:
    """Low 64 bits of md5 as decimal(20,0), little-endian — bit-identical
    to DuckDB ``md5_number_lower`` (same helper as operators/dsir.py)."""
    h = F.md5(col)
    le_hex = F.concat(*[F.substring(h, 33 - 2 * k, 2) for k in range(1, 9)])
    return F.conv(le_hex, 16, 10).cast("decimal(20,0)")


def kmv_theta_overlap(
    df: DataFrame,
    value_col: str,
    tag_col: str,
    tag_a: str,
    tag_b: str,
    *,
    k: int = KMV_K,
) -> DataFrame:
    """|A|, |B|, |A ∪ B|, |A ∩ B|, |A \\ B| estimates over distinct
    ``value_col`` sets from two KMV sketches — every number the oracle
    can recompute exactly.

    Estimator: with theta = the k-th smallest 64-bit hash (2^64 when the
    set holds < k distinct hashes), retained R = {h < theta}, the
    estimate for any derived set S ⊆ R is |S| · 2^64 / theta. Set
    algebra scopes both sketches to theta = min(theta_a, theta_b);
    membership below theta is EXACT (h < theta ≤ theta_X means h ∈ X iff
    h ∈ R_X), which is what makes intersection/difference well-defined.

    Scale shape: the only corpus-sized stage is the distinct over
    (tag, 8-byte digest) — values themselves never shuffle. Top-k then
    runs in two phases (per-salt partial top-k, then top-k of ≤ 16·k
    survivors per tag) so no executor ever sorts a full tag's hash set;
    everything after is ≤ 2(k-1) rows.
    """
    space = F.expr(f"CAST('{_HASH_SPACE}' AS DECIMAL(21,0))")

    dh = (
        df.filter(F.col(tag_col).isin(tag_a, tag_b))
        .select(
            F.col(tag_col).alias("tag"),
            _md5_low64_col(F.col(value_col).cast("string")).alias("h"),
        )
        .distinct()
    )
    cnt = dh.groupBy("tag").agg(F.count(F.lit(1)).alias("n_distinct"))
    # two-phase top-k: partial per (tag, h % 16), then final per tag
    part = Window.partitionBy("tag", F.pmod(F.col("h"), F.lit(16))).orderBy(
        "h"
    )
    survivors = dh.withColumn("r1", F.row_number().over(part)).filter(
        F.col("r1") <= k
    )
    final = Window.partitionBy("tag").orderBy("h")
    ranked = survivors.withColumn("r", F.row_number().over(final)).filter(
        F.col("r") <= k
    )
    # theta per tag: k-th smallest when saturated, else 2^64
    theta = (
        ranked.groupBy("tag")
        .agg(F.max(F.when(F.col("r") == k, F.col("h"))).alias("_kth"))
        .join(cnt, "tag")
        .select(
            "tag",
            F.when(F.col("n_distinct") >= k, F.col("_kth"))
            .otherwise(space)
            .alias("theta"),
        )
    )
    th = theta.groupBy().agg(
        F.max(F.when(F.col("tag") == tag_a, F.col("theta"))).alias(
            "theta_a"
        ),
        F.max(F.when(F.col("tag") == tag_b, F.col("theta"))).alias(
            "theta_b"
        ),
    ).withColumn("theta", F.least("theta_a", "theta_b"))
    # retained hashes flagged by side; set ops scope to min-theta, the
    # per-sketch estimates n_a/n_b to their OWN theta
    flags = (
        ranked.groupBy("h")
        .agg(
            F.max(F.when(F.col("tag") == tag_a, 1).otherwise(0)).alias(
                "in_a"
            ),
            F.max(F.when(F.col("tag") == tag_b, 1).otherwise(0)).alias(
                "in_b"
            ),
        )
        .join(F.broadcast(th), how="cross")  # one-row theta scalars
    )

    def est(count_col: Column, theta_col: str) -> Column:
        return F.round(
            F.coalesce(count_col, F.lit(0)).cast("double")
            * F.lit(float(2**64))
            / F.col(theta_col).cast("double"),
            3,
        )

    below = F.col("h") < F.col("theta")
    return flags.groupBy("theta_a", "theta_b", "theta").agg(
        F.sum(F.when(F.col("h") < F.col("theta_a"), F.col("in_a"))).alias(
            "_ca"
        ),
        F.sum(F.when(F.col("h") < F.col("theta_b"), F.col("in_b"))).alias(
            "_cb"
        ),
        F.sum(F.when(below, 1)).alias("_cu"),
        F.sum(F.when(below, F.col("in_a") * F.col("in_b"))).alias("_ci"),
        F.sum(F.when(below, F.col("in_a") * (1 - F.col("in_b")))).alias(
            "_cao"
        ),
    ).select(
        est(F.col("_ca"), "theta_a").alias("n_a"),
        est(F.col("_cb"), "theta_b").alias("n_b"),
        est(F.col("_cu"), "theta").alias("n_union"),
        est(F.col("_ci"), "theta").alias("n_intersect"),
        est(F.col("_cao"), "theta").alias("n_a_only"),
    )


def q_sketch_theta_kmv_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-customer overlap between URGENT and HIGH orders via the
    md5-derived KMV sketch (saturated — estimation branch — at every SF;
    the unsaturated exact-count branch is covered by
    ``tests/test_sketches.py`` with k larger than the universe)."""
    from event_pipeline_spark.session import read_table

    orders = read_table(spark, sf_dir, "orders")
    return kmv_theta_overlap(
        orders, "o_custkey", "o_orderpriority", "1-URGENT", "2-HIGH"
    )


_KMV_ORACLE = f"""
WITH dh AS (
  SELECT DISTINCT o_orderpriority AS tag,
         md5_number_lower(o_custkey::VARCHAR)::HUGEINT AS h
  FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')),
ranked AS (
  SELECT tag, h, row_number() OVER (PARTITION BY tag ORDER BY h) AS r,
         count(*) OVER (PARTITION BY tag) AS n_distinct
  FROM dh),
theta AS (
  SELECT tag,
         CASE WHEN max(n_distinct) >= {KMV_K}
              THEN max(CASE WHEN r = {KMV_K} THEN h END)
              ELSE {_HASH_SPACE}::HUGEINT END AS theta
  FROM ranked GROUP BY tag),
th AS (
  SELECT max(CASE WHEN tag = '1-URGENT' THEN theta END) AS theta_a,
         max(CASE WHEN tag = '2-HIGH' THEN theta END) AS theta_b,
         least(max(CASE WHEN tag = '1-URGENT' THEN theta END),
               max(CASE WHEN tag = '2-HIGH' THEN theta END)) AS theta
  FROM theta),
flags AS (
  SELECT h,
         max(CASE WHEN tag = '1-URGENT' THEN 1 ELSE 0 END) AS in_a,
         max(CASE WHEN tag = '2-HIGH' THEN 1 ELSE 0 END) AS in_b
  FROM (SELECT * FROM ranked WHERE r <= {KMV_K})
  GROUP BY h),
scoped AS (SELECT f.*, th.* FROM flags f CROSS JOIN th)
SELECT
  round(coalesce(sum(CASE WHEN h < theta_a THEN in_a END), 0)::DOUBLE
        * 18446744073709551616.0 / theta_a::DOUBLE, 3) AS n_a,
  round(coalesce(sum(CASE WHEN h < theta_b THEN in_b END), 0)::DOUBLE
        * 18446744073709551616.0 / theta_b::DOUBLE, 3) AS n_b,
  round(coalesce(sum(CASE WHEN h < theta THEN 1 END), 0)::DOUBLE
        * 18446744073709551616.0 / theta::DOUBLE, 3) AS n_union,
  round(coalesce(sum(CASE WHEN h < theta THEN in_a * in_b END), 0)::DOUBLE
        * 18446744073709551616.0 / theta::DOUBLE, 3) AS n_intersect,
  round(coalesce(sum(CASE WHEN h < theta THEN in_a * (1 - in_b) END),
                 0)::DOUBLE
        * 18446744073709551616.0 / theta::DOUBLE, 3) AS n_a_only
FROM scoped GROUP BY theta_a, theta_b, theta
"""


# -- HLL, md5-derived: the deterministic-parameter exact mode ----------------

#: HLL precision: p index bits -> m = 2^p registers
HLL_P = 8
HLL_M = 1 << HLL_P
#: bits left for the rho field out of the 60-bit hash slice
HLL_W = 60 - HLL_P
#: Flajolet et al. 2007 bias constant for m = 256
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)


def hll_md5_estimate(
    df: DataFrame, value_col: str, group_cols: list[str]
) -> DataFrame:
    """Per-group HLL distinct estimate whose EVERY intermediate — hash,
    register index, rho, register maxima, the summed 2^-M series — is an
    exact integer the oracle recomputes, and whose only doubles are one
    final division (and one round-7 ln on the linear-counting branch,
    the repo's accepted ln-portability recipe).

    Layout of the 60-bit hash slice x = md5_low64 mod 2^60: the top
    p bits index the register, rho = leading zeros of the remaining
    w = 60-p bits + 1 (w+1 when they are all zero). The 2^-M_j harmonic
    series is kept exact by scaling by 2^(w+1): T = sum_j 2^(w+1-M_j)
    (absent registers contribute 2^(w+1)), a BIGINT <= m * 2^(w+1).
    Estimate = alpha * m^2 * 2^(w+1) / T, with the standard
    linear-counting switch (E <= 2.5m and empty registers exist ->
    m * ln(m/V)).

    Scale shape: register maxima are a map-side-combinable
    groupBy(group, idx).max — the shuffle is at most m rows per group
    regardless of corpus size, the same contract as the builtin
    ``hll_partial``/``hll_merge`` pair (registers merge by max).
    """
    two_60 = F.expr("CAST('1152921504606846976' AS DECIMAL(20,0))")
    x = F.pmod(_md5_low64_col(F.col(value_col).cast("string")), two_60).cast(
        "long"
    )
    pos = df.select(
        *group_cols,
        (x - F.pmod(x, F.lit(1 << HLL_W))).alias("_hi"),
        F.pmod(x, F.lit(1 << HLL_W)).alias("_rem"),
    ).select(
        *group_cols,
        (F.col("_hi") / F.lit(1 << HLL_W)).cast("long").alias("idx"),
        # rho: leading zeros in the w-bit field + 1; bin() drops leading
        # zeros so its length locates the MSB (identical in DuckDB)
        F.when(F.col("_rem") == 0, F.lit(HLL_W + 1))
        .otherwise(F.lit(HLL_W + 1) - F.length(F.bin(F.col("_rem"))))
        .alias("rho"),
    )
    regs = pos.groupBy(*group_cols, "idx").agg(F.max("rho").alias("_m"))
    shift = HLL_W + 1
    agg = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("nz"),
        (
            F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {shift} - _m)"))
            + (F.lit(HLL_M) - F.count(F.lit(1)))
            * F.lit(1 << shift).cast("long")
        ).alias("t_units"),
    )
    raw = (
        F.lit(HLL_ALPHA)
        * F.lit(float(HLL_M * HLL_M))
        * F.lit(float(1 << shift))
        / F.col("t_units").cast("double")
    )
    v = F.lit(HLL_M) - F.col("nz")
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (v > 0),
        F.round(
            F.lit(float(HLL_M))
            * F.round(F.log(F.lit(float(HLL_M)) / v.cast("double")), 7),
            3,
        ),
    ).otherwise(F.round(raw, 3))
    return agg.select(*group_cols, "nz", "t_units", est.alias("est"))


def q_sketch_hll_md5_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-part estimate per lineitem return flag via the
    md5-derived HLL (linear-counting branch at small SFs, raw branch at
    sf0.1 — both mirrored exactly by the oracle)."""
    from event_pipeline_spark.session import read_table

    li = read_table(spark, sf_dir, "lineitem")
    return hll_md5_estimate(li, "l_partkey", ["l_returnflag"]).orderBy(
        "l_returnflag"
    )


_HLL_ORACLE = f"""
WITH pos AS (
  SELECT l_returnflag,
         ((md5_number_lower(l_partkey::VARCHAR) % 1152921504606846976)
          // {1 << HLL_W})::BIGINT AS idx,
         ((md5_number_lower(l_partkey::VARCHAR) % 1152921504606846976)
          % {1 << HLL_W})::BIGINT AS rem
  FROM lineitem),
regs AS (
  SELECT l_returnflag, idx,
         max(CASE WHEN rem = 0 THEN {HLL_W + 1}
                  ELSE {HLL_W + 1} - length(bin(rem)) END) AS m
  FROM pos GROUP BY l_returnflag, idx),
agg AS (
  SELECT l_returnflag, count(*)::BIGINT AS nz,
         (sum(1::BIGINT << ({HLL_W + 1} - m))
          + ({HLL_M} - count(*)) * (1::BIGINT << {HLL_W + 1}))::BIGINT
           AS t_units
  FROM regs GROUP BY l_returnflag)
SELECT l_returnflag, nz, t_units,
       CASE WHEN ({HLL_ALPHA!r}::DOUBLE * {float(HLL_M * HLL_M)!r}::DOUBLE
                  * {float(1 << (HLL_W + 1))!r}::DOUBLE / t_units::DOUBLE)
                 <= {2.5 * HLL_M!r}::DOUBLE
             AND ({HLL_M} - nz) > 0
            THEN round({float(HLL_M)!r}::DOUBLE
                       * round(ln({float(HLL_M)!r}::DOUBLE
                                  / ({HLL_M} - nz)::DOUBLE), 7), 3)
            ELSE round({HLL_ALPHA!r}::DOUBLE * {float(HLL_M * HLL_M)!r}::DOUBLE
                       * {float(1 << (HLL_W + 1))!r}::DOUBLE
                       / t_units::DOUBLE, 3)
       END AS est
FROM agg ORDER BY l_returnflag
"""


QUERIES["sketch_hll_daily_users"] = q_sketch_hll_daily_users
QUERIES["sketch_theta_overlap"] = q_sketch_theta_overlap
QUERIES["sketch_kll_value_quantiles"] = q_sketch_kll_value_quantiles
QUERIES["sketch_theta_kmv_exact"] = q_sketch_theta_kmv_exact
ORACLES["sketch_theta_kmv_exact"] = _KMV_ORACLE
QUERIES["sketch_hll_md5_exact"] = q_sketch_hll_md5_exact
ORACLES["sketch_hll_md5_exact"] = _HLL_ORACLE


# ---------------------------------------------------------------------------
# Count-Min sketch (md5 rows, externally recomputable)
# ---------------------------------------------------------------------------

CMS_WIDTH = 32
CMS_DEPTH = 4


def cms_build(
    df: DataFrame,
    value_col: str,
    *,
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
) -> DataFrame:
    """(row, bucket, counter): the Count-Min sketch of ``value_col``
    (Cormode & Muthukrishnan 2005) — depth salted md5 rows × width
    buckets of additive counters. The classic mergeable frequency
    sketch: counters sum across partitions/streams, point estimates
    only ever OVER-count (collisions add, never subtract).

    Determinism: bucket = md5_low64(salt ‖ value) mod width, the
    repo's cross-engine hash (== DuckDB ``md5_number_lower``), so the
    ENTIRE sketch — not just its estimates — is recomputable by the
    oracle. Build = one groupBy over (row, bucket): depth narrow rows
    per input, map-side combined; sketch size depth×width regardless
    of corpus.
    """
    rows = [
        df.select(
            F.lit(s).alias("row"),
            F.pmod(
                _md5_low64_col(
                    F.concat(
                        F.lit(f"cms{s}|"), F.col(value_col).cast("string")
                    )
                ),
                F.lit(width),
            )
            .cast("int")
            .alias("bucket"),
        )
        for s in range(depth)
    ]
    u = rows[0]
    for r in rows[1:]:
        u = u.unionByName(r)
    return u.groupBy("row", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("counter")
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    *,
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
) -> DataFrame:
    """(key, estimate): CM point estimate = min over rows of the
    key's counter. Missing counters read as 0 (an empty bucket)."""
    probes = None
    for s in range(depth):
        p = keys.select(
            F.col(key_col).alias("k"),
            F.lit(s).alias("row"),
            F.pmod(
                _md5_low64_col(
                    F.concat(F.lit(f"cms{s}|"), F.col(key_col).cast("string"))
                ),
                F.lit(width),
            )
            .cast("int")
            .alias("bucket"),
        )
        probes = p if probes is None else probes.unionByName(p)
    j = probes.join(sketch, ["row", "bucket"], "left")
    return j.groupBy("k").agg(
        F.min(F.coalesce(F.col("counter"), F.lit(0)))
        .cast("bigint")
        .alias("estimate")
    )


def q_sketch_cms_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS over event types: per type the true count, the sketch
    estimate, and the (always non-negative) overestimate."""
    from event_pipeline_spark.session import read_table

    ev = read_table(spark, sf_dir, "events")
    sketch = cms_build(ev, "event_type")
    keys = ev.select("event_type").distinct()
    est = cms_estimate(sketch, keys, "event_type")
    true = ev.groupBy(F.col("event_type").alias("k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("true_count")
    )
    return (
        true.join(est, "k")
        .select(
            F.col("k").alias("event_type"),
            "true_count",
            "estimate",
            (F.col("estimate") - F.col("true_count")).alias("overcount"),
        )
        .orderBy("event_type")
    )


QUERIES["sketch_cms_events"] = q_sketch_cms_events
ORACLES["sketch_cms_events"] = f"""
WITH hashed AS (
  SELECT s.s AS row, event_type,
         (md5_number_lower('cms' || s.s || '|' || event_type)::HUGEINT
          % {CMS_WIDTH})::INT AS bucket
  FROM events, (SELECT unnest(generate_series(0, {CMS_DEPTH - 1})) AS s)
       s),
sketch AS (
  SELECT row, bucket, count(*)::BIGINT AS counter
  FROM hashed GROUP BY row, bucket),
keys AS (SELECT DISTINCT event_type FROM events),
probes AS (
  SELECT k.event_type, s.s AS row,
         (md5_number_lower('cms' || s.s || '|' || k.event_type)::HUGEINT
          % {CMS_WIDTH})::INT AS bucket
  FROM keys k,
       (SELECT unnest(generate_series(0, {CMS_DEPTH - 1})) AS s) s),
est AS (
  SELECT p.event_type,
         min(coalesce(sk.counter, 0))::BIGINT AS estimate
  FROM probes p
  LEFT JOIN sketch sk ON sk.row = p.row AND sk.bucket = p.bucket
  GROUP BY p.event_type),
true_c AS (
  SELECT event_type, count(*)::BIGINT AS true_count
  FROM events GROUP BY event_type)
SELECT t.event_type, t.true_count, e.estimate,
       (e.estimate - t.true_count)::BIGINT AS overcount
FROM true_c t JOIN est e USING (event_type)
ORDER BY event_type
"""


# -- AMS F2 (second frequency moment), md5-signed: exact mode ----------------

AMS_SKETCHES = 8


def ams_f2_sketch(
    df: DataFrame, value_col: str, *, n_sketches: int = AMS_SKETCHES
) -> DataFrame:
    """(sketch, z, estimate): the AMS second-frequency-moment sketch
    (Alon, Matias & Szegedy 1996) — ``n_sketches`` independent ±1
    hash-sign accumulators; each Z = Σ_rows sign(value) satisfies
    E[Z²] = F2 = Σ_types count², the "surprise number" / self-join
    size that sizes skew (``skew.py``) and repetition.

    Determinism: sign(x) = +1 iff md5_low64("ams{s}|" ‖ x) is even —
    the repo's cross-engine hash contract (== DuckDB
    ``md5_number_lower``), so the whole sketch, not only its
    estimates, is oracle-recomputable. Everything is BIGINT.

    Scale shape: each sketch is ONE map-side-combinable SUM over ±1
    signs; n_sketches narrow rows per input row shuffle as partial
    sums only — sketch size is n_sketches counters regardless of
    corpus, and sketches MERGE by addition across partitions or
    streams (the AMS linearity that makes it a sketch and not a
    sample)."""
    rows = [
        df.select(
            F.lit(s).alias("sketch"),
            F.when(
                F.pmod(
                    _md5_low64_col(
                        F.concat(
                            F.lit(f"ams{s}|"),
                            F.col(value_col).cast("string"),
                        )
                    ),
                    F.lit(2),
                )
                == 0,
                F.lit(1),
            )
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("sgn"),
        )
        for s in range(n_sketches)
    ]
    u = rows[0]
    for r in rows[1:]:
        u = u.unionByName(r)
    return u.groupBy("sketch").agg(
        F.sum("sgn").cast("bigint").alias("z")
    ).select(
        F.col("sketch").cast("int").alias("sketch"),
        "z",
        (F.col("z") * F.col("z")).cast("bigint").alias("estimate"),
    )


def q_sketch_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS F2 of the event-type stream next to the exact second
    moment — per sketch row the estimate and its signed error."""
    from event_pipeline_spark.session import read_table

    ev = read_table(spark, sf_dir, "events")
    sk = ams_f2_sketch(ev, "event_type")
    exact = (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).cast("bigint").alias("f2"))
    )
    return (
        sk.crossJoin(F.broadcast(exact))  # one-row exact-stats join
        .select(
            "sketch",
            "z",
            "estimate",
            F.col("f2").alias("f2_exact"),
            (F.col("estimate") - F.col("f2")).alias("err"),
        )
        .orderBy("sketch")
    )


QUERIES["sketch_ams_f2"] = q_sketch_ams_f2
ORACLES["sketch_ams_f2"] = f"""
WITH signed AS (
  SELECT s.s AS sketch,
         CASE WHEN md5_number_lower('ams' || s.s || '|' || event_type)
                   ::HUGEINT % 2 = 0 THEN 1 ELSE -1 END AS sgn
  FROM events,
       (SELECT unnest(generate_series(0, {AMS_SKETCHES - 1})) AS s) s),
sk AS (
  SELECT sketch::INT AS sketch, sum(sgn)::BIGINT AS z
  FROM signed GROUP BY sketch),
exact AS (
  SELECT sum(c * c)::BIGINT AS f2 FROM (
    SELECT count(*)::BIGINT AS c FROM events GROUP BY event_type))
SELECT sk.sketch, sk.z, (sk.z * sk.z)::BIGINT AS estimate,
       exact.f2 AS f2_exact, ((sk.z * sk.z) - exact.f2)::BIGINT AS err
FROM sk CROSS JOIN exact
ORDER BY sketch
"""
