"""Distributed bivariate statistics: Pearson r + simple OLS per group.

The `profile.py` module covers univariate column statistics; this is
the bivariate complement — per-group correlation and the least-squares
line, computed from the five classic power sums in ONE aggregation
pass (the textbook distributed form: every sum has a map-side partial,
nothing is ever sorted or centered row-by-row):

    r     = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − (Σx)²)(n·Σy² − (Σy)²))
    slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    icept = (Σy − slope·Σx) / n

Exactness contract: inputs are quantized per row to integer units
(cents etc. — the `rfm.py` recipe), row-level products stay in BIGINT,
and the five SUMS run in DECIMAL(38,0) (Spark) ≡ HUGEINT (DuckDB) —
exact, order-free, and beyond-2^63-safe where a BIGINT Σx² would
overflow at corpus scale. Each exact sum then casts to double (the
same correctly-rounded conversion in both engines), and the statistics
are fixed-shape double expressions rounded to 7 dp — no
data-dependent double folds anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES = {}
ORACLES = {}


def corr_ols_by_group(
    df: DataFrame,
    *,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """(group, n, r, slope, intercept); x/y must already be integer-
    valued columns (quantize before calling). Degenerate groups (zero
    variance in x or y) emit NULL r/slope/intercept."""
    x = F.col(x_col).cast("bigint")
    y = F.col(y_col).cast("bigint")
    dec = "decimal(38,0)"
    agg = df.groupBy(F.col(group_col).alias("g")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(x.cast(dec)).alias("sx"),
        F.sum(y.cast(dec)).alias("sy"),
        F.sum((x * x).cast(dec)).alias("sxx"),
        F.sum((y * y).cast(dec)).alias("syy"),
        F.sum((x * y).cast(dec)).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    ok = (var_x > 0) & (var_y > 0)
    slope = cov_n / var_x
    return agg.select(
        F.col("g").alias(group_col),
        "n",
        F.when(ok, F.round(cov_n / F.sqrt(var_x * var_y), 7)).alias("r"),
        F.when(ok, F.round(slope, 7)).alias("slope"),
        F.when(ok, F.round((sy - slope * sx) / n, 7)).alias("intercept"),
    )


def q_stats_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity vs extended price (cents) per return flag — the
    lineitem pair that is correlated by construction (price scales
    with quantity), so r is discriminative, not noise."""
    from event_pipeline_spark.session import read_table

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_quantity")).cast("bigint").alias("q"),
        F.round(F.col("l_extendedprice") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    return corr_ols_by_group(
        li, group_col="l_returnflag", x_col="q", y_col="cents"
    ).orderBy("l_returnflag")


QUERIES["stats_corr_ols"] = q_stats_corr
ORACLES["stats_corr_ols"] = """
WITH base AS (
  SELECT l_returnflag AS g,
         CAST(round(l_quantity) AS BIGINT) AS x,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS y
  FROM lineitem),
agg AS (
  SELECT g, count(*)::BIGINT AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
  FROM base GROUP BY g)
SELECT g AS l_returnflag, n,
       CASE WHEN (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) > 0
             AND (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE) > 0
            THEN round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                       / sqrt((n::DOUBLE * sxx::DOUBLE
                               - sx::DOUBLE * sx::DOUBLE)
                              * (n::DOUBLE * syy::DOUBLE
                                 - sy::DOUBLE * sy::DOUBLE)), 7) END AS r,
       CASE WHEN (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) > 0
             AND (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE) > 0
            THEN round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                       / (n::DOUBLE * sxx::DOUBLE
                          - sx::DOUBLE * sx::DOUBLE), 7) END AS slope,
       CASE WHEN (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) > 0
             AND (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE) > 0
            THEN round((sy::DOUBLE
                        - ((n::DOUBLE * sxy::DOUBLE
                            - sx::DOUBLE * sy::DOUBLE)
                           / (n::DOUBLE * sxx::DOUBLE
                              - sx::DOUBLE * sx::DOUBLE))
                          * sx::DOUBLE) / n::DOUBLE, 7) END AS intercept
FROM agg ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# chi-square test of independence
# ---------------------------------------------------------------------------


def chi2_independence(
    df: DataFrame,
    *,
    row_col: str,
    col_col: str,
) -> DataFrame:
    """(row, col, observed, expected, chi_units): the χ² contingency
    table for two categorical columns — "is event mix independent of
    weekday" and every other association question a pipeline monitor
    asks. Expected cell mass = row_total · col_total / N; the cell
    contribution (o−e)²/e is quantized to 1e-7 BIGINT units so the
    test statistic (any subset sum of cells) is an order-free integer
    sum.

    Scale: one groupBy to the |rows|×|cols| contingency cells;
    marginals are two window totals over that bounded table (never the
    raw corpus), so the heavy shuffle is the single cell count.
    """
    from pyspark.sql import Window

    cells = df.groupBy(
        F.col(row_col).alias("rk"), F.col(col_col).alias("ck")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    whole = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wr = Window.partitionBy("rk").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wc = Window.partitionBy("ck").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    rt = F.sum("o").over(wr).cast("double")
    ct = F.sum("o").over(wc).cast("double")
    n = F.sum("o").over(whole).cast("double")
    e = rt * ct / n
    chi = (F.col("o").cast("double") - e) * (
        F.col("o").cast("double") - e
    ) / e
    return cells.select(
        F.col("rk").alias(row_col),
        F.col("ck").alias(col_col),
        F.col("o").alias("observed"),
        F.round(e, 7).alias("expected"),
        F.round(chi * F.lit(1e7)).cast("bigint").alias("chi_units"),
    )


def q_stats_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event type × weekday association (dow 1=Sunday..7, Spark's
    dayofweek convention; the oracle shifts DuckDB's 0-based dow)."""
    from event_pipeline_spark.session import read_table

    ev = read_table(spark, sf_dir, "events").select(
        "event_type", F.dayofweek("ts").cast("int").alias("dow")
    )
    return chi2_independence(
        ev, row_col="event_type", col_col="dow"
    ).orderBy("event_type", "dow")


QUERIES["stats_chi2_dow"] = q_stats_chi2
ORACLES["stats_chi2_dow"] = """
WITH cells AS (
  SELECT event_type AS rk,
         (date_part('dow', ts) + 1)::INT AS ck,
         count(*)::BIGINT AS o
  FROM events GROUP BY event_type, date_part('dow', ts)),
marg AS (
  SELECT rk, ck, o,
         sum(o) OVER (PARTITION BY rk)::DOUBLE AS rt,
         sum(o) OVER (PARTITION BY ck)::DOUBLE AS ct,
         sum(o) OVER ()::DOUBLE AS n
  FROM cells)
SELECT rk AS event_type, ck AS dow, o AS observed,
       round(rt * ct / n, 7) AS expected,
       CAST(round((o::DOUBLE - rt * ct / n)
                  * (o::DOUBLE - rt * ct / n)
                  / (rt * ct / n) * 1e7) AS BIGINT) AS chi_units
FROM marg ORDER BY event_type, dow
"""


def q_stats_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf exponent of the corpus: OLS slope of ln(freq) on ln(rank)
    over the word-frequency table — `corpusstats`' Zipf CURVE reduced
    to the one-number fit a corpus monitor tracks. Logs are quantized
    to 1e-7 integer units per row (the repo recipe), so the whole
    regression rides `corr_ols_by_group`'s exact-decimal sums; the
    frequency table is vocabulary-sized, never corpus-sized."""
    from event_pipeline_spark.operators.lm import whitespace_tokens
    from event_pipeline_spark.session import read_table
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents")
    freq = (
        docs.select(
            F.explode(whitespace_tokens(F.col("text"))).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    )
    w = Window.orderBy(F.desc("f"), F.asc("w"))
    pts = freq.select(
        F.lit("corpus").alias("g"),
        F.round(F.log(F.row_number().over(w).cast("double")) * 1e7)
        .cast("bigint")
        .alias("lr"),
        F.round(F.log(F.col("f").cast("double")) * 1e7)
        .cast("bigint")
        .alias("lf"),
    )
    return corr_ols_by_group(
        pts, group_col="g", x_col="lr", y_col="lf"
    ).select("g", "n", "r", "slope", "intercept")


QUERIES["stats_zipf_slope"] = q_stats_zipf_slope
ORACLES["stats_zipf_slope"] = """
WITH freq AS (
  SELECT w, count(*)::BIGINT AS f
  FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
        FROM documents)
  GROUP BY w),
pts AS (
  SELECT CAST(round(ln((row_number() OVER (ORDER BY f DESC, w))::DOUBLE)
              * 1e7) AS BIGINT) AS x,
         CAST(round(ln(f::DOUBLE) * 1e7) AS BIGINT) AS y
  FROM freq),
agg AS (
  SELECT count(*)::BIGINT AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
  FROM pts)
SELECT 'corpus' AS g, n,
       round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
             / sqrt((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                    * (n::DOUBLE * syy::DOUBLE
                       - sy::DOUBLE * sy::DOUBLE)), 7) AS r,
       round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
             / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE), 7)
         AS slope,
       round((sy::DOUBLE
              - ((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                 / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE))
                * sx::DOUBLE) / n::DOUBLE, 7) AS intercept
FROM agg
"""


# ---------------------------------------------------------------------------
# two-proportion z-test (A/B experiment readout)
# ---------------------------------------------------------------------------


def ab_test_proportions(
    df: DataFrame,
    *,
    unit_col: str,
    bucket_col: str,
    success_col: str,
) -> DataFrame:
    """One row: (n_a, conv_a, n_b, conv_b, rate_a, rate_b, z): the
    pooled two-proportion z-test — the experiment readout every
    event-analytics stack ships. Buckets must be exactly two values
    0/1 (hash-bucketed units, the industry assignment mechanism);
    ``success_col`` is a 0/1 per-unit outcome.

        z = (p_a − p_b) / sqrt( p̂(1−p̂) (1/n_a + 1/n_b) ),
        p̂ = (c_a + c_b) / (n_a + n_b)

    Exactness: unit counts and conversions are integers; rates and z
    are fixed-shape double expressions over them, rounded to 7 dp —
    no data-dependent folds. Plan: per-unit reduction (groupBy unit,
    max success) then a two-key aggregate; the final one-row pivot is
    a keyless aggregate (constant-size partials).
    """
    per_unit = df.groupBy(F.col(unit_col).alias("u")).agg(
        F.max(F.col(bucket_col)).cast("int").alias("b"),
        F.max(F.col(success_col)).cast("long").alias("s"),
    )
    agg = per_unit.agg(
        F.sum(F.when(F.col("b") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("b") == 0, F.col("s")).otherwise(0))
        .cast("bigint")
        .alias("conv_a"),
        F.sum(F.when(F.col("b") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
        F.sum(F.when(F.col("b") == 1, F.col("s")).otherwise(0))
        .cast("bigint")
        .alias("conv_b"),
    )
    na, ca = F.col("n_a").cast("double"), F.col("conv_a").cast("double")
    nb, cb = F.col("n_b").cast("double"), F.col("conv_b").cast("double")
    pa, pb = ca / na, cb / nb
    pool = (ca + cb) / (na + nb)
    se = F.sqrt(pool * (F.lit(1.0) - pool) * (1 / na + 1 / nb))
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0) & (se > 0)
    return agg.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.round(pa, 7).alias("rate_a"),
        F.round(pb, 7).alias("rate_b"),
        F.when(ok, F.round((pa - pb) / se, 7)).alias("z"),
    )


def q_stats_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does bucket assignment (user_id % 2 — the hash-bucket
    mechanism) move purchase conversion? Null by construction in the
    synthetic log, so z should hover near 0 — which is itself the
    A/A-test sanity a real experimentation stack must pass."""
    from event_pipeline_spark.session import read_table

    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        (F.col("user_id") % 2).cast("int").alias("bucket"),
        (F.col("event_type") == "purchase").cast("int").alias("success"),
    )
    return ab_test_proportions(
        ev, unit_col="user_id", bucket_col="bucket", success_col="success"
    )


QUERIES["stats_ab_test"] = q_stats_ab_test
ORACLES["stats_ab_test"] = """
WITH per_unit AS (
  SELECT user_id,
         max(user_id % 2)::INT AS b,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS s
  FROM events GROUP BY user_id),
agg AS (
  SELECT sum(CASE WHEN b = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
         sum(CASE WHEN b = 0 THEN s ELSE 0 END)::BIGINT AS conv_a,
         sum(CASE WHEN b = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b,
         sum(CASE WHEN b = 1 THEN s ELSE 0 END)::BIGINT AS conv_b
  FROM per_unit)
SELECT n_a, conv_a, n_b, conv_b,
       round(conv_a::DOUBLE / n_a::DOUBLE, 7) AS rate_a,
       round(conv_b::DOUBLE / n_b::DOUBLE, 7) AS rate_b,
       CASE WHEN n_a > 0 AND n_b > 0 AND
                 sqrt(((conv_a + conv_b)::DOUBLE / (n_a + n_b)::DOUBLE)
                      * (CAST(1 AS DOUBLE)
                         - (conv_a + conv_b)::DOUBLE
                           / (n_a + n_b)::DOUBLE)
                      * (1 / n_a::DOUBLE + 1 / n_b::DOUBLE)) > 0
            THEN round((conv_a::DOUBLE / n_a::DOUBLE
                        - conv_b::DOUBLE / n_b::DOUBLE)
                       / sqrt(((conv_a + conv_b)::DOUBLE
                               / (n_a + n_b)::DOUBLE)
                              * (CAST(1 AS DOUBLE)
                                 - (conv_a + conv_b)::DOUBLE
                                   / (n_a + n_b)::DOUBLE)
                              * (1 / n_a::DOUBLE + 1 / n_b::DOUBLE)), 7)
       END AS z
FROM agg
"""


# ---------------------------------------------------------------------------
# Welch's t-test (two-sample means)
# ---------------------------------------------------------------------------


def welch_t_test(
    df: DataFrame,
    *,
    bucket_col: str,
    value_col: str,
) -> DataFrame:
    """One row: (n_a, n_b, mean_a, mean_b, t, df): Welch's unequal-
    variance t-test between bucket 0 and bucket 1 — the MEANS
    complement of `ab_test_proportions` (revenue-per-user experiments
    where the outcome is an amount, not a conversion). Values must be
    pre-quantized integers (cents — the `rfm.py` recipe).

    Exactness: per-bucket (n, Σx, Σx²) run in DECIMAL(38,0) ≡ HUGEINT
    (the `corr_ols_by_group` contract); means, sample variances

        s² = (n·Σx² − (Σx)²) / (n·(n−1))

    t, and the Welch–Satterthwaite df are fixed-shape double
    expressions over those exact sums, rounded to 7 dp.
    """
    x = F.col(value_col).cast("bigint")
    dec = "decimal(38,0)"
    agg = df.groupBy(
        F.col(bucket_col).cast("int").alias("b")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(x.cast(dec)).alias("sx"),
        F.sum((x * x).cast(dec)).alias("sxx"),
    )
    a = agg.where(F.col("b") == 0).select(
        F.col("n").alias("n_a"),
        F.col("sx").alias("sx_a"),
        F.col("sxx").alias("sxx_a"),
    )
    b = agg.where(F.col("b") == 1).select(
        F.col("n").alias("n_b"),
        F.col("sx").alias("sx_b"),
        F.col("sxx").alias("sxx_b"),
    )
    j = a.crossJoin(b)  # two one-row sides

    def stats(n, sx, sxx):
        nd = F.col(n).cast("double")
        sxd = F.col(sx).cast("double")
        sxxd = F.col(sxx).cast("double")
        mean = sxd / nd
        var = (nd * sxxd - sxd * sxd) / (nd * (nd - F.lit(1.0)))
        return mean, var / nd  # (mean, s^2/n)

    ma, va = stats("n_a", "sx_a", "sxx_a")
    mb, vb = stats("n_b", "sx_b", "sxx_b")
    se2 = va + vb
    t = (ma - mb) / F.sqrt(se2)
    dfree = (se2 * se2) / (
        va * va / (F.col("n_a").cast("double") - 1)
        + vb * vb / (F.col("n_b").cast("double") - 1)
    )
    ok = (F.col("n_a") > 1) & (F.col("n_b") > 1) & (se2 > 0)
    return j.select(
        "n_a",
        "n_b",
        F.round(ma, 7).alias("mean_a"),
        F.round(mb, 7).alias("mean_b"),
        F.when(ok, F.round(t, 7)).alias("t"),
        F.when(ok, F.round(dfree, 7)).alias("df"),
    )


def q_stats_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does hash-bucket assignment (orderkey % 2) move order value?
    An A/A test on spend — t should hover near 0."""
    from event_pipeline_spark.session import read_table

    orders = read_table(spark, sf_dir, "orders").select(
        (F.col("o_orderkey") % 2).alias("bucket"),
        F.round(F.col("o_totalprice") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    return welch_t_test(orders, bucket_col="bucket", value_col="cents")


QUERIES["stats_welch_ttest"] = q_stats_welch
ORACLES["stats_welch_ttest"] = """
WITH base AS (
  SELECT (o_orderkey % 2)::INT AS b,
         CAST(round(o_totalprice * 100) AS BIGINT) AS x
  FROM orders),
agg AS (
  SELECT b, count(*)::BIGINT AS n, sum(x) AS sx, sum(x * x) AS sxx
  FROM base GROUP BY b),
j AS (
  SELECT a.n AS n_a, a.sx::DOUBLE AS sxa, a.sxx::DOUBLE AS sxxa,
         b.n AS n_b, b.sx::DOUBLE AS sxb, b.sxx::DOUBLE AS sxxb
  FROM (SELECT * FROM agg WHERE b = 0) a,
       (SELECT * FROM agg WHERE b = 1) b),
c AS (
  SELECT n_a, n_b, sxa / n_a::DOUBLE AS ma, sxb / n_b::DOUBLE AS mb,
         ((n_a::DOUBLE * sxxa - sxa * sxa)
          / (n_a::DOUBLE * (n_a::DOUBLE - CAST(1 AS DOUBLE))))
           / n_a::DOUBLE AS va,
         ((n_b::DOUBLE * sxxb - sxb * sxb)
          / (n_b::DOUBLE * (n_b::DOUBLE - CAST(1 AS DOUBLE))))
           / n_b::DOUBLE AS vb
  FROM j)
SELECT n_a, n_b, round(ma, 7) AS mean_a, round(mb, 7) AS mean_b,
       CASE WHEN n_a > 1 AND n_b > 1 AND (va + vb) > 0
            THEN round((ma - mb) / sqrt(va + vb), 7) END AS t,
       CASE WHEN n_a > 1 AND n_b > 1 AND (va + vb) > 0
            THEN round((va + vb) * (va + vb)
                       / (va * va / (n_a::DOUBLE - 1)
                          + vb * vb / (n_b::DOUBLE - 1)), 7) END AS df
FROM c
"""


# ---------------------------------------------------------------------------
# Robust outliers: per-key median / MAD and the Iglewicz–Hoaglin flag
#
# Mean/stddev outlier rules break exactly when you need them (the
# outliers inflate the stddev that is supposed to catch them); the
# robust baseline is the median absolute deviation. The modified
# z-score rule (Iglewicz & Hoaglin 1993): flag x when
# 0.6745·|x − median| / MAD > 3.5 — rearranged to the EXACT integer
# inequality 6745·|x − med| > 35000·MAD, so no transcendental or
# double arithmetic anywhere.
#
# Exactness: values quantize to integer cents (floor(v·100 + 0.5),
# the driver-weight recipe); the median is the LOWER median (the
# element at ascending rank (n+1)//2 — a deterministic rank pick both
# engines replay, no averaging of middle pairs); MAD is the lower
# median of |x − med|. Everything is BIGINT.
#
# Scale shape: two key-partitioned windows (rank for the median, rank
# for the MAD) and one aggregate — no global sort, no self-join; the
# windows reuse the same hash partitioning on the key.
# ---------------------------------------------------------------------------


def mad_outliers(
    df: DataFrame,
    *,
    key_col: str = "event_type",
    value_col: str = "value",
    order_col: str = "event_id",
) -> DataFrame:
    """(key, n, median_cents, mad_cents, n_outliers): per-key robust
    location/scale in integer cents and the count of modified-z
    outliers (6745·|x − med| > 35000·MAD). ``order_col`` totalizes the
    rank order among equal values — the picked VALUE is unaffected,
    but a total order keeps both engines deterministic."""
    from pyspark.sql import Window

    v = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    base = df.select(
        F.col(key_col).alias("k"), v.alias("v"), F.col(order_col).alias("o")
    )
    n_per = base.groupBy("k").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    wv = Window.partitionBy("k").orderBy("v", "o")
    # lower median: the element at ascending rank (n+1)//2
    med = (
        base.withColumn("rn", F.row_number().over(wv))
        .join(n_per, "k")
        .where(F.col("rn") == F.floor((F.col("n") + 1) / 2).cast("bigint"))
        .select("k", F.col("v").alias("med"))
    )
    d = base.join(med, "k").withColumn("d", F.abs(F.col("v") - F.col("med")))
    wd = Window.partitionBy("k").orderBy("d", "o")
    mad = (
        d.withColumn("rn", F.row_number().over(wd))
        .join(n_per, "k")
        .where(F.col("rn") == F.floor((F.col("n") + 1) / 2).cast("bigint"))
        .select("k", F.col("d").alias("mad"))
    )
    return (
        d.join(mad, "k")
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.first("med").alias("median_cents"),
            F.first("mad").alias("mad_cents"),
            F.sum(
                F.when(
                    F.lit(6745) * F.col("d") > F.lit(35000) * F.col("mad"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
        .select(
            F.col("k").alias(key_col),
            "n",
            "median_cents",
            "mad_cents",
            "n_outliers",
        )
    )


def q_stats_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-event-type outlier profile of the value column."""
    from event_pipeline_spark.session import read_table

    return mad_outliers(read_table(spark, sf_dir, "events")).orderBy(
        "event_type"
    )


QUERIES["stats_mad_outliers"] = q_stats_mad
ORACLES["stats_mad_outliers"] = """
WITH base AS (
  SELECT event_type AS k, floor(value * 100 + 0.5)::BIGINT AS v,
         event_id AS o
  FROM events),
np AS (SELECT k, count(*)::BIGINT AS n FROM base GROUP BY k),
med AS (
  SELECT k, v AS med FROM (
    SELECT b.k, b.v,
           row_number() OVER (PARTITION BY b.k ORDER BY b.v, b.o) AS rn,
           np.n
    FROM base b JOIN np USING (k))
  WHERE rn = (n + 1) // 2),
d AS (
  SELECT b.k, b.o, abs(b.v - m.med) AS d, m.med
  FROM base b JOIN med m USING (k)),
mad AS (
  SELECT k, d AS mad FROM (
    SELECT d.k, d.d,
           row_number() OVER (PARTITION BY d.k ORDER BY d.d, d.o) AS rn,
           np.n
    FROM d JOIN np USING (k))
  WHERE rn = (n + 1) // 2)
SELECT d.k AS event_type, count(*)::BIGINT AS n,
       min(d.med)::BIGINT AS median_cents,
       min(mad.mad)::BIGINT AS mad_cents,
       sum(CASE WHEN 6745 * d.d > 35000 * mad.mad THEN 1 ELSE 0 END)::BIGINT
         AS n_outliers
FROM d JOIN mad USING (k)
GROUP BY d.k ORDER BY event_type
"""


def percentiles_exact(
    df: DataFrame,
    *,
    key_col: str = "event_type",
    value_col: str = "value",
    order_col: str = "event_id",
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """(key, n, p50_cents, p90_cents, p99_cents): EXACT per-key order
    statistics in integer cents — the SLO profile (what did p99
    actually equal, not what a sketch thinks it equals). The q-th
    percentile is the element at ascending rank ceil(q·n) (the
    nearest-rank definition — a deterministic pick both engines
    replay, no interpolation of neighbors and therefore no double
    arithmetic at all).

    Scale shape: ONE key-partitioned rank window + one aggregate — the
    conditional-min-at-rank trick turns all requested quantiles into a
    single pass (no per-quantile self-join); no global sort. The
    approximate siblings (q37 / KLL) answer the same question at
    sketch cost when exactness isn't required.
    """
    from pyspark.sql import Window

    v = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    base = df.select(
        F.col(key_col).alias("k"), v.alias("v"), F.col(order_col).alias("o")
    )
    wv = Window.partitionBy("k").orderBy("v", "o")
    wn = Window.partitionBy("k")
    ranked = base.withColumn("rn", F.row_number().over(wv)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    for q in quantiles:
        # ceil(q*n) on integers: (n * q_num + q_den - 1) div q_den with
        # q as an exact rational over 100 — no double rank arithmetic
        q_num = round(q * 100)
        rank_q = F.floor(
            (F.col("n") * q_num + F.lit(99)) / F.lit(100)
        ).cast("bigint")
        aggs.append(
            F.min(F.when(F.col("rn") == rank_q, F.col("v")))
            .cast("bigint")
            .alias(f"p{q_num}_cents")
        )
    return (
        ranked.groupBy("k")
        .agg(*aggs)
        .select(F.col("k").alias(key_col), *[c for c in (
            "n", *[f"p{round(q * 100)}_cents" for q in quantiles])])
    )


def q_stats_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_pipeline_spark.session import read_table

    return percentiles_exact(read_table(spark, sf_dir, "events")).orderBy(
        "event_type"
    )


QUERIES["stats_percentiles_exact"] = q_stats_percentiles
ORACLES["stats_percentiles_exact"] = """
WITH base AS (
  SELECT event_type AS k, floor(value * 100 + 0.5)::BIGINT AS v,
         event_id AS o
  FROM events),
ranked AS (
  SELECT k, v,
         row_number() OVER (PARTITION BY k ORDER BY v, o) AS rn,
         count(*) OVER (PARTITION BY k) AS n
  FROM base)
SELECT k AS event_type, count(*)::BIGINT AS n,
       min(CASE WHEN rn = (n * 50 + 99) // 100 THEN v END)::BIGINT
         AS p50_cents,
       min(CASE WHEN rn = (n * 90 + 99) // 100 THEN v END)::BIGINT
         AS p90_cents,
       min(CASE WHEN rn = (n * 99 + 99) // 100 THEN v END)::BIGINT
         AS p99_cents
FROM ranked GROUP BY k ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Kolmogorov-Smirnov two-sample test (exact D statistic)
# ---------------------------------------------------------------------------


def ks_two_sample(
    df: DataFrame,
    *,
    key_col: str,
    sample_col: str,
    value_col: str,
) -> DataFrame:
    """(key, n_a, n_b, d_num, d, reject_05): per-key two-sample
    Kolmogorov-Smirnov test between sample 0 and sample 1 of
    ``sample_col`` — THE distribution-drift readout (did this key's
    value distribution change between snapshots / buckets?), sensitive
    to shape everywhere, not just the mean like ``welch_t_test``.

    Exactness: D = sup|ECDF_a − ECDF_b| is reached at an observed
    value, so pooling to distinct value cells and maximizing the
    INTEGER numerator

        d_num = max over cells of |cum_a·n_b − cum_b·n_a|

    gives D = d_num / (n_a·n_b) with all counts exact in
    DECIMAL(38,0) ≡ HUGEINT and ONE final division. The α=0.05
    decision is likewise integer-exact: D > 1.358·sqrt((n_a+n_b)
    /(n_a·n_b)) squares to 10⁶·d_num² > 1844164·(n_a+n_b)·n_a·n_b
    (1.358² = 1.844164 exactly). The squared form needs (n_a·n_b)²
    ≤ 10³² per key — beyond ~10¹⁶ pairs per key compare the rounded
    doubles instead.

    Scale shape: corpus rows collapse to |value domain| cells per key
    in one map-side-combinable aggregate; the cumulative window
    partitions by key (NO global sort); output is one row per key.
    Values must be pre-quantized integers (cents — the `welch_t_test`
    recipe)."""
    dec = "decimal(38,0)"
    s = F.col(sample_col).cast("int")
    cells = df.groupBy(
        F.col(key_col).alias("k"), F.col(value_col).cast("bigint").alias("v")
    ).agg(
        F.sum((s == 0).cast("long")).cast(dec).alias("ca"),
        F.sum((s == 1).cast("long")).cast(dec).alias("cb"),
    )
    from pyspark.sql import Window

    cum = (
        Window.partitionBy("k")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = Window.partitionBy("k")
    stepped = cells.select(
        "k",
        F.sum("ca").over(cum).alias("cum_a"),
        F.sum("cb").over(cum).alias("cum_b"),
        F.sum("ca").over(tot).alias("n_a"),
        F.sum("cb").over(tot).alias("n_b"),
    )
    d_num = F.abs(
        F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a")
    )
    agg = stepped.groupBy("k").agg(
        F.max(d_num).cast(dec).alias("d_num"),
        F.max("n_a").cast(dec).alias("na"),
        F.max("n_b").cast(dec).alias("nb"),
    )
    ok = (F.col("na") > 0) & (F.col("nb") > 0)
    d = F.col("d_num").cast("double") / (
        F.col("na").cast("double") * F.col("nb").cast("double")
    )
    lhs = F.lit(10**6).cast(dec) * F.col("d_num") * F.col("d_num")
    rhs = (
        F.lit(1844164).cast(dec)
        * (F.col("na") + F.col("nb"))
        * F.col("na")
        * F.col("nb")
    )
    return agg.select(
        F.col("k").alias(key_col),
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.col("d_num").cast("string").alias("d_num"),
        F.when(ok, d).alias("d"),
        F.when(ok, lhs > rhs).alias("reject_05"),
    )


def q_stats_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/A drift check: per event type, does the value distribution
    differ between even and odd user ids? (It should not — hash
    assignment — so rejects flag real skew in the generator.)"""
    from event_pipeline_spark.session import read_table

    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        (F.col("user_id") % 2).alias("s"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias(
            "cents"
        ),
    )
    return ks_two_sample(
        ev, key_col="event_type", sample_col="s", value_col="cents"
    ).orderBy("event_type")


QUERIES["stats_ks_two_sample"] = q_stats_ks
ORACLES["stats_ks_two_sample"] = """
WITH base AS (
  SELECT event_type AS k, (user_id % 2)::INT AS s,
         floor(value * 100 + 0.5)::BIGINT AS v
  FROM events),
cells AS (
  SELECT k, v,
         sum(CASE WHEN s = 0 THEN 1 ELSE 0 END)::HUGEINT AS ca,
         sum(CASE WHEN s = 1 THEN 1 ELSE 0 END)::HUGEINT AS cb
  FROM base GROUP BY k, v),
stepped AS (
  SELECT k,
         sum(ca) OVER (PARTITION BY k ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS cum_a,
         sum(cb) OVER (PARTITION BY k ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS cum_b,
         sum(ca) OVER (PARTITION BY k) AS n_a,
         sum(cb) OVER (PARTITION BY k) AS n_b
  FROM cells),
agg AS (
  SELECT k, max(abs(cum_a * n_b - cum_b * n_a))::HUGEINT AS d_num,
         max(n_a)::HUGEINT AS na, max(n_b)::HUGEINT AS nb
  FROM stepped GROUP BY k)
SELECT k AS event_type, na::BIGINT AS n_a, nb::BIGINT AS n_b,
       d_num::VARCHAR AS d_num,
       CASE WHEN na > 0 AND nb > 0
            THEN d_num::DOUBLE / (na::DOUBLE * nb::DOUBLE) END AS d,
       CASE WHEN na > 0 AND nb > 0
            THEN 1000000::HUGEINT * d_num * d_num
                 > 1844164::HUGEINT * (na + nb) * na * nb END AS reject_05
FROM agg ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# population stability index (binned distribution drift)
# ---------------------------------------------------------------------------

PSI_BINS = 10


def psi_bins(
    df: DataFrame,
    *,
    snapshot_col: str,
    value_col: str,
    lo: int,
    hi: int,
    n_bins: int = PSI_BINS,
) -> DataFrame:
    """(bin, bin_lo, n_expected, n_actual, p_expected, p_actual, psi):
    per-bin Population Stability Index between snapshot 0 (expected)
    and snapshot 1 (actual) of ``snapshot_col`` — the fixed-bin drift
    monitor scorecards run between model-training and serving data
    (PSI > 0.2 on any feature is the classic retrain trigger). The
    KS test (``ks_two_sample``) answers "did it drift?" with a sharp
    decision; PSI localizes WHERE mass moved, bin by bin.

    Binning is equal-width over the CALLER-FIXED integer range
    [lo, hi) — fixed edges (not quantiles) so two runs' bins are
    comparable and the whole computation stays integer-exact;
    out-of-range values clamp into the edge bins. Every bin gets
    add-one smoothing, p = (n+1)/(N+n_bins), so empty bins are
    well-defined (the standard monitoring convention); psi_i =
    (p_a − p_e)·ln(p_a/p_e) is a fixed-shape double expression over
    exact integers — the ln argument is ONE division of exact integer
    products — rounded to 7 dp per bin BEFORE any consumer sums
    (the repo's per-term log contract). All-bin rows always emit
    (a generated bin spine, not the observed bins), so total PSI is a
    plain SUM over the result.

    Scale shape: corpus rows collapse to ≤ 2·n_bins cells in one
    map-side-combinable aggregate; the spine join is n_bins rows."""
    from pyspark.sql import Window

    spark = df.sparkSession
    width_num = hi - lo
    # Clamp FIRST, then pure integer division (`div`, truncating — equal
    # to floor because the clamped numerator is non-negative). The
    # earlier double-divide-then-floor form agreed with the integer
    # oracle only while (v - lo) * n_bins stayed within 2^53; this form
    # is exact for the full BIGINT range of the product.
    v = F.least(
        F.greatest(F.col(value_col).cast("bigint"), F.lit(lo)),
        F.lit(hi - 1),
    )
    b = F.expr(
        f"CAST(((vclamp - {lo}) * {n_bins}) DIV {width_num} AS INT)"
    )
    s = F.col(snapshot_col).cast("int")
    cells = (
        df.select(v.alias("vclamp"), s.alias("snap"))
        .groupBy(b.alias("bin"))
        .agg(
            F.sum((F.col("snap") == 0).cast("long"))
            .cast("bigint")
            .alias("ce"),
            F.sum((F.col("snap") == 1).cast("long"))
            .cast("bigint")
            .alias("ca"),
        )
    )
    spine = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    full = (
        spine.join(cells, "bin", "left")
        .select(
            "bin",
            F.coalesce("ce", F.lit(0)).cast("bigint").alias("n_expected"),
            F.coalesce("ca", F.lit(0)).cast("bigint").alias("n_actual"),
        )
    )
    tot = Window.partitionBy()
    ne = F.sum("n_expected").over(tot) + F.lit(n_bins)
    na = F.sum("n_actual").over(tot) + F.lit(n_bins)
    pe = (F.col("n_expected") + 1).cast("double") / ne.cast("double")
    pa = (F.col("n_actual") + 1).cast("double") / na.cast("double")
    ratio = ((F.col("n_actual") + 1) * ne).cast("double") / (
        (F.col("n_expected") + 1) * na
    ).cast("double")
    return full.select(
        "bin",
        F.expr(
            f"CAST({lo} + (CAST(bin AS BIGINT) * {width_num})"
            f" DIV {n_bins} AS BIGINT)"
        ).alias("bin_lo"),
        "n_expected",
        "n_actual",
        F.round(pe, 7).alias("p_expected"),
        F.round(pa, 7).alias("p_actual"),
        F.round((pa - pe) * F.log(ratio), 7).alias("psi"),
    )


def q_stats_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekend-vs-weekday drift of the event value distribution in
    cents over [0, 50000) — the fixed-bin scorecard PSI."""
    from event_pipeline_spark.session import read_table

    ev = read_table(spark, sf_dir, "events").select(
        F.dayofweek(F.col("ts").cast("timestamp"))
        .isin(1, 7)
        .cast("int")
        .alias("s"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias(
            "cents"
        ),
    )
    return psi_bins(
        ev, snapshot_col="s", value_col="cents", lo=0, hi=50_000
    ).orderBy("bin")


QUERIES["stats_psi_bins"] = q_stats_psi
ORACLES["stats_psi_bins"] = """
WITH base AS (
  SELECT CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS s,
         floor(value * 100 + 0.5)::BIGINT AS v
  FROM events),
cells AS (
  SELECT (((least(greatest(v, 0), 49999) - 0) * 10) // 50000)::INT AS bin,
         sum(CASE WHEN s = 0 THEN 1 ELSE 0 END)::BIGINT AS ce,
         sum(CASE WHEN s = 1 THEN 1 ELSE 0 END)::BIGINT AS ca
  FROM base GROUP BY 1),
spine AS (SELECT unnest(generate_series(0, 9))::INT AS bin),
full_bins AS (
  SELECT spine.bin,
         coalesce(ce, 0)::BIGINT AS n_expected,
         coalesce(ca, 0)::BIGINT AS n_actual
  FROM spine LEFT JOIN cells ON spine.bin = cells.bin),
tot AS (
  SELECT bin, n_expected, n_actual,
         sum(n_expected) OVER () + 10 AS ne,
         sum(n_actual) OVER () + 10 AS na
  FROM full_bins)
SELECT bin, (0 + bin::BIGINT * 50000 // 10)::BIGINT AS bin_lo,
       n_expected, n_actual,
       round((n_expected + 1)::DOUBLE / ne::DOUBLE, 7) AS p_expected,
       round((n_actual + 1)::DOUBLE / na::DOUBLE, 7) AS p_actual,
       round(((n_actual + 1)::DOUBLE / na::DOUBLE
              - (n_expected + 1)::DOUBLE / ne::DOUBLE)
             * ln(((n_actual + 1) * ne)::DOUBLE
                  / ((n_expected + 1) * na)::DOUBLE), 7) AS psi
FROM tot ORDER BY bin
"""


# ---------------------------------------------------------------------------
# difference-in-differences estimator
# ---------------------------------------------------------------------------


def did_estimate(
    df: DataFrame,
    *,
    group_col: str,
    period_col: str,
    value_col: str,
) -> DataFrame:
    """One row: per-cell means (m00, m01, m10, m11 — group×period) and
    the difference-in-differences estimate (m11 − m10) − (m01 − m00)
    — the workhorse quasi-experimental estimator when treatment
    wasn't randomized (a launch hit one segment; what would its trend
    have been without it?). Completes the experimentation shelf
    beside ``ab_test_proportions`` (randomized rates) and
    ``welch_t_test`` (randomized means).

    Exactness: per-cell (n, Σx) in DECIMAL(38,0); each mean is ONE
    exact division; the DiD combines the four doubles in a fixed
    shape, rounded 7dp. One 4-cell aggregate, a keyless pivot row."""
    dec = "decimal(38,0)"
    g = F.col(group_col).cast("int")
    p = F.col(period_col).cast("int")
    x = F.col(value_col).cast("bigint").cast(dec)
    agg = df.groupBy(g.alias("g"), p.alias("p")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(x).alias("s"),
    )

    def cell(gv: int, pv: int, what: str):
        c = (F.col("g") == gv) & (F.col("p") == pv)
        if what == "n":
            return F.sum(F.when(c, F.col("n"))).cast("bigint")
        return F.sum(F.when(c, F.col("s"))).cast(dec)

    row = agg.agg(
        *[
            cell(gv, pv, w).alias(f"{w}{gv}{pv}")
            for gv in (0, 1)
            for pv in (0, 1)
            for w in ("n", "s")
        ]
    )
    means = {
        f"m{gv}{pv}": F.col(f"s{gv}{pv}").cast("double")
        / F.col(f"n{gv}{pv}").cast("double")
        for gv in (0, 1)
        for pv in (0, 1)
    }
    did = (means["m11"] - means["m10"]) - (means["m01"] - means["m00"])
    ok = (
        (F.col("n00") > 0) & (F.col("n01") > 0)
        & (F.col("n10") > 0) & (F.col("n11") > 0)
    )
    return row.select(
        *[F.col(f"n{gv}{pv}") for gv in (0, 1) for pv in (0, 1)],
        *[
            F.round(means[f"m{gv}{pv}"], 7).alias(f"m{gv}{pv}")
            for gv in (0, 1)
            for pv in (0, 1)
        ],
        F.when(ok, F.round(did, 7)).alias("did"),
    )


def q_stats_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DiD of order value (cents): 'treated' = odd customer keys,
    'post' = 1996+ order dates — an A/A-shaped placebo on this
    corpus, so DiD should hover near zero."""
    from event_pipeline_spark.session import read_table

    orders = read_table(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % 2).alias("grp"),
        (F.year("o_orderdate") >= 1996).cast("int").alias("period"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    return did_estimate(
        orders, group_col="grp", period_col="period", value_col="cents"
    )


QUERIES["stats_did"] = q_stats_did
ORACLES["stats_did"] = """
WITH base AS (
  SELECT (o_custkey % 2)::INT AS g,
         CASE WHEN year(o_orderdate) >= 1996 THEN 1 ELSE 0 END AS p,
         CAST(round(o_totalprice * 100) AS BIGINT) AS x
  FROM orders),
agg AS (
  SELECT g, p, count(*)::BIGINT AS n, sum(x::HUGEINT) AS s
  FROM base GROUP BY g, p),
row_ AS (
  SELECT
    sum(CASE WHEN g=0 AND p=0 THEN n END)::BIGINT AS n00,
    sum(CASE WHEN g=0 AND p=0 THEN s END)::HUGEINT AS s00,
    sum(CASE WHEN g=0 AND p=1 THEN n END)::BIGINT AS n01,
    sum(CASE WHEN g=0 AND p=1 THEN s END)::HUGEINT AS s01,
    sum(CASE WHEN g=1 AND p=0 THEN n END)::BIGINT AS n10,
    sum(CASE WHEN g=1 AND p=0 THEN s END)::HUGEINT AS s10,
    sum(CASE WHEN g=1 AND p=1 THEN n END)::BIGINT AS n11,
    sum(CASE WHEN g=1 AND p=1 THEN s END)::HUGEINT AS s11
  FROM agg)
SELECT n00, n01, n10, n11,
       round(s00::DOUBLE / n00::DOUBLE, 7) AS m00,
       round(s01::DOUBLE / n01::DOUBLE, 7) AS m01,
       round(s10::DOUBLE / n10::DOUBLE, 7) AS m10,
       round(s11::DOUBLE / n11::DOUBLE, 7) AS m11,
       CASE WHEN n00 > 0 AND n01 > 0 AND n10 > 0 AND n11 > 0 THEN
         round((s11::DOUBLE / n11::DOUBLE - s10::DOUBLE / n10::DOUBLE)
               - (s01::DOUBLE / n01::DOUBLE - s00::DOUBLE / n00::DOUBLE),
               7)
       END AS did
FROM row_
"""


# ---------------------------------------------------------------------------
# CUPED variance reduction
# ---------------------------------------------------------------------------


def cuped_adjusted_lift(
    df: DataFrame,
    *,
    bucket_col: str,
    pre_col: str,
    value_col: str,
) -> DataFrame:
    """One row: (theta, mean_a, mean_b, adj_a, adj_b, lift, adj_lift)
    — CUPED (Deng et al. 2013): shrink an experiment metric's variance
    with a pre-period covariate, Y' = Y − θ·(X − X̄), θ = cov(X,Y)/
    var(X) pooled across buckets. The industry-standard sensitivity
    boost for the same A/B readout ``welch_t_test`` grades — weeks of
    extra traffic for free when pre-period behavior predicts the
    metric. Completes the experimentation shelf (randomized rates →
    ``ab_test_proportions``, randomized means → ``welch_t_test``,
    unrandomized → ``did_estimate``, variance-reduced → here).

    Exactness: per-bucket (n, Σx, Σy) and pooled (Σxx, Σxy) in
    DECIMAL(38,0); θ's numerator n·Σxy − Σx·Σy and denominator
    n·Σxx − (Σx)² are exact before ONE division; the adjusted means
    are fixed-shape doubles rounded 7dp. Inputs are integer units
    (cents). One 2-cell aggregate + one pooled row."""
    dec = "decimal(38,0)"
    x = F.col(pre_col).cast("bigint").cast(dec)
    y = F.col(value_col).cast("bigint").cast(dec)
    b = F.col(bucket_col).cast("int")
    per = df.groupBy(b.alias("b")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
    )
    pooled = df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
    )

    def side(bv: int, col: str):
        return F.sum(F.when(F.col("b") == bv, F.col(col)))

    cells = per.agg(
        side(0, "n").cast("bigint").alias("n_a"),
        side(0, "sx").cast(dec).alias("sx_a"),
        side(0, "sy").cast(dec).alias("sy_a"),
        side(1, "n").cast("bigint").alias("n_b"),
        side(1, "sx").cast(dec).alias("sx_b"),
        side(1, "sy").cast(dec).alias("sy_b"),
    )
    j = cells.crossJoin(F.broadcast(pooled))
    nd = F.col("n").cast("double")
    th_num = (
        F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    ).cast("double")
    th_den = (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    ).cast("double")
    theta = th_num / th_den
    gx = F.col("sx").cast("double") / nd

    def means(side_: str):
        n_ = F.col(f"n_{side_}").cast("double")
        my = F.col(f"sy_{side_}").cast("double") / n_
        mx = F.col(f"sx_{side_}").cast("double") / n_
        return my, my - theta * (mx - gx)

    my_a, adj_a = means("a")
    my_b, adj_b = means("b")
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0) & (th_den > 0)
    return j.select(
        F.col("n_a"),
        F.col("n_b"),
        F.when(ok, F.round(theta, 7)).alias("theta"),
        F.round(my_a, 7).alias("mean_a"),
        F.round(my_b, 7).alias("mean_b"),
        F.when(ok, F.round(adj_a, 7)).alias("adj_a"),
        F.when(ok, F.round(adj_b, 7)).alias("adj_b"),
        F.round(my_b - my_a, 7).alias("lift"),
        F.when(ok, F.round(adj_b - adj_a, 7)).alias("adj_lift"),
    )


def q_stats_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED over per-customer spend: pre-period (< 1996) spend as the
    covariate for post-period spend, hash buckets by customer key."""
    from event_pipeline_spark.session import read_table

    orders = read_table(spark, sf_dir, "orders")
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
    ).select(
        (F.col("o_custkey") % 2).alias("bucket"),
        "pre_cents",
        "post_cents",
    )
    return cuped_adjusted_lift(
        per_cust,
        bucket_col="bucket",
        pre_col="pre_cents",
        value_col="post_cents",
    )


QUERIES["stats_cuped"] = q_stats_cuped
ORACLES["stats_cuped"] = """
WITH per_cust AS (
  SELECT (o_custkey % 2)::INT AS b,
         sum(CASE WHEN year(o_orderdate) < 1996
                  THEN CAST(round(o_totalprice * 100) AS BIGINT)
                  ELSE 0 END)::HUGEINT AS x,
         sum(CASE WHEN year(o_orderdate) >= 1996
                  THEN CAST(round(o_totalprice * 100) AS BIGINT)
                  ELSE 0 END)::HUGEINT AS y
  FROM orders GROUP BY o_custkey),
pooled AS (
  SELECT count(*)::BIGINT AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(x * y) AS sxy
  FROM per_cust),
cells AS (
  SELECT sum(CASE WHEN b = 0 THEN 1 END)::BIGINT AS n_a,
         sum(CASE WHEN b = 0 THEN x END)::HUGEINT AS sx_a,
         sum(CASE WHEN b = 0 THEN y END)::HUGEINT AS sy_a,
         sum(CASE WHEN b = 1 THEN 1 END)::BIGINT AS n_b,
         sum(CASE WHEN b = 1 THEN x END)::HUGEINT AS sx_b,
         sum(CASE WHEN b = 1 THEN y END)::HUGEINT AS sy_b
  FROM per_cust),
calc AS (
  SELECT c.*, p.n, p.sx, p.sy,
         (p.n * p.sxy - p.sx * p.sy)::DOUBLE AS th_num,
         (p.n * p.sxx - p.sx * p.sx)::DOUBLE AS th_den
  FROM cells c, pooled p)
SELECT n_a, n_b,
       CASE WHEN n_a > 0 AND n_b > 0 AND th_den > 0
            THEN round(th_num / th_den, 7) END AS theta,
       round(sy_a::DOUBLE / n_a::DOUBLE, 7) AS mean_a,
       round(sy_b::DOUBLE / n_b::DOUBLE, 7) AS mean_b,
       CASE WHEN n_a > 0 AND n_b > 0 AND th_den > 0 THEN
         round(sy_a::DOUBLE / n_a::DOUBLE
               - (th_num / th_den)
                 * (sx_a::DOUBLE / n_a::DOUBLE
                    - sx::DOUBLE / n::DOUBLE), 7) END AS adj_a,
       CASE WHEN n_a > 0 AND n_b > 0 AND th_den > 0 THEN
         round(sy_b::DOUBLE / n_b::DOUBLE
               - (th_num / th_den)
                 * (sx_b::DOUBLE / n_b::DOUBLE
                    - sx::DOUBLE / n::DOUBLE), 7) END AS adj_b,
       round(sy_b::DOUBLE / n_b::DOUBLE
             - sy_a::DOUBLE / n_a::DOUBLE, 7) AS lift,
       CASE WHEN n_a > 0 AND n_b > 0 AND th_den > 0 THEN
         round((sy_b::DOUBLE / n_b::DOUBLE
                - (th_num / th_den)
                  * (sx_b::DOUBLE / n_b::DOUBLE - sx::DOUBLE / n::DOUBLE))
               - (sy_a::DOUBLE / n_a::DOUBLE
                  - (th_num / th_den)
                    * (sx_a::DOUBLE / n_a::DOUBLE
                       - sx::DOUBLE / n::DOUBLE)), 7) END AS adj_lift
FROM calc
"""


# ---------------------------------------------------------------------------
# Wilson score intervals for proportions
# ---------------------------------------------------------------------------

_WILSON_Z = 1.959964  # two-sided 95%, rounded to 6dp (a fixed literal)


def wilson_intervals(
    df: DataFrame,
    *,
    key_col: str,
    label_col: str,
    z: float = _WILSON_Z,
) -> DataFrame:
    """(key, n, n_pos, rate, lo, hi): per-key proportion with the
    Wilson score interval — the right small-n confidence bound for
    conversion/defect rates (the naive Wald interval collapses to
    width 0 at p̂ ∈ {0, 1}, exactly where monitoring needs the bound
    most; Wilson stays honest, pinned by a test).

    Exactness: (n, n_pos) are exact BIGINTs; with z a fixed literal,
    lo/hi are fixed-shape double expressions (one sqrt each) over the
    exact counts, rounded 7dp. One map-side-combinable aggregate."""
    y = F.col(label_col).cast("long")
    per = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(y).cast("bigint").alias("n_pos"),
    )
    n = F.col("n").cast("double")
    p = F.col("n_pos").cast("double") / n
    z2 = float(z) * float(z)
    denom = n + F.lit(z2)
    center = (F.col("n_pos").cast("double") + F.lit(z2 / 2)) / denom
    half = (
        F.lit(float(z))
        * F.sqrt(
            (p * (F.lit(1.0) - p) + F.lit(z2) / (F.lit(4.0) * n)) * n
        )
        / denom
    )
    return per.select(
        F.col("key").alias(key_col),
        "n",
        "n_pos",
        F.round(p, 7).alias("rate"),
        F.round(center - half, 7).alias("lo"),
        F.round(center + half, 7).alias("hi"),
    )


def q_stats_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type purchase-value-over-400 rate with Wilson 95%
    bounds."""
    from event_pipeline_spark.session import read_table

    ev = read_table(spark, sf_dir, "events").select(
        "event_type", (F.col("value") > 400).cast("int").alias("label")
    )
    return wilson_intervals(
        ev, key_col="event_type", label_col="label"
    ).orderBy("event_type")


QUERIES["stats_wilson"] = q_stats_wilson
ORACLES["stats_wilson"] = f"""
WITH per AS (
  SELECT event_type AS key, count(*)::BIGINT AS n,
         sum(CASE WHEN value > 400 THEN 1 ELSE 0 END)::BIGINT AS n_pos
  FROM events GROUP BY event_type)
SELECT key AS event_type, n, n_pos,
       round(n_pos::DOUBLE / n::DOUBLE, 7) AS rate,
       round((n_pos::DOUBLE + {_WILSON_Z**2 / 2})
               / (n::DOUBLE + {_WILSON_Z**2})
             - {_WILSON_Z} * sqrt((n_pos::DOUBLE / n::DOUBLE
                                   * (1.0 - n_pos::DOUBLE / n::DOUBLE)
                                   + {_WILSON_Z**2} / (4.0 * n::DOUBLE))
                                  * n::DOUBLE)
               / (n::DOUBLE + {_WILSON_Z**2}), 7) AS lo,
       round((n_pos::DOUBLE + {_WILSON_Z**2 / 2})
               / (n::DOUBLE + {_WILSON_Z**2})
             + {_WILSON_Z} * sqrt((n_pos::DOUBLE / n::DOUBLE
                                   * (1.0 - n_pos::DOUBLE / n::DOUBLE)
                                   + {_WILSON_Z**2} / (4.0 * n::DOUBLE))
                                  * n::DOUBLE)
               / (n::DOUBLE + {_WILSON_Z**2}), 7) AS hi
FROM per ORDER BY event_type
"""


def histogram_equidepth(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str,
    id_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """(group, bucket, n, lo, hi): the equi-DEPTH histogram — buckets
    hold equal row counts and the EDGES move with the data (the shape
    ANALYZE-style optimizers and drift monitors persist; the equi-WIDTH
    dual is ``psi_bins`` above). Bucket of rank r (1-based, ties broken
    by ``id_col``) is (r−1)·n_buckets DIV N — the ``gain_deciles``
    integer tiling, exact for the full BIGINT product; lo/hi are the
    bucket's min/max values, n its exact count.

    Scale shape: ONE rank window partitioned by group (no global
    sort), then a map-side-combinable aggregate to ≤ n_buckets cells
    per group."""
    from pyspark.sql import Window

    rn = F.row_number().over(
        Window.partitionBy(F.col(group_col)).orderBy(
            F.col(value_col), F.col(id_col)
        )
    )
    n = F.count(F.lit(1)).over(Window.partitionBy(F.col(group_col)))
    tiled = df.select(
        F.col(group_col).alias("g"),
        F.col(value_col).alias("v"),
        (rn - F.lit(1)).cast("bigint").alias("rank0"),
        n.cast("bigint").alias("nrows"),
    ).select(
        "g",
        "v",
        F.expr(f"CAST((rank0 * {n_buckets}) DIV nrows AS INT)").alias(
            "bucket"
        ),
    )
    return tiled.groupBy("g", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    )


def q_stats_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth deciles of order totalprice cents per priority."""
    from event_pipeline_spark.session import read_table

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
        "o_orderkey",
    )
    return (
        histogram_equidepth(
            orders,
            group_col="o_orderpriority",
            value_col="cents",
            id_col="o_orderkey",
        )
        .select(
            F.col("g").alias("o_orderpriority"),
            "bucket",
            "n",
            F.col("lo").cast("bigint").alias("lo"),
            F.col("hi").cast("bigint").alias("hi"),
        )
        .orderBy("o_orderpriority", "bucket")
    )


QUERIES["stats_histogram_equidepth"] = q_stats_histogram
ORACLES["stats_histogram_equidepth"] = """
WITH base AS (
  SELECT o_orderpriority AS g,
         floor(o_totalprice * 100 + 0.5)::BIGINT AS v,
         o_orderkey AS id
  FROM orders),
tiled AS (
  SELECT g, v,
         ((row_number() OVER (PARTITION BY g ORDER BY v, id) - 1) * 10
          // count(*) OVER (PARTITION BY g))::INT AS bucket
  FROM base)
SELECT g AS o_orderpriority, bucket, count(*)::BIGINT AS n,
       min(v)::BIGINT AS lo, max(v)::BIGINT AS hi
FROM tiled GROUP BY g, bucket
ORDER BY o_orderpriority, bucket
"""


# ---------------------------------------------------------------------------
# Poisson bootstrap confidence interval (the at-scale bootstrap)
# ---------------------------------------------------------------------------

#: Poisson(1) inverse-CDF thresholds scaled to the 2^61 uniform-draw
#: space (see ``bootstrap_mean_ci``'s double-hash scheme — 61 bits
#: keeps every intermediate in a SIGNED LONG under ANSI mode): a
#: uniform draw u < 2^61 gets weight w = k iff T_{k-1} <= u < T_k
#: (w = 8 past the last threshold — P(w > 8) ~ 1e-6, tail mass folded
#: into 8). Python-computed once; BOTH engines consume the SAME
#: integer literals (the ndcg DISCOUNT_UNITS discipline), so every
#: weight draw is engine-identical.
POISSON1_DRAW_BITS = 61


def _poisson1_thresholds() -> list[int]:
    import math

    cum, term, out = 0.0, math.exp(-1.0), []
    for k in range(8):
        cum += term
        out.append(int(cum * (1 << POISSON1_DRAW_BITS)))
        term /= k + 1
    return out


POISSON1_THRESHOLDS = _poisson1_thresholds()


def _poisson1_weight(u: Column) -> Column:
    """Map a uniform draw on [0, 2^61) (LONG) to a Poisson(1) weight
    via the shared threshold ladder — native long comparisons only."""
    w: Column = F.lit(8)
    for k in range(len(POISSON1_THRESHOLDS) - 1, -1, -1):
        w = F.when(u < F.lit(POISSON1_THRESHOLDS[k]), F.lit(k)).otherwise(w)
    return w


def bootstrap_mean_ci(
    df: DataFrame,
    *,
    key_col: str,
    id_col: str,
    value_col: str,
    replicates: int = 100,
    alpha_pct: int = 5,
) -> DataFrame:
    """(key, n, mean, boot_lo, boot_hi, n_replicates): percentile
    POISSON bootstrap CI for each key's mean — the bootstrap that
    works at cluster scale (Chamandy et al. 2012 "Estimating
    Uncertainty for Massive Data Streams"): classic resampling needs n
    draws WITH replacement per replicate (a shuffle per replicate);
    the Poisson approximation gives every row an independent
    Poisson(1) weight per replicate, so ALL ``replicates`` resamples
    run in ONE pass of map-side-combinable sums.

    Exactness: ONE md5 per row, split into its 64-bit halves
    (little-endian, == DuckDB ``md5_number_lower``/``_upper``), then
    per-replicate draws by Kirsch–Mitzenmacher double hashing kept
    entirely in SIGNED-LONG-safe ranges (ANSI mode forbids
    wraparound):  g_b = (h_lo mod 2^62) + b·(h_hi mod 2^55, forced
    odd)  never exceeds 2^63, and  u_b = g_b mod 2^61  is EXACTLY
    uniform (h_lo mod 2^62 is uniform and independent of the stride,
    and 2^61 | 2^62). u_b meets the shared integer threshold ladder
    (``POISSON1_THRESHOLDS``) in native long comparisons —
    engine-identical draws with two decimal ops per ROW instead of an
    md5 or decimal mod per (row, replicate) (measured at sf0.1:
    per-pair md5 46.5s → decimal double-hash 70.7s → this long form
    ~6s cold / sub-second steady-state). Replicate means are ONE
    division of exact integers (bit-identical doubles); the CI picks
    fixed order-statistic ranks ceil(B·α/2) and B+1-that under the
    (mean, b) total order.

    Values must be pre-quantized integers (cents — the ``rfm.py``
    recipe). Keys small enough for an all-zero-weight replicate
    (P = e^-n per replicate; ~4e-18 at n = 40) are out of contract —
    such replicates drop, shifting the upper rank.

    Scale shape: the corpus fans out via ``explode(sequence(0, B-1))``
    — NOT a broadcast-spine cross join: a BroadcastNestedLoopJoin
    breaks whole-stage codegen, turning every downstream draw
    expression interpreted (measured 43.7s vs 6.0s for the identical
    arithmetic at sf0.1) — into per-(key, replicate) partial sums,
    map-side combinable, cells = |keys|·B; the rank window partitions
    by key. Σw·x runs in DECIMAL(38,0) (the ``corr_ols_by_group``
    contract)."""
    from pyspark.sql import Window

    if not 0 < alpha_pct < 100:
        raise ValueError("alpha_pct must be in (0, 100)")
    if not 1 <= replicates <= 128:
        # the signed-long-safety invariant g_b = (h_lo mod 2^62) +
        # b*(h_hi mod 2^55) < 2^63 holds only for b <= 127: the max
        # stride term is 127*(2^55-1) < 2^62, so the sum stays under
        # 2^63. b = 128 would reach 2^62 + 2^62 = 2^63 and overflow
        # BIGINT under ANSI mode at runtime.
        raise ValueError(
            "replicates must be in [1, 128] (the signed-long "
            "double-hash draw g_b = h_lo%2^62 + b*(h_hi%2^55) "
            "overflows BIGINT for b >= 128)"
        )
    lo_rank = -(-replicates * alpha_pct // 200)  # ceil(B * alpha/2)
    hi_rank = replicates + 1 - lo_rank
    x = F.col(value_col).cast("bigint")
    hhex = F.md5(F.col(id_col).cast("string"))
    lo = F.conv(
        F.concat(*[F.substring(hhex, 33 - 2 * k, 2) for k in range(1, 9)]),
        16,
        10,
    ).cast("decimal(20,0)")
    hi = F.conv(
        F.concat(*[F.substring(hhex, 17 - 2 * k, 2) for k in range(1, 9)]),
        16,
        10,
    ).cast("decimal(20,0)")
    rows = df.select(
        F.col(key_col).alias("k"),
        x.alias("x"),
        (lo % F.lit(str(1 << 62)).cast("decimal(20,0)"))
        .cast("bigint")
        .alias("h_lo"),
        # mod 2^55 bounds b*stride under 2^62; forced odd so the
        # double-hash stride never degenerates
        (hi % F.lit(str(1 << 55)).cast("decimal(20,0)"))
        .cast("bigint")
        .alias("h_hi_raw"),
    ).select(
        "k",
        "x",
        "h_lo",
        (F.col("h_hi_raw") - F.col("h_hi_raw") % 2 + 1).alias("h_hi"),
    )
    u = (
        F.col("h_lo") + F.col("b").cast("bigint") * F.col("h_hi")
    ) % F.lit(1 << POISSON1_DRAW_BITS)
    cells = (
        rows.select(
            "k",
            "x",
            "h_lo",
            "h_hi",
            F.explode(
                F.sequence(F.lit(0), F.lit(replicates - 1))
            ).alias("b"),
        )
        .select("k", "b", "x", _poisson1_weight(u).alias("w"))
        .groupBy("k", "b")
        .agg(
            F.sum("w").cast("bigint").alias("n_w"),
            F.sum((F.col("w") * F.col("x")).cast("decimal(38,0)")).alias(
                "sx_w"
            ),
        )
        .where(F.col("n_w") > 0)
    )
    mean_b = F.col("sx_w").cast("double") / F.col("n_w").cast("double")
    wr = Window.partitionBy("k").orderBy(mean_b, "b")
    ranked = cells.withColumn("rk", F.row_number().over(wr))
    lo = ranked.where(F.col("rk") == lo_rank).select(
        "k", F.round(mean_b, 7).alias("boot_lo")
    )
    hi = ranked.where(F.col("rk") == hi_rank).select(
        "k", F.round(mean_b, 7).alias("boot_hi")
    )
    point = rows.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
    )
    return (
        point.join(lo, "k", "left")
        .join(hi, "k", "left")
        .select(
            F.col("k").alias(key_col),
            "n",
            F.round(
                F.col("sx").cast("double") / F.col("n").cast("double"), 7
            ).alias("mean"),
            "boot_lo",
            "boot_hi",
            F.lit(replicates).cast("int").alias("n_replicates"),
        )
    )


def q_stats_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% Poisson-bootstrap CI of mean event value (cents) per type."""
    from event_pipeline_spark.session import read_table

    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    return bootstrap_mean_ci(
        ev, key_col="event_type", id_col="event_id", value_col="cents"
    ).orderBy("event_type")


def _bootstrap_oracle_sql() -> str:
    whens = " ".join(
        f"WHEN h < {t} THEN {k}"
        for k, t in enumerate(POISSON1_THRESHOLDS)
    )
    return f"""
WITH rows_ AS (
  SELECT event_type AS k,
         CAST(round(value * 100) AS BIGINT) AS x,
         (md5_number_lower(event_id::VARCHAR) % {1 << 62})::BIGINT
           AS h_lo,
         ((md5_number_upper(event_id::VARCHAR) % {1 << 55})::BIGINT
          - (md5_number_upper(event_id::VARCHAR) % {1 << 55})::BIGINT
            % 2 + 1) AS h_hi
  FROM events),
spine AS (SELECT unnest(generate_series(0, 99)) AS b),
fan AS (
  SELECT k, b, x,
         CASE {whens} ELSE 8 END AS w
  FROM (
    SELECT k, b, x,
           (h_lo + b * h_hi) % {1 << POISSON1_DRAW_BITS} AS h
    FROM rows_, spine)),
cells AS (
  SELECT k, b, sum(w)::BIGINT AS n_w, sum(w::HUGEINT * x) AS sx_w
  FROM fan GROUP BY k, b
  HAVING sum(w) > 0),
ranked AS (
  SELECT k, b, sx_w::DOUBLE / n_w::DOUBLE AS mean_b,
         row_number() OVER (
           PARTITION BY k ORDER BY sx_w::DOUBLE / n_w::DOUBLE, b) AS rk
  FROM cells),
point AS (
  SELECT k, count(*)::BIGINT AS n, sum(x::HUGEINT) AS sx
  FROM rows_ GROUP BY k)
SELECT p.k AS event_type, p.n,
       round(p.sx::DOUBLE / p.n::DOUBLE, 7) AS mean,
       lo.v AS boot_lo, hi.v AS boot_hi, 100::INT AS n_replicates
FROM point p
LEFT JOIN (SELECT k, round(mean_b, 7) AS v FROM ranked WHERE rk = 3)
  lo ON lo.k = p.k
LEFT JOIN (SELECT k, round(mean_b, 7) AS v FROM ranked WHERE rk = 98)
  hi ON hi.k = p.k
ORDER BY event_type"""


QUERIES["stats_bootstrap_ci"] = q_stats_bootstrap
ORACLES["stats_bootstrap_ci"] = _bootstrap_oracle_sql()
