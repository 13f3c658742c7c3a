"""Burst detection: trailing-window z-score over daily event counts.

The streaming-analytics staple (a deterministic, windowed cousin of
Kleinberg 2002's burst model, and the shape every monitoring stack
implements): count events per (type, day), compare each day's count
against the trailing 7-day history, and flag days whose z-score
clears a threshold.

Spark-first: one count shuffle to (event_type, day), then window
functions PARTITIONED BY event_type — the window never crosses keys,
so there is no global sort and the state per task is one key's
history (contrast ``WindowExec`` with no partition, which funnels the
table into one task; the plan audit rejects that shape).

Oracle safety: the window aggregates are integer (count / sum /
sum-of-squares over counts), so history stats are exact; variance and
z are ONE fixed-shape double expression over those integers —

    var = (n*ss - s*s) / (n*(n-1))          (sample variance)
    z   = (c - s/n) / sqrt(var)

rounded to 7 dp. Days with under ``min_history`` trailing points or
zero variance emit NULL z and never flag.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

QUERIES = {}
ORACLES = {}


def daily_bursts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_days: int = 7,
    min_history: int = 4,
    threshold: float = 3.0,
) -> DataFrame:
    """(event_type, day, c, hist_n, hist_sum, hist_sumsq, z, burst)."""
    daily = events.groupBy(
        F.col(key_col).alias("k"),
        F.date_format(F.col(ts_col), "yyyy-MM-dd").alias("day"),
    ).agg(F.count(F.lit(1)).alias("c"))
    w = (
        Window.partitionBy("k")
        .orderBy("day")
        .rowsBetween(-window_days, -1)
    )
    hist = daily.select(
        "k",
        "day",
        "c",
        F.count("c").over(w).alias("hist_n"),
        F.sum("c").over(w).alias("hist_sum"),
        F.sum(F.col("c") * F.col("c")).over(w).alias("hist_sumsq"),
    )
    n_d = F.col("hist_n").cast("double")
    s_d = F.col("hist_sum").cast("double")
    ss_d = F.col("hist_sumsq").cast("double")
    var = ((n_d * ss_d) - (s_d * s_d)) / (n_d * (n_d - F.lit(1.0)))
    z = F.when(
        (F.col("hist_n") >= min_history) & (var > 0),
        F.round((F.col("c").cast("double") - (s_d / n_d)) / F.sqrt(var), 7),
    )
    return hist.select(
        F.col("k").alias("event_type"),
        "day",
        F.col("c").cast("bigint").alias("c"),
        F.col("hist_n").cast("bigint").alias("hist_n"),
        F.coalesce(F.col("hist_sum"), F.lit(0))
        .cast("bigint")
        .alias("hist_sum"),
        F.coalesce(F.col("hist_sumsq"), F.lit(0))
        .cast("bigint")
        .alias("hist_sumsq"),
        z.alias("z"),
        (z.isNotNull() & (z >= F.lit(threshold))).alias("burst"),
    )


def q_trend_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_pipeline_spark.session import read_table

    return daily_bursts(read_table(spark, sf_dir, "events")).orderBy(
        "event_type", "day"
    )


QUERIES["trend_bursts"] = q_trend_bursts
ORACLES["trend_bursts"] = """
WITH daily AS (
  SELECT event_type AS k, strftime(ts, '%Y-%m-%d') AS day,
         count(*) AS c
  FROM events GROUP BY event_type, strftime(ts, '%Y-%m-%d')),
hist AS (
  SELECT k, day, c,
         count(c) OVER w AS hist_n,
         sum(c) OVER w AS hist_sum,
         sum(c * c) OVER w AS hist_sumsq
  FROM daily
  WINDOW w AS (PARTITION BY k ORDER BY day
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
scored AS (
  SELECT k, day, c, hist_n,
         coalesce(hist_sum, 0) AS hist_sum,
         coalesce(hist_sumsq, 0) AS hist_sumsq,
         CASE WHEN hist_n >= 4
               AND ((hist_n::DOUBLE * hist_sumsq::DOUBLE)
                    - (hist_sum::DOUBLE * hist_sum::DOUBLE))
                   / (hist_n::DOUBLE * (hist_n::DOUBLE - 1.0)) > 0
              THEN round(
                (c::DOUBLE - (hist_sum::DOUBLE / hist_n::DOUBLE))
                / sqrt(((hist_n::DOUBLE * hist_sumsq::DOUBLE)
                        - (hist_sum::DOUBLE * hist_sum::DOUBLE))
                       / (hist_n::DOUBLE * (hist_n::DOUBLE - 1.0))), 7)
              END AS z
  FROM hist)
SELECT k AS event_type, day, c::BIGINT AS c, hist_n::BIGINT AS hist_n,
       hist_sum::BIGINT AS hist_sum, hist_sumsq::BIGINT AS hist_sumsq,
       z, (z IS NOT NULL AND z >= 3.0) AS burst
FROM scored ORDER BY event_type, day
"""


# ---------------------------------------------------------------------------
# exponentially-weighted rolling counts (dyadic-exact EWMA)
# ---------------------------------------------------------------------------

_EWMA_LAGS = 10  # weights 2^0 .. 2^-10: older mass < 0.1% — truncated


def daily_ewma(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    lags: int = _EWMA_LAGS,
) -> DataFrame:
    """(event_type, day, c, ewma_units, ewma): exponentially-decayed
    daily activity — the monitoring-stack smoother (decayed counters /
    Holt level) next to `daily_bursts`' z-score detector:

        ewma_t = Σ_{j=0..lags} c_{t-j} · 2^-j

    (α = 1/2 decay, truncated after ``lags`` days — the dropped tail
    weighs < 2^-lags of the current day).

    Exactness contract: α = 1/2 makes every weight a dyadic rational,
    so computing in units of 2^lags — ``c_{t-j} · 2^(lags-j)``, pure
    integer shifts — gives an order-free BIGINT sum; the presentation
    double is ONE exact division by 2^lags. A general-α EWMA is a
    data-dependent double fold that no engine pair reproduces
    bit-for-bit; the dyadic ladder is the hash-verifiable form.

    Scale: one count shuffle to (key, day), then ``lags+1`` ``lag()``
    reads over ONE per-key window — same partitioning as
    `daily_bursts`, no global sort.
    """
    daily = events.groupBy(
        F.col(key_col).alias("k"),
        F.date_format(F.col(ts_col), "yyyy-MM-dd").alias("day"),
    ).agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("k").orderBy("day")
    units = None
    for j in range(lags + 1):
        term = F.coalesce(F.lag("c", j).over(w), F.lit(0)).cast(
            "bigint"
        ) * F.lit(1 << (lags - j)).cast("bigint")
        units = term if units is None else units + term
    return daily.select(
        F.col("k").alias("event_type"),
        "day",
        F.col("c").cast("bigint").alias("c"),
        units.cast("bigint").alias("ewma_units"),
        (units.cast("bigint") / F.lit(float(1 << lags))).alias("ewma"),
    )


def q_trend_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_pipeline_spark.session import read_table

    return daily_ewma(read_table(spark, sf_dir, "events")).orderBy(
        "event_type", "day"
    )


_EWMA_TERMS = " + ".join(
    f"coalesce(lag(c, {j}) OVER w, 0)::BIGINT * {1 << (_EWMA_LAGS - j)}"
    for j in range(_EWMA_LAGS + 1)
)

QUERIES["trend_ewma"] = q_trend_ewma
ORACLES["trend_ewma"] = f"""
WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
         count(*)::BIGINT AS c
  FROM events GROUP BY event_type, strftime(ts, '%Y-%m-%d'))
SELECT event_type, day, c,
       ({_EWMA_TERMS})::BIGINT AS ewma_units,
       ({_EWMA_TERMS})::BIGINT / CAST({1 << _EWMA_LAGS} AS DOUBLE)
         AS ewma
FROM daily
WINDOW w AS (PARTITION BY event_type ORDER BY day)
ORDER BY event_type, day
"""


# ---------------------------------------------------------------------------
# CUSUM change-point detection
# ---------------------------------------------------------------------------


def daily_cusum(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    drift_units: int = 0,
    threshold_units: int | None = None,
) -> DataFrame:
    """(event_type, day, c, cusum_pos, cusum_neg, alarm): Page's
    one-sided CUSUM statistics over daily counts — the sequential
    change-point detector (Page 1954) beside `daily_bursts`' point
    z-score: bursts flag a single outlier day, CUSUM accumulates
    small persistent shifts until they cross a threshold.

    The textbook recursion ``S_t = max(0, S_{t-1} + x_t - k)`` is a
    sequential fold no window aggregate expresses — but it has an
    EXACT prefix formulation (the reflection identity):

        S_t = C_t - min_{j<=t} C_j,   C_t = Σ_{i<=t} (x_i - k)

    so two window reads (running sum + running min) over ONE per-key
    partitioning replace the fold. Everything is BIGINT: x_i are
    counts, the reference level is each key's FIRST day's count (a
    deterministic integer pinned by ``first_value``), drift k in
    integer units — both engines replay bit-for-bit, no quantization
    anywhere. The negative-side statistic mirrors it with max.

    Scale: one count shuffle to (key, day), three window functions on
    the same (key, ORDER BY day) spec — no global sort, state is one
    key's running scalars.
    """
    daily = events.groupBy(
        F.col(key_col).alias("k"),
        F.date_format(F.col(ts_col), "yyyy-MM-dd").alias("day"),
    ).agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("k").orderBy("day")
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    ref = F.first("c").over(cum)  # each key's first observed day
    dev = F.col("c").cast("bigint") - ref - F.lit(drift_units)
    devn = F.col("c").cast("bigint") - ref + F.lit(drift_units)
    cpos = F.sum(dev).over(cum) - F.min(F.sum(dev).over(cum)).over(cum)
    cneg = F.max(F.sum(devn).over(cum)).over(cum) - F.sum(devn).over(cum)
    out = daily.select(
        F.col("k").alias("event_type"),
        "day",
        F.col("c").cast("bigint").alias("c"),
        cpos.cast("bigint").alias("cusum_pos"),
        cneg.cast("bigint").alias("cusum_neg"),
    )
    if threshold_units is None:
        return out.withColumn("alarm", F.lit(None).cast("boolean"))
    return out.withColumn(
        "alarm",
        (F.col("cusum_pos") >= threshold_units)
        | (F.col("cusum_neg") >= threshold_units),
    )


def q_trend_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_pipeline_spark.session import read_table

    return daily_cusum(
        read_table(spark, sf_dir, "events"), threshold_units=50
    ).orderBy("event_type", "day")


QUERIES["trend_cusum"] = q_trend_cusum
ORACLES["trend_cusum"] = """
WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
         count(*)::BIGINT AS c
  FROM events GROUP BY event_type, strftime(ts, '%Y-%m-%d')),
dev AS (
  SELECT event_type, day, c,
         c - first_value(c) OVER w AS d
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS UNBOUNDED PRECEDING)),
cum AS (
  SELECT event_type, day, c,
         sum(d) OVER w AS cd
  FROM dev
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS UNBOUNDED PRECEDING))
SELECT event_type, day, c,
       (cd - min(cd) OVER w)::BIGINT AS cusum_pos,
       (max(cd) OVER w - cd)::BIGINT AS cusum_neg,
       ((cd - min(cd) OVER w) >= 50 OR (max(cd) OVER w - cd) >= 50)
         AS alarm
FROM cum
WINDOW w AS (PARTITION BY event_type ORDER BY day
             ROWS UNBOUNDED PRECEDING)
ORDER BY event_type, day
"""


# ---------------------------------------------------------------------------
# Mann-Kendall trend test
# ---------------------------------------------------------------------------


def mann_kendall(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """(event_type, n_days, s, var_s_units, z): the Mann–Kendall
    monotonic-trend test over each key's daily counts — the
    nonparametric "is this series actually trending" answer that
    `daily_bursts` (point outliers) and `daily_cusum` (level shifts)
    don't give:

        S = Σ_{i<j} sign(c_j − c_i)

    with the tie-corrected variance (Kendall 1975)

        Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)] / 18

    and the continuity-corrected z = (S∓1)/sqrt(Var).

    Exactness: S and 18·Var(S) are pure integers (ties counted by a
    groupBy over counts), so both engines agree exactly; z is ONE
    fixed-shape expression over those integers, rounded to 7 dp.

    Scale: the pair join is WITHIN key over the DAILY table — per-key
    pair count is (days choose 2), bounded by the time domain squared,
    not the corpus; the join co-partitions both sides on the key in
    one exchange pair. Corpus-scale rows reduce to daily counts before
    anything quadratic.
    """
    daily = events.groupBy(
        F.col(key_col).alias("k"),
        F.date_format(F.col(ts_col), "yyyy-MM-dd").alias("day"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    a, b = daily.alias("a"), daily.alias("b")
    s = (
        a.join(b, "k")
        .where(F.col("a.day") < F.col("b.day"))
        .groupBy("k")
        .agg(
            F.sum(F.signum(F.col("b.c") - F.col("a.c")).cast("long"))
            .cast("bigint")
            .alias("s")
        )
    )
    nd = daily.groupBy("k").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ties = (
        daily.groupBy("k", "c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .groupBy("k")
        .agg(
            F.sum(
                F.col("t")
                * (F.col("t") - 1)
                * (F.lit(2) * F.col("t") + 5)
            )
            .cast("bigint")
            .alias("tt")
        )
    )
    j = nd.join(s, "k").join(ties, "k")
    var18 = (
        F.col("n") * (F.col("n") - 1) * (F.lit(2) * F.col("n") + 5)
        - F.col("tt")
    )
    z = F.when(
        var18 > 0,
        F.round(
            F.when(
                F.col("s") > 0, (F.col("s") - 1).cast("double")
            )
            .when(F.col("s") < 0, (F.col("s") + 1).cast("double"))
            .otherwise(F.lit(0.0))
            / F.sqrt(var18.cast("double") / F.lit(18.0)),
            7,
        ),
    )
    return j.select(
        F.col("k").alias("event_type"),
        F.col("n").alias("n_days"),
        "s",
        var18.cast("bigint").alias("var_s_x18"),
        z.alias("z"),
    )


def q_trend_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_pipeline_spark.session import read_table

    return mann_kendall(read_table(spark, sf_dir, "events")).orderBy(
        "event_type"
    )


QUERIES["trend_mann_kendall"] = q_trend_mann_kendall
ORACLES["trend_mann_kendall"] = """
WITH daily AS MATERIALIZED (
  SELECT event_type AS k, strftime(ts, '%Y-%m-%d') AS day,
         count(*)::BIGINT AS c
  FROM events GROUP BY event_type, strftime(ts, '%Y-%m-%d')),
s AS (
  SELECT a.k, sum(CASE WHEN b.c > a.c THEN 1
                       WHEN b.c < a.c THEN -1 ELSE 0 END)::BIGINT AS s
  FROM daily a JOIN daily b ON a.k = b.k AND a.day < b.day
  GROUP BY a.k),
nd AS (SELECT k, count(*)::BIGINT AS n FROM daily GROUP BY k),
ties AS (
  SELECT k, sum(t * (t - 1) * (2 * t + 5))::BIGINT AS tt
  FROM (SELECT k, c, count(*)::BIGINT AS t FROM daily GROUP BY k, c)
  GROUP BY k)
SELECT nd.k AS event_type, nd.n AS n_days, s.s,
       (nd.n * (nd.n - 1) * (2 * nd.n + 5) - ties.tt)::BIGINT
         AS var_s_x18,
       CASE WHEN (nd.n * (nd.n - 1) * (2 * nd.n + 5) - ties.tt) > 0
            THEN round(
              (CASE WHEN s.s > 0 THEN (s.s - 1)::DOUBLE
                    WHEN s.s < 0 THEN (s.s + 1)::DOUBLE
                    ELSE CAST(0 AS DOUBLE) END)
              / sqrt((nd.n * (nd.n - 1) * (2 * nd.n + 5) - ties.tt)
                     ::DOUBLE / CAST(18 AS DOUBLE)), 7) END AS z
FROM nd JOIN s ON s.k = nd.k JOIN ties ON ties.k = nd.k
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# seasonal-baseline residual outliers
# ---------------------------------------------------------------------------


def seasonal_residuals(
    events: DataFrame,
    *,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(key, day, dow, c, baseline, residual, mad, outlier): per-key
    daily counts against a SEASONAL baseline — the lower-median count
    of the same day-of-week — with robust outlier flags. CUSUM/EWMA
    (above) catch level shifts; this catches single anomalous days
    that a weekly rhythm would otherwise hide (every Sunday is low —
    a low Tuesday is the anomaly).

    Exactness: everything is BIGINT — lower-median baseline at rank
    (n+1)//2 per (key, dow), MAD of residuals the same way, and the
    Iglewicz–Hoaglin modified-z flag as the exact integer inequality
    6745·|c − baseline| > 35000·MAD (the ``mad_outliers`` rule). No
    doubles anywhere.

    Scale shape: the corpus collapses to (key, day) counts in one
    aggregate; every window partitions by (key, dow) — |days|/7 rows
    per cell, never raw events."""
    from pyspark.sql import Window

    day = F.to_date(F.col(ts_col).cast("timestamp"))
    daily = (
        events.select(F.col(key_col).alias("k"), day.alias("d"))
        .groupBy("k", "d")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .withColumn("dow", F.dayofweek("d").cast("int"))
    )
    cell = ["k", "dow"]
    n_per = Window.partitionBy(*cell)
    wv = Window.partitionBy(*cell).orderBy("c", "d")
    with_med = daily.withColumn(
        "rn", F.row_number().over(wv)
    ).withColumn("n", F.count(F.lit(1)).over(n_per))
    med = with_med.where(
        F.col("rn") == F.floor((F.col("n") + 1) / 2).cast("bigint")
    ).select("k", "dow", F.col("c").alias("baseline"))
    d2 = daily.join(med, cell).withColumn(
        "ad", F.abs(F.col("c") - F.col("baseline"))
    )
    wd = Window.partitionBy(*cell).orderBy("ad", "d")
    mad = (
        d2.withColumn("rn", F.row_number().over(wd))
        .withColumn("n", F.count(F.lit(1)).over(n_per))
        .where(F.col("rn") == F.floor((F.col("n") + 1) / 2).cast("bigint"))
        .select("k", "dow", F.col("ad").alias("mad"))
    )
    return d2.join(mad, cell).select(
        F.col("k").alias(key_col),
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "dow",
        "c",
        "baseline",
        (F.col("c") - F.col("baseline")).cast("bigint").alias("residual"),
        "mad",
        (
            F.lit(6745) * F.col("ad") > F.lit(35000) * F.col("mad")
        ).alias("outlier"),
    )


def q_trend_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_pipeline_spark.session import read_table

    return seasonal_residuals(
        read_table(spark, sf_dir, "events")
    ).orderBy("event_type", "day")


QUERIES["trend_seasonal_residuals"] = q_trend_seasonal
ORACLES["trend_seasonal_residuals"] = """
WITH daily AS (
  SELECT event_type AS k, CAST(ts AS DATE) AS d, count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2),
-- DuckDB dayofweek: 0=Sunday..6=Saturday; Spark: 1=Sunday..7=Saturday
dowed AS (
  SELECT k, d, c, (dayofweek(d) + 1)::INT AS dow FROM daily),
med AS (
  SELECT k, dow, c AS baseline FROM (
    SELECT k, dow, c,
           row_number() OVER (PARTITION BY k, dow ORDER BY c, d) AS rn,
           count(*) OVER (PARTITION BY k, dow) AS n
    FROM dowed) WHERE rn = (n + 1) // 2),
d2 AS (
  SELECT w.k, w.d, w.dow, w.c, m.baseline,
         abs(w.c - m.baseline)::BIGINT AS ad
  FROM dowed w JOIN med m ON m.k = w.k AND m.dow = w.dow),
mad AS (
  SELECT k, dow, ad AS mad FROM (
    SELECT k, dow, ad,
           row_number() OVER (PARTITION BY k, dow ORDER BY ad, d) AS rn,
           count(*) OVER (PARTITION BY k, dow) AS n
    FROM d2) WHERE rn = (n + 1) // 2)
SELECT d2.k AS event_type, strftime(d2.d, '%Y-%m-%d') AS day, d2.dow,
       d2.c, d2.baseline, (d2.c - d2.baseline)::BIGINT AS residual,
       mad.mad, 6745 * d2.ad > 35000 * mad.mad AS outlier
FROM d2 JOIN mad ON mad.k = d2.k AND mad.dow = d2.dow
ORDER BY event_type, day
"""


# ---------------------------------------------------------------------------
# Theil–Sen robust trend slope
# ---------------------------------------------------------------------------


def theil_sen(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    unit: int = 10_000_000,
) -> DataFrame:
    """(event_type, n_days, n_pairs, slope_units, slope): the Theil–Sen
    estimator — the median of all pairwise slopes (c_j − c_i)/(d_j − d_i)
    over each key's daily counts. The natural companion to
    ``mann_kendall`` above: MK answers "is there a monotonic trend?",
    Theil–Sen answers "how steep?" with a 29%-breakdown-point slope no
    single outlier day can move (unlike the OLS slope in
    ``stats.py::corr_ols``).

    Exactness: each pairwise slope is the rational num/den with den =
    day gap > 0; both engines quantize it to integer ``unit``ths via
    TRUNCATING integer division ((num·unit) DIV den — Spark `DIV` and
    DuckDB `//` both truncate toward zero, verified), a monotone map,
    so the lower-median selection by ``row_number`` over the quantized
    units picks the identical value in both engines. ``slope`` is the
    single exact division units/unit.

    Scale shape: corpus rows collapse to daily counts FIRST (one
    map-side-combinable aggregate); the pair join is within-key over
    the daily table — (days choose 2) pairs bounded by the time-domain
    squared, not the corpus (the ``mann_kendall`` bound). Reference
    parity: the reference engine has no trend shelf; this extends
    SURVEY §2's [ext] analytics mandate.
    """
    daily = events.groupBy(
        F.col(key_col).alias("k"),
        F.date_format(F.col(ts_col), "yyyy-MM-dd").alias("day"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    daily = daily.select(
        "k",
        F.datediff(F.to_date("day"), F.lit("1970-01-01").cast("date"))
        .cast("bigint")
        .alias("d"),
        "c",
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = (
        a.join(b, "k")
        .where(F.col("a.d") < F.col("b.d"))
        .select(
            "k",
            (F.col("b.c") - F.col("a.c")).cast("bigint").alias("num"),
            (F.col("b.d") - F.col("a.d")).cast("bigint").alias("den"),
        )
        .select(
            "k",
            F.expr(f"(num * {unit}) DIV den").cast("bigint").alias("u"),
        )
    )
    w = Window.partitionBy("k").orderBy("u")
    ranked = pairs.select(
        "k",
        "u",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("k")).alias("m"),
    )
    med = ranked.where(
        F.col("rn") == F.expr("(m + 1) DIV 2")
    ).select("k", F.col("u").alias("slope_units"), F.col("m").alias("n_pairs"))
    nd = daily.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    return nd.join(med, "k").select(
        F.col("k").alias("event_type"),
        "n_days",
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        "slope_units",
        (F.col("slope_units").cast("double") / F.lit(float(unit))).alias(
            "slope"
        ),
    )


def q_trend_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_pipeline_spark.session import read_table

    return theil_sen(read_table(spark, sf_dir, "events")).orderBy(
        "event_type"
    )


QUERIES["trend_theil_sen"] = q_trend_theil_sen
ORACLES["trend_theil_sen"] = """
WITH daily AS MATERIALIZED (
  SELECT event_type AS k,
         (strftime(ts, '%Y-%m-%d')::DATE - DATE '1970-01-01')::BIGINT AS d,
         count(*)::BIGINT AS c
  FROM events GROUP BY event_type, strftime(ts, '%Y-%m-%d')),
pairs AS (
  SELECT a.k, ((b.c - a.c) * 10000000) // (b.d - a.d) AS u
  FROM daily a JOIN daily b ON a.k = b.k AND a.d < b.d),
ranked AS (
  SELECT k, u,
         row_number() OVER (PARTITION BY k ORDER BY u) AS rn,
         count(*) OVER (PARTITION BY k) AS m
  FROM pairs),
med AS (
  SELECT k, u AS slope_units, m AS n_pairs
  FROM ranked WHERE rn = (m + 1) // 2),
nd AS (SELECT k, count(*)::BIGINT AS n_days FROM daily GROUP BY k)
SELECT nd.k AS event_type, nd.n_days, med.n_pairs::BIGINT AS n_pairs,
       med.slope_units::BIGINT AS slope_units,
       med.slope_units::DOUBLE / CAST(10000000 AS DOUBLE) AS slope
FROM nd JOIN med ON med.k = nd.k
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# autocorrelation function over the zero-filled daily spine
# ---------------------------------------------------------------------------


def daily_acf(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    max_lag: int = 7,
) -> DataFrame:
    """(event_type, lag, n_days, r): the sample autocorrelation of each
    key's daily count series at lags 1..max_lag — the seasonality
    readout (weekly traffic shows r spiking at lag 7) that the
    point-wise shelf (bursts/CUSUM/MK) doesn't give.

    The series is the ZERO-FILLED calendar spine from each key's first
    to last observed day (ACF is meaningless on an irregular grid; a
    missing day is an observed zero for event counts). With S = Σy,
    SS = Σy², A_L = Σ y_t·y_{t−L} and B_L = Σ (y_t + y_{t−L}) over the
    n−L aligned pairs, the standard (biased-denominator) estimator
    multiplies out to the all-BIGINT identity

        r_L = (n²·A_L − n·S·B_L + (n−L)·S²) / (n²·SS − n·S²)

    — ONE exact division, rounded 7 dp; both engines agree on every
    integer. NULL when the series is constant (zero denominator).

    Scale shape: corpus rows collapse to ≤ |keys|·|days| cells, the
    spine explode is linear in that, and the lag join is an equi-join
    on (key, t−L) after a ≤max_lag-row broadcast lag spine — nothing
    quadratic anywhere."""
    daily = events.groupBy(
        F.col(key_col).alias("k"),
        F.to_date(F.date_format(F.col(ts_col), "yyyy-MM-dd")).alias("day"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    span = daily.groupBy("k").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = span.select(
        "k",
        "d0",
        F.explode(F.sequence("d0", "d1")).alias("day"),
    )
    series = (
        spine.join(daily, ["k", "day"], "left")
        .select(
            "k",
            F.datediff("day", "d0").cast("bigint").alias("t"),
            F.coalesce("c", F.lit(0)).cast("bigint").alias("y"),
        )
    )
    stats = series.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("s"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("ss"),
    )
    spark = events.sparkSession
    lags = spark.range(1, max_lag + 1).select(
        F.col("id").cast("bigint").alias("lag")
    )
    a = series.crossJoin(F.broadcast(lags)).select(
        "k", "lag", (F.col("t") - F.col("lag")).alias("tprev"),
        F.col("y").alias("ya"),
    )
    b = series.select("k", F.col("t").alias("tprev"), F.col("y").alias("yb"))
    al = (
        a.join(b, ["k", "tprev"])
        .groupBy("k", "lag")
        .agg(
            F.sum(F.col("ya") * F.col("yb")).cast("bigint").alias("a_l"),
            F.sum(F.col("ya") + F.col("yb")).cast("bigint").alias("b_l"),
        )
    )
    j = al.join(stats, "k")
    num = (
        F.col("n") * F.col("n") * F.col("a_l")
        - F.col("n") * F.col("s") * F.col("b_l")
        + (F.col("n") - F.col("lag")) * F.col("s") * F.col("s")
    )
    den = F.col("n") * F.col("n") * F.col("ss") - F.col("n") * F.col(
        "s"
    ) * F.col("s")
    return j.select(
        F.col("k").alias("event_type"),
        F.col("lag").cast("int").alias("lag"),
        F.col("n").alias("n_days"),
        F.when(
            den > 0, F.round(num.cast("double") / den.cast("double"), 7)
        ).alias("r"),
    )


def q_trend_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_pipeline_spark.session import read_table

    return daily_acf(read_table(spark, sf_dir, "events")).orderBy(
        "event_type", "lag"
    )


QUERIES["trend_acf"] = q_trend_acf
ORACLES["trend_acf"] = """
WITH daily AS MATERIALIZED (
  SELECT event_type AS k, strftime(ts, '%Y-%m-%d')::DATE AS day,
         count(*)::BIGINT AS c
  FROM events GROUP BY event_type, strftime(ts, '%Y-%m-%d')),
span AS (SELECT k, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY k),
spine AS (
  SELECT k, d0, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
  FROM span),
series AS (
  SELECT spine.k, (spine.day - spine.d0)::BIGINT AS t,
         coalesce(daily.c, 0)::BIGINT AS y
  FROM spine LEFT JOIN daily ON daily.k = spine.k AND daily.day = spine.day),
stats AS (
  SELECT k, count(*)::BIGINT AS n, sum(y)::BIGINT AS s,
         sum(y * y)::BIGINT AS ss
  FROM series GROUP BY k),
lags AS (SELECT unnest(generate_series(1, 7))::BIGINT AS lag),
al AS (
  SELECT a.k, lags.lag,
         sum(a.y * b.y)::BIGINT AS a_l,
         sum(a.y + b.y)::BIGINT AS b_l
  FROM series a CROSS JOIN lags
  JOIN series b ON b.k = a.k AND b.t = a.t - lags.lag
  GROUP BY a.k, lags.lag)
SELECT al.k AS event_type, al.lag::INT AS lag, stats.n AS n_days,
       CASE WHEN (stats.n * stats.n * stats.ss
                  - stats.n * stats.s * stats.s) > 0
            THEN round(
              (stats.n * stats.n * al.a_l
               - stats.n * stats.s * al.b_l
               + (stats.n - al.lag) * stats.s * stats.s)::DOUBLE
              / (stats.n * stats.n * stats.ss
                 - stats.n * stats.s * stats.s)::DOUBLE, 7) END AS r
FROM al JOIN stats ON stats.k = al.k
ORDER BY event_type, lag
"""


# ---------------------------------------------------------------------------
# Holt linear trend (double exponential smoothing)
# ---------------------------------------------------------------------------

HOLT_ALPHA = 0.5
HOLT_BETA = 0.2
# 366 covers a full (leap) year of daily observations; the weight
# spine stays a <=366-row broadcast and the A^p weights decay at
# spectral radius sqrt(1-alpha+alpha*beta) ~ 0.707 per lag, so the
# far tail rounds to 0 units — no growth, no overflow
HOLT_MAX_N = 366
HOLT_UNIT = 1_000_000_000


def _holt_weight_tables(
    alpha: float, beta: float, max_n: int, unit: int
) -> tuple[list[tuple[int, int, int]], list[tuple[int, int, int, int, int]]]:
    """Python-precomputed weight literals for the closed-form Holt fold.

    The recursion  s_t = αy_t + (1−α)(s+b),  b_t = β(s_t−s_{t−1}) +
    (1−β)b  is LINEAR with constant matrix A, so the final state is a
    weighted sum of the inputs:  x_t = A^{t−1}x_1 + Σ_{j≥2} A^{t−j}c·y_j
    with c = [α, αβ], x_1 = y_1·[1,−1] + y_2·[0,1] (the standard
    s_1 = y_1, b_1 = y_2−y_1 initialization). Both engines consume the
    SAME integer unit literals (round(w·unit)) — the ndcg
    DISCOUNT_UNITS discipline — so the whole fold is exact BIGINT sums
    with one final division."""
    a, b = alpha, beta
    A = [[1 - a, 1 - a], [-a * b, b * (1 - a) + (1 - b)]]
    c = [a, a * b]

    def matvec(m, v):
        return [
            m[0][0] * v[0] + m[0][1] * v[1],
            m[1][0] * v[0] + m[1][1] * v[1],
        ]

    lag_rows = []   # (lag, ws_units, wb_units): weight of y_j, lag = t-j
    init_rows = []  # (p, i1s, i1b, i2s, i2b): A^p over the two init vecs
    vc, v1, v2 = list(c), [1.0, -1.0], [0.0, 1.0]
    for p in range(max_n):
        lag_rows.append(
            (p, round(vc[0] * unit), round(vc[1] * unit))
        )
        init_rows.append(
            (
                p,
                round(v1[0] * unit),
                round(v1[1] * unit),
                round(v2[0] * unit),
                round(v2[1] * unit),
            )
        )
        vc, v1, v2 = matvec(A, vc), matvec(A, v1), matvec(A, v2)
    return lag_rows, init_rows


def holt_linear(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    alpha: float = HOLT_ALPHA,
    beta: float = HOLT_BETA,
) -> DataFrame:
    """(event_type, n_days, level_units, trend_units, level, trend,
    forecast_3): Holt's linear method (double exponential smoothing,
    Holt 1957) over each key's zero-filled daily count series — the
    trend-aware forecasting layer above ``daily_ewma`` (level only):
    the final smoothed level and trend, and the 3-day-ahead forecast
    level + 3·trend.

    Exactness: the linear recursion is folded in CLOSED FORM over
    Python-precomputed 1e-9-unit weight literals (see
    ``_holt_weight_tables``) — both engines sum the same BIGINT
    products; level/trend/forecast are single exact divisions. The
    model is exactly "Holt with weights quantized to 1e-9".

    Scale shape: corpus rows collapse to the daily spine; the fold is
    ONE equi-join of the series against a ≤366-row broadcast weight
    spine and a map-side-combinable sum per key. Keys with fewer than
    2 observed days (no trend is defined) or spans beyond a leap year
    (366 days — outside the precomputed table; extend HOLT_MAX_N) are
    dropped with the bound documented here."""
    lag_rows, init_rows = _holt_weight_tables(
        alpha, beta, HOLT_MAX_N, HOLT_UNIT
    )
    spark = events.sparkSession
    daily = events.groupBy(
        F.col(key_col).alias("k"),
        F.to_date(F.date_format(F.col(ts_col), "yyyy-MM-dd")).alias("day"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    span = daily.groupBy("k").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    series = (
        span.select(
            "k", "d0", F.explode(F.sequence("d0", "d1")).alias("day")
        )
        .join(daily, ["k", "day"], "left")
        .select(
            "k",
            F.datediff("day", "d0").cast("bigint").alias("t"),
            F.coalesce("c", F.lit(0)).cast("bigint").alias("y"),
        )
    )
    nst = series.groupBy("k").agg(
        (F.max("t") + 1).cast("bigint").alias("n")
    ).where((F.col("n") >= 2) & (F.col("n") <= HOLT_MAX_N))
    lw = spark.createDataFrame(
        lag_rows, "lag long, ws long, wb long"
    )
    iw = spark.createDataFrame(
        init_rows, "p long, i1s long, i1b long, i2s long, i2b long"
    )
    # Σ_{j>=1} A^{(n-1)-j} c · y_j  (0-based j; 1-based j>=2)
    body = (
        series.join(nst, "k")
        .where(F.col("t") >= 1)
        .withColumn("lag", F.col("n") - 1 - F.col("t"))
        .join(F.broadcast(lw), "lag")
        .groupBy("k")
        .agg(
            F.sum(F.col("y") * F.col("ws")).cast("bigint").alias("bs"),
            F.sum(F.col("y") * F.col("wb")).cast("bigint").alias("bb"),
        )
    )
    # init contributions: A^{n-1} over y_0·[1,-1] and y_1·[0,1]
    y0 = series.where(F.col("t") == 0).select("k", F.col("y").alias("y0"))
    y1 = series.where(F.col("t") == 1).select("k", F.col("y").alias("y1"))
    init = (
        nst.withColumn("p", F.col("n") - 1)
        .join(F.broadcast(iw), "p")
        .join(y0, "k")
        .join(y1, "k")
        .select(
            "k",
            "n",
            (F.col("y0") * F.col("i1s") + F.col("y1") * F.col("i2s"))
            .cast("bigint")
            .alias("is_"),
            (F.col("y0") * F.col("i1b") + F.col("y1") * F.col("i2b"))
            .cast("bigint")
            .alias("ib"),
        )
    )
    u = float(HOLT_UNIT)
    j = init.join(body, "k")
    lvl = (F.col("is_") + F.col("bs")).cast("bigint")
    trd = (F.col("ib") + F.col("bb")).cast("bigint")
    return j.select(
        F.col("k").alias(key_col),
        F.col("n").alias("n_days"),
        lvl.alias("level_units"),
        trd.alias("trend_units"),
        F.round(lvl.cast("double") / F.lit(u), 7).alias("level"),
        F.round(trd.cast("double") / F.lit(u), 7).alias("trend"),
        F.round(
            (lvl + F.lit(3) * trd).cast("double") / F.lit(u), 7
        ).alias("forecast_3"),
    )


def q_trend_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_pipeline_spark.session import read_table

    return holt_linear(read_table(spark, sf_dir, "events")).orderBy(
        "event_type"
    )


def _holt_oracle_sql() -> str:
    lag_rows, init_rows = _holt_weight_tables(
        HOLT_ALPHA, HOLT_BETA, HOLT_MAX_N, HOLT_UNIT
    )
    lw = ", ".join(f"({p}, {s}, {b})" for p, s, b in lag_rows)
    iw = ", ".join(
        f"({p}, {a}, {b}, {c}, {d})" for p, a, b, c, d in init_rows
    )
    return f"""
WITH daily AS MATERIALIZED (
  SELECT event_type AS k, strftime(ts, '%Y-%m-%d')::DATE AS day,
         count(*)::BIGINT AS c
  FROM events GROUP BY event_type, strftime(ts, '%Y-%m-%d')),
span AS (SELECT k, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY k),
spine AS (
  SELECT k, d0, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
  FROM span),
series AS (
  SELECT spine.k, (spine.day - spine.d0)::BIGINT AS t,
         coalesce(daily.c, 0)::BIGINT AS y
  FROM spine LEFT JOIN daily ON daily.k = spine.k AND daily.day = spine.day),
nst AS (
  SELECT k, (max(t) + 1)::BIGINT AS n FROM series GROUP BY k
  HAVING (max(t) + 1) BETWEEN 2 AND {HOLT_MAX_N}),
lw(lag, ws, wb) AS (VALUES {lw}),
iw(p, i1s, i1b, i2s, i2b) AS (VALUES {iw}),
body AS (
  SELECT s.k, sum(s.y * lw.ws)::BIGINT AS bs,
         sum(s.y * lw.wb)::BIGINT AS bb
  FROM series s JOIN nst ON nst.k = s.k
  JOIN lw ON lw.lag = nst.n - 1 - s.t
  WHERE s.t >= 1 GROUP BY s.k),
init AS (
  SELECT nst.k, nst.n,
         (y0.y * iw.i1s + y1.y * iw.i2s)::BIGINT AS is_,
         (y0.y * iw.i1b + y1.y * iw.i2b)::BIGINT AS ib
  FROM nst JOIN iw ON iw.p = nst.n - 1
  JOIN series y0 ON y0.k = nst.k AND y0.t = 0
  JOIN series y1 ON y1.k = nst.k AND y1.t = 1)
SELECT init.k AS event_type, init.n AS n_days,
       (init.is_ + body.bs)::BIGINT AS level_units,
       (init.ib + body.bb)::BIGINT AS trend_units,
       round((init.is_ + body.bs)::DOUBLE / {HOLT_UNIT}, 7) AS level,
       round((init.ib + body.bb)::DOUBLE / {HOLT_UNIT}, 7) AS trend,
       round((init.is_ + body.bs + 3 * (init.ib + body.bb))::DOUBLE
             / {HOLT_UNIT}, 7) AS forecast_3
FROM init JOIN body ON body.k = init.k
ORDER BY event_type"""


QUERIES["trend_holt"] = q_trend_holt
ORACLES["trend_holt"] = _holt_oracle_sql()


# ---------------------------------------------------------------------------
# single change-point (binary segmentation step)
# ---------------------------------------------------------------------------

CHANGEPOINT_UNIT = 100


def changepoint_split(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """(event_type, n_days, split_day, n_left, n_right, mean_left,
    mean_right, score_units, gain_units): the best SINGLE split of each
    key's zero-filled daily count series — one step of binary
    segmentation (Scott & Knott 1974), the offline change-point
    locator beside the online ``daily_cusum``: CUSUM says "a shift is
    happening"; this says WHERE the level shifted, in hindsight.

    Splitting at s minimizes total within-segment SSE, equivalently
    maximizes f(s) = Sl²/nl + Sr²/nr. Cross-multiplying onto the
    common denominator nl·nr gives the integer-exact objective
    (Sl²·nr + Sr²·nl)·UNIT DIV (nl·nr) — truncating division (Spark
    `DIV` == DuckDB `//` on non-negatives), a monotone map, so the
    argmax with the (score desc, s asc) tiebreak picks the identical
    split in both engines; splits whose objectives differ by less
    than 1/UNIT may tie and resolve by the earliest day (documented
    quantization, the theil_sen discipline). gain = score −
    S²·UNIT DIV n is the improvement over no split, in the same
    units. DECIMAL(38) intermediates keep Sl²·nr exact far past 2^63.

    Scale shape: corpus rows collapse to the daily spine; candidate
    scores come from ONE key-partitioned cumulative window over ≤
    |days| rows; the argmax is a second window over the same rows."""
    daily = events.groupBy(
        F.col(key_col).alias("k"),
        F.to_date(F.date_format(F.col(ts_col), "yyyy-MM-dd")).alias("day"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    span = daily.groupBy("k").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    series = (
        span.select(
            "k", "d0", F.explode(F.sequence("d0", "d1")).alias("day")
        )
        .join(daily, ["k", "day"], "left")
        .select(
            "k",
            "day",
            F.datediff("day", "d0").cast("bigint").alias("t"),
            F.coalesce("c", F.lit(0)).cast("bigint").alias("y"),
        )
    )
    kw = Window.partitionBy("k")
    cum = kw.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    scored = series.select(
        "k",
        "day",
        "t",
        F.sum("y").over(cum).cast("decimal(38,0)").alias("sl"),
        F.sum("y").over(kw).cast("decimal(38,0)").alias("s"),
        F.count(F.lit(1)).over(kw).cast("bigint").alias("n"),
    ).where(
        F.col("t") < F.col("n") - 1  # split AFTER day t: left = 0..t
    )
    nl = (F.col("t") + 1).cast("decimal(38,0)")
    nr = (F.col("n") - F.col("t") - 1).cast("decimal(38,0)")
    sr = F.col("s") - F.col("sl")
    score = F.expr(
        f"CAST((sl * sl * CAST(n - t - 1 AS DECIMAL(38,0))"
        f" + (s - sl) * (s - sl) * CAST(t + 1 AS DECIMAL(38,0)))"
        f" * {CHANGEPOINT_UNIT}"
        f" div (CAST(t + 1 AS DECIMAL(38,0))"
        f"      * CAST(n - t - 1 AS DECIMAL(38,0))) AS BIGINT)"
    )
    cand = scored.select(
        "k",
        "day",
        "t",
        "n",
        "sl",
        "s",
        nl.cast("bigint").alias("nl"),
        nr.cast("bigint").alias("nr"),
        score.alias("score_units"),
        F.expr(
            f"CAST(s * s * {CHANGEPOINT_UNIT}"
            f" div CAST(n AS DECIMAL(38,0)) AS BIGINT)"
        ).alias("base_units"),
    )
    best = cand.withColumn(
        "rn",
        F.row_number().over(
            kw.orderBy(F.desc("score_units"), F.asc("t"))
        ),
    ).where(F.col("rn") == 1)
    return best.select(
        F.col("k").alias("event_type"),
        F.col("n").alias("n_days"),
        F.date_format(F.date_add("day", 1), "yyyy-MM-dd").alias(
            "split_day"
        ),
        "nl",
        "nr",
        F.round(
            F.col("sl").cast("double") / F.col("nl").cast("double"), 7
        ).alias("mean_left"),
        F.round(
            (F.col("s") - F.col("sl")).cast("double")
            / F.col("nr").cast("double"),
            7,
        ).alias("mean_right"),
        "score_units",
        (F.col("score_units") - F.col("base_units")).alias("gain_units"),
    )


def q_trend_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_pipeline_spark.session import read_table

    return changepoint_split(read_table(spark, sf_dir, "events")).orderBy(
        "event_type"
    )


QUERIES["trend_changepoint"] = q_trend_changepoint
ORACLES["trend_changepoint"] = f"""
WITH daily AS MATERIALIZED (
  SELECT event_type AS k, strftime(ts, '%Y-%m-%d')::DATE AS day,
         count(*)::BIGINT AS c
  FROM events GROUP BY event_type, strftime(ts, '%Y-%m-%d')),
span AS (SELECT k, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY k),
spine AS (
  SELECT k, d0, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
  FROM span),
series AS (
  SELECT spine.k, spine.day, (spine.day - spine.d0)::BIGINT AS t,
         coalesce(daily.c, 0)::BIGINT AS y
  FROM spine LEFT JOIN daily ON daily.k = spine.k AND daily.day = spine.day),
scored AS (
  SELECT k, day, t,
         sum(y) OVER (PARTITION BY k ORDER BY t
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           ::HUGEINT AS sl,
         sum(y) OVER (PARTITION BY k)::HUGEINT AS s,
         count(*) OVER (PARTITION BY k)::BIGINT AS n
  FROM series),
cand AS (
  SELECT k, day, t, n, sl, s,
         (t + 1)::BIGINT AS nl, (n - t - 1)::BIGINT AS nr,
         ((sl * sl * (n - t - 1)::HUGEINT
           + (s - sl) * (s - sl) * (t + 1)::HUGEINT)
          * {CHANGEPOINT_UNIT}
          // ((t + 1)::HUGEINT * (n - t - 1)::HUGEINT))::BIGINT
           AS score_units,
         (s * s * {CHANGEPOINT_UNIT} // n::HUGEINT)::BIGINT AS base_units
  FROM scored WHERE t < n - 1),
best AS (
  SELECT *, row_number() OVER (PARTITION BY k
                               ORDER BY score_units DESC, t) AS rn
  FROM cand)
SELECT k AS event_type, n AS n_days,
       strftime(day + INTERVAL 1 DAY, '%Y-%m-%d') AS split_day,
       nl, nr,
       round(sl::DOUBLE / nl::DOUBLE, 7) AS mean_left,
       round((s - sl)::DOUBLE / nr::DOUBLE, 7) AS mean_right,
       score_units, (score_units - base_units)::BIGINT AS gain_units
FROM best WHERE rn = 1 ORDER BY event_type
"""
