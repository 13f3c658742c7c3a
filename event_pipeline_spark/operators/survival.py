"""Kaplan–Meier survival estimation over event streams.

The time-to-event operator (Kaplan & Meier 1958) product analytics
runs as "time from signup to purchase": each user who signed up is a
subject; the first later purchase is the event; users who never
purchase are right-censored at the corpus horizon (administrative
censoring). The estimator

    S(t) = Π_{t_i <= t} (1 - d_i / n_i)

needs the risk-set size ``n_i`` (subjects still unresolved just
before ``t_i``) and the event count ``d_i`` at each distinct event
time.

Spark-first, exactness-first:

- durations are integer MICROSECONDS (``unix_micros`` ≡ DuckDB
  ``epoch_us``) floored to hours by integer division — never a double
  timestamp subtraction;
- ``n_i`` comes from the reflection ``N − Σ_{u<t} removed(u)`` over
  ONE ordered window on the distinct-duration table (bounded by the
  time domain, ~hundreds of rows — the `corpus_heaps_curve` bounded
  global-window shape; the heavy per-user reduction upstream stays
  partitioned), with ``N`` as an unbounded window total — no driver
  round-trip, no broadcast;
- the survival PRODUCT is the one data-dependent fold: it becomes an
  order-free integer sum of per-term ``round(ln((n−d)/n)·1e7)``
  BIGINT units (the `lm.py` recipe), cumulated by the same ordered
  window; the presentation value is ``round(exp(units/1e7), 6)``.

Censoring convention (standard): subjects censored at ``t`` are still
at risk for events at ``t`` — removals subtract strictly BEFORE the
next time, which the lag-cumsum window encodes exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

QUERIES = {}
ORACLES = {}

_US_PER_HOUR = 3_600_000_000


def km_survival(
    events: DataFrame,
    *,
    start_type: str = "signup",
    event_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(t_hours, n_risk, n_events, log_units, survival): the KM table
    at every distinct event time, survival non-increasing from 1."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    starts = (
        events.where(F.col(type_col) == start_type)
        .groupBy(F.col(user_col).alias("u"))
        .agg(F.min(us).alias("s_us"))
    )
    ends = events.where(F.col(type_col) == event_type).select(
        F.col(user_col).alias("u"), us.alias("p_us")
    )
    # first event strictly after the subject's start; absent -> censored
    # (the > lives in the JOIN: a user whose purchases all precede the
    # signup must stay as a censored subject, not vanish)
    subj = (
        starts.join(
            ends,
            (starts.u == ends.u) & (ends.p_us > starts.s_us),
            "left",
        )
        .select(starts.u, "s_us", "p_us")
        .groupBy("u", "s_us")
        .agg(F.min("p_us").alias("p_us"))
    )
    horizon = Window.partitionBy()  # one scalar via unbounded window
    max_us = F.max(
        F.when(F.col("p_us").isNotNull(), F.col("p_us")).otherwise(
            F.col("s_us")
        )
    ).over(horizon.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    timed = subj.select(
        "u",
        F.col("p_us").isNotNull().alias("ev"),
        ((F.coalesce(F.col("p_us"), max_us) - F.col("s_us")))
        .alias("dur_us"),
    ).select(
        "u",
        "ev",
        F.expr(f"dur_us div {_US_PER_HOUR}").cast("bigint").alias("t"),
    )
    per_t = timed.groupBy("t").agg(
        F.sum(F.col("ev").cast("long")).cast("bigint").alias("d"),
        F.count(F.lit(1)).cast("bigint").alias("r"),
    )
    w = Window.orderBy("t")
    total = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    before = w.rowsBetween(Window.unboundedPreceding, -1)
    n_risk = F.sum("r").over(total) - F.coalesce(
        F.sum("r").over(before), F.lit(0)
    )
    at_risk = per_t.select(
        "t", "d", n_risk.cast("bigint").alias("n_risk")
    ).where(F.col("d") > 0)
    # d == n_risk empties the risk set (possible only at the last event
    # time): the factor is 0, survival pins to 0, ln is undefined —
    # guard the term and carry a sticky zero flag instead
    term = F.when(
        F.col("d") < F.col("n_risk"),
        F.round(
            F.log(
                (F.col("n_risk") - F.col("d")).cast("double")
                / F.col("n_risk").cast("double")
            )
            * F.lit(1e7)
        ).cast("long"),
    )
    wk = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    zeroed = (
        F.max((F.col("d") == F.col("n_risk")).cast("int")).over(wk) == 1
    )
    units = F.when(~zeroed, F.sum("_lt").over(wk).cast("bigint"))
    return (
        at_risk.withColumn("_lt", term)
        .select(
            F.col("t").alias("t_hours"),
            F.col("n_risk"),
            F.col("d").alias("n_events"),
            units.alias("log_units"),
            F.when(zeroed, F.lit(0.0))
            .otherwise(
                F.round(F.exp(F.sum("_lt").over(wk) / F.lit(1e7)), 6)
            )
            .alias("survival"),
        )
    )


def q_events_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_pipeline_spark.session import read_table

    return km_survival(read_table(spark, sf_dir, "events")).orderBy(
        "t_hours"
    )


QUERIES["events_survival"] = q_events_survival
ORACLES["events_survival"] = f"""
WITH starts AS (
  SELECT user_id AS u, min(epoch_us(ts)) AS s_us
  FROM events WHERE event_type = 'signup' GROUP BY user_id),
subj AS MATERIALIZED (
  SELECT s.u, s.s_us, min(e.p_us) AS p_us
  FROM starts s
  LEFT JOIN (SELECT user_id AS u, epoch_us(ts) AS p_us
             FROM events WHERE event_type = 'purchase') e
    ON e.u = s.u AND e.p_us > s.s_us
  WHERE e.p_us IS NULL OR e.p_us > s.s_us
  GROUP BY s.u, s.s_us),
timed AS MATERIALIZED (
  SELECT u, p_us IS NOT NULL AS ev,
         (coalesce(p_us,
                   (SELECT max(coalesce(p_us, s_us)) FROM subj))
          - s_us) // {_US_PER_HOUR} AS t
  FROM subj),
per_t AS MATERIALIZED (
  SELECT t, sum(CASE WHEN ev THEN 1 ELSE 0 END)::BIGINT AS d,
         count(*)::BIGINT AS r
  FROM timed GROUP BY t),
risk AS MATERIALIZED (
  SELECT t, d,
         ((SELECT sum(r) FROM per_t)
          - coalesce(sum(r) OVER (ORDER BY t
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING), 0))::BIGINT
           AS n_risk
  FROM per_t),
ev_times AS MATERIALIZED (
  SELECT t, n_risk, d,
         CASE WHEN d < n_risk
              THEN CAST(round(ln((n_risk - d)::DOUBLE / n_risk::DOUBLE)
                             * 1e7) AS BIGINT) END AS lt
  FROM risk WHERE d > 0)
SELECT t AS t_hours, n_risk, d AS n_events,
       CASE WHEN max(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
                 OVER wk = 0
            THEN (sum(lt) OVER wk)::BIGINT END AS log_units,
       CASE WHEN max(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
                 OVER wk = 1
            THEN 0.0
            ELSE round(exp((sum(lt) OVER wk) / 1e7), 6) END AS survival
FROM ev_times
WINDOW wk AS (ORDER BY t ROWS UNBOUNDED PRECEDING)
ORDER BY t_hours
"""
