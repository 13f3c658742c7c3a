"""Multi-touch marketing attribution (first / last / linear).

The conversion-credit operator every event-analytics stack ships
(Google Analytics' attribution models; the event-stream complement of
``temporal.events_funnel``): for each conversion event, find the
user's touch events inside a lookback window and award credit to each
touch CHANNEL under three models — first-touch (earliest touch gets
1), last-touch (latest gets 1), linear (each of the n touches gets
1/n).

Spark-first, scale-first:

- ONE equi-join on ``user_id`` pairs conversions with touches; the
  lookback bound is a post-join range filter on the co-located rows
  (the ``interval_join`` shape — never a cross join; per-user event
  counts bound the pair fan-out);
- first/last election is a window PARTITIONED BY conversion id,
  ordered (ts, event_id) — event_id breaks timestamp ties
  deterministically, and the window never crosses keys;
- linear credit is quantized per touch to ``round(1e7 / n)`` BIGINT
  units (one correctly-rounded division), so the per-channel total —
  the only data-dependent fold — is an order-free integer sum; the
  presentation credit is the UNROUNDED ``units / 1e7`` (the
  `graphrank.py` rule: re-rounding half-decimal boundaries is the one
  way two engines disagree).

At 100 TB the join shuffles (user, ts, type, id) tuples only, both
sides partition on the same key in one exchange pair, and every
window is per-conversion — no global sort anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

QUERIES = {}
ORACLES = {}

TOUCH_TYPES = ("view", "click", "signup")
CONVERSION_TYPE = "purchase"


def attribute_conversions(
    events: DataFrame,
    *,
    touch_types: tuple[str, ...] = TOUCH_TYPES,
    conversion_type: str = CONVERSION_TYPE,
    lookback_hours: int = 72,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """(channel, n_touches, first_touch, last_touch, linear_units,
    linear_credit): per-channel credit under all three models.

    Touches strictly before the conversion and at most
    ``lookback_hours`` earlier qualify; conversions with no touch in
    the window earn no credit anywhere (unattributed — standard)."""
    conv = events.where(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("cts"),
        F.col(id_col).alias("conv_id"),
    )
    touch = events.where(F.col(type_col).isin(*touch_types)).select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("tts"),
        F.col(type_col).alias("channel"),
        F.col(id_col).alias("touch_id"),
    )
    j = conv.join(touch, "u").where(
        (F.col("tts") < F.col("cts"))
        & (
            F.col("tts")
            >= F.col("cts") - F.expr(f"INTERVAL {lookback_hours} HOURS")
        )
    )
    per_conv = Window.partitionBy("conv_id")
    asc = per_conv.orderBy(F.asc("tts"), F.asc("touch_id"))
    desc = per_conv.orderBy(F.desc("tts"), F.desc("touch_id"))
    scored = j.select(
        "conv_id",
        "channel",
        (F.row_number().over(asc) == 1).alias("is_first"),
        (F.row_number().over(desc) == 1).alias("is_last"),
        F.round(F.lit(1e7) / F.count(F.lit(1)).over(per_conv))
        .cast("long")
        .alias("lin_u"),
    )
    return (
        scored.groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
            F.sum(F.col("is_first").cast("long"))
            .cast("bigint")
            .alias("first_touch"),
            F.sum(F.col("is_last").cast("long"))
            .cast("bigint")
            .alias("last_touch"),
            F.sum("lin_u").cast("bigint").alias("linear_units"),
        )
        .select(
            "channel",
            "n_touches",
            "first_touch",
            "last_touch",
            "linear_units",
            (F.col("linear_units") / F.lit(1e7)).alias("linear_credit"),
        )
    )


def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_pipeline_spark.session import read_table

    return attribute_conversions(
        read_table(spark, sf_dir, "events")
    ).orderBy("channel")


_TOUCH_SQL = ", ".join(f"'{t}'" for t in TOUCH_TYPES)

QUERIES["events_attribution"] = q_attribution
ORACLES["events_attribution"] = f"""
WITH conv AS (
  SELECT user_id AS u, ts AS cts, event_id AS conv_id
  FROM events WHERE event_type = '{CONVERSION_TYPE}'),
touch AS (
  SELECT user_id AS u, ts AS tts, event_type AS channel,
         event_id AS touch_id
  FROM events WHERE event_type IN ({_TOUCH_SQL})),
j AS (
  SELECT c.conv_id, t.channel, t.tts, t.touch_id
  FROM conv c JOIN touch t ON t.u = c.u
  WHERE t.tts < c.cts AND t.tts >= c.cts - INTERVAL 72 HOURS),
scored AS (
  SELECT conv_id, channel,
         row_number() OVER (PARTITION BY conv_id
                            ORDER BY tts, touch_id) = 1 AS is_first,
         row_number() OVER (PARTITION BY conv_id
                            ORDER BY tts DESC, touch_id DESC) = 1
           AS is_last,
         CAST(round(1e7 / (count(*) OVER (PARTITION BY conv_id)))
              AS BIGINT) AS lin_u
  FROM j)
SELECT channel, count(*)::BIGINT AS n_touches,
       sum(CASE WHEN is_first THEN 1 ELSE 0 END)::BIGINT AS first_touch,
       sum(CASE WHEN is_last THEN 1 ELSE 0 END)::BIGINT AS last_touch,
       sum(lin_u)::BIGINT AS linear_units,
       sum(lin_u)::BIGINT / 1e7 AS linear_credit
FROM scored GROUP BY channel ORDER BY channel
"""
