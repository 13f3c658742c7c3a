"""Real-time purchase attribution over Structured Streaming.

Composes the round-3 streaming surface into the standard attribution
flow a marketing/analytics pipeline runs 24/7:

    clicks stream ⋈ purchases stream (event-time bound)
        → foreachBatch append to a parquet store
        → batch report: conversions per user + HLL distinct converters

- The stream-stream join holds bounded state (watermark + the 30-minute
  attribution window drive eviction), so the job survives unbounded
  streams;
- every micro-batch lands idempotently in the store (append + the
  streaming engine's exactly-once file sink bookkeeping via
  checkpoint);
- the report runs as plain batch SQL over the store — the lambda-free
  pattern: one engine, same DataFrame code in both regimes.

Run:  python examples/realtime_attribution.py [sf_dir] [work_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_pipeline_spark.streaming import (
    read_parquet_stream,
    stream_stream_join,
)


def prepare_sources(spark: SparkSession, sf_dir: str, work_dir: str) -> tuple[str, str]:
    """Split the events table into click / purchase source directories
    (stand-ins for two ingestion topics)."""
    from event_pipeline_spark.session import read_table

    events = read_table(spark, sf_dir, "events")
    clicks_dir = f"{work_dir}/clicks_src"
    buys_dir = f"{work_dir}/buys_src"
    events.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    ).write.mode("overwrite").parquet(clicks_dir)
    events.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("buy_id"),
        F.col("value").alias("amount"),
        F.col("ts").alias("buy_ts"),
    ).write.mode("overwrite").parquet(buys_dir)
    return clicks_dir, buys_dir


def attributed(clicks: DataFrame, buys: DataFrame) -> DataFrame:
    """Purchases attributed to a click by the same user within 30
    minutes — identical expression for streams and batch frames."""
    return stream_stream_join(
        clicks,
        buys,
        keys=["user_id"],
        left_ts="click_ts",
        right_ts="buy_ts",
        watermark="1 hour",
        within="30 MINUTES",
    ).select("user_id", "click_id", "buy_id", "amount", "click_ts", "buy_ts")


def run_stream(spark: SparkSession, clicks_dir: str, buys_dir: str, work_dir: str) -> str:
    """Drain both sources with availableNow, landing attributed rows in
    a parquet sink exactly once (checkpointed)."""
    sink = f"{work_dir}/attributed"
    out = attributed(
        read_parquet_stream(spark, clicks_dir),
        read_parquet_stream(spark, buys_dir),
    )
    q = (
        out.writeStream.foreachBatch(
            lambda df, _bid: df.write.mode("append").parquet(sink)
        )
        .option("checkpointLocation", f"{work_dir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return sink


def report(spark: SparkSession, sink: str) -> DataFrame:
    """Batch rollup over the landed conversions: per-user counts plus a
    corpus-wide HLL distinct-converter estimate."""
    conv = spark.read.parquet(sink)
    per_user = conv.groupBy("user_id").agg(
        F.count("*").alias("conversions"),
        F.sum("amount").alias("attributed_amount"),
    )
    totals = conv.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias(
            "approx_distinct_converters"
        )
    )
    return per_user.crossJoin(F.broadcast(totals)).orderBy("user_id")


def main() -> None:
    from event_pipeline_spark.session import get_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/attribution"
    spark = get_session("realtime-attribution")
    clicks_dir, buys_dir = prepare_sources(spark, sf_dir, work_dir)
    sink = run_stream(spark, clicks_dir, buys_dir, work_dir)
    report(spark, sink).show(20)


if __name__ == "__main__":
    main()
