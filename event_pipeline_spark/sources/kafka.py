"""Kafka source/sink option builders (SURVEY §2.8 continuous ingestion —
the [ext] streaming source the reference lacks).

The container ships no spark-sql-kafka connector jar, so — like the JDBC
store — this module builds and validates the full option set and exposes
``readable()`` to probe for the connector; ``read_stream`` raises a clear
error instead of a ClassNotFoundException when the jar is absent. The
option choices encode the scale posture:

- ``startingOffsets=earliest`` only for named (non-pattern) fresh
  subscriptions; checkpointed queries ignore it anyway.
- ``maxOffsetsPerTrigger`` caps micro-batch size so one backlogged topic
  can't produce an unbounded first batch.
- ``failOnDataLoss=false`` is NOT defaulted: silent gap-skipping is a
  choice the caller must make explicitly.
- ``kafka.`` pass-through keys (security, consumer tuning) are preserved
  verbatim.

Value decoding: ``decoded()`` projects the standard Kafka schema
(key/value binary + topic/partition/offset/timestamp) to strings or
through ``from_json`` with a caller schema — the same dual typed/JSON
representation the stores use for ``content`` (SURVEY §1.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KAFKA_FORMAT = "kafka"


class KafkaSourceError(RuntimeError):
    pass


def build_options(
    bootstrap_servers: str,
    *,
    subscribe: str | None = None,
    subscribe_pattern: str | None = None,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = 100_000,
    fail_on_data_loss: bool | None = None,
    extra: dict[str, str] | None = None,
) -> dict[str, str]:
    """Validated option dict for ``spark.readStream.format("kafka")``."""
    if bool(subscribe) == bool(subscribe_pattern):
        raise KafkaSourceError(
            "exactly one of subscribe / subscribe_pattern is required"
        )
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "startingOffsets": starting_offsets,
    }
    if subscribe:
        opts["subscribe"] = subscribe
    else:
        opts["subscribePattern"] = subscribe_pattern  # type: ignore[assignment]
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    if fail_on_data_loss is not None:
        opts["failOnDataLoss"] = "true" if fail_on_data_loss else "false"
    for k, v in (extra or {}).items():
        if not (k.startswith("kafka.") or k in ("includeHeaders",)):
            raise KafkaSourceError(
                f"unknown option {k!r} (consumer configs need the kafka. prefix)"
            )
        opts[k] = str(v)
    return opts


def readable(spark: SparkSession) -> bool:
    """True when the spark-sql-kafka connector is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def read_stream(spark: SparkSession, options: dict[str, str]) -> DataFrame:
    if not readable(spark):
        raise KafkaSourceError(
            "spark-sql-kafka connector not on the classpath; add the "
            "org.apache.spark:spark-sql-kafka-0-10 package to the session"
        )
    return spark.readStream.format(KAFKA_FORMAT).options(**options).load()


def decoded(kafka_df: DataFrame, value_schema: str | None = None) -> DataFrame:
    """Project the Kafka wire schema to usable columns: key/value as
    strings, or ``value`` parsed via ``from_json`` when a schema is given
    (bad records become NULL structs — filter or route them, don't crash
    the stream)."""
    out = kafka_df.select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        "topic", "partition", "offset", "timestamp",
    )
    if value_schema is not None:
        out = out.withColumn("value", F.from_json("value", value_schema))
    return out
