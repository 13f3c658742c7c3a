"""Exactly-once streaming sinks: idempotent-by-path foreachBatch.

Structured Streaming guarantees each micro-batch is REPLAYED with the
same ``batch_id`` after a failure, but an append-mode foreachBatch that
already half-wrote before crashing duplicates rows on replay. The
classic fix needs no transaction log: write each batch to its own
``batch_id=N`` partition directory with ``mode("overwrite")`` — a
replay overwrites the same directory, so the sink converges to
exactly-once no matter how many times a batch is retried. Readers see
the batch id as an ordinary partition column (and can drop it).

This is the sink-side half of end-to-end exactly-once (the source side
is the checkpoint); it works on any path-addressed store (file://,
hdfs://, s3a:// with a consistent lister). The reference has no
streaming sinks at all — this covers the gap users hit first when
moving the DAG onto a real stream.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

BATCH_COL = "batch_id"


def idempotent_parquet_writer(
    base_path: str, partition_by: list[str] | None = None
) -> Callable[[DataFrame, int], None]:
    """A ``foreachBatch`` function writing each micro-batch to
    ``{base_path}/batch_id=N`` via dynamic-partition OVERWRITE of that
    one partition — replays are harmless, other batches untouched.

    Use: ``query.writeStream.foreachBatch(idempotent_parquet_writer(p))``
    """

    def write(df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        out = df.withColumn(BATCH_COL, F.lit(int(batch_id)))
        (
            out.write.mode("overwrite")
            # per-write option, NOT the session conf: concurrent queries
            # sharing the session must not see each other's overwrite mode
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(BATCH_COL, *(partition_by or []))
            .parquet(base_path)
        )

    return write


def read_sink(
    spark: SparkSession, base_path: str, *, drop_batch_col: bool = True
) -> DataFrame:
    """Read everything the idempotent sink has committed."""
    df = spark.read.parquet(base_path)
    return df.drop(BATCH_COL) if drop_batch_col else df
