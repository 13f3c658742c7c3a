"""Rollup cascade: level-to-level merge exactness, non-algebraic
rejection, and incremental refresh folding micro-batches (incl. late
rows) into a partition-pruned rollup table."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from event_pipeline_spark.operators.rollup import (
    cascade,
    incremental_refresh,
    merge_rollup,
    rollup,
)
from event_pipeline_spark.stores.parquet import ParquetTableStore

AGGS = [
    ("v", "count", "n"),
    ("v", "sum", "sum_v"),
    ("v", "min", "min_v"),
    ("v", "max", "max_v"),
]


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def raw(spark):
    rows = [
        ("a", _ts(f"2026-01-01 10:{m:02d}:{s:02d}"), float(m * 60 + s))
        for m in range(0, 30, 7)
        for s in (0, 30)
    ] + [
        ("b", _ts("2026-01-01 11:05:00"), 7.0),
        ("b", _ts("2026-01-02 09:00:00"), 3.0),
    ]
    return spark.createDataFrame(rows, "k string, ts timestamp, v double")


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


class TestCascade:
    def test_merge_equals_direct(self, raw):
        """hour-from-minute re-aggregation == hour-from-raw."""
        levels = cascade(raw, "ts", ["minute", "hour"], AGGS, ["k"])
        direct = rollup(raw, "ts", "hour", AGGS, ["k"])
        assert _canon(levels["hour"]) == _canon(direct)

    def test_three_level_day(self, raw):
        levels = cascade(raw, "ts", ["minute", "hour", "day"], AGGS, ["k"])
        direct = rollup(raw, "ts", "day", AGGS, ["k"])
        assert _canon(levels["day"]) == _canon(direct)

    def test_rejects_non_mergeable(self, raw):
        with pytest.raises(ValueError, match="algebraic"):
            rollup(raw, "ts", "hour", [("v", "avg", "a")])
        with pytest.raises(ValueError, match="algebraic"):
            merge_rollup(raw, "hour", [("v", "median", "m")])


class TestIncrementalRefresh:
    def test_batches_with_late_rows_converge(self, spark, raw, tmp_path):
        """Refreshing batch-by-batch (late row included) converges to the
        same table as one rollup over everything."""
        store = ParquetTableStore(
            f"file://{tmp_path}/agg", spark, partition_by=["day"]
        )
        refresh = incremental_refresh(store, "hourly", "ts", "hour", AGGS, ["k"])

        batches = [
            raw.where(F.col("ts") < F.lit("2026-01-01 10:15:00")),
            raw.where(
                (F.col("ts") >= F.lit("2026-01-01 10:15:00"))
                & (F.col("k") != "b")
            ),
            raw.where(F.col("k") == "b"),  # includes a late 10xx-adjacent bucket
        ]
        for i, b in enumerate(batches):
            refresh(b, i)

        got = store.as_dataframe("hourly").select(
            "bucket", "k", "n", "sum_v", "min_v", "max_v"
        )
        want = rollup(raw, "ts", "hour", AGGS, ["k"])
        assert _canon(got) == _canon(want)

    def test_empty_batch_is_noop(self, spark, raw, tmp_path):
        store = ParquetTableStore(f"file://{tmp_path}/agg2", spark)
        refresh = incremental_refresh(
            store, "hourly", "ts", "hour", AGGS, ["k"], partition_date_col=None
        )
        refresh(raw, 0)
        before = _canon(store.as_dataframe("hourly"))
        refresh(raw.where(F.lit(False)), 1)
        assert _canon(store.as_dataframe("hourly")) == before


def test_streaming_refresh_matches_batch(spark, raw, tmp_path):
    """readStream -> foreachBatch(incremental_refresh) over file
    micro-batches converges to the batch rollup."""
    src = f"file://{tmp_path}/src"
    a, b = (
        raw.where(F.col("ts") < F.lit("2026-01-01 10:15:00")),
        raw.where(F.col("ts") >= F.lit("2026-01-01 10:15:00")),
    )
    a.coalesce(1).write.mode("append").parquet(src)
    import time as _time

    _time.sleep(1.1)  # distinct mod times -> one file per micro-batch
    b.coalesce(1).write.mode("append").parquet(src)

    store = ParquetTableStore(f"file://{tmp_path}/agg3", spark, partition_by=["day"])
    refresh = incremental_refresh(store, "hourly", "ts", "hour", AGGS, ["k"])

    stream = (
        spark.readStream.schema("k string, ts timestamp, v double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(refresh)
        .option("checkpointLocation", f"{tmp_path}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive

    got = store.as_dataframe("hourly").select(
        "bucket", "k", "n", "sum_v", "min_v", "max_v"
    )
    assert _canon(got) == _canon(rollup(raw, "ts", "hour", AGGS, ["k"]))
