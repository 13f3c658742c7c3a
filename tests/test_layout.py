"""Range-sorted layout: footer stats must actually enable pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_pipeline_spark.operators.layout import (
    file_key_ranges,
    prunable_files,
    write_range_sorted,
)


def test_range_sorted_files_have_disjoint_ranges(spark, tmp_path):
    df = spark.range(0, 100_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    out = str(tmp_path / "ranged")
    write_range_sorted(df, out, ["k"], 8)

    ranges = sorted(file_key_ranges(out, "k").values())
    assert len(ranges) == 8
    for (_, prev_hi), (next_lo, _) in zip(ranges, ranges[1:]):
        assert prev_hi < next_lo  # disjoint, ordered ranges

    # a narrow range predicate needs 1-2 of 8 files
    hit, total = prunable_files(out, "k", 10_000, 12_000)
    assert total == 8 and len(hit) <= 2

    # and the data survives intact
    back = spark.read.parquet(out)
    assert back.count() == 100_000
    assert back.where((F.col("k") >= 10_000) & (F.col("k") <= 12_000)).count() == 2001


def test_unsorted_layout_cannot_prune(spark, tmp_path):
    # contrast: hash-distributed files all span ~the full key range
    df = spark.range(0, 100_000).select(F.col("id").alias("k"))
    out = str(tmp_path / "hashed")
    df.repartition(8, "k").write.parquet(out)
    hit, total = prunable_files(out, "k", 10_000, 12_000)
    assert total == 8 and len(hit) == 8  # every file must be read
