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


# -- compaction ---------------------------------------------------------------

def test_compact_parquet_reduces_file_count_preserving_rows(spark, tmp_path):
    from event_pipeline_spark.operators.layout import compact_parquet

    src, dest = str(tmp_path / "frag"), str(tmp_path / "compacted")
    spark.range(20_000).repartition(40).write.parquet(src)
    import os as _os

    assert sum(n.endswith(".parquet") for n in _os.listdir(src)) == 40
    written = compact_parquet(spark, src, dest, target_file_mb=1)
    assert written < 40
    assert spark.read.parquet(dest).count() == 20_000
    got = sorted(r["id"] for r in spark.read.parquet(dest).collect())
    assert got == list(range(20_000))


def test_compact_with_sort_keys_restores_pruning(spark, tmp_path):
    from event_pipeline_spark.operators.layout import (
        compact_parquet,
        prunable_files,
    )

    src, dest = str(tmp_path / "frag2"), str(tmp_path / "compacted2")
    # fragmented AND unsorted: every file spans the whole key range
    # (the uuid-seeded payload keeps parquet from compressing the data
    # under one target file)
    spark.range(300_000).selectExpr(
        "id % 9973 AS k", "id AS v", "uuid() AS pad"
    ).repartition(30).write.parquet(src)
    hit, total = prunable_files(src, "k", 100, 200)
    assert hit and len(hit) == total  # no pruning before compaction
    compact_parquet(spark, src, dest, target_file_mb=1, sort_keys=["k"])
    hit2, total2 = prunable_files(dest, "k", 100, 200)
    assert total2 > 1 and len(hit2) <= max(1, total2 // 3)


# -- z-order ------------------------------------------------------------------

def test_zorder_value_interleaves_bits(spark):
    from pyspark.sql import functions as F

    from event_pipeline_spark.operators.layout import zorder_value

    df = spark.createDataFrame([(0b101, 0b011)], "a long, b long")
    z = df.select(zorder_value(F.col("a"), F.col("b"), 3).alias("z")).first()["z"]
    # a bits -> even positions (1,0,1), b bits -> odd positions (0,1,1):
    # z = b2 a2 b1 a1 b0 a0 = 0 1 1 0 1 1 = 0b011011
    assert z == 0b011011


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    """Single-key sort prunes only its own dimension; the Z-ordered
    layout prunes meaningfully on BOTH keys."""
    from pyspark.sql import functions as F

    from event_pipeline_spark.operators.layout import (
        prunable_files,
        write_range_sorted,
        write_zordered,
    )

    n, files = 200_000, 16
    df = spark.range(n).select(
        (F.col("id") % 449).alias("a"),
        ((F.col("id") * 7919) % 463).alias("b"),
    )
    a_sorted, zordered = str(tmp_path / "asort"), str(tmp_path / "zord")
    write_range_sorted(df, a_sorted, ["a"], files)
    write_zordered(df, zordered, "a", "b", files, bits=9)

    # dimension a: both layouts prune
    hit_a_sorted, tot1 = prunable_files(a_sorted, "a", 10, 40)
    hit_a_z, tot2 = prunable_files(zordered, "a", 10, 40)
    assert len(hit_a_sorted) < tot1 and len(hit_a_z) < tot2
    # dimension b: only the Z-ordered layout prunes
    hit_b_sorted, tot_b = prunable_files(a_sorted, "b", 10, 40)
    hit_b_z, totz = prunable_files(zordered, "b", 10, 40)
    assert len(hit_b_sorted) == tot_b  # a-sorted layout reads every file
    assert len(hit_b_z) < totz


def test_hilbert_is_permutation_with_unit_steps(spark):
    """The defining Hilbert property (Z-order lacks it): over the full
    2^b x 2^b grid the index is a bijection AND every consecutive pair
    of curve positions is grid-adjacent (Manhattan distance exactly 1).
    """
    from pyspark.sql import functions as F

    from event_pipeline_spark.operators.layout import hilbert_value

    bits, n = 3, 8
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )
    rows = (
        grid.transform(hilbert_value(F.col("x"), F.col("y"), bits))
        .orderBy("h")
        .collect()
    )
    assert [r["h"] for r in rows] == list(range(n * n))
    steps = [
        abs(a["x"] - b["x"]) + abs(a["y"] - b["y"])
        for a, b in zip(rows, rows[1:])
    ]
    assert steps == [1] * (n * n - 1)


def test_hilbert_write_prunes_both_dimensions(spark, tmp_path):
    from pyspark.sql import functions as F

    from event_pipeline_spark.operators.layout import (
        prunable_files,
        write_hilbert,
    )

    n, files = 100_000, 16
    df = spark.range(n).select(
        (F.col("id") % 251).alias("a"),
        ((F.col("id") * 7919) % 241).alias("b"),
    )
    dest = str(tmp_path / "hil")
    write_hilbert(df, dest, "a", "b", files, bits=8)
    hit_a, tot_a = prunable_files(dest, "a", 10, 40)
    hit_b, tot_b = prunable_files(dest, "b", 10, 40)
    assert len(hit_a) < tot_a and len(hit_b) < tot_b


def test_partitioned_write_prunes_directories(spark, tmp_path):
    """A day= filter over a directory-partitioned table shows up as a
    PartitionFilter (no data filter needed) and the scan reads only
    the matching directory's files."""
    import os

    from pyspark.sql import functions as F

    from event_pipeline_spark.operators.layout import write_partitioned

    df = spark.range(0, 3000).select(
        "id",
        F.concat(
            F.lit("2024-01-0"), (F.col("id") % 5 + 1).cast("string")
        ).alias("day"),
    )
    path = f"{tmp_path}/by_day"
    write_partitioned(df, path, partition_cols=["day"])
    dirs = sorted(
        d for d in os.listdir(path) if d.startswith("day=")
    )
    assert dirs == [f"day=2024-01-0{i}" for i in range(1, 6)]
    # one file per partition directory (small-files bound)
    for d in dirs:
        files = [
            f for f in os.listdir(os.path.join(path, d))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, d

    q = spark.read.parquet(path).where(F.col("day") == "2024-01-03")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "2024-01-03" in plan.split("PartitionFilters", 1)[1][:200]
    assert q.count() == 600
