"""Data-layout operators: range-sorted writes for min/max pruning.

Bucketing (``operators/bucketing.py``) removes shuffles from repeated
equi-joins; this module covers the other big layout lever — **range
predicates**. ``write_range_sorted`` lays a table out so every file owns
a disjoint key range: ``repartitionByRange`` (one sampled range shuffle
at write time) + ``sortWithinPartitions``. Parquet footers then carry
tight, non-overlapping min/max stats per file AND per row group, so a
reader with ``WHERE k BETWEEN a AND b`` skips everything outside the
range — at 100 TB a time-range query touches hours, not the archive.
This is the static-layout complement to partition pruning: use
directory partitions for coarse keys (day), range-sorted files for
fine keys (timestamp, id) inside each partition.

``prunable_files`` reads the footers back and answers "which files can
contain this range?" — the same decision Spark's scan makes from
PushedFilters; exposed so tests (and pipelines) can verify the layout
actually prunes instead of trusting that it should.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

__all__ = ["write_range_sorted", "file_key_ranges", "prunable_files"]


def write_range_sorted(
    df: DataFrame,
    path: str,
    keys: list[str],
    n_files: int,
    *,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ~``n_files`` parquet files with disjoint sorted
    key ranges (sampled range partitioning, then an in-partition sort —
    no global sort barrier)."""
    (
        df.repartitionByRange(n_files, *keys)
        .sortWithinPartitions(*keys)
        .write.mode(mode)
        .parquet(path)
    )


def file_key_ranges(path: str, key: str) -> dict[str, tuple]:
    """(min, max) of ``key`` per parquet file, from footer statistics —
    no data pages read."""
    import pyarrow.parquet as pq

    out: dict[str, tuple] = {}
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        f = pq.ParquetFile(os.path.join(path, name))
        idx = f.schema_arrow.get_field_index(key)
        lo, hi = None, None
        for rg in range(f.metadata.num_row_groups):
            stats = f.metadata.row_group(rg).column(idx).statistics
            if stats is None or not stats.has_min_max:
                continue
            lo = stats.min if lo is None else min(lo, stats.min)
            hi = stats.max if hi is None else max(hi, stats.max)
        if lo is not None:
            out[name] = (lo, hi)
    return out


def prunable_files(path: str, key: str, lo, hi) -> tuple[list[str], int]:
    """Files whose footer range intersects [lo, hi] (what a min/max-
    pruning scan must read), plus the total file count — the pair a
    layout test asserts on."""
    ranges = file_key_ranges(path, key)
    hit = [
        name
        for name, (fmin, fmax) in ranges.items()
        if not (fmax < lo or fmin > hi)
    ]
    return hit, len(ranges)


def compact_parquet(
    spark,
    src: str,
    dest: str,
    *,
    target_file_mb: int = 256,
    sort_keys: list[str] | None = None,
) -> int:
    """Small-file compaction: rewrite a directory of parquet files into
    ~``target_file_mb``-sized files; returns the file count written.

    The maintenance operator every long-running ingestion needs —
    streaming sinks and per-batch appends produce thousands of KB-scale
    files whose open/footer overhead eventually dominates scans (and
    whose count explodes driver listing time at 100 TB). Sizing comes
    from the actual on-disk bytes, not row counts, so compressed width
    is respected. With ``sort_keys`` the rewrite also restores
    range-sorted min/max pruning (write_range_sorted's layout);
    without, a round-robin repartition balances file sizes exactly.
    """
    total = sum(
        os.path.getsize(os.path.join(src, n))
        for n in os.listdir(src)
        if n.endswith(".parquet")
    )
    n_files = max(1, -(-total // (target_file_mb << 20)))  # ceil div
    df = spark.read.parquet(src)
    if sort_keys:
        (
            df.repartitionByRange(n_files, *sort_keys)
            .sortWithinPartitions(*sort_keys)
            .write.mode("overwrite")
            .parquet(dest)
        )
    else:
        df.repartition(n_files).write.mode("overwrite").parquet(dest)
    return sum(1 for n in os.listdir(dest) if n.endswith(".parquet"))


def zorder_value(a, b, bits: int = 16):
    """Bit-interleaved Z-value of two non-negative int columns — the
    space-filling-curve key that clusters BOTH dimensions at once.
    Columns are used modulo 2^bits (callers bucket/rank real values
    into that range first). Pure bitwise expressions → whole-stage
    codegen, no UDF."""
    from pyspark.sql import functions as F

    z = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(abit, 2 * i)).bitwiseOR(
            F.shiftleft(bbit, 2 * i + 1)
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    key_a: str,
    key_b: str,
    n_files: int,
    *,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Two-dimensional clustering: sort by the Z-value of (key_a,
    key_b) so parquet footers carry tight min/max on BOTH columns.
    A single-key sort gives perfect pruning on one dimension and none
    on the other; the Z-curve trades a little of each for pruning on
    both — the standard layout for workloads that filter on either of
    two fine-grained keys (e.g. time AND tenant)."""
    from pyspark.sql import functions as F

    zcol = zorder_value(F.col(key_a), F.col(key_b), bits)
    (
        df.withColumn("__z", zcol)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
