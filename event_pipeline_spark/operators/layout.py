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
