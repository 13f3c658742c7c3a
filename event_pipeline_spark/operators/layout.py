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


# ---------------------------------------------------------------------------
# Hilbert-curve clustering
# ---------------------------------------------------------------------------

QUERIES = {}
ORACLES = {}


def hilbert_value(a, b, bits: int = 8):
    """Hilbert-curve index of two non-negative int columns (used modulo
    2^bits) — the space-filling curve with strictly better locality
    than the Z-curve: consecutive curve positions are ALWAYS
    grid-adjacent (Manhattan distance 1), where the Z-curve jumps
    across quadrant seams. Delta OPTIMIZE ZORDER's documented
    alternative (Hilbert clustering is what Databricks' liquid
    clustering uses) — better multi-dimension min/max pruning for the
    same sort.

    The classic xy2d loop (one reflect-rotate per bit level,
    Wikipedia's public formulation) unrolls into pure integer bitwise
    expressions: each level is materialized as its own projection so
    the expression tree stays LINEAR in ``bits`` (a single nested
    Column would re-expand the previous level's x/y at every
    reference — the `text.bind` lesson at the expression-tree level).
    Returns a function applied via ``DataFrame.transform`` because the
    per-level aliases must live as real projection columns.
    """
    from pyspark.sql import functions as F

    def apply(df: DataFrame, out_col: str = "h") -> DataFrame:
        df = df.withColumns(
            {
                "_hx": a.cast("long").bitwiseAND(F.lit((1 << bits) - 1)),
                "_hy": b.cast("long").bitwiseAND(F.lit((1 << bits) - 1)),
                "_hd": F.lit(0).cast("long"),
            }
        )
        s = 1 << (bits - 1)
        while s > 0:
            x, y, d = F.col("_hx"), F.col("_hy"), F.col("_hd")
            rx = F.when(x.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(
                F.lit(0)
            )
            ry = F.when(y.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(
                F.lit(0)
            )
            df = (
                df.withColumns({"_rx": rx, "_ry": ry})
                .withColumns(
                    {
                        "_hd": d
                        + F.lit(s)
                        * F.lit(s)
                        * (F.col("_rx") * 3).bitwiseXOR(F.col("_ry"))
                        .cast("long"),
                        # ry==0: reflect when rx==1, then swap axes
                        "_nx": F.when(
                            F.col("_ry") == 0,
                            F.when(
                                F.col("_rx") == 1, F.lit(s - 1) - y
                            ).otherwise(y),
                        ).otherwise(x),
                        "_ny": F.when(
                            F.col("_ry") == 0,
                            F.when(
                                F.col("_rx") == 1, F.lit(s - 1) - x
                            ).otherwise(x),
                        ).otherwise(y),
                    }
                )
                .withColumns(
                    {"_hx": F.col("_nx"), "_hy": F.col("_ny")}
                )
                .drop("_rx", "_ry", "_nx", "_ny")
            )
            s >>= 1
        return df.withColumn(out_col, F.col("_hd")).drop(
            "_hx", "_hy", "_hd"
        )

    return apply


def write_hilbert(
    df: DataFrame,
    path: str,
    key_a: str,
    key_b: str,
    n_files: int,
    *,
    bits: int = 8,
    mode: str = "overwrite",
) -> None:
    """Hilbert-clustered write — `write_zordered` with the better
    curve: sort by the Hilbert index so parquet footers carry tight
    min/max on BOTH columns with no quadrant-seam jumps."""
    from pyspark.sql import functions as F

    clustered = df.transform(
        hilbert_value(F.col(key_a), F.col(key_b), bits), "__h"
    )
    (
        clustered.repartitionByRange(n_files, "__h")
        .sortWithinPartitions("__h")
        .drop("__h")
        .write.mode(mode)
        .parquet(path)
    )


def _q_hilbert(spark, sf_dir: str):
    """Hilbert index over (custkey, orderkey) buckets — the clustering
    key `write_hilbert` sorts by, emitted for oracle verification."""
    from pyspark.sql import functions as F

    from event_pipeline_spark.session import read_table

    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.transform(
            hilbert_value(F.col("o_custkey"), F.col("o_orderkey"), 8)
        )
        .select(
            "o_orderkey",
            F.col("o_custkey").bitwiseAND(F.lit(255)).alias("x"),
            F.col("o_orderkey").bitwiseAND(F.lit(255)).alias("y"),
            F.col("h"),
        )
        .orderBy("h", "o_orderkey")
    )


def _hilbert_sql(bits: int = 8) -> str:
    """The same xy2d loop as unrolled DuckDB CTEs (one per bit level,
    MATERIALIZED so inlining cannot re-expand the level chain)."""
    sql = """
WITH it0 AS MATERIALIZED (
  SELECT o_orderkey, (o_custkey & 255) AS x, (o_orderkey & 255) AS y,
         0::BIGINT AS d
  FROM orders)"""
    lvl = 0
    s = 1 << (bits - 1)
    while s > 0:
        sql += f""",
it{lvl + 1} AS MATERIALIZED (
  SELECT o_orderkey,
         CASE WHEN (y & {s}) = 0
              THEN CASE WHEN (x & {s}) > 0 THEN {s - 1} - y ELSE y END
              ELSE x END AS x,
         CASE WHEN (y & {s}) = 0
              THEN CASE WHEN (x & {s}) > 0 THEN {s - 1} - x ELSE x END
              ELSE y END AS y,
         d + {s * s}::BIGINT *
             xor(3 * (CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END),
                 CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END) AS d
  FROM it{lvl})"""
        lvl += 1
        s >>= 1
    sql += f"""
SELECT o.o_orderkey, (o.o_custkey & 255)::BIGINT AS x,
       (o.o_orderkey & 255)::BIGINT AS y, t.d::BIGINT AS h
FROM orders o JOIN it{lvl} t USING (o_orderkey)
ORDER BY h, o_orderkey"""
    return sql


QUERIES["layout_hilbert"] = _q_hilbert
ORACLES["layout_hilbert"] = _hilbert_sql(8)


def write_partitioned(
    df: "DataFrame",
    path: str,
    *,
    partition_cols: list[str],
    files_per_partition: int = 1,
) -> None:
    """Directory-partitioned parquet (``day=2024-01-01/…``): the COARSE
    layout lever beside this module's in-file range sorting — a reader
    filtering on a partition column never opens the other directories
    at all (PartitionFilters in the scan, asserted by the layout
    tests), which at 100 TB is the difference between listing one
    day and listing the archive. Repartitioning on the partition
    columns first bounds output files at ``files_per_partition`` per
    directory instead of one per (task × partition) — the classic
    small-files accident."""
    from pyspark.sql import functions as F  # noqa: F401  (parity import)

    (
        df.repartition(files_per_partition, *partition_cols)
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(path)
    )
