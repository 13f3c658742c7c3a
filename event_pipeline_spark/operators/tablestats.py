"""Catalog statistics: ANALYZE persisted tables so Catalyst can plan.

Every hint-free broadcast decision in this codebase (e.g. the
three-state ``broadcast_build=None`` default in ``operators/fuzzy.py``)
delegates to Catalyst's size estimates. For a RAW parquet path Spark
estimates from file bytes — good enough for "is the whole table
small" — but a FILTERED build side is invisible to that estimate:
without column statistics the size-only planner passes a Filter's
child size straight through, so a 1%-selective dimension filter still
looks 100× too big and a perfectly broadcastable join plans as a
shuffle. At 100 TB that one wrong decision is the difference between
a map-side join and the largest exchange in the job.

The contract this module provides (plan-asserted by tests):

- ``save_analyzed`` persists a DataFrame as a catalog table and
  immediately writes basic (size + row count) and per-column (NDV,
  min/max, null count) statistics — the "persisted tables carry
  stats" discipline.
- With ``spark.sql.cbo.enabled`` and those stats present, Catalyst's
  ``FilterEstimation`` shrinks the filtered dimension below
  ``autoBroadcastJoinThreshold`` and picks BroadcastHashJoin WITHOUT
  any hint. Stats absent → the documented fallback: the size-only
  estimate keeps the un-filtered size, the join stays a shuffled
  sort-merge, and AQE may still rescue it AT RUNTIME from actual
  shuffle sizes (a second chance, not a plan — the whole build side
  is shuffled once before AQE can see it).

``ANALYZE`` costs one scan of the table at write time; it amortizes
over every subsequent query that plans against the numbers.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

__all__ = ["analyze_table", "table_stats", "save_analyzed"]


def analyze_table(
    spark: SparkSession, table: str, columns: list[str] | None = None
) -> dict:
    """Compute basic table statistics (size in bytes + row count) and,
    when ``columns`` is given, per-column stats (NDV, min/max, null
    count — what ``FilterEstimation`` needs for selectivity). Returns
    the stats read back from the catalog."""
    spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")
    if columns:
        cols = ", ".join(columns)
        spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR COLUMNS {cols}")
    stats = table_stats(spark, table)
    assert stats is not None  # ANALYZE just wrote them
    return stats


def table_stats(spark: SparkSession, table: str) -> dict | None:
    """(size_bytes, row_count) from ``DESCRIBE EXTENDED``, or None if
    the table carries no catalog statistics yet."""
    rows = spark.sql(f"DESCRIBE EXTENDED {table}").collect()
    line = next(
        (r["data_type"] for r in rows if r["col_name"] == "Statistics"),
        None,
    )
    if line is None:
        return None
    m = re.match(r"(\d+) bytes(?:, (\d+) rows)?", line)
    if not m:  # pragma: no cover - unexpected catalog format
        return {"raw": line}
    return {
        "size_bytes": int(m.group(1)),
        "row_count": int(m.group(2)) if m.group(2) else None,
    }


def save_analyzed(
    df: DataFrame,
    table: str,
    *,
    path: str | None = None,
    columns: list[str] | None = None,
    mode: str = "overwrite",
) -> dict:
    """Persist ``df`` as a catalog parquet table and ANALYZE it in the
    same breath — the write path persisted dimensions should take so
    every later join plans against real numbers (module doc)."""
    writer = df.write.mode(mode)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
    return analyze_table(df.sparkSession, table, columns=columns)
