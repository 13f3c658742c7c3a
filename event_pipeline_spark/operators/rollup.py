"""Multi-resolution time rollups — the hypertable / continuous-aggregate
pattern (driver mandate: "hypertable rollup" as a canonical custom
operator; reference analogue: the telemetry aggregates of SURVEY §2.6
materialized per time bucket).

At 100 TB you never re-scan raw events to answer an hourly question:

- ``rollup``: one pass over raw rows → per-(bucket, keys) algebraic
  partials (count/sum/min/max — the decomposable set, same table as
  ``operators.skew``).
- ``cascade``: coarser levels re-aggregate the *previous level's* rows
  (hour from minute, day from hour), so the day table costs |hour rows|,
  not |raw rows|. Exactness of the merge is oracle-checked against a
  direct GROUP BY over raw data.
- ``incremental_refresh``: a ``foreachBatch`` sink that MERGEs each
  micro-batch's partials into a rollup table keyed on (bucket, keys) via
  the partition-pruned parquet upsert — only buckets the batch touches
  are rewritten. Re-aggregation of (old partials ∪ new partials) uses the
  same merge functions, so late data folds in correctly.

``avg`` is served at read time as sum/count — never stored, because a
stored average cannot merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: (partial fn over raw, merge fn over partials) per algebraic aggregate.
_PARTIAL_MERGE = {
    "count": ("count", "sum"),
    "sum": ("sum", "sum"),
    "min": ("min", "min"),
    "max": ("max", "max"),
}

BUCKET_COL = "bucket"


def _check_aggs(aggs: list[tuple[str, str, str]]) -> None:
    for _, fn, _ in aggs:
        if fn not in _PARTIAL_MERGE:
            raise ValueError(
                f"{fn!r} does not merge across levels (algebraic only: "
                f"{sorted(_PARTIAL_MERGE)}); serve avg as sum/count at read time"
            )


def rollup(
    df: DataFrame,
    ts: str,
    width: str,
    aggs: list[tuple[str, str, str]],
    keys: list[str] | None = None,
) -> DataFrame:
    """Aggregate raw rows into ``width`` buckets (a ``date_trunc`` unit:
    minute/hour/day/week/month/year). Output: ``bucket``, keys, aliases.
    """
    _check_aggs(aggs)
    keys = keys or []
    cols = [
        getattr(F, _PARTIAL_MERGE[fn][0])(col).alias(alias)
        for col, fn, alias in aggs
    ]
    return (
        df.withColumn(BUCKET_COL, F.date_trunc(width, F.col(ts)))
        .groupBy(BUCKET_COL, *keys)
        .agg(*cols)
    )


def merge_rollup(
    finer: DataFrame,
    width: str,
    aggs: list[tuple[str, str, str]],
    keys: list[str] | None = None,
) -> DataFrame:
    """Re-aggregate an existing rollup into coarser ``width`` buckets
    using each aggregate's merge function (count partials SUM, not
    re-count). ``aggs`` aliases name columns of ``finer``."""
    _check_aggs(aggs)
    keys = keys or []
    cols = [
        getattr(F, _PARTIAL_MERGE[fn][1])(alias).alias(alias)
        for _, fn, alias in aggs
    ]
    return (
        finer.withColumn(BUCKET_COL, F.date_trunc(width, F.col(BUCKET_COL)))
        .groupBy(BUCKET_COL, *keys)
        .agg(*cols)
    )


def cascade(
    df: DataFrame,
    ts: str,
    widths: list[str],
    aggs: list[tuple[str, str, str]],
    keys: list[str] | None = None,
) -> dict[str, DataFrame]:
    """Build every level of a rollup hierarchy, each from the previous:
    ``cascade(events, "ts", ["minute", "hour", "day"], ...)`` scans raw
    data once (for the finest level); each coarser level aggregates the
    level before it."""
    out: dict[str, DataFrame] = {}
    prev: DataFrame | None = None
    for width in widths:
        prev = (
            rollup(df, ts, width, aggs, keys)
            if prev is None
            else merge_rollup(prev, width, aggs, keys)
        )
        out[width] = prev
    return out


def incremental_refresh(
    store,
    schema_name: str,
    ts: str,
    width: str,
    aggs: list[tuple[str, str, str]],
    keys: list[str] | None = None,
    partition_date_col: str | None = "day",
):
    """A ``foreachBatch`` function maintaining a rollup table under
    streaming ingest: partial-aggregate the micro-batch, merge with the
    stored partials for the touched (bucket, keys) rows, upsert.

    ``store`` is a ``ParquetTableStore`` (or any backend with
    ``upsert_table``/``as_dataframe``). Late rows merge into their true
    bucket — the merge functions make refresh order-independent.

    When ``partition_date_col`` is set, rows carry a ``yyyy-MM-dd``
    partition column derived from the bucket; construct the store with
    ``partition_by=[that col]`` and each refresh rewrites only the days
    the micro-batch touches (partition-pruned MERGE), so steady-state
    refresh cost is O(today), not O(history).
    """
    _check_aggs(aggs)
    keys = keys or []

    def _finalize(df: DataFrame) -> DataFrame:
        out = df.withColumn(
            "id",
            F.concat_ws(
                "|", F.date_format(BUCKET_COL, "yyyy-MM-dd HH:mm:ss"), *keys
            ),
        )
        if partition_date_col:
            out = out.withColumn(
                partition_date_col, F.date_format(BUCKET_COL, "yyyy-MM-dd")
            )
        return out

    def refresh(batch_df: DataFrame, batch_id: int) -> None:
        partial = _finalize(rollup(batch_df, ts, width, aggs, keys))
        if partial.isEmpty():
            return
        try:
            current = store.as_dataframe(schema_name)
        except Exception:  # first batch: no table yet
            store.upsert_table(schema_name, partial, key="id")
            return
        touched = current.join(partial.select("id").distinct(), "id", "inner")
        # derived cols (id, partition date) recompute after the merge;
        # union only the semantic columns so stored-side type inference
        # (e.g. the partition date read back as DATE) can't conflict
        needed = [BUCKET_COL, *keys, *[alias for _, _, alias in aggs]]
        merged = _finalize(
            merge_rollup(
                touched.select(needed).unionByName(partial.select(needed)),
                width,
                aggs,
                keys,
            )
        )
        store.upsert_table(schema_name, merged, key="id")

    return refresh


# -- oracle-checked query surface (driver correctness gate) ----------------

_AGGS = [
    ("value", "count", "n"),
    ("value", "sum", "sum_v"),
    ("value", "min", "min_v"),
    ("value", "max", "max_v"),
]


def _rollup_cascade_day(spark, sf_dir: str) -> DataFrame:
    """Day-level rollup computed THROUGH the cascade (minute → hour →
    day re-aggregation); the oracle aggregates raw rows directly, so the
    check proves level-to-level merging is exact."""
    from event_pipeline_spark.session import read_table

    events = read_table(spark, sf_dir, "events").withColumn(
        "value", F.col("value").cast("decimal(18,2)")
    )
    day = cascade(events, "ts", ["minute", "hour", "day"], _AGGS, ["event_type"])["day"]
    return day.select(
        F.date_format(BUCKET_COL, "yyyy-MM-dd").alias("d"),
        "event_type",
        "n",
        # DOUBLE on both sides: DuckDB fetchdf() renders DECIMAL as
        # float64; the driver hash compares rendered values.
        F.col("sum_v").cast("double").alias("sum_v"),
        F.col("min_v").cast("double").alias("min_v"),
        F.col("max_v").cast("double").alias("max_v"),
    ).orderBy("d", "event_type")


QUERIES = {"rollup_cascade": _rollup_cascade_day}
ORACLES = {
    "rollup_cascade": """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS d,
       event_type,
       COUNT(value) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
       CAST(MIN(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS min_v,
       CAST(MAX(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_v
FROM events GROUP BY date_trunc('day', ts), event_type
ORDER BY d, event_type"""
}
