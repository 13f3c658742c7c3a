"""Differential oracle checking: Spark result vs DuckDB result.

Mirrors the driver's t2 gate (BASELINE.md): run the Spark DataFrame and
the oracle SQL over the same parquet, canonicalize (columns sorted by
name, rows sorted, values normalized), and compare. Used by tests/ and
tools/check_oracles.py while iterating.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math
import os
from dataclasses import dataclass, field

import duckdb
import numpy as _np
import pandas as pd

from event_pipeline_spark.session import TABLE_NAMES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Register each parquet table as a view, like the driver does."""
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _canon_value(v: object) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        # repr keeps full double precision — NO zero-stripping: the
        # driver hashes rendered values, so Decimal('x.00') vs float
        # 'x.0' must FAIL here too (round-1 q12/q20/q31 lesson). Both
        # sides must emit the same dtype, not merely the same value.
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return format(v, "f")
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return "NULL"
        # FIXTURES.md: timestamps compared at microsecond precision
        return v.floor("us").isoformat()
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    try:
        if pd.isna(v):  # catches numpy NaT/NaN scalars
            return "NULL"
    except (TypeError, ValueError):
        pass
    return str(v)


def canonicalize(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    rows = [
        tuple(_canon_value(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    rows.sort()
    return rows


@dataclass
class DiffResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    columns_match: bool
    mismatches: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        status = "OK " if self.ok else "FAIL"
        msg = f"[{status}] {self.name}: spark={self.spark_rows} oracle={self.oracle_rows}"
        for m in self.mismatches[:5]:
            msg += f"\n    {m}"
        return msg


def _value_class(series: pd.Series) -> str:
    """Representation class of a column's values — the unit the driver's
    value-hash actually compares. Two engines agreeing on values but
    disagreeing on class (Decimal vs float64, int64 vs float64) hash
    differently, so class mismatch is a FAILURE here even when the
    canonical rows happen to collide."""
    for v in series:
        if v is None:
            continue
        try:
            if pd.isna(v):
                continue
        except (TypeError, ValueError):
            pass
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, decimal.Decimal):
            return "decimal"
        if isinstance(v, (pd.Timestamp, _dt.datetime)):
            return "timestamp"
        if isinstance(v, _dt.date):
            return "date"
        if isinstance(v, bytes):
            return "bytes"
        if isinstance(v, (int, _np.integer)):
            return "int"
        if isinstance(v, (float, _np.floating)):
            return "float"
        return type(v).__name__
    return "all-null"


def compare(
    name: str,
    spark_df,
    con: duckdb.DuckDBPyConnection,
    oracle_sql: str,
) -> DiffResult:
    spark_pd = spark_df.toPandas()
    oracle_pd = con.execute(oracle_sql).fetchdf()

    cols_match = sorted(spark_pd.columns) == sorted(oracle_pd.columns)
    s_rows = canonicalize(spark_pd)
    o_rows = canonicalize(oracle_pd)

    mismatches: list[str] = []
    if not cols_match:
        mismatches.append(
            f"columns: spark={sorted(spark_pd.columns)} oracle={sorted(oracle_pd.columns)}"
        )
    else:
        for c in spark_pd.columns:
            sc, oc = _value_class(spark_pd[c]), _value_class(oracle_pd[c])
            if "all-null" in (sc, oc):
                continue
            if sc != oc:
                cols_match = False
                mismatches.append(f"value-class[{c}]: spark={sc} oracle={oc}")
    if s_rows != o_rows:
        sset, oset = set(s_rows), set(o_rows)
        for r in list(sset - oset)[:3]:
            mismatches.append(f"spark-only: {r}")
        for r in list(oset - sset)[:3]:
            mismatches.append(f"oracle-only: {r}")
        if not (sset - oset) and not (oset - sset):
            mismatches.append("row multiplicity differs (same distinct rows)")

    return DiffResult(
        name=name,
        ok=cols_match and s_rows == o_rows,
        spark_rows=len(s_rows),
        oracle_rows=len(o_rows),
        columns_match=cols_match,
        mismatches=mismatches,
    )
