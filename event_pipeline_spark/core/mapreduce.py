"""Map-with-error-split: the reference's Hadoop-streaming pattern.

The reference ships a pickled function as a Hadoop-streaming job whose
mapper applies it per record and whose reducer splits outputs into
results vs errors before collecting (scripts/hadoop_executor/
mapper.py:7-28, reducer.py:6-31). On Spark the whole pattern is one
``mapInPandas`` over Arrow batches with an error column — the
"reducer split" is a pair of filters on the same DataFrame (predicate
evaluation, no extra pass), and "collect" is whatever action the caller
chooses.
"""

from __future__ import annotations

import json
from typing import Any, Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame


def map_with_errors(
    df: DataFrame,
    fn: Callable[[dict[str, Any]], Any],
    *,
    result_type: str = "string",
) -> DataFrame:
    """Apply ``fn`` to each row (as a dict); capture exceptions per row.

    Returns the input columns plus ``result`` (fn output, JSON-encoded
    for non-scalar values when result_type='string') and ``error``
    (exception text, null on success) — exactly one is non-null.
    """
    schema = df.schema.simpleString()[7:-1]  # struct<...> → ...
    out_schema = f"{schema}, result {result_type}, error string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            results: list[Any] = []
            errors: list[str | None] = []
            for rec in pdf.to_dict(orient="records"):
                try:
                    val = fn(rec)
                    if result_type == "string" and not isinstance(val, (str, type(None))):
                        val = json.dumps(val, default=str)
                    results.append(val)
                    errors.append(None)
                except Exception as exc:  # noqa: BLE001 — per-row capture
                    results.append(None)
                    errors.append(f"{type(exc).__name__}: {exc}")
            pdf = pdf.copy()
            pdf["result"] = results
            pdf["error"] = errors
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def split_errors(mapped: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(successes, failures) — the reducer's partition step
    (reducer.py:14-27) as two filters over one lineage."""
    return (
        mapped.where(mapped["error"].isNull()),
        mapped.where(mapped["error"].isNotNull()),
    )
