"""Aggregated query/oracle registry across all modules.

``__spark_entry__.py`` pulls from here; operator modules register their
queryable surfaces by being imported here.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def _collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    from event_pipeline_spark import queries as core

    qs: dict[str, QueryFn] = dict(core.QUERIES)
    os_: dict[str, str] = dict(core.ORACLES)

    # North-star operator modules (registered as they land).
    for mod_name in (
        "dedup", "similarity", "text", "multimodal", "skew", "temporal",
        "rollup", "packing", "filtering", "sampling", "decontam", "ranking",
        "cdc", "fuzzy", "sketches", "validate", "bpe",
    ):
        try:
            mod = __import__(
                f"event_pipeline_spark.operators.{mod_name}",
                fromlist=["QUERIES", "ORACLES"],
            )
        except ImportError:
            continue
        qs.update(getattr(mod, "QUERIES", {}))
        os_.update(getattr(mod, "ORACLES", {}))
    return qs, os_


def all_queries() -> dict[str, QueryFn]:
    return _collect()[0]


def all_oracles() -> dict[str, str]:
    return _collect()[1]
