"""Differential gate: every oracle-checkable query, Spark vs DuckDB.

Mirrors the driver's t2 check (BASELINE.md) at sf0.001 for speed;
``SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01`` reruns at gate scale.
"""

from __future__ import annotations

import pytest

from event_pipeline_spark.registry import all_oracles, all_queries
from event_pipeline_spark.testing.differential import compare, duckdb_connect

_QUERIES = all_queries()
_ORACLES = all_oracles()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connect(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle(name, spark, sf_dir, con):
    res = compare(name, _QUERIES[name](spark, sf_dir), con, _ORACLES[name])
    assert res.ok, str(res)


def test_all_oracle_queries_registered():
    # every oracle has a matching query implementation
    assert set(_ORACLES) <= set(_QUERIES)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and df.columns == [
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_price",
        "count_order",
    ]
