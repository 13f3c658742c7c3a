#!/usr/bin/env python
"""Run every registered query on Spark AND DuckDB; report diffs.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
Defaults to /root/testdata/sf0.001 and all oracle-checkable queries.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from event_pipeline_spark.registry import all_oracles, all_queries
from event_pipeline_spark.session import get_session
from event_pipeline_spark.testing.differential import compare, duckdb_connect


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    spark = get_session("check_oracles")
    con = duckdb_connect(sf_dir)
    queries, oracles = all_queries(), all_oracles()

    failures = 0
    no_oracle = []
    for name, fn in sorted(queries.items()):
        if only and name not in only:
            continue
        if name not in oracles:
            no_oracle.append(name)
            continue
        try:
            res = compare(name, fn(spark, sf_dir), con, oracles[name])
        except Exception as exc:  # noqa: BLE001 — report, keep going
            print(f"[ERR ] {name}: {type(exc).__name__}: {exc}")
            failures += 1
            continue
        print(res)
        failures += 0 if res.ok else 1

    if no_oracle:
        print(f"(rows-only, no oracle: {', '.join(sorted(no_oracle))})")
    print(f"\n{failures} failing")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
