#!/usr/bin/env python
"""Dump .explain("formatted") for named queries to plans/<tag>/<name>_<suffix>.txt.

Usage: python tools/dump_plans.py <tag> <suffix> [query ...]
Defaults to the bench HEADLINE + OPERATORS set when no query names given.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from event_pipeline_spark.registry import all_queries  # noqa: E402
from event_pipeline_spark.session import get_session  # noqa: E402


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r11"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    if not names:
        import bench

        names = list(bench.HEADLINE) + list(bench.OPERATORS)

    out_dir = os.path.join("plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_session("dump_plans")
    queries = all_queries()
    for name in names:
        if name not in queries:
            print(f"skip (unknown): {name}")
            continue
        try:
            plan = queries[name](spark, sf_dir)
            txt = plan._sc._jvm.PythonSQLUtils.explainString(
                plan._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — keep dumping the rest
            txt = f"ERROR building/explaining {name}: {type(exc).__name__}: {exc}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
