"""The automated plan-hygiene gate: every registered query's physical
plan is free of scale anti-patterns (cartesian products, undocumented
nested-loop joins, whole-table single-partition funnels, row-at-a-time
Python UDFs). Plans are BUILT, never executed — the audit covers the
whole registry in one session."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from tools.plan_audit import ALLOWED, audit_plan  # noqa: E402

from event_pipeline_spark.registry import all_queries  # noqa: E402


def test_every_registered_plan_is_scale_clean(spark, sf_dir):
    failures = []
    for name, fn in sorted(all_queries().items()):
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        for pat, detail in audit_plan(name, plan):
            failures.append(f"{name}: {pat} ({detail})")
    assert not failures, "\n".join(failures)


def test_allowances_are_documented_and_still_needed(spark, sf_dir):
    """Every ALLOWED entry must still match its query's plan — a stale
    allowance (pattern gone after a rewrite) must be deleted, not
    carried as dead configuration."""
    qs = all_queries()
    stale = []
    for name, pats in ALLOWED.items():
        assert name in qs, f"allowance for unknown query {name}"
        plan = qs[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        for pat in pats:
            if pat not in plan:
                stale.append(f"{name}: {pat}")
    assert not stale, f"stale allowances: {stale}"
