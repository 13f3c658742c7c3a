"""Documentation-contract gate: the counts README.md advertises for the
driver contract must equal what ``__spark_entry__`` actually exposes.

Round-8 ADVICE flagged drift between the documented numbers (then
255/243) and the registry (254/242); this test makes the doc a checked
claim instead of a hand-maintained one. No SparkSession needed — the
registry builds lazily.
"""

import pathlib
import re

ROOT = pathlib.Path(__file__).resolve().parent.parent


def _entry():
    import sys

    sys.path.insert(0, str(ROOT))
    import __spark_entry__ as entry

    return entry


def test_readme_counts_match_registry():
    text = (ROOT / "README.md").read_text()
    m = re.search(r"`queries\(\)` \((\d+) entries\)", text)
    assert m, "README driver-contract line moved; update this regex"
    documented_queries = int(m.group(1))
    m = re.search(r"`oracle_sql\(\)` \((\d+) DuckDB-checked", text)
    assert m, "README oracle-count line moved; update this regex"
    documented_oracles = int(m.group(1))

    entry = _entry()
    assert documented_queries == len(entry.queries())
    assert documented_oracles == len(entry.oracle_sql())


def test_oracles_are_subset_of_queries():
    entry = _entry()
    q, o = entry.queries(), entry.oracle_sql()
    missing = sorted(set(o) - set(q))
    assert not missing, f"oracles without a query: {missing}"
