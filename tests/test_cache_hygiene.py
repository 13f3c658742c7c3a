"""Operator-internal persists are pinned and deterministically released.

VERDICT r4 task 7: ``running_total`` / ``ngram_jaccard_pairs`` /
``minhash_near_duplicates`` / ``frequent_items`` persist intermediates
the returned lazy plan still references, so the release point is after
the caller materializes — ``cache.release_pins()`` explicitly, or
automatically at the next registry-query entry.
"""

from __future__ import annotations

from event_pipeline_spark import cache
from event_pipeline_spark.registry import all_queries


def _cached_rdd_count(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_pins_released_after_each_materialization(spark, sf_dir):
    qs = all_queries()
    cache.release_pins()
    spark.catalog.clearCache()
    assert _cached_rdd_count(spark) == 0

    for name in ("running_total_by_day", "dedup_ngram_jaccard",
                 "frequent_event_types"):
        rows = qs[name](spark, sf_dir).collect()
        assert rows  # materialized with pins alive (recompute-unsafe ones)
        cache.release_pins()
        assert _cached_rdd_count(spark) == 0, name


def test_registry_entry_auto_releases_previous_pins(spark, sf_dir):
    qs = all_queries()
    cache.release_pins()
    spark.catalog.clearCache()

    qs["running_total_by_day"](spark, sf_dir).collect()
    assert cache.pinned_count() >= 1  # prefix pin survives materialization
    # next registry query drops the previous query's pins at entry
    qs["frequent_event_types"](spark, sf_dir).collect()
    assert cache.pinned_count() == 1  # only frequent's own pin remains
    cache.release_pins()
    assert _cached_rdd_count(spark) == 0
