"""Source connectors beyond plain ``spark.read`` (SURVEY §2.4)."""

from event_pipeline_spark.sources.http import fetch_json, fetch_shards

__all__ = ["fetch_json", "fetch_shards"]
