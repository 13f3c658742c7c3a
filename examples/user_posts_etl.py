"""End-to-end ETL example (reference: examples/user_posts_etl/ —
``LoadData |-> ProcessData |-> GraphData``, a fetch → group-count →
render chain).

Here: load events from parquet |-> aggregate per user |-> persist to a
parquet store, with telemetry captured. Run:

    python examples/user_posts_etl.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from event_pipeline_spark.core.events import event
from event_pipeline_spark.core.fields import InputDataField
from event_pipeline_spark.plans.pipeline import Pipeline
from event_pipeline_spark.stores import ParquetTableStore
from event_pipeline_spark.telemetry import TelemetryLogger, execution_metrics


@event
def LoadData(spark, sf_dir):
    from event_pipeline_spark.session import read_table

    return True, read_table(spark, sf_dir, "events")


@event
def ProcessData(spark, previous_result):
    per_user = previous_result.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.count_if(F.col("event_type") == "purchase").alias("purchases"),
    )
    return True, per_user


@event
def StoreData(spark, previous_result, out_dir):
    store = ParquetTableStore(out_dir, spark)
    store.write_table("user_activity", previous_result, mode="overwrite")
    return True, previous_result


class UserPostsETL(Pipeline):
    sf_dir = InputDataField(str, required=True)
    out_dir = InputDataField(str, required=True)

    class Meta:
        pointy = "LoadData |-> ProcessData |-> StoreData"


def main(sf_dir: str, out_dir: str) -> dict:
    from event_pipeline_spark.session import get_session

    spark = get_session("user_posts_etl")
    telemetry = TelemetryLogger()
    pipe = UserPostsETL(sf_dir=sf_dir, out_dir=out_dir)
    print(pipe.explain())
    run = pipe.start(spark, telemetry=telemetry)
    metrics = execution_metrics(telemetry.to_df(spark))
    print("state:", run.state, "stages:", len(run.records), "metrics:", metrics)
    return metrics


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001",
        sys.argv[2] if len(sys.argv) > 2 else "/tmp/user_posts_etl_out",
    )
