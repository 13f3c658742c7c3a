"""End-to-end LLM training-data pipeline over the Pointy DSL.

Composes the north-star operators into the standard curation flow:

    Validate |-> Clean |-> Dedup |-> Select |-> Layout

- **Validate**: ingest contract (expectations) evaluated in one scan —
  a failing contract routes the pipeline to its failure branch instead
  of silently curating bad data;
- **Clean**: language-ID + quality score, keep docs above threshold;
- **Dedup**: drop exact duplicates (normalized-text digest, the
  shuffle-a-hash-not-the-text design), then near-duplicate clusters via
  MinHash-LSH keep one representative per cluster;
- **Select** (round 4): a trained quality classifier (heuristic-seeded
  labels -> HashingTF + logistic regression) scores survivors, and the
  distributed prefix sum fills a global token budget best-first;
- **Layout**: token counts → deterministic train/val split → FFD token
  packing → stable shards, written to a parquet store.

Every stage is a lazy DataFrame plan; one job runs at the final write.
Run:  python examples/training_data_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from event_pipeline_spark.core.events import event
from event_pipeline_spark.core.fields import InputDataField
from event_pipeline_spark.operators.dedup import (
    dedup_exact,
    minhash_near_duplicates,
)
from event_pipeline_spark.operators.packing import (
    assign_shards,
    pack_greedy,
    train_val_test_split,
)
from event_pipeline_spark.operators.text import (
    bpe_ish_token_count,
    predict_language,
    quality_score,
)
from event_pipeline_spark.plans.pipeline import Pipeline
from event_pipeline_spark.stores import ParquetTableStore


@event
def Load(spark, sf_dir):
    from event_pipeline_spark.session import read_table

    return True, read_table(spark, sf_dir, "documents")


@event
def Validate(spark, previous_result):
    """Ingest contract: one scan, every rule a conditional count. A
    non-empty violation set fails the event, routing execution to the
    pipeline's failure branch (reference semantics: on_failure edge)."""
    from event_pipeline_spark.operators.validate import check_rows

    report = check_rows(
        previous_result,
        {
            "doc_id_not_null": F.col("doc_id").isNotNull(),
            "text_not_null": F.col("text").isNotNull(),
            "n_chars_consistent": F.col("n_chars") >= 0,
        },
    )
    bad = report.where(F.col("violations") > 0).count()
    return bad == 0, previous_result


@event
def Clean(spark, previous_result, min_quality):
    docs = previous_result.withColumn(
        "lang_pred", predict_language(F.col("text"))
    ).withColumn("quality", quality_score(F.col("text")))
    return True, docs.where(F.col("quality") >= F.lit(min_quality))


@event
def Dedup(spark, previous_result):
    exact = dedup_exact(previous_result, text_col="text")
    # near-dup pass: LSH candidates -> keep the smallest doc_id of each
    # similar pair's cluster (greedy representative selection)
    pairs = minhash_near_duplicates(exact, threshold=0.7)
    losers = pairs.select(F.greatest("id_a", "id_b").alias("doc_id")).distinct()
    return True, exact.join(losers, "doc_id", "left_anti")


@event
def Select(spark, previous_result, token_budget):
    """Model-based selection: seed labels from the heuristic quality
    score's top half, train the classifier, keep the best-scoring docs
    until the corpus token budget is full (distributed prefix sum — no
    single-partition window)."""
    from event_pipeline_spark.operators.classify import (
        score_documents,
        train_quality_classifier,
    )
    from event_pipeline_spark.operators.prefix import select_token_budget

    docs = previous_result.withColumn(
        "tokens", bpe_ish_token_count(F.col("text")).cast("long")
    )
    median = docs.approxQuantile("quality", [0.5], 0.01)[0]
    labeled = docs.withColumn(
        "label", (F.col("quality") >= median).cast("double")
    )
    model = train_quality_classifier(labeled)
    scored = score_documents(model, docs)
    return True, select_token_budget(
        scored,
        score_col="p_good",
        tokens_col="tokens",
        budget=token_budget,
        id_col="doc_id",
    )


@event
def Layout(spark, previous_result, budget, n_shards, out_dir):
    from event_pipeline_spark.operators.sampling import shuffle_epoch

    # epoch-0 deterministic shuffle before packing: reproducible order
    # on any engine/re-run, no RNG state
    docs = shuffle_epoch(previous_result, "doc_id", epoch=0, seed="corpus")
    split = train_val_test_split(
        docs, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05}
    )
    packed = pack_greedy(split, "doc_id", "tokens", budget=budget)
    laid_out = assign_shards(
        split.select("doc_id", "split").join(packed, "doc_id"),
        "pack_id",
        n_shards,
    )
    store = ParquetTableStore(out_dir, spark, partition_by=["split", "shard"])
    store.write_table("corpus", laid_out, mode="overwrite")
    return True, laid_out


class TrainingDataPipeline(Pipeline):
    sf_dir = InputDataField(str, default="/root/testdata/sf0.001")
    out_dir = InputDataField(str)
    min_quality = InputDataField(float, default=0.3)
    token_budget = InputDataField(int, default=200_000)
    budget = InputDataField(int, default=2048)
    n_shards = InputDataField(int, default=8)

    class Meta:
        pointy = "Load |-> Validate |-> Clean |-> Dedup |-> Select |-> Layout"


def main() -> None:
    from event_pipeline_spark.session import get_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/training_corpus"
    spark = get_session("training-data-pipeline")
    run = TrainingDataPipeline(sf_dir=sf_dir, out_dir=out_dir).start(spark)
    final = run.result
    final.groupBy("split").agg(
        F.count(F.lit(1)).alias("docs"),
        F.countDistinct("pack_id").alias("packs"),
        F.sum("tokens").alias("tokens"),
    ).orderBy("split").show()


if __name__ == "__main__":
    main()
