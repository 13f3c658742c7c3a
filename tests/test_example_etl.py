"""Integration test: the examples/user_posts_etl pipeline end-to-end —
DSL parse → DAG run → piped stages → store write → telemetry roll-up."""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from examples.user_posts_etl import UserPostsETL
from event_pipeline_spark.core.events import EventRegistry
from event_pipeline_spark.plans.executor import RunState
from event_pipeline_spark.telemetry import TelemetryLogger, execution_metrics


def test_user_posts_etl_end_to_end(spark, sf_dir, tmp_path):
    import examples.user_posts_etl as mod

    for klass_name in ("LoadData", "ProcessData", "StoreData"):
        EventRegistry.register(getattr(mod, klass_name))

    out = f"file://{tmp_path}/etl_out"
    telemetry = TelemetryLogger()
    pipe = UserPostsETL(sf_dir=sf_dir, out_dir=out)
    assert "LoadData" in pipe.explain()

    run = pipe.start(spark, telemetry=telemetry)
    assert run.state is RunState.COMPLETED
    assert len(run.records) == 3  # three piped stages

    stored = spark.read.parquet(f"{out}/user_activity")
    n_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id").distinct().count()
    )
    assert stored.count() == n_users
    assert stored.agg(F.sum("n_events")).first()[0] == spark.read.parquet(
        f"{sf_dir}/events.parquet"
    ).count()

    m = execution_metrics(telemetry.to_df(spark))
    assert m["completed"] == 3 and m["failed"] == 0
    assert m["success_rate"] == 100.0


def test_training_data_pipeline_end_to_end(spark, sf_dir, tmp_path):
    """The curation flow: clean -> exact-dedup -> split/pack/shard ->
    partitioned store; invariants on the laid-out corpus."""
    import importlib

    mod = importlib.import_module("examples.training_data_pipeline")
    out = f"file://{tmp_path}/corpus"
    run = mod.TrainingDataPipeline(sf_dir=sf_dir, out_dir=out).start(spark)
    assert run.result is not None

    from event_pipeline_spark.stores import ParquetTableStore

    corpus = ParquetTableStore(out, spark).as_dataframe("corpus")
    rows = corpus.collect()
    assert len(rows) > 0
    assert len({r["doc_id"] for r in rows}) == len(rows)  # deduped, packed once
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    assert all(0 <= r["shard"] < 8 for r in rows)
    # pack token sums respect the budget (no doc over budget at this SF)
    from collections import defaultdict
    packs = defaultdict(int)
    for r in rows:
        packs[r["pack_id"]] += r["tokens"]
    assert max(packs.values()) <= 2048


def test_realtime_attribution_example_end_to_end(spark, sf_dir, tmp_path):
    """Stream-stream attribution: the drained stream must land exactly
    the rows the identical batch expression produces, and the report's
    HLL estimate must be near the exact converter count."""
    import importlib

    mod = importlib.import_module("examples.realtime_attribution")
    work = f"file://{tmp_path}/attr"
    clicks_dir, buys_dir = mod.prepare_sources(spark, sf_dir, work)
    sink = mod.run_stream(spark, clicks_dir, buys_dir, work)

    streamed = spark.read.parquet(sink)
    batch = mod.attributed(
        spark.read.parquet(clicks_dir), spark.read.parquet(buys_dir)
    )
    assert streamed.count() == batch.count() > 0
    s_keys = {(r["click_id"], r["buy_id"]) for r in streamed.collect()}
    b_keys = {(r["click_id"], r["buy_id"]) for r in batch.collect()}
    assert s_keys == b_keys

    rep = mod.report(spark, sink)
    first = rep.first()
    exact = streamed.select("user_id").distinct().count()
    assert abs(first["approx_distinct_converters"] - exact) <= max(3, 0.05 * exact)
    assert rep.count() == exact


def test_web_corpus_curation_composes(spark, sf_dir):
    """The r5 stages compose end-to-end: extraction recovers text,
    the perplexity filter and semantic dedup both bite (or pass
    everything through deterministically), and the budget fill is
    exact: every kept doc fits, adding the next-best would not."""
    import sys as _sys

    _sys.path.insert(0, "examples")
    from examples.web_corpus_curation import curate

    out = curate(spark, sf_dir, token_budget=5_000).collect()
    assert out  # something survives at every sf
    total = max(r["running_tokens"] for r in out)
    assert total <= 5_000
    # budget is FULL: the smallest excluded increment would overflow
    # (every selected doc has n_tokens >= 1, so a loose fill would
    # show total far under budget only if the corpus ran dry)
    assert total > 5_000 - max(r["n_tokens"] for r in out)


def test_trend_monitoring_example(spark, sf_dir, capsys):
    import importlib

    mod = importlib.import_module("examples.trend_monitoring")
    mod.main(sf_dir)
    out = capsys.readouterr().out
    lines = [l for l in out.strip().splitlines() if l]
    assert len(lines) == 5  # one verdict per event type
    assert all("best split" in l and "holt forecast" in l for l in lines)


def test_tokenizer_artifacts_example(spark, sf_dir, capsys):
    import importlib

    mod = importlib.import_module("examples.tokenizer_artifacts_pipeline")
    mod.main(sf_dir)
    out = capsys.readouterr().out
    assert "loaded tokenizer.json: BPE, 3 merges" in out
    assert "under the LOADED merge table" in out
    assert "'the' -> ['the'] (logp_units=-20000000)" in out
    assert "'and' -> ['and']" in out
    assert "'than' -> ['[UNK]']" in out  # 'h' uncovered: honest UNK
