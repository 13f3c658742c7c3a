"""Streaming semantics tests (SURVEY §5(d)): stream(availableNow) ==
batch for windows; watermark drops late rows; foreachBatch runs the DAG;
stateful per-key counts survive micro-batches; trigger mapping parity."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from event_pipeline_spark.core.events import EventBase, EventRegistry, event
from event_pipeline_spark.streaming import (
    ScheduleError,
    StreamingPipeline,
    has_transform_with_state,
    make_trigger,
    read_parquet_stream,
    running_counts,
    session,
    sessionize,
    sliding,
    tumbling,
    with_watermark,
)

# every test here is a multi-batch streaming integration run (15-90s
# each, ~20 min total): the whole module rides the slow lane so the
# driver's default verification run fits its budget; run with
# `pytest -m slow` (see pytest.ini / tests/slow_tests.txt)
pytestmark = pytest.mark.slow

EVENTS_COLS = ["event_id", "ts", "user_id", "event_type", "value"]


@pytest.fixture(scope="module")
def events_path(spark, sf_dir, tmp_path_factory):
    """events.parquet stores TIMESTAMP(NANOS), which streaming file
    sources reject; materialize the micros-converted copy once."""
    from event_pipeline_spark.session import read_table

    out = tmp_path_factory.mktemp("stream_events") / "events"
    read_table(spark, sf_dir, "events").write.parquet(str(out))
    return f"file://{out}"


def _await(query, timeout=120):
    query.awaitTermination(timeout)
    assert not query.isActive


# -- trigger mapping -------------------------------------------------------

def test_make_trigger_interval():
    assert make_trigger("interval", minutes=2, seconds=30) == {
        "processingTime": "150 seconds"
    }
    assert make_trigger("once") == {"availableNow": True}


def test_make_trigger_rejects_bad_kwargs():
    with pytest.raises(ScheduleError, match="takes"):
        make_trigger("interval", run_date="2026-01-01")
    with pytest.raises(ScheduleError, match="external scheduler"):
        make_trigger("cron", minute="*/5")
    with pytest.raises(ScheduleError, match="unknown"):
        make_trigger("nope")


# -- windows: stream == batch ----------------------------------------------

def test_tumbling_stream_equals_batch(spark, events_path, tmp_path):
    src = read_parquet_stream(spark, events_path)
    agg = tumbling(src, "ts", "1 hour", "event_type").count()
    q = (
        agg.writeStream.format("memory")
        .queryName("tumb")
        .outputMode("complete")
        .option("checkpointLocation", f"{tmp_path}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    got = {
        (r["window"]["start"], r["event_type"]): r["count"]
        for r in spark.table("tumb").collect()
    }
    batch = spark.read.parquet(events_path)
    want = {
        (r["window"]["start"], r["event_type"]): r["count"]
        for r in tumbling(batch, "ts", "1 hour", "event_type").count().collect()
    }
    assert got == want and len(want) > 0


def test_session_window_stream_equals_batch(spark, events_path, tmp_path):
    src = read_parquet_stream(spark, events_path)
    agg = session(with_watermark(src, "ts", "1 day"), "ts", "30 minutes", "user_id").count()
    q = (
        agg.writeStream.format("memory")
        .queryName("sess")
        .outputMode("complete")
        .option("checkpointLocation", f"{tmp_path}/ckpt2")
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    batch = spark.read.parquet(events_path)
    want = session(batch, "ts", "30 minutes", "user_id").count().count()
    assert spark.table("sess").count() == want > 0


def test_sliding_window_batch_shape(spark, events_path):
    df = spark.read.parquet(events_path)
    tumb = tumbling(df, "ts", "1 hour").count().count()
    slid = sliding(df, "ts", "1 hour", "30 minutes").count().count()
    assert slid > tumb  # overlapping windows produce more groups


def test_sessionize_batch_matches_session_window_counts(spark, events_path):
    df = spark.read.parquet(events_path).select("user_id", "ts")
    n_sessions_sql = session(df, "ts", "30 minutes", "user_id").count().count()
    ses = sessionize(df, "ts", 30 * 60, "user_id")
    n_sessions_flag = (
        ses.groupBy("user_id").agg(F.max("session_id").alias("m"))
        .agg(F.sum("m")).first()[0]
    )
    assert n_sessions_flag == n_sessions_sql


# -- watermark: late rows dropped -------------------------------------------

def test_watermark_drops_late_rows(spark, tmp_path):
    src_dir = f"file://{tmp_path}/wm_src"

    def write_batch(rows):
        spark.createDataFrame(rows, "id long, ts_s string").select(
            "id", F.to_timestamp("ts_s").alias("ts")
        ).coalesce(1).write.mode("append").parquet(src_dir)
        time.sleep(1.1)  # distinct mod times → one file per micro-batch

    # Spark filters late records with the PREVIOUS batch's watermark, so
    # the drop needs two batches after the watermark-advancing data: the
    # 10:05 row arrives when the late-event watermark is already 10:40.
    write_batch([(0, "2026-01-01 10:00:00"), (1, "2026-01-01 10:10:00"),
                 (2, "2026-01-01 10:50:00")])
    write_batch([(3, "2026-01-01 10:52:00")])
    write_batch([(99, "2026-01-01 10:05:00")])  # late beyond the horizon

    stream = read_parquet_stream(spark, src_dir, max_files_per_trigger=1)
    agg = tumbling(with_watermark(stream, "ts", "10 minutes"), "ts", "5 minutes").count()
    q = (
        agg.writeStream.format("memory")
        .queryName("wm")
        .outputMode("append")
        .option("checkpointLocation", f"{tmp_path}/wm_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    dropped = sum(
        op["numRowsDroppedByWatermark"]
        for p in q.recentProgress
        for op in p["stateOperators"]
    )
    assert dropped == 1  # the 10:05 row was dropped, not aggregated


# -- foreachBatch DAG execution ---------------------------------------------

@event
def CountToSink(spark, previous_result, batch_df, sink_dir):
    out = batch_df.where(F.col("event_type") == "click")
    out.write.mode("append").parquet(sink_dir)
    return True, out


@event
def SummarizeClicks(spark, previous_result):
    return True, previous_result.groupBy("user_id").count()


def test_streaming_pipeline_foreach_batch(spark, events_path, tmp_path):
    EventRegistry.register(CountToSink)
    EventRegistry.register(SummarizeClicks)
    sink = f"file://{tmp_path}/sink"
    sp = StreamingPipeline(
        "CountToSink |-> SummarizeClicks", params={"sink_dir": sink}
    )
    src = read_parquet_stream(spark, events_path)
    q = sp.start(src, checkpoint=f"{tmp_path}/fb_ckpt")
    _await(q)

    batch = spark.read.parquet(events_path)
    want_clicks = batch.where(F.col("event_type") == "click").count()
    assert spark.read.parquet(sink).count() == want_clicks
    assert len(sp.runs) >= 1
    # last context's DataFrame is the piped summary
    _, run = sp.runs[-1]
    assert run.result is not None and "count" in run.result.columns


# -- stateful per-key processing ---------------------------------------------

def test_running_counts_stateful(spark, tmp_path):
    src_dir = f"file://{tmp_path}/state_src"
    mk = lambda rows: spark.createDataFrame(rows, "user_id string, v long")  # noqa: E731
    mk([("a", 1), ("a", 2), ("b", 1)]).coalesce(1).write.mode("append").parquet(src_dir)
    time.sleep(1.1)
    mk([("a", 3), ("c", 1)]).coalesce(1).write.mode("append").parquet(src_dir)

    stream = read_parquet_stream(spark, src_dir, max_files_per_trigger=1)
    q = (
        running_counts(stream, "user_id")
        .writeStream.format("memory")
        .queryName("rc")
        .outputMode("update")
        .option("checkpointLocation", f"{tmp_path}/rc_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    final = {
        r["user_id"]: r["m"]
        for r in spark.table("rc")
        .groupBy("user_id")
        .agg(F.max("n").alias("m"))
        .collect()
    }
    assert final == {"a": 3, "b": 1, "c": 1}


# -- state API v2: transformWithStateInPandas --------------------------------

def test_transform_with_state_gated_when_protobuf_missing(spark, monkeypatch):
    """The v2 wrapper degrades to a clear error (not a worker crash) when
    pyspark's protobuf-based state client can't run — simulated by
    forcing the availability probe off (the vendored shim makes the
    real-absence path otherwise unreachable)."""
    import event_pipeline_spark.streaming.stateful as stateful_mod
    from event_pipeline_spark.streaming import (
        make_running_stats_processor,
        transform_with_state,
    )

    proc = make_running_stats_processor("user_id", "v")
    df = spark.createDataFrame([("a", 1.0)], "user_id string, v double")
    monkeypatch.setattr(stateful_mod, "ensure_protobuf", lambda s=None: False)
    with pytest.raises(RuntimeError, match="protobuf"):
        transform_with_state(df, ["user_id"], proc, "user_id string, n long")


@pytest.mark.skipif(
    not has_transform_with_state(),
    reason="protobuf unavailable and vendored shim missing",
)
def test_transform_with_state_running_stats(spark, tmp_path):
    """Per-key running stats survive micro-batches via state v2: the
    RocksDB provider + the repo's vendored pure-Python protobuf runtime
    (event_pipeline_spark/_vendor) talking to the JVM state server."""
    from event_pipeline_spark.streaming import (
        ROCKSDB_PROVIDER,
        RUNNING_STATS_SCHEMA,
        make_running_stats_processor,
        transform_with_state,
    )

    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    try:
        src_dir = f"file://{tmp_path}/tws_src"
        mk = lambda rows: spark.createDataFrame(rows, "user_id string, v double")  # noqa: E731
        mk([("a", 1.0), ("a", 2.0), ("b", 5.0)]).coalesce(1).write.mode("append").parquet(src_dir)
        time.sleep(1.1)
        mk([("a", 3.0)]).coalesce(1).write.mode("append").parquet(src_dir)

        stream = read_parquet_stream(spark, src_dir, max_files_per_trigger=1)
        out = transform_with_state(
            stream, ["user_id"], make_running_stats_processor("user_id", "v"),
            RUNNING_STATS_SCHEMA,
        )
        q = (
            out.writeStream.format("memory").queryName("tws")
            .outputMode("update")
            .option("checkpointLocation", f"{tmp_path}/tws_ckpt")
            .trigger(availableNow=True).start()
        )
        _await(q)
        final = {
            r["user_id"]: (r["n"], r["total"])
            for r in spark.table("tws")
            .groupBy("user_id")
            .agg(F.max("n").alias("n"), F.max("total").alias("total"))
            .collect()
        }
        assert final == {"a": (3, 6.0), "b": (1, 5.0)}
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


# -- observed metrics ---------------------------------------------------------

def test_observed_metrics_ride_the_stream(spark, tmp_path):
    """Per-micro-batch (n, errs) arrive via observedMetrics — no second
    aggregation pass — and the collector's totals match the data."""
    from event_pipeline_spark.streaming import (
        ObservedMetricsCollector,
        observe_errors,
    )

    src_dir = f"file://{tmp_path}/obs_src"
    mk = lambda rows: spark.createDataFrame(rows, "id long, error boolean")  # noqa: E731
    mk([(1, False), (2, True), (3, False)]).coalesce(1).write.mode("append").parquet(src_dir)
    time.sleep(1.1)
    mk([(4, True), (5, True)]).coalesce(1).write.mode("append").parquet(src_dir)

    seen = []
    collector = ObservedMetricsCollector(callback=lambda name, m: seen.append((name, m)))
    spark.streams.addListener(collector)
    try:
        stream = (
            spark.readStream.schema("id long, error boolean")
            .option("maxFilesPerTrigger", "1")
            .parquet(src_dir)
        )
        q = (
            observe_errors(stream, "ingest")
            .writeStream.format("memory")
            .queryName("obs")
            .outputMode("append")
            .option("checkpointLocation", f"{tmp_path}/obs_ckpt")
            .trigger(availableNow=True)
            .start()
        )
        _await(q)
        # listener delivery is async; poll briefly
        for _ in range(40):
            if collector.total("ingest", "n") >= 5:
                break
            time.sleep(0.25)
    finally:
        spark.streams.removeListener(collector)

    assert collector.total("ingest", "n") == 5
    assert collector.total("ingest", "errs") == 3
    assert len(collector.metrics["ingest"]) >= 2  # one report per micro-batch
    assert seen and seen[0][0] == "ingest"


# -- checkpoint restart: exactly-once continuation --------------------------

def test_checkpoint_restart_resumes_exactly_once(spark, tmp_path):
    """Stop a checkpointed stream, land more data, restart from the same
    checkpoint: the new query must process only the unseen files, and the
    union of all delivered batches must contain every input row exactly
    once — the recovery contract a 24/7 ingestion pipeline relies on."""
    src = f"file://{tmp_path}/restart_src"
    ledger = str(tmp_path / "ledger")

    def write_src(lo, hi):
        spark.range(lo, hi).coalesce(1).write.mode("append").parquet(src)

    def run_once():
        stream = spark.readStream.schema("id long").parquet(src)
        return (
            stream.writeStream.foreachBatch(
                lambda df, bid: df.write.mode("append").parquet(ledger)
            )
            .option("checkpointLocation", f"{tmp_path}/restart_ckpt")
            .trigger(availableNow=True)
            .start()
        )

    write_src(0, 50)
    q1 = run_once()
    q1.awaitTermination(120)
    assert sorted(
        r["id"] for r in spark.read.parquet(ledger).collect()
    ) == list(range(50))

    write_src(50, 80)
    q2 = run_once()
    q2.awaitTermination(120)
    got = sorted(r["id"] for r in spark.read.parquet(ledger).collect())
    assert got == list(range(80))  # no gaps, no duplicates


# -- streaming ingestion dedup ----------------------------------------------

def test_dedup_stream_drops_redelivered_rows(spark, tmp_path):
    from event_pipeline_spark.streaming.windows import dedup_stream

    src = f"file://{tmp_path}/dd_src"

    def write_batch(rows):
        spark.createDataFrame(rows, "id long, ts_s string").select(
            "id", F.to_timestamp("ts_s").alias("ts")
        ).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)

    # batch 1 delivers ids 1,2; batch 2 redelivers id 2 (in-horizon dup)
    # and delivers id 3
    write_batch([(1, "2026-01-01 10:00:00"), (2, "2026-01-01 10:00:30")])
    write_batch([(2, "2026-01-01 10:00:30"), (3, "2026-01-01 10:01:00")])

    stream = read_parquet_stream(spark, src, max_files_per_trigger=1)
    deduped = dedup_stream(stream, ["id"], "ts", "10 minutes")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dd")
        .outputMode("append")
        .option("checkpointLocation", f"{tmp_path}/dd_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    got = sorted(r["id"] for r in spark.sql("SELECT id FROM dd").collect())
    assert got == [1, 2, 3]  # the redelivered 2 was dropped


# -- stream-stream joins -----------------------------------------------------

def test_stream_stream_inner_join_equals_batch(spark, tmp_path):
    """Clicks joined to purchases within 30 minutes per user: the
    streaming inner join (availableNow, multi-micro-batch) delivers
    exactly the rows the same expression produces on batch frames."""
    from event_pipeline_spark.streaming import (
        read_parquet_stream,
        stream_stream_join,
    )

    clicks_dir = f"file://{tmp_path}/ssj_clicks"
    buys_dir = f"file://{tmp_path}/ssj_buys"

    def write(path, rows, schema):
        spark.createDataFrame(rows, schema).select(
            "*", F.to_timestamp(F.col("ts_s")).alias("ts")
        ).drop("ts_s").coalesce(1).write.mode("append").parquet(path)
        time.sleep(1.1)

    c_schema = "user_id long, click_id long, ts_s string"
    b_schema = "user_id long, buy_id long, ts_s string"
    write(clicks_dir, [(1, 10, "2026-01-01 10:00:00"), (2, 20, "2026-01-01 10:05:00")], c_schema)
    write(clicks_dir, [(1, 11, "2026-01-01 11:00:00")], c_schema)
    write(buys_dir, [(1, 100, "2026-01-01 10:20:00"),   # joins click 10
                     (2, 200, "2026-01-01 10:50:00")], b_schema)  # outside 30m of 20
    write(buys_dir, [(1, 101, "2026-01-01 11:10:00")], b_schema)  # joins click 11

    def build(cl, by):
        cl = cl.withColumnRenamed("ts", "click_ts")
        by = by.withColumnRenamed("ts", "buy_ts")
        return stream_stream_join(
            cl, by, keys=["user_id"], left_ts="click_ts",
            right_ts="buy_ts", watermark="1 hour", within="30 MINUTES",
        ).select("user_id", "click_id", "buy_id")

    out = build(
        read_parquet_stream(spark, clicks_dir, max_files_per_trigger=1),
        read_parquet_stream(spark, buys_dir, max_files_per_trigger=1),
    )
    q = (
        out.writeStream.format("memory").queryName("ssj")
        .outputMode("append")
        .option("checkpointLocation", f"{tmp_path}/ssj_ckpt")
        .trigger(availableNow=True).start()
    )
    _await(q)
    got = {tuple(r) for r in spark.table("ssj").collect()}
    want = {
        tuple(r)
        for r in build(
            spark.read.parquet(clicks_dir), spark.read.parquet(buys_dir)
        ).collect()
    }
    assert got == want == {(1, 10, 100), (1, 11, 101)}


def test_stream_stream_left_outer_join_pads_after_watermark(spark, tmp_path):
    """Left-outer stream-stream join: the unmatched click emits a
    null-padded row once the watermark passes its join horizon (advanced
    by a later sentinel row — the standard way to flush outer state in a
    bounded run)."""
    from event_pipeline_spark.streaming import (
        read_parquet_stream,
        stream_stream_join,
    )

    clicks_dir = f"file://{tmp_path}/ssjo_clicks"
    buys_dir = f"file://{tmp_path}/ssjo_buys"

    def write(path, rows, schema):
        spark.createDataFrame(rows, schema).select(
            "*", F.to_timestamp(F.col("ts_s")).alias("ts")
        ).drop("ts_s").coalesce(1).write.mode("append").parquet(path)
        time.sleep(1.1)

    c_schema = "user_id long, click_id long, ts_s string"
    b_schema = "user_id long, buy_id long, ts_s string"
    write(clicks_dir, [(1, 10, "2026-01-01 10:00:00"),   # will match
                       (2, 20, "2026-01-01 10:00:00")], c_schema)  # never matches
    write(buys_dir, [(1, 100, "2026-01-01 10:10:00")], b_schema)
    # sentinel rows far in the future push both watermarks past the
    # 10:00 + 30min + 10min horizon so the outer row for user 2 flushes
    write(clicks_dir, [(9, 90, "2026-01-01 14:00:00")], c_schema)
    write(buys_dir, [(9, 900, "2026-01-01 14:00:00")], b_schema)

    cl = read_parquet_stream(spark, clicks_dir, max_files_per_trigger=1)
    by = read_parquet_stream(spark, buys_dir, max_files_per_trigger=1)
    out = stream_stream_join(
        cl.withColumnRenamed("ts", "click_ts"),
        by.withColumnRenamed("ts", "buy_ts"),
        keys=["user_id"], left_ts="click_ts", right_ts="buy_ts",
        watermark="10 minutes", within="30 MINUTES", how="left_outer",
    ).select("user_id", "click_id", "buy_id")
    q = (
        out.writeStream.format("memory").queryName("ssjo")
        .outputMode("append")
        .option("checkpointLocation", f"{tmp_path}/ssjo_ckpt")
        .trigger(availableNow=True).start()
    )
    _await(q)
    got = {tuple(r) for r in spark.table("ssjo").collect()}
    assert (1, 10, 100) in got          # matched pair
    assert (2, 20, None) in got         # null-padded after horizon
    assert (9, 90, 900) in got          # sentinel matched itself


def test_stateful_timeout_expires_idle_keys(spark, tmp_path):
    """Processing-time state expiry: a key that goes idle must emit a
    final closed=true row and its state must be evicted (state size
    stays bounded by ACTIVE keys — the 24/7 operating contract)."""
    from event_pipeline_spark.streaming.stateful import sessionizing_counts

    src_dir = f"file://{tmp_path}/to_src"
    mk = lambda rows: spark.createDataFrame(rows, "user_id string, v long")  # noqa: E731
    mk([("a", 1), ("a", 2), ("b", 1)]).coalesce(1).write.mode("append").parquet(src_dir)

    from event_pipeline_spark.streaming import read_parquet_stream

    stream = read_parquet_stream(spark, src_dir, max_files_per_trigger=1)
    q = (
        sessionizing_counts(stream, "user_id", idle_ms=1_500)
        .writeStream.format("memory")
        .queryName("toq")
        .outputMode("update")
        .option("checkpointLocation", f"{tmp_path}/to_ckpt")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        # wait for the first batch's live rows
        for _ in range(40):
            if spark.table("toq").where("closed = false").count() >= 2:
                break
            time.sleep(0.5)
        # go idle past the timeout, then land data for a DIFFERENT key —
        # the new batch advances processing time and fires a's timeout
        time.sleep(2.5)
        mk([("c", 1)]).coalesce(1).write.mode("append").parquet(src_dir)
        for _ in range(60):
            done = (
                spark.table("toq").where("closed = true").count() >= 2
                and spark.table("toq")
                .where("user_id = 'c' AND NOT closed")
                .count()
                >= 1
            )
            if done:
                break
            time.sleep(0.5)
    finally:
        q.stop()

    rows = spark.table("toq").collect()
    closed = {r["user_id"]: r["n"] for r in rows if r["closed"]}
    live = {r["user_id"]: r["n"] for r in rows if not r["closed"]}
    assert closed.get("a") == 2 and closed.get("b") == 1  # final counts at expiry
    assert live.get("a") == 2 and live.get("b") == 1 and live.get("c") == 1


def test_streaming_incremental_near_dedup_against_corpus(spark, tmp_path):
    """The production ingest flow end-to-end: each micro-batch is
    near-dup-checked against the standing corpus (cross-side LSH, never
    a corpus self-join) and only novel docs append — so the corpus stays
    deduplicated as it grows, batch by batch."""
    from event_pipeline_spark.operators.dedup import (
        minhash_cross_near_duplicates,
    )

    src = f"file://{tmp_path}/inc_src"
    corpus_dir = f"file://{tmp_path}/inc_corpus"
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    alt = "spark shuffles partition data across executors during wide joins"

    def write_batch(rows):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(src)
        time.sleep(1.1)

    # seed corpus with doc 0; batch 1 brings a near-dup of it + a novel
    # doc; batch 2 brings a near-dup of BATCH 1's novel doc
    spark.createDataFrame(
        [(0, base)], "doc_id long, text string"
    ).write.mode("overwrite").parquet(corpus_dir)
    write_batch([(10, base + " today"), (11, alt)])
    write_batch([(20, alt + " nightly"), (21, "entirely novel zebra "
                                              "quartz lantern text body")])

    def ingest(batch_df, _bid):
        corpus = spark.read.parquet(corpus_dir)
        dupes = minhash_cross_near_duplicates(
            batch_df, corpus, threshold=0.6
        )
        dupe_ids = dupes.select(
            F.greatest("id_a", "id_b").alias("doc_id")
        ).distinct()
        batch_df.join(dupe_ids, "doc_id", "left_anti").write.mode(
            "append"
        ).parquet(corpus_dir)

    stream = read_parquet_stream(spark, src, max_files_per_trigger=1)
    q = (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", f"{tmp_path}/inc_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    _await(q)

    final = {r["doc_id"] for r in spark.read.parquet(corpus_dir).collect()}
    assert 0 in final and 11 in final and 21 in final  # seed + novels kept
    assert 10 not in final  # near-dup of the seed rejected
    assert 20 not in final  # near-dup of batch 1's novel doc rejected


def test_transform_with_state_list_map_and_ttl(spark, tmp_path):
    """The full state-v2 variable surface live: ListState append/get,
    MapState update/keys, ValueState with TTL — exercising the shim's
    repeated-bytes, map-call, and TTLConfig wire paths against the JVM
    state server across micro-batches."""
    from event_pipeline_spark.streaming import (
        ROCKSDB_PROVIDER,
        SESSION_LOG_SCHEMA,
        make_session_log_processor,
        transform_with_state,
    )

    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    try:
        src_dir = f"file://{tmp_path}/tws2_src"
        mk = lambda rows: spark.createDataFrame(rows, "user_id string, v double")  # noqa: E731
        mk([("a", 3.0), ("a", 17.0), ("b", 25.0)]).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
        time.sleep(1.1)
        mk([("a", 12.0)]).coalesce(1).write.mode("append").parquet(src_dir)

        stream = read_parquet_stream(spark, src_dir, max_files_per_trigger=1)
        out = transform_with_state(
            stream,
            ["user_id"],
            make_session_log_processor("user_id", "v", ttl_ms=3_600_000),
            SESSION_LOG_SCHEMA,
            time_mode="ProcessingTime",  # required for TTL-carrying state
        )
        # In ProcessingTime mode the engine keeps scheduling no-data
        # batches for timer/TTL bookkeeping, so availableNow never
        # terminates on its own: poll for the expected rows, then stop.
        q = (
            out.writeStream.format("memory").queryName("tws2")
            .outputMode("update")
            .option("checkpointLocation", f"{tmp_path}/tws2_ckpt")
            .trigger(processingTime="1 second").start()
        )
        try:
            def snapshot():
                return {
                    r["user_id"]: (r["log_len"], r["n_buckets"], r["total"])
                    for r in spark.table("tws2")
                    .groupBy("user_id")
                    .agg(
                        F.max("log_len").alias("log_len"),
                        F.max("n_buckets").alias("n_buckets"),
                        F.max("total").alias("total"),
                    )
                    .collect()
                }

            # a: values 3.0, 17.0 (batch 1) + 12.0 (batch 2) -> log of
            # 3, buckets {0, 1}, total 32; state carried across batches
            want = {"a": (3, 2, 32.0), "b": (1, 1, 25.0)}
            deadline = time.time() + 120
            final = snapshot()
            while final != want and time.time() < deadline:
                time.sleep(2)
                final = snapshot()
            assert final == want
        finally:
            q.stop()
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_transform_with_state_timers_fire(spark, tmp_path):
    """Processing-time timers live: registerTimer in handleInputRows,
    the engine fires handleExpiredTimer on a later batch, listTimers
    sees pending timers — covering the shim's RegisterTimer/ListTimers/
    ExpiryTimerRequest + StateResponseWithTimer wire paths."""
    from event_pipeline_spark.streaming import (
        ROCKSDB_PROVIDER,
        TIMER_SCHEMA,
        make_timer_processor,
        transform_with_state,
    )

    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    try:
        src_dir = f"file://{tmp_path}/twst_src"
        spark.createDataFrame(
            [("a", 1.0), ("b", 2.0)], "user_id string, v double"
        ).coalesce(1).write.mode("append").parquet(src_dir)

        stream = read_parquet_stream(spark, src_dir)
        out = transform_with_state(
            stream,
            ["user_id"],
            make_timer_processor("user_id", delay_ms=10),
            TIMER_SCHEMA,
            time_mode="ProcessingTime",
        )
        q = (
            out.writeStream.format("memory").queryName("twst")
            .outputMode("update")
            .option("checkpointLocation", f"{tmp_path}/twst_ckpt")
            .trigger(processingTime="1 second").start()
        )
        try:
            deadline = time.time() + 120
            fired = set()
            while len(fired) < 2 and time.time() < deadline:
                time.sleep(2)
                fired = {
                    r["user_id"]
                    for r in spark.table("twst").where("fired").collect()
                }
            assert fired == {"a", "b"}  # both keys' timers expired
            rows = spark.table("twst").where("NOT fired").collect()
            assert {r["user_id"]: r["n"] for r in rows} == {"a": 1, "b": 1}
        finally:
            q.stop()
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_streaming_near_dedup_finds_cross_batch_pairs(spark, tmp_path):
    """The LSH index lives in state: a doc streamed in batch 2 is
    caught against its batch-1 near-duplicate without re-reading the
    corpus; unrelated docs pair with nothing; exact duplicates report
    jaccard 1.0."""
    from event_pipeline_spark.streaming import streaming_near_dedup
    from event_pipeline_spark.streaming.stateful import ROCKSDB_PROVIDER

    text = ("the quick brown fox jumps over the lazy dog again and again "
            "while the cat watches from the fence with great interest")
    near = text.replace("great interest", "mild interest")
    other = ("completely different words about spark shuffles catalyst "
             "plans and adaptive query execution at petabyte scale")

    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    try:
        src_dir = f"file://{tmp_path}/nd_src"
        mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")  # noqa: E731
        mk([(1, text), (2, other), (3, text)]).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
        time.sleep(1.1)
        mk([(4, near), (5, "zebra quartz lantern nothing alike "
                           "whatsoever in any shingle")]).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)

        stream = read_parquet_stream(spark, src_dir, max_files_per_trigger=1)
        pairs = streaming_near_dedup(stream, threshold=0.5)
        q = (
            pairs.writeStream.format("memory").queryName("nd")
            .outputMode("update")
            .option("checkpointLocation", f"{tmp_path}/nd_ckpt")
            .trigger(availableNow=True).start()
        )
        _await(q)
        rows = spark.table("nd").collect()
        got = {}
        for r in rows:
            got[(r["id_a"], r["id_b"])] = r["jaccard"]
        # batch-1 exact duplicate
        assert got.get((1, 3)) == 1.0
        # batch-2 doc vs batch-1 corpus: caught via state, high jaccard
        assert (1, 4) in got and got[(1, 4)] >= 0.5
        assert (3, 4) in got
        # unrelated docs never pair
        assert all(2 not in p and 5 not in p for p in got)
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_streaming_near_dedup_state_survives_restart(spark, tmp_path):
    """The LSH index is durable: stop the query after batch 1, start a
    NEW query from the same checkpoint, and a batch-2 duplicate is
    still caught against the batch-1 corpus — state restored from
    RocksDB, nothing re-streamed."""
    from event_pipeline_spark.streaming import streaming_near_dedup
    from event_pipeline_spark.streaming.stateful import ROCKSDB_PROVIDER

    text = ("the quick brown fox jumps over the lazy dog again and again "
            "while the cat watches from the fence with great interest")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    try:
        src_dir = f"file://{tmp_path}/ndr_src"
        ckpt = f"{tmp_path}/ndr_ckpt"
        mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")  # noqa: E731

        collected: list = []

        def run_query():
            # memory sink can't recover from a checkpoint; foreachBatch
            # can, and runs driver-side in local mode
            stream = read_parquet_stream(spark, src_dir, max_files_per_trigger=4)
            return (
                streaming_near_dedup(stream, threshold=0.5)
                .writeStream.foreachBatch(
                    lambda df, _id: collected.extend(df.collect())
                )
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True).start()
            )

        mk([(1, text)]).coalesce(1).write.mode("append").parquet(src_dir)
        q1 = run_query()
        _await(q1)
        assert collected == []  # nothing to pair yet

        mk([(2, text)]).coalesce(1).write.mode("append").parquet(src_dir)
        q2 = run_query()  # fresh query object, same checkpoint
        _await(q2)
        pairs = {(r["id_a"], r["id_b"], r["jaccard"]) for r in collected}
        assert pairs == {(1, 2, 1.0)}  # doc 1 came from restored state
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_transform_with_state_event_time_timers(spark, tmp_path):
    """Event-time timers: a key idle past the gap IN EVENT TIME is
    closed when the watermark crosses its timer — wall clock plays no
    part. Covers timeMode=EventTime + deleteTimer re-arming."""
    from event_pipeline_spark.streaming import (
        EVENT_SESSION_SCHEMA,
        make_event_time_session_processor,
        transform_with_state,
    )
    from event_pipeline_spark.streaming.stateful import ROCKSDB_PROVIDER

    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    try:
        src_dir = f"file://{tmp_path}/et_src"

        def write(rows):
            spark.createDataFrame(rows, "user_id string, ts_s string").select(
                "user_id", F.to_timestamp("ts_s").alias("ts")
            ).coalesce(1).write.mode("append").parquet(src_dir)
            time.sleep(1.1)

        # a: two events, then silence; b keeps the watermark moving
        write([("a", "2026-01-01 10:00:00"), ("a", "2026-01-01 10:00:01"),
               ("b", "2026-01-01 10:00:01")])
        write([("b", "2026-01-01 10:00:10")])   # wm -> ~10:00:01
        write([("b", "2026-01-01 10:00:20")])   # wm -> ~10:00:10 > a's timer

        stream = read_parquet_stream(
            spark, src_dir, max_files_per_trigger=1
        ).withWatermark("ts", "0 seconds")
        out = transform_with_state(
            stream,
            ["user_id"],
            make_event_time_session_processor("user_id", "ts", gap_ms=500),
            EVENT_SESSION_SCHEMA,
            time_mode="EventTime",
        )
        q = (
            out.writeStream.format("memory").queryName("et")
            .outputMode("update")
            .option("checkpointLocation", f"{tmp_path}/et_ckpt")
            .trigger(availableNow=True).start()
        )
        _await(q)
        rows = spark.table("et").collect()
        closed = {r["user_id"]: r["n"] for r in rows if r["closed"]}
        assert closed.get("a") == 2  # a's session closed by event time
        open_counts = {
            r["user_id"]: r["n"] for r in rows if not r["closed"]
        }
        assert open_counts["b"] >= 1  # b stayed live while data flowed
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_idempotent_sink_converges_under_replay(spark, tmp_path):
    """Replaying a batch (same batch_id) overwrites its own partition —
    no duplicates; a later batch lands beside it; a half-written batch
    replayed with more rows converges to the replay's content."""
    from event_pipeline_spark.streaming import (
        idempotent_parquet_writer,
        read_sink,
    )

    base = f"file://{tmp_path}/sink"
    write = idempotent_parquet_writer(base)
    b0 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    write(b0, 0)
    write(b0, 0)  # replay: same batch twice
    assert sorted(r["id"] for r in read_sink(spark, base).collect()) == [1, 2]

    b1 = spark.createDataFrame([(3, "c")], "id long, v string")
    write(b1, 1)
    # batch 0 crashed mid-write in a past life: replay carries MORE rows
    b0_full = spark.createDataFrame(
        [(1, "a"), (2, "b"), (9, "z")], "id long, v string"
    )
    write(b0_full, 0)
    got = sorted(r["id"] for r in read_sink(spark, base).collect())
    assert got == [1, 2, 3, 9]  # batch-0 replaced wholesale, batch-1 kept


def test_idempotent_sink_end_to_end_with_restart(spark, tmp_path):
    """Live: the same stream checkpoint-restarted re-delivers nothing
    extra through the sink — counts equal the source exactly."""
    from event_pipeline_spark.streaming import (
        idempotent_parquet_writer,
        read_sink,
    )

    src_dir = f"file://{tmp_path}/is_src"
    base = f"file://{tmp_path}/is_sink"
    mk = lambda rows: spark.createDataFrame(rows, "id long")  # noqa: E731
    mk([(i,) for i in range(5)]).coalesce(1).write.mode("append").parquet(src_dir)

    def run():
        q = (
            spark.readStream.schema("id long").parquet(src_dir)
            .writeStream.foreachBatch(idempotent_parquet_writer(base))
            .option("checkpointLocation", f"{tmp_path}/is_ckpt")
            .trigger(availableNow=True).start()
        )
        _await(q)

    run()
    mk([(i,) for i in range(5, 8)]).coalesce(1).write.mode("append").parquet(src_dir)
    run()  # restart from checkpoint: only the new file processed
    got = sorted(r["id"] for r in read_sink(spark, base).collect())
    assert got == list(range(8))


def test_socket_source_streams_through_windows(spark, tmp_path):
    """Spark's TCP socket source live: a local server emits events, the
    stream aggregates them through the same window operators as the
    file sources — continuous ingestion without any connector jar."""
    import json as _json
    import socket
    import socketserver
    import threading

    lines = [
        _json.dumps({"user_id": u, "v": i})
        for i, u in enumerate(["a", "b", "a", "a", "b", "c"])
    ]
    started = threading.Event()

    class Handler(socketserver.BaseRequestHandler):
        def handle(self):
            for line in lines:
                self.request.sendall((line + "\n").encode())
            # keep the connection open so the source doesn't restart
            started.set()
            threading.Event().wait(30)

    server = socketserver.ThreadingTCPServer(("127.0.0.1", 0), Handler)
    server.daemon_threads = True
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        raw = (
            spark.readStream.format("socket")
            .option("host", "127.0.0.1").option("port", str(port))
            .load()
        )
        parsed = raw.select(
            F.get_json_object("value", "$.user_id").alias("user_id"),
            F.get_json_object("value", "$.v").cast("long").alias("v"),
        )
        counts = parsed.groupBy("user_id").agg(
            F.count("*").alias("n"), F.sum("v").alias("total")
        )
        q = (
            counts.writeStream.format("memory").queryName("sock")
            .outputMode("complete")
            .option("checkpointLocation", f"{tmp_path}/sock_ckpt")
            .trigger(processingTime="1 second").start()
        )
        try:
            want = {"a": (3, 0 + 2 + 3), "b": (2, 1 + 4), "c": (1, 5)}
            deadline = time.time() + 60
            got = {}
            while got != want and time.time() < deadline:
                time.sleep(1)
                got = {
                    r["user_id"]: (r["n"], r["total"])
                    for r in spark.table("sock").collect()
                }
            assert got == want
        finally:
            q.stop()
    finally:
        server.shutdown()
        server.server_close()


def test_streaming_banding_matches_batch_index_math(spark):
    """neardedup's inline banding (which carries the shingle payload)
    must produce byte-identical (band, bh) keys to the batch index
    builder — a drift here would silently partition streaming docs into
    different buckets than a persisted batch-built index."""
    from event_pipeline_spark.operators.dedup import _banded_signatures
    from event_pipeline_spark.streaming.neardedup import (
        _banded_with_shingles,
    )

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "a completely different document about spark plans")],
        "doc_id long, text string",
    )
    batch = {
        (r["_id"], r["band"], r["bh"])
        for r in _banded_signatures(docs).collect()
    }
    stream_style = {
        (r["docid"], r["band"], r["bh"])
        for r in _banded_with_shingles(
            docs, "doc_id", "text", 3, 64, 16
        ).collect()
    }
    assert batch == stream_style


# -- sessionize property differential ----------------------------------------

from hypothesis import given, settings as hyp_settings
from hypothesis import strategies as st


@given(
    offsets=st.lists(st.integers(0, 4000), min_size=1, max_size=40),
    users=st.lists(st.integers(0, 2), min_size=1, max_size=40),
    gap_s=st.sampled_from([60, 600]),
)
@hyp_settings(max_examples=15, deadline=None)
def test_sessionize_property_vs_pure_python(spark, offsets, users, gap_s):
    """Random per-user timelines: session ids must match the
    straightforward sorted-scan gap rule."""
    import datetime as dt

    base = dt.datetime(2026, 1, 1)
    n = min(len(offsets), len(users))
    rows = [
        (f"u{users[i]}", base + dt.timedelta(seconds=offsets[i]), i)
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, rid long")
    got = {
        r["rid"]: (r["user_id"], r["session_id"])
        for r in sessionize(df, "ts", gap_s, "user_id").collect()
    }
    # pure-python: per user, sorted by (ts, rid); new session when the
    # gap from the previous event is > gap_s
    want = {}
    by_user: dict = {}
    for uid, ts, rid in rows:
        by_user.setdefault(uid, []).append((ts, rid))
    for uid, evs in by_user.items():
        evs.sort()
        sid, prev = 1, None
        for ts, rid in evs:
            if prev is not None and (ts - prev).total_seconds() > gap_s:
                sid += 1
            want[rid] = (uid, sid)
            prev = ts
    assert got == want


def test_streaming_near_dedup_slim_matches_fat_variant(spark, tmp_path):
    """The slim-state flow (bare resident ids in state + foreachBatch
    verification against the persisted shingle store) must produce
    exactly the fat variant's verified pairs on the same two-batch
    stream — and its per-resident state row is one long, not a
    shingle set."""
    from event_pipeline_spark.streaming import streaming_near_dedup
    from event_pipeline_spark.streaming.neardedup import (
        _make_bucket_processor,
        _make_slim_processor,
        make_slim_verifier,
        streaming_near_dedup_slim,
    )
    from event_pipeline_spark.streaming.runner import read_parquet_stream
    from event_pipeline_spark.streaming.stateful import ROCKSDB_PROVIDER

    text = ("the quick brown fox jumps over the lazy dog again and again "
            "while the cat watches from the fence with great interest")
    near = text.replace("great interest", "mild interest")
    other = ("completely different words about spark shuffles catalyst "
             "plans and adaptive query execution at petabyte scale")
    batches = [
        [(1, text), (2, other), (3, text)],
        [(4, near), (5, "zebra quartz lantern nothing alike "
                        "whatsoever in any shingle")],
    ]

    # state-shape contract: slim rows are a single long; fat rows carry
    # the shingle set
    assert _make_slim_processor(None).STATE_SCHEMA == "id long"
    fat_src = __import__("inspect").getsource(_make_bucket_processor)
    assert '"residents", "id long, sh array<string>"' in fat_src

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    try:
        mk = lambda rows: spark.createDataFrame(  # noqa: E731
            rows, "doc_id long, text string"
        )

        def run(flavor: str) -> set:
            src = f"file://{tmp_path}/{flavor}_src"
            for i, b in enumerate(batches):
                mk(b).coalesce(1).write.mode("append").parquet(src)
                if i == 0:
                    time.sleep(1.1)  # distinct mtimes -> 2 micro-batches
            stream = read_parquet_stream(spark, src, max_files_per_trigger=1)
            collected: list = []
            if flavor == "fat":
                writer = (
                    streaming_near_dedup(stream, threshold=0.5)
                    .writeStream.foreachBatch(
                        lambda df, _id: collected.extend(df.collect())
                    )
                )
            else:
                writer = (
                    streaming_near_dedup_slim(stream)
                    .writeStream.foreachBatch(
                        make_slim_verifier(
                            f"{tmp_path}/{flavor}_store", 0.5,
                            lambda df, _id: collected.extend(df.collect()),
                        )
                    )
                )
            q = (
                writer.outputMode("update")
                .option("checkpointLocation", f"{tmp_path}/{flavor}_ckpt")
                .trigger(availableNow=True)
                .start()
            )
            _await(q)
            return {(r["id_a"], r["id_b"], r["jaccard"]) for r in collected}

        fat, slim = run("fat"), run("slim")
        assert fat == slim
        assert (1, 3, 1.0) in fat  # within-batch exact duplicate
        assert any(p[:2] == (1, 4) for p in fat)  # cross-batch near-dup
        assert all(2 not in p[:2] and 5 not in p[:2] for p in fat)

        # the slim store holds one shingle row per doc (registrations
        # deduplicated, all 5 docs registered via their band-0 bucket)
        store = spark.read.parquet(f"{tmp_path}/slim_store")
        assert store.count() == 5
        assert dict(store.dtypes)["sh"] == "array<string>"
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_streaming_near_dedup_slim_restart_uses_store_and_state(spark, tmp_path):
    """Stop after batch 1, restart from the checkpoint: a batch-2
    duplicate is verified against the batch-1 doc whose shingles now
    live ONLY in the persisted store (slim state has just its id)."""
    from event_pipeline_spark.streaming.neardedup import (
        make_slim_verifier,
        streaming_near_dedup_slim,
    )
    from event_pipeline_spark.streaming.runner import read_parquet_stream
    from event_pipeline_spark.streaming.stateful import ROCKSDB_PROVIDER

    text = ("the quick brown fox jumps over the lazy dog again and again "
            "while the cat watches from the fence with great interest")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    try:
        src = f"file://{tmp_path}/slimr_src"
        ckpt = f"{tmp_path}/slimr_ckpt"
        store = f"{tmp_path}/slimr_store"
        mk = lambda rows: spark.createDataFrame(  # noqa: E731
            rows, "doc_id long, text string"
        )
        collected: list = []

        def run_query():
            stream = read_parquet_stream(spark, src, max_files_per_trigger=4)
            return (
                streaming_near_dedup_slim(stream)
                .writeStream.foreachBatch(
                    make_slim_verifier(
                        store, 0.5,
                        lambda df, _id: collected.extend(df.collect()),
                    )
                )
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )

        mk([(1, text)]).coalesce(1).write.mode("append").parquet(src)
        _await(run_query())
        assert collected == []

        mk([(2, text)]).coalesce(1).write.mode("append").parquet(src)
        _await(run_query())  # fresh query, same checkpoint + store
        assert {(r["id_a"], r["id_b"], r["jaccard"]) for r in collected} == {
            (1, 2, 1.0)
        }
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_streaming_line_dedup_across_batches(spark, tmp_path):
    """A recurring boilerplate line survives only its first batch: the
    seen-set lives in state, so batch-2 docs lose it without
    re-reading batch 1. Structural (short) lines always pass."""
    from event_pipeline_spark.streaming.linededup import (
        reassemble_batch,
        streaming_dedup_lines,
    )
    from event_pipeline_spark.streaming.runner import read_parquet_stream
    from event_pipeline_spark.streaming.stateful import ROCKSDB_PROVIDER

    banner = "subscribe to our newsletter today"
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    try:
        src = f"file://{tmp_path}/ld_src"
        mk = lambda rows: spark.createDataFrame(  # noqa: E731
            rows, "doc_id long, text string"
        )
        mk([(1, f"unique first content line\n{banner}\n-")]).coalesce(
            1
        ).write.mode("append").parquet(src)
        time.sleep(1.1)
        mk(
            [
                (2, f"{banner}\nsecond doc real content line\n-"),
                (3, banner),  # nothing else: fully deduped away
            ]
        ).coalesce(1).write.mode("append").parquet(src)

        collected: list = []
        q = (
            streaming_dedup_lines(
                read_parquet_stream(spark, src, max_files_per_trigger=1),
                min_line_chars=2,
            )
            .writeStream.foreachBatch(
                lambda df, _id: collected.extend(
                    reassemble_batch(df).collect()
                )
            )
            .outputMode("append")
            .option("checkpointLocation", f"{tmp_path}/ld_ckpt")
            .trigger(availableNow=True)
            .start()
        )
        _await(q)
        docs = {r["doc_id"]: r["text"] for r in collected}
        assert docs[1] == f"unique first content line\n{banner}\n-"
        assert docs[2] == "second doc real content line\n-"  # banner gone
        assert 3 not in docs  # everything it had was already seen
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_streaming_exact_doc_dedup_across_batches(spark, tmp_path):
    """Exact-doc streaming dedup: a byte-identical document re-ingested
    in a later batch is suppressed by the digest seen-set in state;
    within one batch exactly one copy of a duplicated text survives."""
    from event_pipeline_spark.streaming.exactdedup import (
        streaming_dedup_exact,
    )
    from event_pipeline_spark.streaming.runner import read_parquet_stream
    from event_pipeline_spark.streaming.stateful import ROCKSDB_PROVIDER

    body = "the exact same document body, byte for byte"
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    try:
        src = f"file://{tmp_path}/ed_src"
        mk = lambda rows: spark.createDataFrame(  # noqa: E731
            rows, "doc_id long, text string"
        )
        mk([(1, body), (2, "unique first-batch doc")]).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)
        mk(
            [
                (3, body),  # exact replay of doc 1 -> suppressed
                (4, "unique second-batch doc"),
                (5, "unique second-batch doc"),  # within-batch duplicate
            ]
        ).coalesce(1).write.mode("append").parquet(src)

        collected: list = []
        q = (
            streaming_dedup_exact(
                read_parquet_stream(spark, src, max_files_per_trigger=1)
            )
            .writeStream.foreachBatch(
                lambda df, _id: collected.extend(df.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", f"{tmp_path}/ed_ckpt")
            .trigger(availableNow=True)
            .start()
        )
        _await(q)
        by_id = {r["docid"]: r["text"] for r in collected}
        assert by_id[1] == body
        assert 3 not in by_id  # cross-batch exact replay suppressed
        assert by_id[2] == "unique first-batch doc"
        # within-batch duplicate pair: exactly one survivor
        assert len({4, 5} & set(by_id)) == 1
        assert len(collected) == len(by_id)  # one row per survivor
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_streaming_substring_dedup_across_batches(spark, tmp_path):
    """A span first seen in batch 1 is excised from batch-2 documents:
    the window-digest seen-set lives in state, so batch 2 loses every
    token covered by the replayed span without re-reading batch 1.
    Sub-window docs bypass state and pass whole; a doc that was
    entirely one seen span vanishes."""
    from event_pipeline_spark.streaming.runner import read_parquet_stream
    from event_pipeline_spark.streaming.stateful import ROCKSDB_PROVIDER
    from event_pipeline_spark.streaming.substringdedup import (
        excise_batch,
        streaming_dedup_substrings,
    )

    span = "alpha bravo charlie delta"  # window-sized repeated span
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    try:
        src = f"file://{tmp_path}/sd_src"
        mk = lambda rows: spark.createDataFrame(  # noqa: E731
            rows, "doc_id long, text string"
        )
        mk([(1, f"{span} unique one tail")]).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)
        mk(
            [
                (2, f"{span} second doc content"),
                (3, span),  # nothing else: fully excised away
                (4, "short doc"),  # < window tokens: bypasses state
            ]
        ).coalesce(1).write.mode("append").parquet(src)

        collected: list = []
        q = (
            streaming_dedup_substrings(
                read_parquet_stream(spark, src, max_files_per_trigger=1),
                window=4,
            )
            .writeStream.foreachBatch(
                lambda df, _id: collected.extend(
                    excise_batch(df, window=4).collect()
                )
            )
            .outputMode("append")
            .option("checkpointLocation", f"{tmp_path}/sd_ckpt")
            .trigger(availableNow=True)
            .start()
        )
        _await(q)
        docs = {r["doc_id"]: (r["text"], r["n_tokens"], r["n_kept"]) for r in collected}
        assert docs[1] == (f"{span} unique one tail", 7, 7)  # first batch whole
        assert docs[2] == ("second doc content", 7, 3)  # span excised
        assert 3 not in docs  # everything it had was already seen
        assert docs[4] == ("short doc", 2, 2)  # sub-window bypass
        assert len(collected) == 3
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_streaming_media_dedup_perceptual_replay(spark, tmp_path):
    """A JPEG re-encode of a batch-1 PNG has different bytes but the
    same dHash, so the signature seen-set suppresses it in batch 2;
    a visually distinct image still passes. Audio: a float32 re-encode
    of a batch-1 PCM16 clip is suppressed by its fingerprint."""
    from event_pipeline_spark.operators import codecs
    from event_pipeline_spark.operators.imagededup import FIXTURE_PATH
    from event_pipeline_spark.operators.audiodedup import (
        FIXTURE_PATH as AUDIO_FIXTURE,
    )
    from event_pipeline_spark.streaming.mediadedup import (
        streaming_dedup_media,
    )
    from event_pipeline_spark.streaming.runner import read_parquet_stream
    from event_pipeline_spark.streaming.stateful import ROCKSDB_PROVIDER

    imgs = {r["img_id"]: r for r in spark.read.parquet(FIXTURE_PATH).collect()}
    png = bytes(imgs[1]["payload"])  # continuous-tone base
    jpeg_replay = codecs.encode_jpeg(
        codecs.decode_image(png, "png"), quality=90
    )  # same dHash, different bytes (measured in the batch tests)
    distinct = bytes(imgs[7]["payload"])

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    try:
        src = f"file://{tmp_path}/md_src"
        mk = lambda rows: spark.createDataFrame(  # noqa: E731
            rows, "media_id long, fmt string, payload binary"
        )
        mk([(1, "png", png)]).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)
        mk(
            [(2, "jpeg", jpeg_replay), (3, "png", distinct)]
        ).coalesce(1).write.mode("append").parquet(src)

        collected: list = []
        q = (
            streaming_dedup_media(
                read_parquet_stream(spark, src, max_files_per_trigger=1)
            )
            .writeStream.foreachBatch(
                lambda df, _id: collected.extend(df.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", f"{tmp_path}/md_ckpt")
            .trigger(availableNow=True)
            .start()
        )
        _await(q)
        survivors = {r["media_id"] for r in collected}
        assert survivors == {1, 3}  # replay (2) suppressed across batches

        # audio: PCM16 clip then its float32 re-encode
        clips = {
            r["clip_id"]: bytes(r["payload"])
            for r in spark.read.parquet(AUDIO_FIXTURE).collect()
        }
        asrc = f"file://{tmp_path}/ma_src"
        amk = lambda rows: spark.createDataFrame(  # noqa: E731
            rows, "media_id long, payload binary"
        )
        amk([(10, clips[1])]).coalesce(1).write.mode("append").parquet(asrc)
        time.sleep(1.1)
        amk(
            [(11, clips[3]), (12, clips[6])]  # float32 replay + distinct
        ).coalesce(1).write.mode("append").parquet(asrc)
        acollected: list = []
        aq = (
            streaming_dedup_media(
                read_parquet_stream(spark, asrc, max_files_per_trigger=1),
                fmt_col=None,
                method="afp",
            )
            .writeStream.foreachBatch(
                lambda df, _id: acollected.extend(df.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", f"{tmp_path}/ma_ckpt")
            .trigger(availableNow=True)
            .start()
        )
        _await(aq)
        assert {r["media_id"] for r in acollected} == {10, 12}
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_streaming_curate_pipeline(spark, tmp_path):
    """Composed streaming curation: the quality gate drops a too-short
    doc, decontamination drops a doc containing a benchmark 8-gram,
    exact-dedup state suppresses a cross-batch replay — and the clean
    survivors from both batches come through exactly once."""
    import hashlib

    from event_pipeline_spark.streaming.curate import streaming_curate
    from event_pipeline_spark.streaming.runner import read_parquet_stream
    from event_pipeline_spark.streaming.stateful import ROCKSDB_PROVIDER

    good_a = (
        "the quick spark batch merge table scan join order filter "
        "window value line part small batch stream data row group "
        "query sort agg"
    )
    good_b = (
        "the slow spark vector merge column scan join order filter "
        "window value line part small batch stream data row group "
        "query sort agg"
    )
    bench_words = "alpha bravo charlie delta echo foxtrot golf hotel"
    contaminated = f"the {bench_words} spark batch merge table scan join order filter window value line part group"
    bench_hash = hashlib.md5(bench_words.encode()).hexdigest()

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    try:
        src = f"file://{tmp_path}/cur_src"
        mk = lambda rows: spark.createDataFrame(  # noqa: E731
            rows, "doc_id long, text string"
        )
        mk(
            [
                (1, good_a),
                (2, "too short"),  # fails the quality gate
                (3, contaminated),  # shares the benchmark 8-gram
            ]
        ).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)
        mk(
            [
                (4, good_a),  # exact replay -> suppressed by state
                (5, good_b),
            ]
        ).coalesce(1).write.mode("append").parquet(src)

        collected: list = []
        q = (
            streaming_curate(
                read_parquet_stream(spark, src, max_files_per_trigger=1),
                bench_gram_hashes=[bench_hash],
            )
            .writeStream.foreachBatch(
                lambda df, _id: collected.extend(df.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", f"{tmp_path}/cur_ckpt")
            .trigger(availableNow=True)
            .start()
        )
        _await(q)
        by_id = {r["docid"]: r["text"] for r in collected}
        assert by_id == {1: good_a, 5: good_b}
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_streaming_scd2_emits_closed_versions(spark, tmp_path):
    """A change arriving in batch 2 closes the version opened in batch
    1 (open version persists in state); emitted closed rows equal the
    batch rebuild's non-current rows on the same log."""
    from datetime import datetime

    from event_pipeline_spark.operators.cdc import scd2_history
    from event_pipeline_spark.streaming.scd2 import streaming_scd2
    from event_pipeline_spark.streaming.runner import read_parquet_stream
    from event_pipeline_spark.streaming.stateful import ROCKSDB_PROVIDER

    t = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    schema = "user_id long, event_type string, ts timestamp, event_id long"
    b1 = [
        (1, "free", t(0), 10),
        (1, "paid", t(1), 11),   # closes free v1 within batch 1
        (3, "same", t(0), 12),
        (3, "same", t(1), 13),   # no change: nothing closes
    ]
    b2 = [
        (1, "free", t(2), 20),   # closes paid v2 ACROSS batches
        (2, "new", t(2), 21),    # opens only: nothing emitted
    ]
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    try:
        src = f"file://{tmp_path}/scd_src"
        spark.createDataFrame(b1, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)
        spark.createDataFrame(b2, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

        collected: list = []
        q = (
            streaming_scd2(
                read_parquet_stream(spark, src, max_files_per_trigger=1)
            )
            .writeStream.foreachBatch(
                lambda df, _id: collected.extend(df.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", f"{tmp_path}/scd_ckpt")
            .trigger(availableNow=True)
            .start()
        )
        _await(q)
        got = sorted(
            (r["key"], r["state"], r["valid_from"], r["valid_to"],
             r["version"])
            for r in collected
        )
        batch = scd2_history(
            spark.createDataFrame(b1 + b2, schema),
            key_col="user_id", state_col="event_type", ts_col="ts",
            tiebreak_col="event_id",
        )
        fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
        want = sorted(
            (r["user_id"], r["event_type"], r["valid_from"],
             r["valid_to"], r["version"])
            for r in batch.where(~F.col("is_current")).select(
                "user_id", "event_type",
                F.date_format("valid_from", fmt).alias("valid_from"),
                F.date_format("valid_to", fmt).alias("valid_to"),
                "version",
            ).collect()
        )
        assert got == want
        assert [g[0] for g in got] == [1, 1]  # only user 1 closed rows
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_streaming_cusum_equals_batch(spark, tmp_path):
    """Two micro-batches of daily counts: the live CUSUM emission
    equals the batch reflection-identity rebuild row-for-row, with the
    running state carried across the batch boundary."""
    from datetime import datetime

    from event_pipeline_spark.operators.trends import daily_cusum
    from event_pipeline_spark.streaming.cusum import streaming_cusum
    from event_pipeline_spark.streaming.runner import read_parquet_stream
    from event_pipeline_spark.streaming.stateful import ROCKSDB_PROVIDER

    counts = {"view": [10, 10, 13, 14, 9, 7], "click": [5, 5, 5, 5, 5, 5]}
    # raw events for the batch operator
    rows, eid = [], 0
    for k, series in counts.items():
        for d, c in enumerate(series):
            for _ in range(c):
                rows.append((eid, datetime(2024, 1, 1 + d, 1), 1, k))
                eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string",
    )
    expected = sorted(
        (r["event_type"], r["day"], r["c"], r["cusum_pos"],
         r["cusum_neg"], r["alarm"])
        for r in daily_cusum(ev, threshold_units=3).collect()
    )

    # daily-count stream split across two batches at day 3
    def day_rows(lo, hi):
        return [
            (k, f"2024-01-{1 + d:02d}", series[d])
            for k, series in counts.items()
            for d in range(lo, hi)
        ]

    schema = "event_type string, day string, c long"
    src = f"file://{tmp_path}/cusum_src"
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    spark.createDataFrame(day_rows(0, 3), schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(day_rows(3, 6), schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    collected: list = []
    q = (
        streaming_cusum(
            read_parquet_stream(spark, src, max_files_per_trigger=1),
            threshold_units=3,
        )
        .writeStream.foreachBatch(
            lambda df, _id: collected.extend(df.collect())
        )
        .outputMode("append")
        .option("checkpointLocation", f"{tmp_path}/cusum_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    got = sorted(
        (r["key"], r["day"], r["c"], r["cusum_pos"], r["cusum_neg"],
         r["alarm"])
        for r in collected
    )
    assert got == expected
    # the cross-boundary carry actually mattered: day 4 of 'view'
    # accumulates the +3/+4 shift from batch 1
    view4 = [g for g in got if g[0] == "view" and g[1] == "2024-01-04"]
    assert view4 and view4[0][3] == 7 and view4[0][5]


def test_streaming_frequent_guarantee_and_carry(spark, tmp_path):
    """Two micro-batches of items: per shard the latest summary obeys
    the Misra-Gries bound (never overcounts, undercount <=
    n_shard // (cap+1)), state carries across batches, and with
    capacity >= distinct items the counts are EXACT."""
    from collections import Counter

    from event_pipeline_spark.streaming.frequent import (
        streaming_frequent,
    )
    from event_pipeline_spark.streaming.runner import read_parquet_stream
    from event_pipeline_spark.streaming.stateful import ROCKSDB_PROVIDER

    b1 = [f"k{i % 7}" for i in range(300)] + ["hot"] * 100
    b2 = [f"k{i % 11}" for i in range(200)] + ["hot"] * 150
    true = Counter(b1) + Counter(b2)

    src = f"file://{tmp_path}/mg_src"
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    spark.createDataFrame(
        [(v,) for v in b1], "item string"
    ).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(
        [(v,) for v in b2], "item string"
    ).coalesce(1).write.mode("append").parquet(src)

    collected: list = []
    q = (
        streaming_frequent(
            read_parquet_stream(spark, src, max_files_per_trigger=1),
            "item",
            shards=4,
            capacity=16,
        )
        .writeStream.foreachBatch(
            lambda df, _id: collected.extend(df.collect())
        )
        .outputMode("append")
        .option("checkpointLocation", f"{tmp_path}/mg_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    # latest emission per shard = the one with max n
    latest: dict = {}
    for r in collected:
        if r["shard"] not in latest or r["n"] > latest[r["shard"]][0]["n"]:
            latest[r["shard"]] = []
        if not latest[r["shard"]] or r["n"] == latest[r["shard"]][0]["n"]:
            latest[r["shard"]].append(r)
    est = {
        r["item"]: r["est"] for rows in latest.values() for r in rows
    }
    shard_n = {s: rows[0]["n"] for s, rows in latest.items()}
    shard_of = {
        r["item"]: r["shard"] for rows in latest.values() for r in rows
    }
    # capacity 16 >= distinct items per shard -> exact, incl. the
    # cross-batch 'hot' accumulation (100 + 150)
    assert est["hot"] == 250
    for item, e in est.items():
        assert e <= true[item]
        assert true[item] - e <= shard_n[shard_of[item]] // 17
    # every sufficiently heavy item survives
    for item, c in true.items():
        if any(c > n // 17 for n in shard_n.values()):
            assert item in est or c <= max(shard_n.values()) // 17


def test_streaming_frequent_eviction_path(spark, tmp_path):
    """capacity far below the distinct-item count: decrement-all
    eviction fires, the table never exceeds capacity, and the bound
    still holds for the surviving heavy item."""
    from collections import Counter

    from event_pipeline_spark.streaming.frequent import (
        streaming_frequent,
    )
    from event_pipeline_spark.streaming.runner import read_parquet_stream
    from event_pipeline_spark.streaming.stateful import ROCKSDB_PROVIDER

    items = [f"rare{i}" for i in range(60)] + ["heavy"] * 120
    true = Counter(items)
    src = f"file://{tmp_path}/mg2_src"
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    spark.createDataFrame(
        [(v,) for v in items], "item string"
    ).coalesce(1).write.mode("append").parquet(src)

    collected: list = []
    q = (
        streaming_frequent(
            read_parquet_stream(spark, src, max_files_per_trigger=1),
            "item",
            shards=2,
            capacity=4,
        )
        .writeStream.foreachBatch(
            lambda df, _id: collected.extend(df.collect())
        )
        .outputMode("append")
        .option("checkpointLocation", f"{tmp_path}/mg2_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    per_shard = Counter(r["shard"] for r in collected)
    assert all(c <= 4 for c in per_shard.values())
    est = {r["item"]: (r["est"], r["n"]) for r in collected}
    assert "heavy" in est  # 120 occurrences >> n_shard/5
    e, n = est["heavy"]
    assert e <= 120 and 120 - e <= n // 5


def test_streaming_ewma_equals_batch(spark, tmp_path):
    """Two micro-batches of daily counts: the live dyadic-EWMA emission
    equals the batch lag-window rebuild row-for-row, with the bounded
    count history carried across the batch boundary."""
    from datetime import datetime

    from event_pipeline_spark.operators.trends import daily_ewma
    from event_pipeline_spark.streaming.ewma import streaming_ewma
    from event_pipeline_spark.streaming.runner import read_parquet_stream
    from event_pipeline_spark.streaming.stateful import ROCKSDB_PROVIDER

    counts = {"view": [10, 4, 13, 2, 9, 7], "click": [5, 1, 8, 5, 2, 6]}
    rows, eid = [], 0
    for k, series in counts.items():
        for d, c in enumerate(series):
            for _ in range(c):
                rows.append((eid, datetime(2024, 1, 1 + d, 1), 1, k))
                eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string",
    )
    expected = sorted(
        (r["event_type"], r["day"], r["c"], r["ewma_units"], r["ewma"])
        for r in daily_ewma(ev).collect()
    )

    def day_rows(lo, hi):
        return [
            (k, f"2024-01-{1 + d:02d}", series[d])
            for k, series in counts.items()
            for d in range(lo, hi)
        ]

    schema = "event_type string, day string, c long"
    src = f"file://{tmp_path}/ewma_src"
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    spark.createDataFrame(day_rows(0, 3), schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(day_rows(3, 6), schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    collected: list = []
    q = (
        streaming_ewma(
            read_parquet_stream(spark, src, max_files_per_trigger=1)
        )
        .writeStream.foreachBatch(
            lambda df, _id: collected.extend(df.collect())
        )
        .outputMode("append")
        .option("checkpointLocation", f"{tmp_path}/ewma_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    got = sorted(
        (r["key"], r["day"], r["c"], r["ewma_units"], r["ewma"])
        for r in collected
    )
    assert got == expected
    # the carry mattered: day 4's units include day 1-3 history
    v4 = [g for g in got if g[0] == "view" and g[1] == "2024-01-04"][0]
    assert v4[3] == (2 << 10) + (13 << 9) + (4 << 8) + (10 << 7)


def test_streaming_funnel_equals_batch(spark, tmp_path):
    """Two micro-batches of events: aggregating the live funnel's
    advancement emissions reproduces the batch events_funnel report,
    with user 1's conversion SPANNING the batch boundary (view+click
    in batch 1, signup+purchase in batch 2 — only carried state can
    advance those)."""
    from datetime import datetime

    from event_pipeline_spark.operators.temporal import (
        FUNNEL_STEPS,
        events_funnel,
    )
    from event_pipeline_spark.streaming.funnel import streaming_funnel
    from event_pipeline_spark.streaming.runner import read_parquet_stream
    from event_pipeline_spark.streaming.stateful import ROCKSDB_PROVIDER

    t = lambda m: datetime(2024, 3, 1, 10, m)  # noqa: E731
    b1 = [
        (1, t(0), 1, "view"), (2, t(5), 1, "click"),
        (3, t(0), 2, "purchase"), (4, t(5), 2, "view"),
        (5, t(0), 3, "view"), (6, t(1), 3, "click"),
        (7, t(0), 4, "view"), (8, t(0), 4, "click"),  # tie: no advance
    ]
    b2 = [
        (9, t(10), 1, "signup"), (10, t(30), 1, "purchase"),
        (11, t(2), 3, "signup"),
        # beyond the 1h horizon of user 3's stage-1 view at t(0)
        (12, datetime(2024, 3, 1, 12, 0), 3, "purchase"),
        (13, t(6), 4, "click"),  # strictly later: now advances
    ]
    schema = "event_id long, ts timestamp_ntz, user_id long, event_type string"
    ev = spark.createDataFrame(b1 + b2, schema)
    batch_row = events_funnel(ev, horizon_hours=1).collect()[0]

    src = f"file://{tmp_path}/funnel_src"
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    spark.createDataFrame(b1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    collected: list = []
    try:
        q = (
            streaming_funnel(
                read_parquet_stream(spark, src, max_files_per_trigger=1),
                horizon_hours=1,
            )
            .writeStream.foreachBatch(
                lambda df, _id: collected.extend(df.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", f"{tmp_path}/funnel_ckpt")
            .trigger(availableNow=True)
            .start()
        )
        _await(q)
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    # stream emissions -> batch report: n_k = users that reached stage k
    reached = {}
    for r in collected:
        reached[r["key"]] = max(reached.get(r["key"], 0), r["stage"])
    for k, st in enumerate(FUNNEL_STEPS):
        assert (
            sum(1 for d in reached.values() if d >= k + 1)
            == batch_row[f"n_{st}"]
        ), st
    # the boundary-spanning conversion: user 1 finished the funnel,
    # and its last two advancements came from batch-2 events
    assert reached[1] == 4
    u1 = sorted(
        (r["stage"], r["step"]) for r in collected if r["key"] == 1
    )
    assert u1 == [
        (1, "view"), (2, "click"), (3, "signup"), (4, "purchase")
    ]
    # horizon enforced across the boundary: user 3 stalled at signup
    assert reached[3] == 3
    # tie strictness: user 4's same-ts click did NOT advance in batch 1
    # but the strictly-later batch-2 click did
    assert reached[4] == 2


def test_streaming_psi_equals_batch(spark, tmp_path):
    """Two micro-batches of values: the live running PSI equals the
    batch psi_bins total (reference snapshot vs everything streamed so
    far), with bin-count state carried across the boundary."""
    from event_pipeline_spark.operators.stats import psi_bins
    from event_pipeline_spark.streaming.drift import streaming_psi
    from event_pipeline_spark.streaming.runner import read_parquet_stream
    from event_pipeline_spark.streaming.stateful import ROCKSDB_PROVIDER

    ref = {
        "amt": [5, 15, 25, 25, 35, 45, 55, 65, 75, 85] * 3,
        "lat": [12, 22, 32, 42, 52] * 4,
    }
    b1 = {"amt": [35, 45, 55, 90, 95], "lat": [72, 82, 92]}
    b2 = {"amt": [91, 93, 97, 99], "lat": [95, 99]}

    def bins(vals):
        counts = [0] * 10
        for v in vals:
            counts[min(max(v * 10 // 100, 0), 9)] += 1
        return counts

    expected = {k: bins(vs) for k, vs in ref.items()}

    src = f"file://{tmp_path}/psi_src"
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    for batch in (b1, b2):
        spark.createDataFrame(
            [(k, v) for k, vs in batch.items() for v in vs],
            "key string, v long",
        ).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)

    collected: list = []
    try:
        q = (
            streaming_psi(
                read_parquet_stream(spark, src, max_files_per_trigger=1),
                expected,
                key_col="key",
                value_col="v",
            )
            .writeStream.foreachBatch(
                lambda df, _id: collected.extend(df.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", f"{tmp_path}/psi_ckpt")
            .trigger(availableNow=True)
            .start()
        )
        _await(q)
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    # one emission per (key, batch); the LAST per key must equal the
    # batch operator over reference vs all streamed rows
    assert len(collected) == 4
    last = {}
    for r in collected:
        last[r["key"]] = r  # append order: batch 2 rows come last
    for k in ref:
        streamed = b1[k] + b2[k]
        rows = [(0, v) for v in ref[k]] + [(1, v) for v in streamed]
        batch_psi = sum(
            r["psi"]
            for r in psi_bins(
                spark.createDataFrame(rows, "s int, v long"),
                snapshot_col="s", value_col="v", lo=0, hi=100,
            ).collect()
        )
        assert last[k]["n_actual"] == len(streamed)
        assert abs(last[k]["psi"] - batch_psi) < 1e-12
    # drift direction sanity: the shifted stream scores high
    assert last["amt"]["psi"] > 0.1


def test_streaming_hll_equals_batch(spark, tmp_path):
    """Two micro-batches of user ids: the live HLL emission equals the
    batch md5-HLL rebuild (nz, t_units, est all exact), with register
    state carried across the boundary."""
    from event_pipeline_spark.operators.sketches import hll_md5_estimate
    from event_pipeline_spark.streaming.hll import streaming_hll
    from event_pipeline_spark.streaming.runner import read_parquet_stream
    from event_pipeline_spark.streaming.stateful import ROCKSDB_PROVIDER

    b1 = [("clicks", f"user{i}") for i in range(400)]
    b1 += [("views", f"u{i % 30}") for i in range(90)]
    b2 = [("clicks", f"user{i}") for i in range(200, 700)]  # 300 new
    b2 += [("views", f"u{i}") for i in range(25, 40)]

    src = f"file://{tmp_path}/hll_src"
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    for b in (b1, b2):
        spark.createDataFrame(b, "key string, v string").coalesce(
            1
        ).write.mode("append").parquet(src)
        time.sleep(1.1)

    collected: list = []
    try:
        q = (
            streaming_hll(
                read_parquet_stream(spark, src, max_files_per_trigger=1)
            )
            .writeStream.foreachBatch(
                lambda df, _id: collected.extend(df.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", f"{tmp_path}/hll_ckpt")
            .trigger(availableNow=True)
            .start()
        )
        _await(q)
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    assert len(collected) == 4  # 2 keys x 2 batches
    last = {}
    for r in collected:
        last[r["key"]] = r
    batch = {
        r["key"]: r
        for r in hll_md5_estimate(
            spark.createDataFrame(b1 + b2, "key string, v string"),
            "v",
            ["key"],
        ).collect()
    }
    for k in ("clicks", "views"):
        assert last[k]["nz"] == batch[k]["nz"], k
        assert last[k]["t_units"] == int(batch[k]["t_units"]), k
        assert last[k]["est"] == batch[k]["est"], k
    # sanity: the estimates are in the right ballpark (true 700 / 40)
    assert abs(last["clicks"]["est"] - 700) < 700 * 0.2
    assert abs(last["views"]["est"] - 40) < 40 * 0.2


def test_streaming_weighted_sample_equals_batch(spark, tmp_path):
    """Two micro-batches of weighted members: each group's LAST
    emitted sample equals weighted_sample_k over everything streamed —
    exactly, row for row, because the race keys are deterministic."""
    from event_pipeline_spark.operators.sampling import weighted_sample_k
    from event_pipeline_spark.streaming.runner import read_parquet_stream
    from event_pipeline_spark.streaming.sample import (
        streaming_weighted_sample,
    )
    from event_pipeline_spark.streaming.stateful import ROCKSDB_PROVIDER

    b1 = [("docs", f"d{i}", float(1 + i % 7)) for i in range(60)]
    b2 = [("docs", f"d{i}", float(1 + i % 7)) for i in range(60, 140)]
    b2 += [("docs", "whale", 500.0)]  # a late heavy item must enter

    src = f"file://{tmp_path}/ws_src"
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    for b in (b1, b2):
        spark.createDataFrame(
            b, "grp string, member string, w double"
        ).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)

    collected: list = []
    try:
        q = (
            streaming_weighted_sample(
                read_parquet_stream(spark, src, max_files_per_trigger=1),
                8,
                salt="ws8",
            )
            .writeStream.foreachBatch(
                lambda df, _bid: collected.append(
                    [tuple(r) for r in df.collect()]
                )
            )
            .outputMode("append")
            .option("checkpointLocation", f"{tmp_path}/ws_ckpt")
            .trigger(availableNow=True)
            .start()
        )
        _await(q)
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    last = [rows for rows in collected if rows][-1]
    got = sorted((r[1], r[2]) for r in last)
    batch = weighted_sample_k(
        spark.createDataFrame(
            b1 + b2, "grp string, member string, w double"
        ),
        8,
        "member",
        "w",
        salt="ws8",
    ).collect()
    want = sorted((r["member"], r["w"]) for r in batch)
    assert got == want
    assert any(m == "whale" for m, _ in got)  # late heavy item entered


def test_stream_static_enrichment_parity_and_broadcast(spark, tmp_path):
    """Two micro-batches enriched against a static dimension: rows
    equal the batch join, unmatched stream rows survive the left join,
    and the per-batch plan broadcast the dimension."""
    from event_pipeline_spark.streaming.enrich import enrich_stream
    from event_pipeline_spark.streaming.runner import read_parquet_stream

    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], "user_id long, tier string"
    )
    b1 = [(10, 1), (11, 2), (12, 9)]  # user 9 not in dim
    b2 = [(13, 1), (14, 9)]
    src = f"file://{tmp_path}/enrich_src"
    for b in (b1, b2):
        spark.createDataFrame(
            b, "event_id long, user_id long"
        ).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)

    collected: list = []

    def sink(df, _bid):
        collected.extend(df.collect())

    q = (
        enrich_stream(
            read_parquet_stream(spark, src, max_files_per_trigger=1),
            dim,
            ["user_id"],
        )
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", f"{tmp_path}/enrich_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    _await(q)

    got = sorted(
        (r["event_id"], r["user_id"], r["tier"]) for r in collected
    )
    want = sorted(
        (r["event_id"], r["user_id"], r["tier"])
        for r in spark.createDataFrame(
            b1 + b2, "event_id long, user_id long"
        ).join(dim, ["user_id"], "left").collect()
    )
    assert got == want
    assert (12, 9, None) in got  # left join kept the unmatched row
    # the enrichment shape broadcasts the dimension (assert on the
    # same operator applied to a batch frame — per-micro-batch plans
    # are not observable through foreachBatch's materialized input)
    plan = (
        enrich_stream(
            spark.createDataFrame(b1, "event_id long, user_id long"),
            dim,
            ["user_id"],
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_streaming_ab_deltas_equal_batch(spark, tmp_path):
    """Two micro-batches of experiment events: cumulative delta sums
    reproduce the batch ab_test_proportions counters exactly, with
    user 3's conversion arriving a batch AFTER enrollment (only
    carried state can know it already counted in n_b) and user 1
    re-appearing without re-emitting."""
    from event_pipeline_spark.operators.stats import ab_test_proportions
    from event_pipeline_spark.streaming.abtest import (
        streaming_ab_deltas,
        z_from_counters,
    )
    from event_pipeline_spark.streaming.runner import read_parquet_stream
    from event_pipeline_spark.streaming.stateful import ROCKSDB_PROVIDER

    # (user_id, bucket, success)
    b1 = [
        (1, 0, 0), (2, 0, 1), (3, 1, 0), (4, 1, 0),
        (1, 0, 0),  # same unit twice in one batch: one enrollment
    ]
    b2 = [
        (3, 1, 1),  # converts across the boundary -> (bucket 1, 0, +1)
        (1, 0, 1),  # first conversion of an already-enrolled unit
        (2, 0, 1),  # already converted: NO emission
        (5, 0, 0),  # fresh enrollment in batch 2
    ]
    schema = "user_id long, bucket int, success int"
    ev = spark.createDataFrame(b1 + b2, schema)
    batch = ab_test_proportions(
        ev, unit_col="user_id", bucket_col="bucket", success_col="success"
    ).collect()[0]

    src = f"file://{tmp_path}/ab_src"
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    spark.createDataFrame(b1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    collected: list = []
    try:
        q = (
            streaming_ab_deltas(
                read_parquet_stream(spark, src, max_files_per_trigger=1)
            )
            .writeStream.foreachBatch(
                lambda df, _id: collected.extend(df.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", f"{tmp_path}/ab_ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        for s in spark.streams.active:
            s.stop()

    n_a = sum(r["d_n"] for r in collected if r["bucket"] == 0)
    conv_a = sum(r["d_conv"] for r in collected if r["bucket"] == 0)
    n_b = sum(r["d_n"] for r in collected if r["bucket"] == 1)
    conv_b = sum(r["d_conv"] for r in collected if r["bucket"] == 1)
    assert (n_a, conv_a, n_b, conv_b) == (
        batch["n_a"], batch["conv_a"], batch["n_b"], batch["conv_b"]
    )
    assert (n_a, conv_a, n_b, conv_b) == (3, 2, 2, 1)
    # unit 2's second success emitted nothing
    assert len([r for r in collected if r["bucket"] == 0]) == 4
    assert z_from_counters(n_a, conv_a, n_b, conv_b) == batch["z"]


def test_streaming_retention_equals_batch(spark, tmp_path):
    """Counting the live (cohort, offset) marks reproduces the batch
    retention triangle, with user 1's day-2 return arriving a batch
    after enrollment and a same-(user, offset) re-arrival emitting
    nothing."""
    from datetime import datetime

    from event_pipeline_spark.operators.temporal import events_retention
    from event_pipeline_spark.streaming.retention import (
        streaming_retention,
    )
    from event_pipeline_spark.streaming.runner import read_parquet_stream
    from event_pipeline_spark.streaming.stateful import ROCKSDB_PROVIDER

    d = lambda dom, h=9: datetime(2024, 3, dom, h)  # noqa: E731
    b1 = [
        (1, d(1), 1, "view"), (2, d(1), 2, "view"),
        (3, d(2), 2, "view"),            # user 2 returns at offset 1
        (4, d(1, 15), 1, "view"),        # same (user, offset 0): silent
        (5, d(2), 3, "view"),            # user 3 joins on day 2
    ]
    b2 = [
        (6, d(3), 1, "view"),            # user 1 offset 2, cross-batch
        (7, d(3), 2, "view"),            # user 2 offset 2
        (8, d(2, 18), 2, "view"),        # (user 2, offset 1) again: silent
        (9, d(4), 3, "view"),            # user 3 offset 2
    ]
    schema = "event_id long, ts timestamp_ntz, user_id long, event_type string"
    ev = spark.createDataFrame(b1 + b2, schema)
    batch = {
        (r["cohort_day"], r["day_offset"]): r["n_active"]
        for r in events_retention(ev).collect()
    }

    src = f"file://{tmp_path}/ret_src"
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    spark.createDataFrame(b1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    collected: list = []
    try:
        q = (
            streaming_retention(
                read_parquet_stream(spark, src, max_files_per_trigger=1)
            )
            .writeStream.foreachBatch(
                lambda df, _id: collected.extend(df.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", f"{tmp_path}/ret_ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        for s in spark.streams.active:
            s.stop()

    import collections as _c
    from datetime import date, timedelta

    got = _c.Counter()
    for r in collected:
        cohort = (
            date(1970, 1, 1) + timedelta(days=int(r["cohort_day"]))
        ).strftime("%Y-%m-%d")
        got[(cohort, r["day_offset"])] += 1
    assert dict(got) == batch
    assert got[("2024-03-01", 0)] == 2 and got[("2024-03-02", 2)] == 1


def test_streaming_retention_horizon_bound_is_exclusive():
    """Offset exactly horizon_days must be skipped, not emitted: at the
    default horizon 63 an inclusive bound would set mask bit 63 and
    overflow the signed-long value state. The highest bit ever set is
    horizon_days-1."""
    import pandas as pd

    from event_pipeline_spark.streaming.retention import (
        _make_retention_processor,
    )

    class _FakeState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            assert -(1 << 63) <= int(v[1]) < (1 << 63), "mask overflowed int64"
            self._v = tuple(v)

    class _FakeHandle:
        def __init__(self, st):
            self._st = st

        def getValueState(self, name, schema):
            return self._st

    st = _FakeState()
    proc = _make_retention_processor(63)
    proc.init(_FakeHandle(st))
    rows = [pd.DataFrame({"day": [1000, 1062, 1063, 1064]})]
    out = list(proc.handleInputRows((1,), rows, None))
    emitted = [tuple(r) for pdf in out for r in pdf.itertuples(index=False)]
    # offsets 0 and 62 emit; 63 (== horizon) and 64 are silent
    assert emitted == [(1000, 0), (1000, 62)]
    cohort, mask = st.get()
    assert cohort == 1000 and mask == (1 | (1 << 62))


def test_streaming_transitions_equals_batch(spark, tmp_path):
    """Counting the live (prev, next) pairs reproduces the batch
    transition matrix, with user 1's chain continued across
    micro-batches and a tied timestamp broken by event_id."""
    from datetime import datetime

    from event_pipeline_spark.operators.temporal import event_transitions
    from event_pipeline_spark.streaming.runner import read_parquet_stream
    from event_pipeline_spark.streaming.stateful import ROCKSDB_PROVIDER
    from event_pipeline_spark.streaming.transitions import (
        streaming_transitions,
    )

    t = lambda h: datetime(2024, 3, 1, h)  # noqa: E731
    b1 = [
        (1, t(9), 1, "x"), (2, t(10), 1, "x"), (3, t(10), 1, "y"),
        (4, t(9), 2, "y"),
    ]
    b2 = [
        (5, t(12), 1, "x"),          # chain x->y->(cross-batch)->x
        (6, t(11), 2, "x"),
    ]
    schema = "event_id long, ts timestamp_ntz, user_id long, event_type string"
    ev = spark.createDataFrame(b1 + b2, schema)
    batch = {
        (r["prev_type"], r["next_type"]): r["n"]
        for r in event_transitions(ev).collect()
    }

    src = f"file://{tmp_path}/tr_src"
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    spark.createDataFrame(b1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    collected: list = []
    try:
        q = (
            streaming_transitions(
                read_parquet_stream(spark, src, max_files_per_trigger=1)
            )
            .writeStream.foreachBatch(
                lambda df, _id: collected.extend(df.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", f"{tmp_path}/tr_ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        for s in spark.streams.active:
            s.stop()

    import collections as _c

    got = _c.Counter(
        (r["prev_type"], r["next_type"]) for r in collected
    )
    assert dict(got) == batch
    # the cross-batch pair specifically: user 1's y (batch 1 tail)
    # -> x (batch 2)
    assert got[("y", "x")] >= 1
