"""Batch-field semantics tests (reference: tests/unittests/
test_batch_pipeline.py:40-260) + the HTTP source pattern."""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest
from pyspark.sql import functions as F

from event_pipeline_spark.core.events import EventRegistry, event
from event_pipeline_spark.core.fields import (
    InputDataField,
    file_stream_batch_processor,
    list_batch_processor,
    validate_batch_processor,
)
from event_pipeline_spark.plans.pipeline import BatchPipeline
from event_pipeline_spark.sources.http import fetch_json
from event_pipeline_spark.telemetry import signals as S


# -- processors ------------------------------------------------------------

def test_list_batch_processor_chunks():
    assert list(list_batch_processor([1, 2, 3, 4, 5], 2)) == [[1, 2], [3, 4], [5]]


def test_file_stream_batch_processor(tmp_path):
    p = tmp_path / "blob.bin"
    p.write_bytes(b"abcdefghij")
    assert list(file_stream_batch_processor(str(p), 4)) == [b"abcd", b"efgh", b"ij"]


def test_validate_batch_processor_rejects_bad_signature():
    with pytest.raises(TypeError, match="values, batch_size"):
        validate_batch_processor(lambda only_one: None)
    with pytest.raises(TypeError, match="callable"):
        validate_batch_processor(42)


# -- BatchPipeline round-robin + signals -------------------------------------

@event
def RecordBatch(spark, items, tags):
    RecordBatch.__wrapped__.seen.append((items, tags))
    return True, None


RecordBatch.__wrapped__.seen = []


class TwoFieldBatch(BatchPipeline):
    items = InputDataField(list, batch_size=2)
    tags = InputDataField(list, batch_size=1)

    class Meta:
        pointy = "RecordBatch"


def test_round_robin_none_padding(spark):
    """Unequal batch counts co-advance; exhausted fields pad with None
    (reference pipeline.py:1158-1189)."""
    EventRegistry.register(RecordBatch)
    RecordBatch.__wrapped__.seen.clear()
    finished = []
    on_done = lambda sender, signal, **kw: finished.append(kw)  # noqa: E731
    S.batch_pipeline_finished.connect(on_done, weak=False)
    try:
        bp = TwoFieldBatch(items=[1, 2, 3, 4, 5], tags=["a"])
        results = bp.execute(spark)
    finally:
        S.batch_pipeline_finished.disconnect(on_done)

    assert RecordBatch.__wrapped__.seen == [
        ([1, 2], ["a"]),
        ([3, 4], None),
        ([5], None),
    ]
    assert len(results) == 3
    assert len(finished) == 1 and finished[0]["success_rate"] == 100.0


def test_custom_field_batch_override(spark):
    """<field>_batch methods override the processor
    (reference pipeline.py:1133-1145)."""
    EventRegistry.register(RecordBatch)
    RecordBatch.__wrapped__.seen.clear()

    class Override(TwoFieldBatch):
        def items_batch(self, values, batch_size):
            yield values  # single batch regardless of size

    bp = Override(items=[1, 2, 3], tags=["x", "y"])
    bp.execute(spark)
    assert RecordBatch.__wrapped__.seen == [
        ([1, 2, 3], ["x"]),
        (None, ["y"]),
    ]


# -- HTTP source --------------------------------------------------------------

class _Handler(BaseHTTPRequestHandler):
    payload = [{"userId": 1, "title": "a"}, {"userId": 1, "title": "b"},
               {"userId": 2, "title": "c"}]

    def do_GET(self):
        body = json.dumps(self.payload).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):  # silence
        pass


@pytest.fixture()
def http_url():
    server = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_port}/posts"
    server.shutdown()


def test_fetch_json_group_count(spark, http_url):
    """The reference's user-posts ETL shape (examples/user_posts_etl):
    fetch JSON → group-count per user."""
    df = fetch_json(spark, http_url)
    got = {
        r["userId"]: r["n"]
        for r in df.groupBy("userId").agg(F.count("*").alias("n")).collect()
    }
    assert got == {1: 2, 2: 1}


def test_field_default_applies_when_omitted(spark):
    """A declared default binds when the field is not passed (regression:
    the EMPTY sentinel used to shadow the default, so omitted fields
    silently bound None — and a None threshold nulls any comparison)."""
    from event_pipeline_spark.core.fields import InputDataField
    from event_pipeline_spark.plans.pipeline import Pipeline

    class P(Pipeline):
        threshold = InputDataField(float, default=0.3)
        name = InputDataField(str)

        class Meta:
            pointy = "Noop"

    p = P(name="x")
    assert p.threshold == 0.3
    assert p.field_values()["threshold"] == 0.3
    p2 = P(name="x", threshold=0.9)
    assert p2.threshold == 0.9


class TestKafkaSource:
    """Option building + decode projection (the connector jar is absent
    in this container, so the read path is gated like JDBC)."""

    def test_build_options(self):
        from event_pipeline_spark.sources.kafka import build_options

        opts = build_options(
            "broker:9092", subscribe="events",
            extra={"kafka.security.protocol": "SSL"},
        )
        assert opts["subscribe"] == "events"
        assert opts["maxOffsetsPerTrigger"] == "100000"
        assert opts["kafka.security.protocol"] == "SSL"
        assert "failOnDataLoss" not in opts  # explicit choice only

    def test_option_validation(self):
        import pytest as _pytest

        from event_pipeline_spark.sources.kafka import (
            KafkaSourceError,
            build_options,
        )

        with _pytest.raises(KafkaSourceError, match="exactly one"):
            build_options("b:9092")
        with _pytest.raises(KafkaSourceError, match="exactly one"):
            build_options("b:9092", subscribe="a", subscribe_pattern="a.*")
        with _pytest.raises(KafkaSourceError, match="kafka. prefix"):
            build_options("b:9092", subscribe="a", extra={"fetch.min.bytes": "1"})

    def test_read_stream_gated_without_connector(self, spark):
        import pytest as _pytest

        from event_pipeline_spark.sources.kafka import (
            KafkaSourceError,
            build_options,
            read_stream,
            readable,
        )

        if readable(spark):
            _pytest.skip("kafka connector present; gating path unreachable")
        with _pytest.raises(KafkaSourceError, match="classpath"):
            read_stream(spark, build_options("b:9092", subscribe="events"))

    def test_decoded_projection(self, spark):
        from event_pipeline_spark.sources.kafka import decoded

        wire = spark.createDataFrame(
            [(b"k1", b'{"a": 1}', "t", 0, 0, None)],
            "key binary, value binary, topic string, partition int, "
            "offset long, timestamp timestamp",
        )
        plain = decoded(wire).first()
        assert plain["key"] == "k1" and plain["value"] == '{"a": 1}'
        parsed = decoded(wire, "a int").first()
        assert parsed["value"]["a"] == 1

    def test_decoded_runs_live_in_streaming_pipeline(self, spark, tmp_path):
        """End-to-end minus the broker: a file stream with the exact
        Kafka wire schema (key/value binary, topic/partition/offset/
        timestamp) feeds decoded() + from_json + aggregation inside a
        real Structured Streaming query — everything the Kafka source
        does downstream of .load(), exercised live."""
        import json

        from event_pipeline_spark.sources.kafka import decoded

        wire_schema = (
            "key binary, value binary, topic string, partition int, "
            "offset long, timestamp timestamp"
        )
        rows = [
            (
                f"u{i % 2}".encode(),
                json.dumps({"user": f"u{i % 2}", "amount": i}).encode(),
                "events",
                i % 2,
                i,
                None,
            )
            for i in range(10)
        ]
        src = str(tmp_path / "wire")
        spark.createDataFrame(rows, wire_schema).write.parquet(src)

        stream = spark.readStream.schema(wire_schema).parquet(src)
        parsed = decoded(stream, "user string, amount long")
        agg = parsed.groupBy(F.col("value.user").alias("user")).agg(
            F.sum("value.amount").alias("total"), F.count("*").alias("n")
        )
        query = (
            agg.writeStream.format("memory")
            .queryName("kafka_sim")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            query.processAllAvailable()
            got = {
                r["user"]: (r["total"], r["n"])
                for r in spark.sql("SELECT * FROM kafka_sim").collect()
            }
        finally:
            query.stop()
        assert got == {"u0": (20, 5), "u1": (25, 5)}


# -- Python DataSource connector (Spark 4 DataSource API) --------------------

def test_http_json_datasource_partitioned_read(spark, http_url):
    """The http_json connector plans one InputPartition per manifest URL
    (executor-side fetch) and delivers the same rows as the driver-side
    fetch_json path."""
    from event_pipeline_spark.sources.http import (
        HAS_DATASOURCE_API,
        register_http_json,
    )

    assert HAS_DATASOURCE_API
    register_http_json(spark)
    df = (
        spark.read.format("http_json")
        .schema("userId long, id long, title string")
        .option("urls", f"{http_url};{http_url}")
        .load()
    )
    rows = df.collect()
    single = fetch_json(spark, http_url).count()
    assert len(rows) == 2 * single  # two partitions, one fetch each
    assert df.rdd.getNumPartitions() == 2
    assert {r["userId"] for r in rows} and all(r["title"] for r in rows)


def test_http_json_datasource_requires_schema(spark, http_url):
    from event_pipeline_spark.sources.http import register_http_json

    register_http_json(spark)
    with pytest.raises(Exception, match="schema"):
        spark.read.format("http_json").option("urls", http_url).load()


def test_http_json_datasource_streams_polls(spark, http_url, tmp_path):
    """The streaming side of the connector: two polls (max_epochs=2)
    deliver the manifest rows twice through the offset log, then the
    query drains and stops."""
    from event_pipeline_spark.sources.http import register_http_json

    register_http_json(spark)
    stream = (
        spark.readStream.format("http_json")
        .schema("userId long, id long, title string")
        .option("urls", http_url)
        .option("max_epochs", "2")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("httpstream")
        .outputMode("append")
        .option("checkpointLocation", f"{tmp_path}/http_ckpt")
        .trigger(processingTime="1 second")
        .start()
    )
    single = fetch_json(spark, http_url).count()
    try:
        # max_epochs=2 caps the offset log at two polls; wait for both
        for _ in range(60):
            if spark.table("httpstream").count() >= 2 * single:
                break
            time.sleep(1)
    finally:
        q.stop()
    assert spark.table("httpstream").count() == 2 * single
