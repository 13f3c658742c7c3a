"""Differential gate: every oracle-checkable query, Spark vs DuckDB.

Mirrors the driver's t2 check (BASELINE.md) at sf0.001 for speed;
``SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01`` reruns at gate scale.
"""

from __future__ import annotations

import pytest

from event_pipeline_spark.registry import all_oracles, all_queries
from event_pipeline_spark.testing.differential import compare, duckdb_connect

_QUERIES = all_queries()
_ORACLES = all_oracles()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connect(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle(name, spark, sf_dir, con):
    res = compare(name, _QUERIES[name](spark, sf_dir), con, _ORACLES[name])
    assert res.ok, str(res)


def test_all_oracle_queries_registered():
    # every oracle has a matching query implementation
    assert set(_ORACLES) <= set(_QUERIES)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and df.columns == [
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_price",
        "count_order",
    ]


def test_read_table_normalizes_every_ts_encoding(spark, sf_dir, tmp_path):
    """events.ts has shipped as TIMESTAMP(NANOS), TIMESTAMP_NTZ, and could
    ship as zoned TIMESTAMP; read_table must normalize all three to
    TIMESTAMP_NTZ with identical wall-clock values (the round-2
    regression: the nanos branch went dead when testdata regenerated as
    NTZ, and downstream casts broke). This fixture keeps every branch
    live."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from event_pipeline_spark.session import read_table

    current = read_table(spark, sf_dir, "events").select("event_id", "ts")
    assert dict(current.dtypes)["ts"] == "timestamp_ntz"
    want = {r["event_id"]: r["ts"] for r in current.limit(200).collect()}
    ids = list(want)

    base = pa.table(
        {
            "event_id": pa.array(ids, pa.int64()),
            "ts": pa.array([want[i] for i in ids], pa.timestamp("us")),
        }
    )
    encodings = {
        "nanos": base.set_column(1, "ts", base["ts"].cast(pa.timestamp("ns"))),
        "ntz": base,
        "zoned": base.set_column(
            1, "ts", base["ts"].cast(pa.timestamp("us", tz="UTC"))
        ),
    }
    for label, tbl in encodings.items():
        d = tmp_path / label
        d.mkdir()
        pq.write_table(tbl, d / "events.parquet", version="2.6")
        got_df = read_table(spark, str(d), "events", cached=False)
        assert dict(got_df.dtypes)["ts"] == "timestamp_ntz", label
        got = {r["event_id"]: r["ts"] for r in got_df.collect()}
        assert got == want, label


def test_read_table_jsonl_and_csv_parity(spark, sf_dir, tmp_path):
    """Non-parquet ingest parity (real corpus drops arrive as
    JSONL/CSV): read_table detects the format by extension and the
    TIMESTAMP_NTZ normalization contract extends to string timestamps —
    the same table read from parquet, JSONL (explicit schema and
    inferred), and CSV must produce identical values."""
    from event_pipeline_spark.session import read_table

    events = read_table(spark, sf_dir, "events")
    schema_ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in events.schema
    )
    want = {
        r["event_id"]: r.asDict()
        for r in events.limit(300).collect()
    }
    sample = events.limit(300)

    # writers default to millisecond timestampNTZFormat — a real drop
    # carries full microseconds, so the fixtures must too
    ntz_fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    jd = tmp_path / "jsonl"
    sample.coalesce(1).write.option(
        "timestampNTZFormat", ntz_fmt
    ).json(str(jd / "tmp"))
    jsonl = next((jd / "tmp").glob("part-*.json"))
    jsonl.rename(jd / "events.jsonl")

    cd = tmp_path / "csv"
    sample.coalesce(1).write.option("header", "true").option(
        "timestampNTZFormat", ntz_fmt
    ).csv(str(cd / "tmp"))
    csvf = next((cd / "tmp").glob("part-*.csv"))
    csvf.rename(cd / "events.csv")

    for label, df in (
        ("jsonl_schema", read_table(
            spark, str(jd), "events", cached=False, schema=schema_ddl)),
        ("jsonl_inferred", read_table(
            spark, str(jd), "events", cached=False)),
        ("csv_inferred", read_table(
            spark, str(cd), "events", cached=False)),
    ):
        assert dict(df.dtypes)["ts"] == "timestamp_ntz", label
        got = {r["event_id"]: r.asDict() for r in df.collect()}
        assert set(got) == set(want), label
        for k in want:
            g, w = got[k], want[k]
            assert g["ts"] == w["ts"], (label, k)
            assert g["event_type"] == w["event_type"], (label, k)
            assert g["user_id"] == w["user_id"], (label, k)

    # missing table file is a clear error, not a parquet stacktrace
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError, match="no table file"):
        read_table(spark, str(tmp_path), "nope", cached=False)


def test_q37_approx_within_bounds(spark, sf_dir):
    """HLL++ cardinality within rsd bounds of exact; approx percentiles
    within the accuracy window of the exact rank statistics."""
    from pyspark.sql import functions as F

    from event_pipeline_spark.queries import QUERIES
    from event_pipeline_spark.session import read_table

    approx = {r["event_type"]: r for r in QUERIES["q37"](spark, sf_dir).collect()}
    events = read_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r
        for r in events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            # rank brackets, not point targets: approx_percentile returns
            # a real data value while percentile() interpolates, so in a
            # sparse tail the two legitimately diverge — the contract is
            # that the approx p50/p95 lands within a nearby rank window
            F.expr("percentile(value, array(0.40, 0.60, 0.90, 0.99))").alias("q"),
        )
        .collect()
    }
    assert approx.keys() == exact.keys()
    for et, a in approx.items():
        e = exact[et]
        assert abs(a["approx_users"] - e["users"]) <= max(3, 0.1 * e["users"])
        assert e["q"][0] - 1e-9 <= a["p50"] <= e["q"][1] + 1e-9
        assert e["q"][2] - 1e-9 <= a["p95"] <= e["q"][3] + 1e-9


def test_read_table_orc_parity(spark, sf_dir, tmp_path):
    """ORC ingest parity: the columnar sibling format reads through
    read_table with the same TIMESTAMP_NTZ normalization and value
    equality as parquet (differential: values compared against the
    parquet read of the same rows)."""
    from event_pipeline_spark.session import read_table

    events = read_table(spark, sf_dir, "events")
    sample = events.limit(300)
    want = {r["event_id"]: r.asDict() for r in sample.collect()}

    od = tmp_path / "orc"
    sample.coalesce(1).write.orc(str(od / "tmp"))
    orcf = next((od / "tmp").glob("part-*.orc"))
    orcf.rename(od / "events.orc")

    df = read_table(spark, str(od), "events", cached=False)
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    got = {r["event_id"]: r.asDict() for r in df.collect()}
    assert set(got) == set(want)
    for k in want:
        for col in ("ts", "event_type", "user_id", "value"):
            assert got[k][col] == want[k][col], (k, col)



def test_read_table_avro_gate(spark, sf_dir, tmp_path):
    """Avro ingest is jar-gated (closed-by-environment: the container
    ships the avro CORE jars but not the spark-avro DataSource
    module). The probe must answer honestly, and read_table must
    either read an .avro drop with full parity (module present) or
    refuse with the documented error (module absent) — never a raw
    ClassNotFound/lookup failure."""
    import pytest

    from event_pipeline_spark.session import avro_readable, read_table

    ad = tmp_path / "avro"
    ad.mkdir()
    if not avro_readable(spark):
        # the gate: a clear, documented refusal on an .avro drop
        (ad / "events.avro").write_bytes(b"Obj\x01")  # avro magic
        with pytest.raises(RuntimeError, match="spark-avro"):
            read_table(spark, str(ad), "events", cached=False)
        # and the probe's claim is consistent with the engine's
        with pytest.raises(Exception, match="avro"):
            spark.range(1).write.format("avro").save(str(ad / "w"))
        return

    # module present: full parity with the parquet read (the ORC test's
    # differential posture)
    events = read_table(spark, sf_dir, "events")
    sample = events.limit(300)
    want = {r["event_id"]: r.asDict() for r in sample.collect()}
    sample.withColumn(
        "ts", sample["ts"].cast("timestamp")
    ).coalesce(1).write.format("avro").save(str(ad / "tmp"))
    avrof = next((ad / "tmp").glob("part-*.avro"))
    avrof.rename(ad / "events.avro")
    df = read_table(spark, str(ad), "events", cached=False)
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    got = {r["event_id"]: r.asDict() for r in df.collect()}
    assert set(got) == set(want)
    for k in want:
        for col in ("ts", "event_type", "user_id", "value"):
            assert got[k][col] == want[k][col], (k, col)
