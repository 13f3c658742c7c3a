"""SparkSession factory and table loading.

Defaults are tuned for correctness-vs-oracle comparison (UTC timestamps,
ANSI off to mirror DuckDB's permissive casts) and for scale (AQE on,
Arrow on, shuffle partitions sized to the data rather than the 200
default). On a real cluster the same settings hold; only
``shuffle_partitions`` and memory sizing change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: Tables the driver generates at /root/testdata/sf*/ (TESTDATA.md).
TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def _ensure_protobuf_env() -> None:
    """Put the vendored protobuf shim on ``PYTHONPATH`` before the JVM
    launches, when no real protobuf install exists.

    ``transformWithStateInPandas`` spawns a DRIVER-side Python worker
    (state-schema validation, ``transform_with_state_driver_worker``)
    whose import path comes from the JVM process environment — not from
    ``addPyFile`` — so the shim must be in the environment the JVM
    inherits at launch. Harmless when protobuf is installed (no-op) or
    when the JVM is already up (the var simply goes unused).
    """
    vendor = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_vendor")
    try:
        import google.protobuf as _gp

        origin = getattr(_gp, "__file__", "") or ""
        if not origin.startswith(vendor):
            return  # real protobuf install — don't shadow it in workers
    except ImportError:
        pass
    if not os.path.isdir(os.path.join(vendor, "google", "protobuf")):
        return
    existing = os.environ.get("PYTHONPATH", "")
    if vendor not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            vendor + (os.pathsep + existing if existing else "")
        )


def get_session(
    app_name: str = "event_pipeline_spark",
    *,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-aware defaults.

    - AQE enabled: runtime partition coalescing + skew-join splitting, so
      a plan written once survives 100x data movement.
    - Arrow enabled: pandas_udf / toPandas cross the Python boundary in
      columnar batches, not row-at-a-time pickle.
    - UTC session timezone: parquet timestamps compare bit-stable against
      the DuckDB oracle.
    - shuffle partitions default to local core count (local mode); on a
      cluster leave AQE's coalescing to right-size them.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 4)
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)

    _ensure_protobuf_env()

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Local mode only: AQE's 64MB advisory target coalesces a test-SF
        # shuffle to 1 partition, serializing every post-shuffle sort and
        # window on one core. 1MB keeps local parallelism; on a cluster
        # the default stands (the advisory size also sets AQE's skew-split
        # granularity — 1MB splits would shred a skewed 10 GB partition
        # into 10k tasks).
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "1m" if master.startswith("local") else "64m",
        )
        # Local mode only: test-SF tables are single ~10MB parquet files —
        # one scan task at the 128MB default. 8MB splits give the scan the
        # cores (row-group granularity bounds how far this goes). Cluster
        # default stands: at 100 TB, files outnumber cores and 128MB
        # splits amortize task overhead properly.
        .config(
            "spark.sql.files.maxPartitionBytes",
            "8m" if master.startswith("local") else "128m",
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # Broadcast threshold: dims (region/nation/supplier at test SF) stay
        # broadcast; at 100 TB the fact tables never qualify, which is correct.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


#: Lazy-plan cache keyed by (application id, absolute path). A DataFrame
#: is an immutable plan, but its parquet file listing is snapshotted at
#: read time — so this cache is only correct for immutable table
#: directories (the driver's testdata is; pass ``cached=False`` for a
#: directory that receives appends). Saves the ~0.1s listing+schema RPC
#: per query in the bench/correctness runners.
_TABLE_CACHE: dict[tuple[str, str], DataFrame] = {}


#: detection order for read_table: parquet is the benchmark's native
#: format; JSONL/CSV are the arrival formats of real corpus drops.
#: Avro (the Kafka-adjacent arrival format) is jar-gated — see
#: ``avro_readable``.
_TABLE_FORMATS = (
    ("parquet", ".parquet"),
    ("orc", ".orc"),
    ("avro", ".avro"),
    ("json", ".jsonl"),
    ("json", ".json"),
    ("csv", ".csv"),
)


def avro_readable(spark: SparkSession) -> bool:
    """True when the ``spark-avro`` DataSource module is deployable.

    Closed-by-environment in this container (the ``sources/kafka.py``
    posture): the distribution ships the avro CORE jars
    (avro-1.12.1 etc. — Spark-internal serialization) but NOT the
    external ``org.apache.spark:spark-avro`` DataSource module, so
    ``spark.read.format("avro")`` fails at source lookup. The probe
    asks the real registry (``DataSource.lookupDataSource``) rather
    than ``Class.forName`` — a stray avro class on the classpath
    false-positives the latter (verified here: the class resolves,
    the source does not). Verification one-liner:
    ``spark.range(1).write.format("avro").save(...)`` →
    "Failed to find data source: avro"."""
    try:
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(  # noqa: E501
            "avro", spark._jsparkSession.sessionState().conf()
        )
        return True
    except Exception:
        return False


def _normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize every physical encoding of the events ``ts`` column to
    TIMESTAMP_NTZ (UTC wall-clock) — the single-type contract every
    downstream operator and the DuckDB oracle comparison rely on.

    - TIMESTAMP_NTZ → no-op (current parquet testdata).
    - bigint → parquet TIMESTAMP(NANOS) read via nanosAsLong; convert
      with integer arithmetic (``ts div 1000`` — double division loses
      precision above 2^53 ns).
    - zoned TIMESTAMP → cast (session tz is UTC: wall clock unchanged).
    - string → JSONL/CSV arrival without an explicit schema; cast
      parses ISO-8601 as naive wall-clock.
    """
    from pyspark.sql import functions as F

    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":  # parquet TIMESTAMP(NANOS)
        return df.withColumn(
            "ts",
            F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"),
        )
    if ts_type in ("timestamp", "string"):
        return df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    return df


def read_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    *,
    cached: bool = True,
    schema=None,
) -> DataFrame:
    """Read one benchmark table as a lazy DataFrame scan.

    Format is detected by file extension — ``{name}.parquet`` first (the
    benchmark's native format), then ``.orc`` (the columnar sibling,
    same pushdown/pruning), then ``.jsonl``/``.json``/``.csv`` (how
    real corpus drops arrive). The normalization contract is
    format-independent: the ``events`` table's ``ts`` lands as
    TIMESTAMP_NTZ whatever the physical encoding was (three parquet
    encodings across testdata generations, zoned timestamps, or
    JSONL/CSV strings — see :func:`_normalize_events_ts`), so a pipeline
    written against the parquet tables runs unchanged on a JSONL drop.

    For JSONL/CSV pass ``schema`` (a DDL string or StructType) to pin
    exact column types — the production posture, since inference samples
    data and can flip types between drops; without it, inference is used
    and integral columns arrive as BIGINT (matching the parquet tables'
    key columns).
    """
    for fmt, ext in _TABLE_FORMATS:
        path = os.path.join(sf_dir, f"{name}{ext}")
        if os.path.exists(path):
            break
    else:
        raise FileNotFoundError(
            f"no table file for {name!r} in {sf_dir} "
            f"(tried {', '.join(e for _, e in _TABLE_FORMATS)})"
        )
    key = (spark.sparkContext.applicationId, os.path.abspath(path))
    if cached and key in _TABLE_CACHE:
        return _TABLE_CACHE[key]
    if fmt == "parquet":
        if name == "events":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
    elif fmt == "orc":
        # columnar sibling with the same pushdown/pruning properties;
        # ORC TIMESTAMP is zone-less on disk, so the events
        # normalization below lands it as TIMESTAMP_NTZ like parquet
        df = spark.read.orc(path)
    elif fmt == "avro":
        if not avro_readable(spark):
            raise RuntimeError(
                f"{path} is Avro but the spark-avro DataSource module "
                "is not deployed (this container ships only the avro "
                "CORE jars) — add org.apache.spark:spark-avro to the "
                "session packages; see session.avro_readable"
            )
        # row-oriented arrival format: no column pruning/pushdown at
        # the scan (whole records decode) — land-and-convert to
        # parquet is the posture for anything queried more than once
        df = spark.read.format("avro").load(path)
    else:
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        if fmt == "json":
            df = reader.json(path)
        else:
            df = (
                reader.option("header", "true")
                .option("inferSchema", schema is None)
                .csv(path)
            )
    if name == "events":
        df = _normalize_events_ts(df)
    if cached:
        _TABLE_CACHE[key] = df
    return df


def load_tables(
    spark: SparkSession,
    sf_dir: str = DEFAULT_SF_DIR,
    *,
    register_views: bool = True,
) -> dict[str, DataFrame]:
    """Load the benchmark tables lazily; optionally register temp views.

    Parquet scans get predicate pushdown + column pruning from Catalyst;
    nothing is materialized here.
    """
    tables: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        if not any(
            os.path.exists(os.path.join(sf_dir, f"{name}{ext}"))
            for _, ext in _TABLE_FORMATS
        ):
            continue
        df = read_table(spark, sf_dir, name)
        tables[name] = df
        if register_views:
            df.createOrReplaceTempView(name)
    return tables
