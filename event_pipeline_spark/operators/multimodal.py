"""Multimodal columns: opaque binary payloads + typed metadata.

Treats image/audio/video as ``binary`` columns with a metadata struct
(SURVEY north-star). The Spark-side plumbing — schema, Arrow batch shape,
``mapInPandas`` signatures, partition sizing — is real and tested; the
codec step is STUBBED (this container ships no image/audio libraries):
``decode_image`` raises NotImplementedError unless ``fake=True``, in
which case a deterministic content-hash-seeded feature vector stands in
for real decode output so downstream plumbing is exercisable.

Scale notes: binary payloads ride ``spark.read.format("binaryFile")``
(one row per file, split-capped by ``maxPartitionBytes``); feature
extraction is an Arrow-batched ``mapInPandas`` so payload bytes cross
the Python boundary once, in columnar batches — never row-at-a-time
pickle. Keep ``spark.sql.execution.arrow.maxRecordsPerBatch`` modest
(e.g. 64) when payloads are MBs so batches fit executor memory.

Registered query: ``mm_binary_stats`` [oracle] — byte-size stats over a
binary column derived deterministically from ``documents`` (no binary
fixture table exists, so the derivation IS the fixture).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

QUERIES = {}
ORACLES = {}


def _register(name: str, fn, oracle: str | None = None) -> None:
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle


#: metadata struct carried alongside every binary payload
MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),   # image|audio|video
        T.StructField("format", T.StringType(), True),        # png|wav|mp4|...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("source_uri", T.StringType(), True),
    ]
)

FEATURE_DIM = 16


def read_binary_dir(spark: SparkSession, path: str, media_type: str) -> DataFrame:
    """Directory of media files → (path, length, content, meta)."""
    raw = spark.read.format("binaryFile").load(path)
    return raw.select(
        F.col("path").alias("source_uri"),
        F.col("length"),
        F.col("content"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.regexp_extract(F.col("path"), r"\.(\w+)$", 1).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.col("path").alias("source_uri"),
        ).alias("meta"),
    )


def documents_as_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic binary fixture: document texts as utf-8 payloads
    with image-ish metadata. Stands in for a real media table."""
    from event_pipeline_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("content"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("raw").alias("format"),
            (F.col("n_chars") % 640).cast("int").alias("width"),
            (F.col("n_chars") % 480).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.concat(F.lit("doc://"), F.col("doc_id")).alias("source_uri"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# decode / feature-extract (mapInPandas; codec stubbed)
# ---------------------------------------------------------------------------


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a decoded-image feature vector: bytes of
    sha256(payload) scaled to [0,1). Stable across runs and processes."""
    digest = hashlib.sha256(payload).digest()
    return [b / 256.0 for b in digest[:dim]]


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), False),
    ]
)


def extract_features(df: DataFrame, *, fake: bool = True) -> DataFrame:
    """Binary payloads → fixed-dim feature vectors via Arrow-batched
    mapInPandas. With ``fake=False`` this is where a real codec
    (PIL/librosa/ffmpeg) would run — unavailable here by design."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires codec libraries not present "
                    "in this environment; pass fake=True for the "
                    "deterministic stand-in"
                )
            payloads = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.str.len().astype("int64"),
                    "features": [_fake_features(p) for p in payloads],
                }
            )

    return df.select("media_id", "content").mapInPandas(
        batches, schema=FEATURES_SCHEMA
    )


def resize_images(df: DataFrame, width: int, height: int,
                  *, fake: bool = True) -> DataFrame:
    """Resize stub: passes payloads through, rewrites metadata dims.
    Real implementation would decode→resize→re-encode in mapInPandas."""
    if not fake:
        raise NotImplementedError("real resize requires an image codec")
    return df.withColumn(
        "meta",
        F.col("meta").withField("width", F.lit(width)).withField(
            "height", F.lit(height)
        ),
    )


def sample_frames(df: DataFrame, every_ms: int, *, fake: bool = True) -> DataFrame:
    """Video frame-sampling stub: emits (media_id, frame_idx) rows from
    metadata duration — the explode shape is real, the decode is not."""
    if not fake:
        raise NotImplementedError("real frame sampling requires a video codec")
    n_frames = F.greatest(
        (F.coalesce(F.col("meta.duration_ms"), F.lit(0)) / every_ms).cast("int"),
        F.lit(1),
    )
    return df.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    )


# ---------------------------------------------------------------------------
# registered queries
# ---------------------------------------------------------------------------


def q_mm_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-size stats per media format bucket over the derived binary
    column — verifies encode + metadata plumbing end to end."""
    media = documents_as_binary(spark, sf_dir)
    return (
        media.groupBy(F.col("meta.media_type").alias("media_type"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.length("content")).cast("long").alias("total_bytes"),
        )
        .orderBy("media_type")
    )


_register(
    "mm_binary_stats",
    q_mm_binary_stats,
    """SELECT 'image' AS media_type, COUNT(*) AS n,
              CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes
       FROM documents GROUP BY 1 ORDER BY media_type""",
)


def q_mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction through the Arrow/mapInPandas path (rows-only:
    deterministic fake features; checked for stability in tests)."""
    media = documents_as_binary(spark, sf_dir)
    feats = extract_features(media, fake=True)
    return feats.select(
        "media_id",
        "n_bytes",
        F.round(F.aggregate("features", F.lit(0.0), lambda a, b: a + b), 6).alias(
            "feature_sum"
        ),
    ).orderBy("media_id")


_register("mm_features", q_mm_features)
