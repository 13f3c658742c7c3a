"""Multimodal columns: opaque binary payloads + typed metadata.

Treats image/audio/video as ``binary`` columns with a metadata struct
(SURVEY north-star). The Spark-side plumbing — schema, Arrow batch shape,
``mapInPandas`` signatures, partition sizing — is real and tested. The
codec layer is real for the formats pure numpy can handle (BMP, PPM/PGM,
WAV-PCM — see ``operators/codecs.py``): ``fake=False`` decodes those
payloads for real and computes real pixel/sample statistics, and
``resize_images(fake=False)`` does an actual decode→nearest-neighbor
resize→re-encode round trip. Remaining formats (arithmetic-coded jpeg,
mp3/mp4, inter-frame video) need
codec libraries this container doesn't ship, so they raise
NotImplementedError; ``fake=True`` substitutes a deterministic
content-hash-seeded feature vector so downstream plumbing stays
exercisable for any format.

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


def _image_features(pixels, dim: int = FEATURE_DIM) -> list[float]:
    """Real image features: per-channel mean/std (6) + 10-bin luminance
    histogram, all normalized to [0,1]. numpy-vectorized per image."""
    import numpy as np

    arr = pixels.astype(np.float64)
    if arr.ndim == 2:  # grayscale → replicate to 3 channels
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    means = arr.mean(axis=(0, 1)) / 255.0
    stds = arr.std(axis=(0, 1)) / 255.0
    luma = arr @ [0.299, 0.587, 0.114]
    hist, _ = np.histogram(luma, bins=dim - 6, range=(0.0, 255.0))
    hist = hist / max(1, luma.size)
    return [*means, *stds, *hist][:dim]


def _audio_features(sample_rate: int, samples, dim: int = FEATURE_DIM) -> list[float]:
    """Real audio features: duration, rms, peak, zero-crossing rate +
    12-bin histogram of the normalized mono mix."""
    import numpy as np

    mono = samples.astype(np.float64).mean(axis=1)
    scale = float(np.iinfo(samples.dtype).max) if samples.dtype.kind in "iu" else 1.0
    mono = mono / scale
    n = max(1, mono.size)
    duration = mono.size / sample_rate
    rms = float(np.sqrt((mono**2).mean())) if mono.size else 0.0
    peak = float(np.abs(mono).max()) if mono.size else 0.0
    zcr = float((np.diff(np.signbit(mono)) != 0).sum()) / n
    hist, _ = np.histogram(mono, bins=dim - 4, range=(-1.0, 1.0))
    return [duration, rms, peak, zcr, *(hist / n)][:dim]


def _real_features(payload: bytes, fmt: str) -> list[float]:
    """Dispatch on container format; NotImplementedError surfaces for
    formats needing external codecs (the honest gate)."""
    from event_pipeline_spark.operators import codecs

    if (fmt or "").lower() == "wav":
        return _audio_features(*codecs.decode_wav(bytes(payload)))
    return _image_features(codecs.decode_image(bytes(payload), fmt))


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), False),
    ]
)


def extract_features(df: DataFrame, *, fake: bool = True) -> DataFrame:
    """Binary payloads → fixed-dim feature vectors via Arrow-batched
    mapInPandas. ``fake=False`` decodes for real — pure-numpy codecs for
    bmp/ppm/pgm/png/gif/jpeg/wav (``operators/codecs.py``; png via
    stdlib zlib, jpeg baseline implemented here); other formats raise
    NotImplementedError (inter-frame video codecs need libraries this container lacks)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["content"]
            if fake:
                features = [_fake_features(p) for p in payloads]
            else:
                features = [
                    _real_features(p, fmt)
                    for p, fmt in zip(payloads, pdf["format"])
                ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.str.len().astype("int64"),
                    "features": features,
                }
            )

    cols = df.select(
        "media_id", "content", F.col("meta.format").alias("format")
    ) if not fake else df.select("media_id", "content")
    return cols.mapInPandas(batches, schema=FEATURES_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int,
                  *, fake: bool = True) -> DataFrame:
    """Resize. ``fake=True`` passes payloads through and rewrites the
    metadata dims (plumbing only). ``fake=False`` does the real thing in
    mapInPandas — decode (bmp/ppm/pgm, pure numpy), nearest-neighbor
    resize, re-encode in the same container format — keeping the input
    schema so resized media flows through the same downstream operators."""
    if fake:
        return df.withColumn(
            "meta",
            F.col("meta").withField("width", F.lit(width)).withField(
                "height", F.lit(height)
            ),
        )

    from event_pipeline_spark.operators import codecs

    out_schema = df.schema

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            contents = []
            metas = []
            for payload, meta in zip(pdf["content"], pdf["meta"]):
                fmt = (meta.get("format") or "").lower()
                pixels = codecs.decode_image(bytes(payload), fmt)
                resized = codecs.resize_nearest(pixels, width, height)
                encode = codecs.encode_bmp if fmt == "bmp" else codecs.encode_ppm
                contents.append(encode(resized))
                metas.append({**meta, "width": width, "height": height})
            out = pdf.copy()
            out["content"] = contents
            out["meta"] = metas
            yield out

    return df.mapInPandas(batches, schema=out_schema)


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("ts_ms", T.LongType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("mean_luma", T.DoubleType(), False),
    ]
)


def sample_frames(df: DataFrame, every_ms: int, *, fake: bool = True) -> DataFrame:
    """Video frame sampling.

    ``fake=True``: emits (media_id, frame_idx) rows from metadata
    duration — plumbing only, no decode.

    ``fake=False`` (real since r4): each binary payload is parsed as an
    MJPEG AVI (``codecs.decode_avi_mjpeg`` — RIFF walk, one JPEG per
    frame via the round-4 baseline JPEG decoder), frames are sampled at
    the ``every_ms`` stride from the container's own fps, and only the
    SAMPLED frames are decoded — per-row work is O(frames kept), the
    property that matters when a 100 TB video corpus is sampled sparsely.
    Emits ``FRAME_SAMPLE_SCHEMA`` rows (timestamp, dims, mean luma per
    decoded frame). Inter-frame codecs (H.264/VP9) still need external
    libraries and raise from the JPEG/AVI parsers.
    """
    if fake:
        n_frames = F.greatest(
            (F.coalesce(F.col("meta.duration_ms"), F.lit(0)) / every_ms).cast("int"),
            F.lit(1),
        )
        return df.select(
            "media_id",
            F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
        )

    from event_pipeline_spark.operators import codecs

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k.name: [] for k in FRAME_SAMPLE_SCHEMA.fields}
            for media_id, payload in zip(pdf["media_id"], pdf["content"]):
                fps, frames = codecs.decode_avi_mjpeg(bytes(payload))
                frame_ms = 1000.0 / fps
                stride = max(1, int(round(every_ms / frame_ms)))
                for idx in range(0, len(frames), stride):
                    img = codecs.decode_image(frames[idx], "jpeg")
                    luma = (
                        img.mean()
                        if img.ndim == 2
                        else (
                            0.299 * img[..., 0]
                            + 0.587 * img[..., 1]
                            + 0.114 * img[..., 2]
                        ).mean()
                    )
                    out["media_id"].append(int(media_id))
                    out["frame_idx"].append(idx)
                    out["ts_ms"].append(int(idx * frame_ms))
                    out["height"].append(int(img.shape[0]))
                    out["width"].append(int(img.shape[1]))
                    out["mean_luma"].append(round(float(luma), 3))
            yield pd.DataFrame(out)

    return df.select("media_id", "content").mapInPandas(
        batches, schema=FRAME_SAMPLE_SCHEMA
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


_register(
    "mm_features",
    q_mm_features,
    # the fake-feature derivation is fully deterministic (sha256 bytes /
    # 256), so it IS oracle-able: DuckDB's sha256(VARCHAR) hashes the
    # same utf-8 bytes Spark's encode() produced; hex digits parse via
    # strpos. Each b/256.0 is an exact dyadic rational and the 16-term
    # sum stays exact in float64, so both engines agree bit-for-bit.
    """SELECT doc_id AS media_id,
              octet_length(encode(text)) AS n_bytes,
              ROUND(list_sum(list_transform(generate_series(1, 16), i ->
                  ((strpos('0123456789abcdef',
                           substr(sha256(text), 2*i - 1, 1)) - 1) * 16
                   + (strpos('0123456789abcdef',
                             substr(sha256(text), 2*i, 1)) - 1)) / 256.0)),
                  6) AS feature_sum
       FROM documents ORDER BY media_id""",
)


# ---------------------------------------------------------------------------
# Spectral audio features (round 3): numpy FFT over real decoded WAV
# ---------------------------------------------------------------------------

SPECTRAL_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("duration_sec", T.DoubleType(), False),
        T.StructField("dominant_hz", T.DoubleType(), False),
        T.StructField("spectral_centroid_hz", T.DoubleType(), False),
        T.StructField("band_energy", T.ArrayType(T.DoubleType()), False),
    ]
)


def _spectral_features(payload: bytes, n_bands: int = 8):
    """Real frequency-domain features from a PCM WAV payload: dominant
    frequency (argmax of the magnitude spectrum), spectral centroid,
    and energy split across ``n_bands`` log-ish linear bands."""
    import numpy as np

    from event_pipeline_spark.operators import codecs

    rate, samples = codecs.decode_wav(bytes(payload))
    mono = samples.astype(np.float64).mean(axis=1)
    if samples.dtype.kind in "iu":
        mono = mono / float(np.iinfo(samples.dtype).max)
    if mono.size == 0:
        return rate, 0.0, 0.0, 0.0, [0.0] * n_bands
    spec = np.abs(np.fft.rfft(mono))
    freqs = np.fft.rfftfreq(mono.size, d=1.0 / rate)
    power = spec**2
    total = float(power.sum()) or 1.0
    dominant = float(freqs[int(np.argmax(spec[1:])) + 1]) if spec.size > 1 else 0.0
    centroid = float((freqs * power).sum() / total)
    edges = np.linspace(0, rate / 2, n_bands + 1)
    bands = [
        float(power[(freqs >= lo) & (freqs < hi)].sum() / total)
        for lo, hi in zip(edges[:-1], edges[1:])
    ]
    return rate, mono.size / rate, dominant, centroid, bands


def audio_spectral_features(df: DataFrame, n_bands: int = 8) -> DataFrame:
    """WAV payloads → FFT features via Arrow-batched mapInPandas (one
    Python crossing per batch; the FFT itself is numpy, vectorized).
    The real-decode analogue of ``extract_features`` for the audio
    modality — feeds audio dedup/quality filters the way image stats
    feed the visual ones."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["content"]):
                rate, dur, dom, cen, bands = _spectral_features(
                    payload, n_bands
                )
                out.append(
                    {
                        "media_id": mid,
                        "sample_rate": rate,
                        "duration_sec": dur,
                        "dominant_hz": dom,
                        "spectral_centroid_hz": cen,
                        "band_energy": bands,
                    }
                )
            yield pd.DataFrame(out)

    return df.select("media_id", "content").mapInPandas(
        batches, schema=SPECTRAL_SCHEMA
    )
