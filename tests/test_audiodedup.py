"""Audio fingerprint dedup: fixture pins, gain/re-encode invariance,
block-join completeness, and contract edges."""

from __future__ import annotations

import numpy as np
import pytest

from event_pipeline_spark.operators import codecs
from event_pipeline_spark.operators.audiodedup import (
    FIXTURE_PATH,
    afp64,
    afp_audio,
    audio_near_duplicates,
)


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_spark_fingerprints_match_pinned_fixture(spark):
    """The vectorized Spark path must reproduce the fixture's
    independent scalar-loop fingerprints exactly."""
    df = spark.read.parquet(FIXTURE_PATH)
    pinned = {r["clip_id"]: r["expected_afp"] for r in df.collect()}
    got = afp_audio(df).collect()
    assert len(got) == len(pinned)
    for r in got:
        assert r["afp"] == pinned[r["clip_id"]], r["clip_id"]


def test_gain_and_encoding_invariance():
    """The difference-of-differences bits cancel uniform gain and
    bit-depth rescaling: PCM16, half-volume, float32, and uint8
    re-encodes of one clip fingerprint within the near-dup threshold
    (the fixture family measures exactly 0 bits apart)."""
    t = np.arange(2048) / 8000.0
    x = np.round(
        9000 * (np.sin(2 * np.pi * 350 * t) + 0.5 * np.sin(2 * np.pi * 900 * t))
        / 1.5
    ).astype(np.int16)
    h0 = afp64(codecs.encode_wav(x, 8000))
    assert _ham(h0, afp64(codecs.encode_wav((x // 2).astype(np.int16), 8000))) <= 10
    assert _ham(
        h0, afp64(codecs.encode_wav(x.astype(np.float32) / 32767.0, 8000))
    ) <= 10
    assert _ham(
        h0,
        afp64(
            codecs.encode_wav(
                ((x.astype(np.int32) >> 8) + 128).astype(np.uint8), 8000
            )
        ),
    ) <= 10


def test_stereo_mono_channel_sum():
    """A stereo clip whose channels sum to a mono clip's samples must
    fingerprint identically (channel sum is the normalization)."""
    t = np.arange(1024) / 8000.0
    mono = np.round(8000 * np.sin(2 * np.pi * 500 * t)).astype(np.int16)
    left = (mono.astype(np.int32) // 3).astype(np.int16)
    right = (mono.astype(np.int32) - left).astype(np.int16)
    stereo = np.stack([left, right], axis=1)
    assert afp64(codecs.encode_wav(mono, 8000)) == afp64(
        codecs.encode_wav(stereo, 8000)
    )


def test_block_join_equals_bruteforce_on_fixture(spark):
    df = spark.read.parquet(FIXTURE_PATH)
    fps = {r["clip_id"]: r["afp"] for r in afp_audio(df).collect()}
    expected = {
        (a, b, _ham(fps[a], fps[b]))
        for a in fps
        for b in fps
        if a < b and _ham(fps[a], fps[b]) <= 10
    }
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in audio_near_duplicates(df).collect()
    }
    assert got == expected
    assert len(expected) == 6  # the four-clip A family: C(4,2)


def test_short_clip_raises():
    with pytest.raises(ValueError):
        afp64(codecs.encode_wav(np.zeros(64, dtype=np.int16), 8000))
