"""Perceptual image dedup: hand-computed dHash, fixture pins,
brightness/JPEG-roundtrip invariance, and block-join completeness."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from event_pipeline_spark.operators import codecs
from event_pipeline_spark.operators.imagededup import (
    FIXTURE_PATH,
    dhash64,
    dhash_images,
    image_near_duplicates,
)


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_dhash_hand_computed_tiny_image():
    """9x8 grayscale whose resize is the identity: bit(y,x) is a direct
    adjacent-column comparison, so the hash is hand-derivable. Row y
    alternates starting with y's parity -> per-row byte patterns
    0b10101010 (rises at odd x... computed below) verified by hand."""
    # luma strictly increases along x for even rows, decreases for odd
    img = np.zeros((8, 9), dtype=np.uint8)
    for y in range(8):
        for x in range(9):
            img[y, x] = (10 + 20 * x) if y % 2 == 0 else (200 - 20 * x)
    payload = codecs.encode_ppm(img)  # P5 PGM
    h = dhash64(payload, "pgm")
    # even rows: every comparison right>left -> 0xFF; odd rows: 0x00
    expected = 0
    for y in range(8):
        expected = (expected << 8) | (0xFF if y % 2 == 0 else 0x00)
    expected = expected - (1 << 64) if expected >= (1 << 63) else expected
    assert h == expected


def test_dhash_brightness_and_contrast_invariant():
    """Uniform brightness (+c) and contrast (*k, k>0) preserve every
    adjacent comparison, so the hash is bit-identical."""
    rng = np.random.RandomState(7)
    base = (rng.rand(20, 30, 3) * 120 + 40).astype(np.uint8)
    h0 = dhash64(codecs.encode_png(base), "png")
    brighter = (base.astype(np.int16) + 30).clip(0, 255).astype(np.uint8)
    dimmer = (base.astype(np.float64) * 0.7).astype(np.uint8)
    assert dhash64(codecs.encode_bmp(brighter), "bmp") == h0
    # integer truncation of *0.7 can flip near-tie comparisons; allow
    # a small drift but require near-dup closeness
    assert _ham(dhash64(codecs.encode_bmp(dimmer), "bmp"), h0) <= 10


def test_jpeg_roundtrip_pairs_with_original(spark):
    """Property (VERDICT r6 task 2): JPEG-re-encoded images still pair
    with their originals through the full Spark path.

    Scoped to the continuous-tone fixture rows: the flat-palette
    pattern images (img 5/6) are dHash's documented instability —
    large flat regions make adjacent-sample comparisons exact ties
    (right > left is false by equality), and JPEG ringing perturbs
    ties arbitrarily (measured: 14-19 flipped bits at q90-95, vs <= 1
    on every continuous-tone row). Real-photo content is
    continuous-tone; the palette rows stay in the fixture for the
    GIF-decode and lossless pattern-edit relations."""
    imgs = [
        r
        for r in spark.read.parquet(FIXTURE_PATH).collect()
        if r["img_id"] not in (5, 6)
    ]
    rows = []
    for r in imgs:
        rows.append((r["img_id"], r["fmt"], bytes(r["payload"])))
        pixels = codecs.decode_image(bytes(r["payload"]), r["fmt"])
        rows.append(
            (
                r["img_id"] + 100,  # roundtripped twin
                "jpeg",
                codecs.encode_jpeg(pixels, quality=90),
            )
        )
    df = spark.createDataFrame(
        rows, "img_id long, fmt string, payload binary"
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in image_near_duplicates(df, max_hamming=10).collect()
    }
    for r in imgs:
        assert (r["img_id"], r["img_id"] + 100) in pairs


def test_block_join_equals_bruteforce_on_fixture(spark):
    """hamming_block_pairs must find EXACTLY the <= d relation (the
    pigeonhole guarantee): compare against a driver-side brute force
    over all fixture pairs."""
    hashes = {
        r["img_id"]: r["dhash"]
        for r in dhash_images(spark.read.parquet(FIXTURE_PATH)).collect()
    }
    expected = {
        (a, b, _ham(hashes[a], hashes[b]))
        for a in hashes
        for b in hashes
        if a < b and _ham(hashes[a], hashes[b]) <= 10
    }
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in image_near_duplicates(
            spark.read.parquet(FIXTURE_PATH), max_hamming=10
        ).collect()
    }
    assert got == expected
    assert len(expected) >= 4  # the fixture's two near-dup families


def test_spark_hashes_match_pinned_fixture(spark):
    """The vectorized Spark path must reproduce the fixture's
    independently-computed scalar-loop hashes exactly."""
    df = spark.read.parquet(FIXTURE_PATH)
    got = dhash_images(df).collect()
    pinned = {r["img_id"]: r["expected_hash"] for r in df.collect()}
    assert len(got) == len(pinned)
    for r in got:
        assert r["dhash"] == pinned[r["img_id"]], r["img_id"]


def test_unsupported_format_raises():
    with pytest.raises(NotImplementedError):
        dhash64(b"RIFFxxxxWEBP", "webp")


# -- pHash -------------------------------------------------------------------


def test_phash_pins_and_dc_brightness_exactness(spark):
    """Spark pHash path reproduces the independently computed fixture
    pins; uniform brightness lands entirely in the dropped DC term, so
    the invariance is EXACT (not just near)."""
    from event_pipeline_spark.operators.imagededup import (
        phash64,
        phash_images,
    )

    df = spark.read.parquet(FIXTURE_PATH)
    pinned = {r["img_id"]: r["expected_phash"] for r in df.collect()}
    for r in phash_images(df).collect():
        assert r["phash"] == pinned[r["img_id"]], r["img_id"]
        assert r["phash"] >= 0  # 63 bits: MSB always clear

    rng = np.random.RandomState(11)
    base = (rng.rand(24, 36, 3) * 120 + 40).astype(np.uint8)
    shifted = (base.astype(np.int16) + 35).clip(0, 255).astype(np.uint8)
    assert phash64(codecs.encode_png(base), "png") == phash64(
        codecs.encode_bmp(shifted), "bmp"
    )


def test_phash_stable_where_dhash_is_not(spark):
    """The motivating case: flat-palette images JPEG-roundtrip 14-19
    bits away under dHash (tie comparisons perturbed by ringing) but
    must stay within the near-dup threshold under pHash (global
    frequency structure), pairing through the full Spark path."""
    from event_pipeline_spark.operators.imagededup import (
        dhash64,
        image_near_duplicates,
        phash64,
    )

    pats = [
        r
        for r in spark.read.parquet(FIXTURE_PATH).collect()
        if r["img_id"] in (5, 6)
    ]
    rows = []
    for r in pats:
        payload = bytes(r["payload"])
        pixels = codecs.decode_image(payload, r["fmt"])
        jpeg = codecs.encode_jpeg(pixels, quality=90)
        assert _ham(dhash64(payload, r["fmt"]), dhash64(jpeg, "jpeg")) > 10
        assert _ham(phash64(payload, r["fmt"]), phash64(jpeg, "jpeg")) <= 10
        rows += [
            (r["img_id"], r["fmt"], payload),
            (r["img_id"] + 100, "jpeg", jpeg),
        ]
    df = spark.createDataFrame(rows, "img_id long, fmt string, payload binary")
    pairs = {
        (p["id_a"], p["id_b"])
        for p in image_near_duplicates(df, method="phash").collect()
    }
    for r in pats:
        assert (r["img_id"], r["img_id"] + 100) in pairs


def test_phash_block_join_equals_bruteforce(spark):
    from event_pipeline_spark.operators.imagededup import (
        image_near_duplicates,
        phash_images,
    )

    df = spark.read.parquet(FIXTURE_PATH)
    hashes = {r["img_id"]: r["phash"] for r in phash_images(df).collect()}
    expected = {
        (a, b, _ham(hashes[a], hashes[b]))
        for a in hashes
        for b in hashes
        if a < b and _ham(hashes[a], hashes[b]) <= 10
    }
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in image_near_duplicates(df, method="phash").collect()
    }
    assert got == expected
    assert len(expected) >= 4


def test_image_clusters_families(spark):
    """Components over pHash pairs: the base family (PNG, brightness
    BMP, JPEG re-encode, patch-edit PPM) collapses to cluster 1, the
    pattern family (GIF + edited PNG) to cluster 5; unrelated images
    are absent (singletons have no pairs)."""
    from event_pipeline_spark.operators.imagededup import (
        q_mm_image_clusters,
    )

    rows = {
        r["id"]: r["cluster_id"]
        for r in q_mm_image_clusters(spark, "unused").collect()
    }
    assert rows == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5}
