"""Generate images.parquet — real encoded images with pinned dHashes.

Each row is a REAL payload produced by the repo's pure-numpy encoders
(PNG/BMP/PPM/PGM/GIF/JPEG — ``operators/codecs.py``) plus the image's
expected 64-bit dHash, computed HERE by an independent scalar-loop
implementation (explicit per-pixel luma, explicit half-pixel
nearest-neighbor sampling, explicit bit packing — no shared code with
``operators/imagededup.py``'s vectorized path).

For the lossless formats the reference hash is computed from the
pre-encode pixel array, so the pinned value is independent of the
repo's decoders too (encode→decode must be exact for the hash query to
pass — a decoder regression breaks it). The JPEG row is lossy: its
reference hash is computed from the repo decoder's output at build
time, pinning decoder+hash jointly (documented trade — no independent
JPEG decoder exists in this container).

Content map (asserted below at build time):
  base family      — smooth gradient; brightness-shifted copy must be
                     hamming 0, JPEG q90 re-encode and a locally
                     perturbed copy must be within the near-dup
                     threshold (10 bits)
  pattern family   — 4-color blocks (GIF-encodable) + a shifted copy
  unrelated images — every cross-family distance must exceed 10 bits

Columns: img_id BIGINT, fmt VARCHAR, payload BLOB, expected_hash BIGINT.

Run once: python tests/fixtures/make_image_fixture.py
"""

import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from event_pipeline_spark.operators import codecs  # noqa: E402

NEAR, FAR = 10, 10  # near-dup threshold / required cross-family margin


def ref_dhash(pixels: np.ndarray) -> int:
    """Independent scalar dHash: loops, not vectorized numpy."""
    h_in = len(pixels)
    w_in = len(pixels[0])
    luma = []
    for y in range(h_in):
        row = []
        for x in range(w_in):
            p = pixels[y][x]
            if np.ndim(p) == 0:  # grayscale
                row.append(int(p) * 1000)
            else:
                row.append(299 * int(p[0]) + 587 * int(p[1]) + 114 * int(p[2]))
        luma.append(row)
    # half-pixel-center nearest neighbor to 9 wide x 8 tall
    g = []
    for y in range(8):
        sy = min(int((y + 0.5) * h_in / 8), h_in - 1)
        g.append(
            [luma[sy][min(int((x + 0.5) * w_in / 9), w_in - 1)] for x in range(9)]
        )
    h = 0
    for y in range(8):
        for x in range(8):
            h = (h << 1) | (1 if g[y][x + 1] > g[y][x] else 0)
    return h - (1 << 64) if h >= (1 << 63) else h


def hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def ref_phash(pixels: np.ndarray) -> int:
    """Independent scalar pHash: explicit loops, Python-int DCT with
    the same Q = round(basis * 2^15) quantization (math.cos, not the
    vectorized numpy path) — exact integer arithmetic end to end."""
    import math

    h_in = len(pixels)
    w_in = len(pixels[0])
    luma = []
    for y in range(h_in):
        row = []
        for x in range(w_in):
            p = pixels[y][x]
            if np.ndim(p) == 0:
                row.append(int(p) * 1000)
            else:
                row.append(299 * int(p[0]) + 587 * int(p[1]) + 114 * int(p[2]))
        luma.append(row)
    g = []
    for y in range(32):
        sy = min(int((y + 0.5) * h_in / 32), h_in - 1)
        g.append(
            [luma[sy][min(int((x + 0.5) * w_in / 32), w_in - 1)]
             for x in range(32)]
        )
    q = []
    for u in range(32):
        qrow = []
        for y in range(32):
            if u == 0:
                b = math.sqrt(1.0 / 32.0)
            else:
                b = math.sqrt(2.0 / 32.0) * math.cos(
                    math.pi * (2 * y + 1) * u / 64.0
                )
            qrow.append(round(b * 32768))
        q.append(qrow)
    ac = []
    for u in range(8):
        for v in range(8):
            if (u, v) == (0, 0):
                continue
            c = 0
            for y in range(32):
                for x in range(32):
                    c += q[u][y] * g[y][x] * q[v][x]
            ac.append(c)
    med = sorted(ac)[31]
    h = 0
    for c in ac:
        h = (h << 1) | (1 if c > med else 0)
    return h


def base_image() -> np.ndarray:
    """48x32 smooth non-monotonic RGB waves in [40, 215] (headroom for
    +25; non-monotonic so the dHash has mixed bits, smooth so JPEG q90
    stays near)."""
    yy, xx = np.mgrid[0:32, 0:48]
    r = 127 + 85 * np.sin(xx * 0.42) * np.cos(yy * 0.31)
    g = 127 + 85 * np.cos(xx * 0.23 + 1.0) * np.sin(yy * 0.47 + 0.5)
    b = 127 + 85 * np.sin((xx + yy) * 0.19)
    img = np.stack([r, g, b], axis=2)
    return np.clip(img, 40, 215).astype(np.uint8)


def pattern_image(shift: int = 0) -> np.ndarray:
    """36x24 4-color 6x6 blocks (GIF-encodable), optionally with one
    block recolored (a small visual edit)."""
    palette = np.array(
        [[220, 40, 40], [40, 180, 60], [50, 70, 200], [230, 220, 70]],
        dtype=np.uint8,
    )
    yy, xx = np.mgrid[0:24, 0:36]
    idx = ((yy // 6) * 2 + (xx // 6) + (yy // 6) * (xx // 6)) % 4
    img = palette[idx]
    if shift:
        img = img.copy()
        img[6:12, 12:18] = palette[(idx[8, 14] + 1) % 4]
    return img


def unrelated_a() -> np.ndarray:
    """Inverse-direction gradient with a checker overlay."""
    yy, xx = np.mgrid[0:32, 0:48]
    r = 215 - (xx * 175) // 47
    g = 215 - (yy * 175) // 31
    b = np.where((xx // 4 + yy // 4) % 2 == 0, 60, 200)
    return np.stack([r, g, b], axis=2).astype(np.uint8)


def unrelated_gray() -> np.ndarray:
    """Grayscale diagonal bands (exercises the (H, W) luma path)."""
    yy, xx = np.mgrid[0:40, 0:40]
    return (((xx * 2 - yy * 3) % 23) * 11).astype(np.uint8)


def main() -> None:
    base = base_image()
    bright = np.clip(base.astype(np.int16) + 25, 0, 255).astype(np.uint8)
    # +40 over an 8x12 patch: dHash (local comparisons) moves 1 bit,
    # pHash (global DCT) moves 10 — the measured edge of the near-dup
    # threshold; larger patch edits are visible content changes and
    # legitimately leave the pHash near-dup relation first
    perturbed = base.copy()
    perturbed[20:28, 8:20] = np.clip(
        perturbed[20:28, 8:20].astype(np.int16) + 40, 0, 255
    ).astype(np.uint8)
    jpeg_payload = codecs.encode_jpeg(base, quality=90)

    rows = [
        # (img_id, fmt, payload, reference pixels or None for lossy)
        (1, "png", codecs.encode_png(base), base),
        (2, "bmp", codecs.encode_bmp(bright), bright),
        (3, "jpeg", jpeg_payload, None),  # lossy: pin decoder output
        (4, "ppm", codecs.encode_ppm(perturbed), perturbed),
        (5, "gif", codecs.encode_gif(pattern_image()), pattern_image()),
        (6, "png", codecs.encode_png(pattern_image(shift=1)),
         pattern_image(shift=1)),
        (7, "png", codecs.encode_png(unrelated_a()), unrelated_a()),
        (8, "pgm", codecs.encode_ppm(unrelated_gray()), unrelated_gray()),
    ]
    hashes, phashes = {}, {}
    for img_id, fmt, payload, pixels in rows:
        if pixels is None:
            pixels = codecs.decode_image(payload, fmt)
        else:  # lossless round-trip must be exact for the pin to hold
            assert np.array_equal(
                codecs.decode_image(payload, fmt), np.asarray(pixels)
            ), f"img {img_id}: {fmt} round-trip not exact"
        hashes[img_id] = ref_dhash(np.asarray(pixels))
        phashes[img_id] = ref_phash(np.asarray(pixels))

    # intended relationships, asserted so the fixture stays honest
    assert hamming(hashes[1], hashes[2]) == 0, "brightness must not move dHash"
    # q90 on smooth content may be hash-identical (observed: 0 bits)
    assert hamming(hashes[1], hashes[3]) <= NEAR, (
        f"jpeg q90: {hamming(hashes[1], hashes[3])}"
    )
    assert 0 < hamming(hashes[1], hashes[4]) <= NEAR, (
        f"perturbed: {hamming(hashes[1], hashes[4])}"
    )
    assert 0 < hamming(hashes[5], hashes[6]) <= NEAR, (
        f"pattern edit: {hamming(hashes[5], hashes[6])}"
    )
    families = {1: "base", 2: "base", 3: "base", 4: "base",
                5: "pat", 6: "pat", 7: "u1", 8: "u2"}
    for a in families:
        for b in families:
            if a < b and families[a] != families[b]:
                d = hamming(hashes[a], hashes[b])
                assert d > FAR, f"cross-family {a}-{b} too close: {d}"
                dp = hamming(phashes[a], phashes[b])
                assert dp > FAR, f"phash cross-family {a}-{b}: {dp}"

    # pHash relationships: brightness lands entirely in the dropped DC
    # term, so the invariance is EXACT; same-family edits stay near
    assert phashes[1] == phashes[2], "pHash must be brightness-exact"
    assert hamming(phashes[1], phashes[3]) <= NEAR
    assert hamming(phashes[1], phashes[4]) <= NEAR
    assert hamming(phashes[5], phashes[6]) <= NEAR

    table = pa.table(
        {
            "img_id": pa.array([r[0] for r in rows], pa.int64()),
            "fmt": pa.array([r[1] for r in rows], pa.string()),
            "payload": pa.array([r[2] for r in rows], pa.binary()),
            "expected_hash": pa.array(
                [hashes[r[0]] for r in rows], pa.int64()
            ),
            "expected_phash": pa.array(
                [phashes[r[0]] for r in rows], pa.int64()
            ),
        }
    )
    out = Path(__file__).parent / "images.parquet"
    pq.write_table(table, out)
    print(f"wrote {out}: {table.num_rows} rows")
    for img_id, fmt, payload, _ in rows:
        print(f"  img {img_id} [{fmt:4}] {len(payload):6d} B "
              f"hash={hashes[img_id]:#018x}" if hashes[img_id] >= 0 else
              f"  img {img_id} [{fmt:4}] {len(payload):6d} B "
              f"hash={hashes[img_id]}")


if __name__ == "__main__":
    main()
