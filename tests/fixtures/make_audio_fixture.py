"""Generate audio.parquet — real WAV payloads with pinned fingerprints.

Each row is a REAL payload from the repo's WAV encoder
(``operators/codecs.py::encode_wav``) plus the clip's expected 64-bit
band-energy fingerprint, computed HERE by an independent scalar-loop
implementation (explicit per-sample normalization, math.cos DCT table,
Python-int energies — no shared code with
``operators/audiodedup.py``'s vectorized path). The fingerprint's
integer pipeline is exact, so identical input samples must give
bit-identical values on both paths.

Clip map (asserted below at build time):
  A family — a two-tone mixture with an amplitude envelope, plus its
             half-volume PCM16, float32, and uint8 re-encodes: all
             within the near-dup threshold (10 bits) of each other
  B        — different tone pair       (must be > 10 bits from all)
  C        — deterministic LCG noise   (must be > 10 bits from all)
  D        — linear chirp              (must be > 10 bits from all)

Columns: clip_id BIGINT, payload BLOB, expected_afp BIGINT.

Run once: python tests/fixtures/make_audio_fixture.py
"""

import math
import struct
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from event_pipeline_spark.operators import codecs  # noqa: E402

NEAR, FAR = 10, 10
RATE, N = 8000, 4096


def ref_afp(payload: bytes) -> int:
    """Independent scalar fingerprint: stdlib-only WAV parse + loops."""
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", payload, pos + 8)
        elif cid == b"data":
            data = payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    fmt_code, n_ch, _, _, _, bits = fmt
    # normalize to the int16 grid, summing channels
    s = []
    if fmt_code == 1 and bits == 16:
        raw = struct.unpack_from(f"<{len(data)//2}h", data)
        for i in range(0, len(raw), n_ch):
            s.append(sum(raw[i : i + n_ch]))
    elif fmt_code == 1 and bits == 8:
        for i in range(0, len(data), n_ch):
            s.append(sum((b - 128) << 8 for b in data[i : i + n_ch]))
    elif fmt_code == 3 and bits == 32:
        raw = struct.unpack_from(f"<{len(data)//4}f", data)
        for i in range(0, len(raw), n_ch):
            # float64 promotion then round-half-even, matching numpy
            s.append(
                sum(
                    int(round(float(x) * 32767.0))
                    for x in raw[i : i + n_ch]
                )
            )
    else:
        raise AssertionError(f"fixture uses unexpected encoding {fmt}")
    n = len(s)
    assert n >= 128
    q = []
    for k in range(1, 73):
        q.append(
            [
                round(
                    math.sqrt(2.0 / 128.0)
                    * math.cos(math.pi * (2 * t + 1) * k / 256.0)
                    * 128
                )
                for t in range(128)
            ]
        )
    energies = []
    for f in range(9):
        start = f * (n - 128) // 8
        frame = s[start : start + 128]
        e_bands = []
        for m in range(9):
            e = 0
            for kk in range(8):
                c = 0
                row = q[m * 8 + kk]
                for t in range(128):
                    c += row[t] * frame[t]
                e += c * c
            e_bands.append(e)
        energies.append(e_bands)
    h = 0
    for f in range(1, 9):
        for m in range(8):
            d = (energies[f][m] - energies[f][m + 1]) - (
                energies[f - 1][m] - energies[f - 1][m + 1]
            )
            h = (h << 1) | (1 if d > 0 else 0)
    return h - (1 << 64) if h >= (1 << 63) else h


def hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def tone_mix(freqs, amp=9000):
    t = np.arange(N) / RATE
    env = 0.4 + 0.6 * np.abs(np.sin(np.pi * t / (N / RATE)))
    x = sum(np.sin(2 * np.pi * f * t + i) for i, f in enumerate(freqs))
    return np.round(amp * env * x / len(freqs)).astype(np.int16)


def lcg_noise():
    vals, state = [], 12345
    for _ in range(N):
        state = (1103515245 * state + 12345) % (1 << 31)
        vals.append((state >> 8) % 16001 - 8000)
    return np.array(vals, dtype=np.int16)


def chirp():
    t = np.arange(N) / RATE
    return np.round(
        8000 * np.sin(2 * np.pi * (200 + 1500 * t) * t)
    ).astype(np.int16)


def main() -> None:
    a = tone_mix([440, 1320])
    rows = [
        (1, codecs.encode_wav(a, RATE)),
        (2, codecs.encode_wav((a // 2).astype(np.int16), RATE)),  # half gain
        (3, codecs.encode_wav((a.astype(np.float32) / 32767.0), RATE)),
        (4, codecs.encode_wav(
            ((a.astype(np.int32) >> 8) + 128).astype(np.uint8), RATE)),
        (5, codecs.encode_wav(tone_mix([523, 700]), RATE)),
        (6, codecs.encode_wav(lcg_noise(), RATE)),
        (7, codecs.encode_wav(chirp(), RATE)),
    ]
    fps = {cid: ref_afp(p) for cid, p in rows}

    fam = {1: "a", 2: "a", 3: "a", 4: "a", 5: "b", 6: "c", 7: "d"}
    for x in fam:
        for y in fam:
            if x < y:
                d = hamming(fps[x], fps[y])
                if fam[x] == fam[y]:
                    assert d <= NEAR, f"{x}-{y} family drift: {d}"
                else:
                    assert d > FAR, f"{x}-{y} cross-family too close: {d}"

    table = pa.table(
        {
            "clip_id": pa.array([r[0] for r in rows], pa.int64()),
            "payload": pa.array([r[1] for r in rows], pa.binary()),
            "expected_afp": pa.array([fps[r[0]] for r in rows], pa.int64()),
        }
    )
    out = Path(__file__).parent / "audio.parquet"
    pq.write_table(table, out)
    print(f"wrote {out}: {table.num_rows} rows")
    for cid, p in rows:
        print(f"  clip {cid} {len(p):6d} B afp={fps[cid]}")


if __name__ == "__main__":
    main()
