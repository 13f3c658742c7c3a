"""Pure-numpy media codecs for the uncompressed container formats.

Real decode/encode — not stubs — for the formats that need no external
codec library: BMP (24-bit uncompressed BI_RGB), PPM/PGM (binary P6/P5),
and WAV (PCM integer/float). Compressed formats (png/jpeg/mp3/mp4) still
require PIL/librosa/ffmpeg and stay behind the ``fake=True`` gate in
``operators/multimodal.py``; this module is what makes the non-fake path
real for the formats this environment can honestly handle.

Everything here is driver/executor-side scalar code invoked from inside
Arrow-batched ``mapInPandas`` — one call per payload, numpy throughout,
no Python-per-pixel loops.

Reference parity note: the reference engine has no media codecs at all;
this implements the multimodal north-star from SURVEY.md §6.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "SUPPORTED_IMAGE_FORMATS",
    "decode_image",
    "decode_wav",
    "encode_bmp",
    "encode_ppm",
    "encode_wav",
    "resize_nearest",
]

SUPPORTED_IMAGE_FORMATS = ("bmp", "ppm", "pgm")


# ---------------------------------------------------------------------------
# BMP: 24-bit uncompressed BI_RGB, bottom-up rows, 4-byte row padding
# ---------------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 24-bit BMP bytes."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"encode_bmp needs (H, W, 3) uint8, got {arr.shape}")
    height, width = arr.shape[:2]
    row_size = (width * 3 + 3) & ~3  # rows pad to 4-byte boundary
    image_size = row_size * height
    # pixel data: BGR order, bottom row first
    bgr = arr[::-1, :, ::-1]
    rows = np.zeros((height, row_size), dtype=np.uint8)
    rows[:, : width * 3] = bgr.reshape(height, width * 3)
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + image_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, image_size, 2835, 2835, 0, 0
    )
    return header + rows.tobytes()


def _decode_bmp(payload: bytes) -> np.ndarray:
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    width, height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"only 24-bit uncompressed BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    bottom_up = height > 0
    height = abs(height)
    row_size = (width * 3 + 3) & ~3
    raw = np.frombuffer(payload, dtype=np.uint8, count=row_size * height,
                        offset=data_offset)
    rows = raw.reshape(height, row_size)[:, : width * 3]
    bgr = rows.reshape(height, width, 3)
    if bottom_up:
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()  # → RGB


# ---------------------------------------------------------------------------
# PPM (P6, RGB) / PGM (P5, gray), binary variants, maxval ≤ 255
# ---------------------------------------------------------------------------


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → P6 PPM; (H, W) uint8 → P5 PGM."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 3 and arr.shape[2] == 3:
        magic = b"P6"
    elif arr.ndim == 2:
        magic = b"P5"
    else:
        raise ValueError(f"encode_ppm needs (H, W, 3) or (H, W), got {arr.shape}")
    height, width = arr.shape[:2]
    return magic + f"\n{width} {height}\n255\n".encode() + arr.tobytes()


def _decode_ppm(payload: bytes) -> np.ndarray:
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"unsupported PNM magic {magic!r} (binary P5/P6 only)")
    # header = magic, width, height, maxval as whitespace/comment-separated
    # ASCII tokens; pixel data starts one whitespace byte after maxval
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos] not in (10, 13):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = tokens
    if maxval > 255:
        raise ValueError(f"16-bit PNM not supported (maxval={maxval})")
    channels = 3 if magic == b"P6" else 1
    arr = np.frombuffer(
        payload, dtype=np.uint8, count=width * height * channels, offset=pos
    )
    shape = (height, width, 3) if channels == 3 else (height, width)
    return arr.reshape(shape).copy()


def decode_image(payload: bytes, fmt: str) -> np.ndarray:
    """Binary payload → uint8 array, (H, W, 3) RGB or (H, W) gray.

    Raises ValueError for malformed payloads and NotImplementedError for
    formats that need an external codec (png, jpeg, ...).
    """
    fmt = (fmt or "").lower()
    if fmt == "bmp":
        return _decode_bmp(payload)
    if fmt in ("ppm", "pgm", "pnm"):
        return _decode_ppm(payload)
    raise NotImplementedError(
        f"image format {fmt!r} requires an external codec (supported "
        f"pure-numpy formats: {SUPPORTED_IMAGE_FORMATS})"
    )


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize via numpy index gather (no Python loops).

    Uses the standard half-pixel-center mapping: output pixel i samples
    input pixel floor((i + 0.5) * in/out)."""
    in_h, in_w = pixels.shape[:2]
    rows = np.minimum(
        ((np.arange(height) + 0.5) * in_h / height).astype(np.int64), in_h - 1
    )
    cols = np.minimum(
        ((np.arange(width) + 0.5) * in_w / width).astype(np.int64), in_w - 1
    )
    return pixels[rows[:, None], cols[None, :]]


# ---------------------------------------------------------------------------
# WAV: RIFF/WAVE, PCM (format 1) and IEEE float (format 3)
# ---------------------------------------------------------------------------

_WAV_DTYPES = {
    (1, 8): np.uint8,       # PCM unsigned 8-bit
    (1, 16): np.int16,
    (1, 32): np.int32,
    (3, 32): np.float32,
    (3, 64): np.float64,
}


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n,) or (n, channels) int16/int32/uint8/float32/float64 → WAV."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    fmt_code = 3 if arr.dtype.kind == "f" else 1
    bits = arr.dtype.itemsize * 8
    if (fmt_code, bits) not in _WAV_DTYPES:
        raise ValueError(f"unsupported sample dtype {arr.dtype}")
    n_channels = arr.shape[1]
    byte_rate = sample_rate * n_channels * arr.dtype.itemsize
    block_align = n_channels * arr.dtype.itemsize
    data = arr.astype(arr.dtype, copy=False).tobytes()  # interleaved
    fmt_chunk = struct.pack(
        "<HHIIHH", fmt_code, n_channels, sample_rate, byte_rate, block_align, bits
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt_chunk) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt_chunk))
        + fmt_chunk
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes → (sample_rate, (n_samples, channels) array)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        chunk_id = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if chunk_id == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif chunk_id == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    fmt_code, n_channels, sample_rate, _, _, bits = fmt
    dtype = _WAV_DTYPES.get((fmt_code, bits))
    if dtype is None:
        raise ValueError(f"unsupported WAV encoding (format={fmt_code}, bits={bits})")
    arr = np.frombuffer(data, dtype=dtype)
    n_frames = len(arr) // n_channels
    return sample_rate, arr[: n_frames * n_channels].reshape(n_frames, n_channels)
