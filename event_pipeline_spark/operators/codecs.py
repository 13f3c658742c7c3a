"""Pure-numpy media codecs for the uncompressed container formats.

Real decode/encode — not stubs — for the formats this environment can
honestly handle: BMP (24-bit uncompressed BI_RGB), PPM/PGM (binary
P6/P5), WAV (PCM integer/float), and — since round 3 — PNG (8-bit
gray/RGB/RGBA, all five scanline filters, DEFLATE via the stdlib's
zlib) and single-frame GIF (variable-width LZW implemented here, both
directions). Formats that genuinely need an external codec
(jpeg/mp3/mp4) stay behind the ``fake=True`` gate in
``operators/multimodal.py``.

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
    "encode_gif",
    "encode_png",
    "encode_ppm",
    "encode_wav",
    "resize_nearest",
]

SUPPORTED_IMAGE_FORMATS = ("bmp", "ppm", "pgm", "png", "gif")


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
    if fmt == "png":
        return _decode_png(payload)
    if fmt == "gif":
        return _decode_gif(payload)
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


# ---------------------------------------------------------------------------
# PNG: 8-bit gray / RGB / RGBA, non-interlaced — stdlib zlib + numpy.
# A real compressed-format codec with no external dependency: DEFLATE is
# the stdlib's, the scanline filter algebra (None/Sub/Up/Average/Paeth)
# is implemented here per the PNG specification.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: color type → channels
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """uint8 array (H,W) gray, (H,W,3) RGB or (H,W,4) RGBA → PNG bytes
    (bit depth 8, filter None per scanline, one zlib IDAT)."""
    import zlib

    arr = np.ascontiguousarray(pixels)
    if arr.dtype != np.uint8:
        raise ValueError(f"expected uint8 pixels, got {arr.dtype}")
    if arr.ndim == 2:
        color_type = 0
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type = 2
    elif arr.ndim == 3 and arr.shape[2] == 4:
        color_type = 6
    else:
        raise ValueError(f"unsupported pixel shape {arr.shape}")
    h, w = arr.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 (None) prefixes every scanline
    raw = np.concatenate(
        [
            np.zeros((h, 1), np.uint8),
            arr.reshape(h, -1),
        ],
        axis=1,
    ).tobytes()
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _decode_png(payload: bytes) -> np.ndarray:
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + data + crc
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or color_type not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"PNG bit depth {depth} / color type {color_type} unsupported "
            "(8-bit gray/gray+alpha/RGB/RGBA only)"
        )
    if interlace:
        raise NotImplementedError("interlaced (Adam7) PNG unsupported")
    ch = _PNG_CHANNELS[color_type]
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload has wrong length")
    rows = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    filters, data = rows[:, 0], rows[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), np.int32)
    for y in range(h):
        f, line = int(filters[y]), data[y]
        prev = out[y - 1] if y else np.zeros(stride, np.int32)
        if f == 0:  # None
            out[y] = line
        elif f == 2:  # Up — fully vectorized
            out[y] = (line + prev) & 0xFF
        elif f == 1:  # Sub — per-channel prefix sum mod 256
            cols = line.reshape(w, ch)
            out[y] = (np.cumsum(cols, axis=0) & 0xFF).reshape(stride)
        elif f == 3:  # Average — sequential in x
            cur = out[y]
            for x in range(stride):
                left = cur[x - ch] if x >= ch else 0
                cur[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth — sequential in x
            cur = out[y]
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                c = prev[x - ch] if x >= ch else 0
                cur[x] = (line[x] + _paeth(a, prev[x], c)) & 0xFF
        else:
            raise ValueError(f"PNG filter type {f} invalid")
    arr = out.astype(np.uint8).reshape(h, w, ch)
    return arr[:, :, 0] if ch == 1 else arr


# ---------------------------------------------------------------------------
# GIF: single-frame GIF87a/89a, global/local palettes, real variable-width
# LZW (decode and encode) — pure python/numpy, no external codec.
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-variant LZW: LSB-first bit packing, CLEAR/EOI codes,
    code width grows after the dictionary fills each width."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out: list[int] = []
    table: list[list[int]] = []

    def reset() -> int:
        table.clear()
        table.extend([i] for i in range(clear))
        table.extend(([], []))  # clear + eoi placeholders
        return min_code_size + 1

    width = reset()
    acc = nbits = 0
    prev: list[int] | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                width = reset()
                prev = None
                continue
            if code == eoi:
                return out
            if code < len(table):
                entry = table[code]
                if prev is not None:
                    table.append(prev + [entry[0]])
            elif prev is not None and code == len(table):
                entry = prev + [prev[0]]
                table.append(entry)
            else:
                raise ValueError("corrupt GIF LZW stream")
            out.extend(entry)
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
    return out


def _lzw_encode(indices, min_code_size: int) -> bytes:
    """Real LZW compression, inverse of ``_lzw_decode``."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1

    def fresh() -> dict[bytes, int]:
        return {bytes([i]): i for i in range(clear)}

    table = fresh()
    next_code = eoi + 1
    width = min_code_size + 1
    acc = nbits = 0
    out = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    run = b""
    for idx in indices:
        cand = run + bytes([int(idx)])
        if cand in table:
            run = cand
            continue
        emit(table[run])
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear)
            table, next_code, width = fresh(), eoi + 1, min_code_size + 1
        run = bytes([int(idx)])
    if run:
        emit(table[run])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(pixels: np.ndarray) -> bytes:
    """uint8 (H,W,3) RGB (≤256 distinct colors) or (H,W) palette-index
    gray → single-frame GIF89a with a global color table and real LZW."""
    arr = np.ascontiguousarray(pixels)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=2)
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError(f"expected uint8 (H,W,3) or (H,W), got {arr.shape}")
    h, w = arr.shape[:2]
    flat = arr.reshape(-1, 3)
    palette, indices = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"GIF needs <=256 colors, image has {len(palette)}")
    depth = max(1, int(len(palette) - 1).bit_length())
    gct = np.zeros((1 << depth, 3), np.uint8)
    gct[: len(palette)] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) << 4) | (depth - 1), 0, 0)
    out += gct.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)  # image descriptor
    min_code = max(2, depth)
    out.append(min_code)
    payload = _lzw_encode(indices, min_code)
    for i in range(0, len(payload), 255):
        block = payload[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def _decode_gif(payload: bytes) -> np.ndarray:
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    w, h, flags, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(payload):
        block = payload[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            ix, iy, iw, ih, iflags = struct.unpack(
                "<HHHHB", payload[pos + 1 : pos + 10]
            )
            pos += 10
            pal = gct
            if iflags & 0x80:  # local color table
                n = 2 << (iflags & 0x07)
                pal = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if iflags & 0x40:
                raise NotImplementedError("interlaced GIF unsupported")
            if pal is None:
                raise ValueError("GIF image has no color table")
            min_code = payload[pos]
            pos += 1
            chunks = []
            while payload[pos]:
                ln = payload[pos]
                chunks.append(payload[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            indices = _lzw_decode(b"".join(chunks), min_code)
            if len(indices) < iw * ih:
                raise ValueError("GIF pixel data truncated")
            idx = np.array(indices[: iw * ih], np.int32).reshape(ih, iw)
            return pal[idx]
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF contained no image data")
