"""Pure-numpy media codecs for the uncompressed container formats.

Real decode/encode — not stubs — for the formats this environment can
honestly handle: BMP (24-bit uncompressed BI_RGB), PPM/PGM (binary
P6/P5), WAV (PCM integer/float), and — since round 3 — PNG (8-bit
gray/RGB/RGBA, all five scanline filters, DEFLATE via the stdlib's
zlib), single-frame GIF (variable-width LZW implemented here, both
directions), and — since round 4 — baseline sequential JPEG (ITU-T
T.81: Huffman entropy coding, DCT via basis-matrix matmuls, 4:4:4 and
4:2:0 sampling, both directions — and PROGRESSIVE mode too: spectral
selection + successive approximation, EOBn run codes, refinement
correction bits, decoder and encoder, verified pixel-identical to the
baseline coefficients and against a real libjpeg-progressive photo).
Formats that genuinely need an external codec (arithmetic-coded jpeg,
inter-frame video, mp3/mp4) stay behind the ``fake=True`` gate in
``operators/multimodal.py``; MJPEG AVI video is real here (round 4) —
RIFF container + per-frame JPEG.

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
    "encode_jpeg",
    "encode_png",
    "encode_ppm",
    "encode_wav",
    "resize_nearest",
]

SUPPORTED_IMAGE_FORMATS = ("bmp", "ppm", "pgm", "png", "gif", "jpeg")


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
    formats that need an external codec (webp, heic, ...).
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
    if fmt in ("jpeg", "jpg"):
        return _decode_jpeg(payload)
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
# PNG: 8- and 16-bit gray / gray+alpha / RGB / RGBA, sequential AND
# Adam7-interlaced — stdlib zlib + numpy. A real compressed-format
# codec with no external dependency: DEFLATE is the stdlib's, the
# scanline filter algebra (None/Sub/Up/Average/Paeth) is implemented
# here per the PNG specification. Filtering operates on BYTES with a
# left-offset of bpp = channels * bytes-per-sample (spec §9.2); each
# Adam7 pass is an independently-filtered sub-image scattered into the
# output grid by strided slicing.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: color type → channels
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}

#: Adam7 pass origins/steps: (x0, y0, dx, dy) — PNG spec §8.2
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, *, interlace: bool = False) -> bytes:
    """uint8/uint16 array (H,W) gray, (H,W,3) RGB or (H,W,4) RGBA →
    PNG bytes (bit depth 8 or 16, filter None per scanline, one zlib
    IDAT; ``interlace=True`` writes the seven Adam7 passes)."""
    import zlib

    arr = np.ascontiguousarray(pixels)
    if arr.dtype == np.uint8:
        depth = 8
    elif arr.dtype == np.uint16:
        depth = 16
    else:
        raise ValueError(f"expected uint8/uint16 pixels, got {arr.dtype}")
    if arr.ndim == 2:
        color_type = 0
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type = 2
    elif arr.ndim == 3 and arr.shape[2] == 4:
        color_type = 6
    else:
        raise ValueError(f"unsupported pixel shape {arr.shape}")
    h, w = arr.shape[:2]
    ihdr = struct.pack(
        ">IIBBBBB", w, h, depth, color_type, 0, 0, 1 if interlace else 0
    )

    def scanlines(sub: np.ndarray) -> bytes:
        # filter byte 0 (None) prefixes every scanline; 16-bit samples
        # are big-endian per spec
        hs = sub.shape[0]
        body = (
            sub.astype(">u2") if depth == 16 else sub
        ).reshape(hs, -1).view(np.uint8).reshape(hs, -1)
        return np.concatenate(
            [np.zeros((hs, 1), np.uint8), body], axis=1
        ).tobytes()

    if interlace:
        raw = b"".join(
            scanlines(arr[y0::dy, x0::dx])
            for x0, y0, dx, dy in _ADAM7
            if arr[y0::dy, x0::dx].shape[0] and arr[y0::dy, x0::dx].shape[1]
        )
    else:
        raw = scanlines(arr)
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


def _unfilter(rows: np.ndarray, wp: int, bpp: int) -> np.ndarray:
    """Reverse the scanline filters of one (sub-)image.

    ``rows`` is (h, 1 + wp*bpp) uint8 (filter byte + filtered bytes);
    returns (h, wp*bpp) uint8. The left-neighbor offset is ``bpp``
    BYTES (channels × bytes-per-sample), per PNG spec §9.2 — the same
    byte algebra covers 8- and 16-bit depths.
    """
    hs, stride = rows.shape[0], rows.shape[1] - 1
    filters, data = rows[:, 0], rows[:, 1:].astype(np.int32)
    out = np.zeros((hs, stride), np.int32)
    for y in range(hs):
        f, line = int(filters[y]), data[y]
        prev = out[y - 1] if y else np.zeros(stride, np.int32)
        if f == 0:  # None
            out[y] = line
        elif f == 2:  # Up — fully vectorized
            out[y] = (line + prev) & 0xFF
        elif f == 1:  # Sub — per-byte-lane prefix sum mod 256
            out[y] = (np.cumsum(line.reshape(wp, bpp), axis=0) & 0xFF).reshape(
                stride
            )
        elif f == 3:  # Average — sequential in x
            cur = out[y]
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth — sequential in x
            cur = out[y]
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                c = prev[x - bpp] if x >= bpp else 0
                cur[x] = (line[x] + _paeth(a, prev[x], c)) & 0xFF
        else:
            raise ValueError(f"PNG filter type {f} invalid")
    return out.astype(np.uint8)


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
    if depth not in (8, 16) or color_type not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"PNG bit depth {depth} / color type {color_type} unsupported "
            "(8/16-bit gray/gray+alpha/RGB/RGBA only)"
        )
    if interlace not in (0, 1):
        raise ValueError(f"PNG interlace method {interlace} invalid")
    ch = _PNG_CHANNELS[color_type]
    bps = depth // 8
    bpp = ch * bps
    raw = zlib.decompress(b"".join(idat))
    img = np.zeros((h, w, ch), np.uint16 if depth == 16 else np.uint8)
    passes = _ADAM7 if interlace else ((0, 0, 1, 1),)
    offset = 0
    for x0, y0, dx, dy in passes:
        wp = -(-(w - x0) // dx) if w > x0 else 0
        hp = -(-(h - y0) // dy) if h > y0 else 0
        if wp <= 0 or hp <= 0:
            continue  # empty pass stores nothing (spec §8.2)
        need = hp * (wp * bpp + 1)
        if offset + need > len(raw):
            raise ValueError("PNG scanline payload has wrong length")
        rows = np.frombuffer(raw, np.uint8, need, offset).reshape(
            hp, wp * bpp + 1
        )
        offset += need
        sub = _unfilter(rows, wp, bpp)
        if depth == 16:
            vals = sub.reshape(hp, wp, ch, 2)
            pix = (vals[..., 0].astype(np.uint16) << 8) | vals[..., 1]
        else:
            pix = sub.reshape(hp, wp, ch)
        img[y0::dy, x0::dx] = pix
    if offset != len(raw):
        raise ValueError("PNG scanline payload has wrong length")
    return img[:, :, 0] if ch == 1 else img


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


def _gif_interlace_rows(h: int) -> list[int]:
    """Row storage order of an interlaced GIF image (spec appendix E)."""
    return (
        list(range(0, h, 8)) + list(range(4, h, 8))
        + list(range(2, h, 4)) + list(range(1, h, 2))
    )


def encode_gif(pixels: np.ndarray, *, interlace: bool = False) -> bytes:
    """uint8 (H,W,3) RGB (≤256 distinct colors) or (H,W) palette-index
    gray → single-frame GIF89a with a global color table and real LZW;
    ``interlace=True`` stores rows in the four-pass order with the
    descriptor's interlace flag set."""
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
    out += b"\x2c" + struct.pack(  # image descriptor
        "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
    )
    min_code = max(2, depth)
    out.append(min_code)
    idx2d = indices.reshape(h, w)
    if interlace:
        idx2d = idx2d[_gif_interlace_rows(h)]
    payload = _lzw_encode(idx2d.reshape(-1), min_code)
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
            if iflags & 0x40:
                # GIF89a interlace: rows stored in four passes
                # (0,8,16.. then 4,12.. then 2,6.. then odd rows)
                deint = np.empty_like(idx)
                deint[_gif_interlace_rows(ih)] = idx
                idx = deint
            return pal[idx]
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF contained no image data")


# ---------------------------------------------------------------------------
# JPEG: baseline + progressive DCT (ITU-T T.81), both directions, numpy
# ---------------------------------------------------------------------------
#
# Decoder: marker parse (DQT/SOF0/SOF2/DHT/SOS/DRI), canonical Huffman
# decode (8-bit prefix LUT) over the byte-stuffed entropy stream,
# coefficient-domain scan accumulation (baseline full-band and all four
# progressive scan kinds), vectorized 8x8 IDCT (DCT basis matmul),
# chroma upsampling by replication, JFIF YCbCr->RGB. Arithmetic coding
# and hierarchical mode raise NotImplementedError.
#
# Encoder: baseline JFIF (4:4:4/4:2:0/gray) plus the progressive scan
# script (see encode_jpeg_progressive below). Huffman tables are
# generated canonical tables (DC: twelve 4-bit codes; AC: EOBn + all
# run/size symbols at 8 bits) — JPEG embeds tables in DHT, so any
# Kraft-valid table is spec-correct; this avoids transcribing Annex K
# while keeping files readable by every decoder.

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], np.int32)

# IJG-style base quantization tables (public, T.81 Annex K examples)
_QLUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], np.int32)
_QCHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], np.int32)


def _dct_basis() -> np.ndarray:
    k = np.arange(8).reshape(8, 1)
    n = np.arange(8).reshape(1, 8)
    c = np.full((8, 1), 0.5)
    c[0] = 0.5 / np.sqrt(2.0)
    return c * np.cos((2 * n + 1) * k * np.pi / 16.0)


_DCT_C = _dct_basis()


def _scaled_qtable(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255)


class _HuffTable:
    """Canonical JPEG Huffman table: BITS counts + symbol order. An
    8-bit prefix LUT serves codes up to 8 bits in one probe (the common
    case in every table this module emits or meets)."""

    def __init__(self, counts: list[int], symbols: list[int]):
        self.counts = counts
        self.symbols = symbols
        self.decode_map: dict[tuple[int, int], int] = {}
        self.encode_map: dict[int, tuple[int, int]] = {}
        self.lut: list[tuple[int, int] | None] = [None] * 256
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                sym = symbols[k]
                self.decode_map[(length, code)] = sym
                self.encode_map[sym] = (length, code)
                if length <= 8:
                    base = code << (8 - length)
                    for suffix in range(1 << (8 - length)):
                        self.lut[base | suffix] = (sym, length)
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first reader over the entropy-coded segment; un-stuffs
    0xFF00 and stops (raising a marker signal) at real markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RSTn consumed by caller
                raise _RestartMarker(nxt)
            else:
                self.marker = nxt
                raise ValueError(
                    f"unexpected marker 0xFF{nxt:02X} inside scan"
                )
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        if self.nbits >= n:  # fast path: bits already buffered
            self.nbits -= n
            return (self.bitbuf >> self.nbits) & ((1 << n) - 1)
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def byte_align(self) -> None:
        self.bitbuf = 0
        self.nbits = 0

    def consume_restart(self) -> None:
        """Skip a RSTn marker at the (byte-aligned) current position."""
        self.byte_align()
        if (
            self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, code: int):
        self.code = code


def _huff_decode(reader: _BitReader, table: _HuffTable) -> int:
    if reader.nbits < 8:
        # top up from buffered stream bytes only while safe; stop at a
        # potential marker so scan-end behavior is unchanged
        try:
            while reader.nbits < 8:
                reader._fill()
        except (_RestartMarker, ValueError, IndexError):
            pass  # near scan end: fall through to the per-bit path
    if reader.nbits >= 8:
        prefix = (reader.bitbuf >> (reader.nbits - 8)) & 0xFF
        hit = table.lut[prefix]
        if hit is not None:
            sym, length = hit
            reader.nbits -= length
            return sym
    code, length = 0, 0
    for _ in range(16):
        code = (code << 1) | reader.read_bit()
        length += 1
        sym = table.decode_map.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, t: int) -> int:
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def _decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline (SOF0/1) and progressive (SOF2) JPEG decode.

    Coefficient-domain architecture: every scan — baseline full-band,
    progressive DC/AC first scans and DC/AC successive-approximation
    refinements (T.81 G.1.2) — accumulates into per-component zigzag
    coefficient arrays; dequantize + IDCT + upsample + YCbCr happen
    once at EOI. Arithmetic coding and hierarchical mode stay gated.

    Truncated/garbage payloads raise ValueError (the decode_image
    contract): segment/marker reads past the end surface as
    struct.error/IndexError internally and are re-raised as ValueError.
    """
    try:
        return _decode_jpeg_inner(payload)
    except (struct.error, IndexError) as e:
        raise ValueError(f"malformed JPEG payload: {e}") from e


def _decode_jpeg_inner(payload: bytes) -> np.ndarray:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}
    frame = None  # (h, w, comps) with comps = [(cid, ch, cv, tq), ...]
    restart_interval = 0
    coeffs: dict[int, np.ndarray] = {}  # cid -> (by, bx, 64) zigzag order
    preds: dict[int, int] = {}
    mcus = (0, 0)
    saw_scan = False
    while pos + 1 < len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01, 0x00) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack(">H", payload[pos : pos + 2])[0]
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            sp = 0
            while sp < len(seg):
                pq, tq = seg[sp] >> 4, seg[sp] & 0x0F
                sp += 1
                if pq:
                    q = np.frombuffer(seg, ">u2", 64, sp).astype(np.int32)
                    sp += 128
                else:
                    q = np.frombuffer(seg, np.uint8, 64, sp).astype(np.int32)
                    sp += 64
                qtables[tq] = q.copy()  # zigzag order, matching coeffs
        elif marker == 0xC4:  # DHT
            sp = 0
            while sp < len(seg):
                tc, th = seg[sp] >> 4, seg[sp] & 0x0F
                counts = list(seg[sp + 1 : sp + 17])
                n = sum(counts)
                symbols = list(seg[sp + 17 : sp + 17 + n])
                htables[(tc, th)] = _HuffTable(counts, symbols)
                sp += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            precision, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if precision != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcus = (-(-w // (8 * hmax)), -(-h // (8 * vmax)))
            for cid, ch, cv, _tq in comps:
                coeffs[cid] = np.zeros(
                    (mcus[1] * cv, mcus[0] * ch, 64), np.int32
                )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(
                "only baseline sequential (SOF0/1) and progressive (SOF2) "
                "JPEG supported"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_comps.append((cs, tables >> 4, tables & 0x0F))
            ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            pos = _decode_scan(
                payload, pos + seglen, frame, mcus, scan_comps,
                (ss, se, ah, al), coeffs, htables, restart_interval,
            )
            saw_scan = True
            continue
        pos += seglen
    if not saw_scan:
        raise ValueError("JPEG contained no scan")
    return _finish_jpeg(frame, mcus, coeffs, qtables)


def _finish_jpeg(frame, mcus, coeffs, qtables) -> np.ndarray:
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    out_planes = []
    for cid, ch, cv, tq in comps:
        zz = coeffs[cid].astype(np.float64) * qtables[tq]  # both zigzag
        by, bx = zz.shape[:2]
        nat = np.zeros_like(zz)
        nat[:, :, _ZIGZAG] = zz  # zigzag vector -> natural raster order
        blocks = nat.reshape(by, bx, 8, 8)
        px = np.einsum("ji,abjk,kl->abil", _DCT_C, blocks, _DCT_C)
        plane = px.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8) + 128.0
        ry, rx = vmax // cv, hmax // ch
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out_planes.append(plane[:h, :w])
    if len(out_planes) == 1:
        return np.clip(np.rint(out_planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out_planes[0], out_planes[1] - 128.0, out_planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def _decode_scan(
    data, pos, frame, mcus, scan_comps, band, coeffs, htables,
    restart_interval,
) -> int:
    """Decode one entropy-coded scan into the coefficient arrays;
    returns the stream position after the scan's data."""
    h, w, comps = frame
    ss, se, ah, al = band
    by_comp = {cid: (cid, ch, cv, tq) for cid, ch, cv, tq in comps}
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    reader = _BitReader(data, pos)
    pred = {cid: 0 for cid, *_ in scan_comps}
    state = {"eobrun": 0}

    interleaved = len(scan_comps) > 1
    if interleaved:
        units = mcus[0] * mcus[1]  # MCUs
    else:
        cid, ch, cv, _tq = by_comp[scan_comps[0][0]]
        bw = -(-(-(-w * ch // hmax)) // 8)
        bh = -(-(-(-h * cv // vmax)) // 8)
        units = bw * bh

    done = 0
    while done < units:
        if restart_interval and done and done % restart_interval == 0:
            reader.consume_restart()
            pred = {c: 0 for c in pred}
            state["eobrun"] = 0
        try:
            if interleaved:
                mx, my = done % mcus[0], done // mcus[0]
                for cs, dc_sel, ac_sel in scan_comps:
                    _cid, ch, cv, _tq = by_comp[cs]
                    for byy in range(cv):
                        for bxx in range(ch):
                            _decode_unit(
                                reader, htables, dc_sel, ac_sel, band,
                                coeffs[cs][my * cv + byy, mx * ch + bxx],
                                pred, cs, state,
                            )
            else:
                cs, dc_sel, ac_sel = scan_comps[0]
                bxx, byy = done % bw, done // bw
                _decode_unit(
                    reader, htables, dc_sel, ac_sel, band,
                    coeffs[cs][byy, bxx], pred, cs, state,
                )
        except _RestartMarker:
            raise ValueError("unexpected restart marker mid-unit")
        done += 1
    reader.byte_align()
    return reader.pos


def _decode_unit(reader, htables, dc_sel, ac_sel, band, zz, pred, cid, state):
    """One 8x8 block's contribution for this scan's band/approximation.
    ``zz`` is the block's 64-coefficient zigzag vector (mutated)."""
    ss, se, ah, al = band
    if ss == 0 and se == 63 and ah == 0 and al == 0:
        # baseline: full-band DC+AC in one pass
        _decode_block_full(
            reader, htables[(0, dc_sel)], htables[(1, ac_sel)], zz, pred, cid
        )
        return
    if ss == 0:  # DC-only scan (progressive requires Se==0 here)
        if ah == 0:
            t = _huff_decode(reader, htables[(0, dc_sel)])
            diff = _extend(reader.read_bits(t), t) if t else 0
            pred[cid] += diff
            zz[0] = pred[cid] << al
        else:  # DC refinement: one bit
            if reader.read_bit():
                zz[0] |= 1 << al
        return
    if ah == 0:
        _decode_ac_first(reader, htables[(1, ac_sel)], zz, ss, se, al, state)
    else:
        _decode_ac_refine(reader, htables[(1, ac_sel)], zz, ss, se, al, state)


def _decode_block_full(reader, dc_t, ac_t, zz, pred, cid) -> None:
    t = _huff_decode(reader, dc_t)
    diff = _extend(reader.read_bits(t), t) if t else 0
    pred[cid] += diff
    zz[0] = pred[cid]
    k = 1
    while k < 64:
        rs = _huff_decode(reader, ac_t)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run overflows block")
        zz[k] = _extend(reader.read_bits(s), s)
        k += 1


def _decode_ac_first(reader, ac_t, zz, ss, se, al, state) -> None:
    """Progressive AC first scan (Ah=0): values at this approximation
    level, with EOBn run-length codes spanning blocks (G.1.2.2)."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = _huff_decode(reader, ac_t)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16
                continue
            state["eobrun"] = (1 << r) - 1
            if r:
                state["eobrun"] += reader.read_bits(r)
            return
        k += r
        if k > se:
            raise ValueError("AC run overflows band")
        zz[k] = _extend(reader.read_bits(s), s) << al
        k += 1


def _decode_ac_refine(reader, ac_t, zz, ss, se, al, state) -> None:
    """Progressive AC refinement (Ah>0): correction bits for known
    coefficients, new +-1<<Al coefficients inserted by run (G.1.2.3)."""
    p1, m1 = 1 << al, -1 << al

    def correct(k):
        if reader.read_bit() and (zz[k] & p1) == 0:
            zz[k] += p1 if zz[k] >= 0 else m1

    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = _huff_decode(reader, ac_t)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if r < 15:
                    # EOBn: n = (1<<r) + extra blocks end here, the
                    # CURRENT block included (its tail corrections are
                    # read below before the run is decremented)
                    e = 1 << r
                    if r:
                        e += reader.read_bits(r)
                    state["eobrun"] = e
                    break
                # r == 15: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("refinement scan with s > 1")
                newval = p1 if reader.read_bit() else m1
            # advance past r zero-history coefficients, correcting
            # nonzero ones along the way
            while k <= se:
                if zz[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        if newval:
                            zz[k] = newval
                        k += 1
                        break
                    r -= 1
                k += 1
    if state["eobrun"] > 0:
        # EOB span covers the rest of this block: correction bits only
        while k <= se:
            if zz[k] != 0:
                correct(k)
            k += 1
        state["eobrun"] -= 1


# -- encoder ----------------------------------------------------------------

def _make_dc_table() -> _HuffTable:
    counts = [0] * 16
    counts[3] = 12  # twelve 4-bit codes; max code 1011, never all-ones
    return _HuffTable(counts, list(range(12)))


def _make_ac_table() -> _HuffTable:
    # EOB/EOBn (r<<4 for r=0..14: progressive end-of-band run lengths),
    # ZRL, and every run/size pair — 176 symbols, all at 8 bits
    # (176/256 Kraft-valid; max canonical code 175, never all-ones)
    symbols = [r << 4 for r in range(15)] + [0xF0]
    for run in range(16):
        for size in range(1, 11):
            symbols.append((run << 4) | size)
    symbols = sorted(set(symbols))
    counts = [0] * 16
    counts[7] = len(symbols)
    return _HuffTable(counts, symbols)


_DC_TABLE = _make_dc_table()
_AC_TABLE = _make_ac_table()


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nacc += 1
            if self.nacc == 8:
                b = self.acc & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nacc = 0

    def flush(self) -> None:
        while self.nacc:
            self.write(1, 1)  # pad with 1-bits per spec


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_block(writer, coeffs_zz, pred, dc_t, ac_t):
    diff = int(coeffs_zz[0]) - pred
    t = _category(diff)
    length, code = dc_t.encode_map[t]
    writer.write(code, length)
    if t:
        writer.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    nz = np.nonzero(coeffs_zz[1:])[0]
    last_nz = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last_nz + 1):
        v = int(coeffs_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_t.encode_map[0xF0]
            writer.write(code, length)
            run -= 16
        s = _category(v)
        length, code = ac_t.encode_map[(run << 4) | s]
        writer.write(code, length)
        writer.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        length, code = ac_t.encode_map[0x00]
        writer.write(code, length)
    return int(coeffs_zz[0])


def _zigzag_blocks(quant: np.ndarray) -> np.ndarray:
    """(by, bx, 8, 8) -> (by, bx, 64) in zigzag scan order."""
    flat = quant.reshape(quant.shape[0], quant.shape[1], 64)
    return flat[:, :, _ZIGZAG]


def _avg_pool2(plane: np.ndarray) -> np.ndarray:
    """2x2 mean downsample (pad to even with edge replication first)."""
    h, w = plane.shape
    p = np.pad(plane, ((0, h % 2), (0, w % 2)), mode="edge")
    return (
        p[0::2, 0::2] + p[1::2, 0::2] + p[0::2, 1::2] + p[1::2, 1::2]
    ) / 4.0


def encode_jpeg(
    pixels: np.ndarray, quality: int = 90, subsample: str = "444"
) -> bytes:
    """Baseline sequential JFIF: grayscale (H, W) or RGB (H, W, 3),
    4:4:4 or 4:2:0 chroma sampling. Lossy — round-trips within a
    quality-dependent tolerance (exact for flat blocks at high
    quality). Huffman tables are generated canonical tables embedded in
    DHT (spec-valid; JPEG files carry their own tables)."""
    if subsample not in ("444", "420"):
        raise ValueError("subsample must be '444' or '420'")
    pixels = np.asarray(pixels, np.float64)
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    qlum = _scaled_qtable(_QLUM, quality).reshape(8, 8).astype(np.float64)
    qchrom = _scaled_qtable(_QCHROM, quality).reshape(8, 8).astype(np.float64)
    if gray:
        comps = [(pixels, qlum, 1, 1, 0)]  # (plane, q, ch, cv, tq)
    else:
        r, g, b = pixels[..., 0], pixels[..., 1], pixels[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample == "420":
            comps = [
                (y, qlum, 2, 2, 0),
                (_avg_pool2(cb), qchrom, 1, 1, 1),
                (_avg_pool2(cr), qchrom, 1, 1, 1),
            ]
        else:
            comps = [
                (y, qlum, 1, 1, 0),
                (cb, qchrom, 1, 1, 1),
                (cr, qchrom, 1, 1, 1),
            ]
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + \
        struct.pack(">HH", 1, 1) + b"\x00\x00"  # APP0
    for tq, q in ((0, qlum),) if gray else ((0, qlum), (1, qchrom)):
        zz = q.reshape(64)[_ZIGZAG].astype(np.uint8)
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + zz.tobytes()
    nc = len(comps)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for i, (_p, _q, ch, cv, tq) in enumerate(comps):
        out += bytes([i + 1, (ch << 4) | cv, tq])
    for tc_th, table in (
        ((0x00,), _DC_TABLE), ((0x10,), _AC_TABLE),
        *((((0x01,), _DC_TABLE), ((0x11,), _AC_TABLE)) if not gray else ()),
    ):
        body = bytes(tc_th) + bytes(table.counts) + bytes(table.symbols)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for i in range(nc):
        out += bytes([i + 1, 0x00 if i == 0 else 0x11])
    out += b"\x00\x3f\x00"  # Ss=0, Se=63, Ah/Al=0

    # entropy-coded data, MCU-interleaved; DCT vectorized per component
    zz_planes = []
    for plane, q, ch, cv, _tq in comps:
        ph, pw = mcus_y * cv * 8, mcus_x * ch * 8
        padded = np.pad(
            plane,
            ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
            mode="edge",
        )
        blocks = padded.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
        dct = np.einsum("ij,abjk,lk->abil", _DCT_C, blocks - 128.0, _DCT_C)
        zz_planes.append(_zigzag_blocks(np.rint(dct / q).astype(np.int32)))
    writer = _BitWriter()
    preds = [0] * nc
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (_p, _q, ch, cv, _tq) in enumerate(comps):
                for by in range(cv):
                    for bx in range(ch):
                        preds[ci] = _encode_block(
                            writer,
                            zz_planes[ci][my * cv + by, mx * ch + bx],
                            preds[ci],
                            _DC_TABLE,
                            _AC_TABLE,
                        )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# AVI / MJPEG: RIFF container, one JPEG per frame (round 4)
# ---------------------------------------------------------------------------
#
# Motion-JPEG in an AVI RIFF container — the simplest real video format,
# and the round-4 JPEG codec supplies the per-frame compression, so the
# whole video path stays pure numpy + stdlib. The writer emits the
# minimal spec-complete layout (hdrl with avih + one 'vids'/'MJPG'
# stream, movi with '00dc' chunks, even-byte padding); the reader walks
# RIFF chunks and accepts any MJPEG AVI of that shape. Inter-frame
# codecs (H.264 etc.) genuinely need external libraries and stay gated.


def encode_avi_mjpeg(
    frames: list[np.ndarray], fps: int = 10, quality: int = 90
) -> bytes:
    """RGB/gray frame arrays (all same shape) → MJPEG AVI bytes."""
    if not frames:
        raise ValueError("encode_avi_mjpeg needs at least one frame")
    h, w = frames[0].shape[:2]
    payloads = [encode_jpeg(f, quality=quality) for f in frames]

    def chunk(tag: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return tag + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    us_per_frame = 1_000_000 // fps
    max_bytes = max(len(p) for p in payloads)
    avih = struct.pack(
        "<14I",
        us_per_frame, max_bytes * fps, 0, 0,  # no index chunk -> flags 0
        len(frames), 0, 1, max_bytes, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIiI", 0, 0, 0, 0, 1, fps, 0,
                      len(frames), max_bytes, -1, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", p) for p in payloads))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi_mjpeg(payload: bytes) -> tuple[int, list[bytes]]:
    """MJPEG AVI bytes → ``(fps, [jpeg_frame_bytes, ...])``.

    Walks the RIFF tree; frames come from '..dc'/'..db' chunks inside
    LIST movi, fps from the avih microseconds-per-frame field. Decode a
    frame with ``decode_image(frame, "jpeg")``.
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload (missing RIFF/AVI magic)")
    fps = 0
    frames: list[bytes] = []

    def walk(data: bytes, pos: int, end: int) -> None:
        nonlocal fps
        while pos + 8 <= end:
            tag = data[pos : pos + 4]
            size = struct.unpack_from("<I", data, pos + 4)[0]
            body_start = pos + 8
            body_end = min(body_start + size, end)
            if tag == b"LIST":
                walk(data, body_start + 4, body_end)
            elif tag == b"avih" and size >= 4:
                us = struct.unpack_from("<I", data, body_start)[0]
                if us:
                    fps = round(1_000_000 / us)
            elif tag[2:4] in (b"dc", b"db") and size > 0:
                frames.append(bytes(data[body_start:body_end]))
            pos = body_start + size + (size % 2)

    walk(payload, 12, len(payload))
    if not frames:
        raise ValueError("AVI contained no video frames")
    return fps or 1, frames


# ---------------------------------------------------------------------------
# Progressive JPEG encoder (spectral selection + successive approximation)
# ---------------------------------------------------------------------------
#
# Emits the canonical progressive scan script: interleaved DC at Al=1 +
# DC refinement, then per-component AC bands 1-5 and 6-63 at Al=1
# followed by their refinement scans (T.81 G.1.2, EOBn run codes and
# the correction-bit buffering of G.1.2.3). Because the final
# coefficients equal the baseline encoder's quantized coefficients
# EXACTLY, a correct progressive decode must reproduce the baseline
# decode pixel-for-pixel — the self-oracle the tests pin.


def _ac_level(v: int, al: int) -> int:
    """AC point transform: magnitude shift TOWARD ZERO (T.81 A.4)."""
    return -((-v) >> al) if v < 0 else v >> al


class _ProgressiveACWriter:
    """Per-scan AC emission state: EOB run + buffered correction bits
    (refinement only), flushed in decoder-read order."""

    def __init__(self, writer: _BitWriter, table: _HuffTable):
        self.w = writer
        self.t = table
        self.eobrun = 0
        self.pending: list[int] = []

    def _emit(self, sym: int) -> None:
        length, code = self.t.encode_map[sym]
        self.w.write(code, length)

    def flush_eob(self) -> None:
        if self.eobrun == 0:
            if self.pending:
                for b in self.pending:
                    self.w.write(b, 1)
                self.pending = []
            return
        e = self.eobrun
        r = e.bit_length() - 1
        self._emit(r << 4)
        if r:
            self.w.write(e - (1 << r), r)
        for b in self.pending:
            self.w.write(b, 1)
        self.pending = []
        self.eobrun = 0

    def code_with_bits(self, sym: int, value: int, nbits: int) -> None:
        """A Huffman code + immediate bits, then buffered corrections."""
        self._emit(sym)
        if nbits:
            self.w.write(value, nbits)
        for b in self.pending:
            self.w.write(b, 1)
        self.pending = []


def _encode_ac_first_block(ac: _ProgressiveACWriter, zz, ss, se, al) -> None:
    vals = [_ac_level(int(zz[k]), al) for k in range(ss, se + 1)]
    last_nz = -1
    for i, v in enumerate(vals):
        if v:
            last_nz = i
    if last_nz < 0:
        ac.eobrun += 1
        if ac.eobrun == 0x7FFF:
            ac.flush_eob()
        return
    ac.flush_eob()
    run = 0
    for i in range(last_nz + 1):
        v = vals[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            ac.code_with_bits(0xF0, 0, 0)
            run -= 16
        s = _category(v)
        ac.code_with_bits(
            (run << 4) | s, v if v > 0 else v + (1 << s) - 1, s
        )
        run = 0
    if last_nz < len(vals) - 1:
        ac.eobrun += 1
        if ac.eobrun == 0x7FFF:
            ac.flush_eob()


def _encode_ac_refine_block(ac: _ProgressiveACWriter, zz, ss, se, ah, al) -> None:
    """Exact inverse of the decoder's G.1.2.3 consumption: correction
    bits attach to the specific ZRL/newval/EOB code whose advance walks
    past their coefficient, so the windows line up bit-for-bit."""
    cur = [_ac_level(int(zz[k]), al) for k in range(ss, se + 1)]
    prev = [_ac_level(int(zz[k]), ah) for k in range(ss, se + 1)]
    n = len(cur)
    new_positions = [
        i for i in range(n) if prev[i] == 0 and cur[i] != 0
    ]
    if not new_positions:
        # no newly significant coefficients: the whole block joins the
        # EOB run; its correction bits ride the pending buffer
        ac.eobrun += 1
        for i in range(n):
            if prev[i] != 0:
                ac.pending.append(abs(cur[i]) & 1)
        if ac.eobrun == 0x7FFF:
            ac.flush_eob()
        return
    ac.flush_eob()
    pos = 0
    for j in new_positions:
        # zero-history zeros and corrections strictly before j
        zeros = [
            i for i in range(pos, j) if prev[i] == 0 and cur[i] == 0
        ]
        run = len(zeros)
        while run > 15:
            # this ZRL's advance covers positions up to (and incl.) the
            # 16th zero — only corrections in that window ride with it
            boundary = zeros[len(zeros) - run + 15]
            window_bits = [
                abs(cur[i]) & 1
                for i in range(pos, boundary + 1)
                if prev[i] != 0
            ]
            ac.code_with_bits(0xF0, 0, 0)
            for b in window_bits:
                ac.w.write(b, 1)
            pos = boundary + 1
            run -= 16
        tail_bits = [
            abs(cur[i]) & 1 for i in range(pos, j) if prev[i] != 0
        ]
        ac.code_with_bits((run << 4) | 1, 1 if cur[j] > 0 else 0, 1)
        for b in tail_bits:
            ac.w.write(b, 1)
        pos = j + 1
    if pos < n:
        ac.eobrun += 1
        ac.pending.extend(
            abs(cur[i]) & 1 for i in range(pos, n) if prev[i] != 0
        )
        if ac.eobrun == 0x7FFF:
            ac.flush_eob()


def encode_jpeg_progressive(
    pixels: np.ndarray, quality: int = 90, subsample: str = "444"
) -> bytes:
    """Progressive JFIF (SOF2): same quantized coefficients as
    :func:`encode_jpeg`, delivered as DC-first + band + refinement
    scans. ``decode_image`` must produce pixels identical to the
    baseline encoding's decode."""
    if subsample not in ("444", "420"):
        raise ValueError("subsample must be '444' or '420'")
    pixels = np.asarray(pixels, np.float64)
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    qlum = _scaled_qtable(_QLUM, quality).reshape(8, 8).astype(np.float64)
    qchrom = _scaled_qtable(_QCHROM, quality).reshape(8, 8).astype(np.float64)
    if gray:
        comps = [(pixels, qlum, 1, 1, 0)]
    else:
        r, g, b = pixels[..., 0], pixels[..., 1], pixels[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample == "420":
            comps = [
                (y, qlum, 2, 2, 0),
                (_avg_pool2(cb), qchrom, 1, 1, 1),
                (_avg_pool2(cr), qchrom, 1, 1, 1),
            ]
        else:
            comps = [
                (y, qlum, 1, 1, 0),
                (cb, qchrom, 1, 1, 1),
                (cr, qchrom, 1, 1, 1),
            ]
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    zz_planes = []
    for plane, q, ch, cv, _tq in comps:
        ph, pw = mcus_y * cv * 8, mcus_x * ch * 8
        padded = np.pad(
            plane,
            ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
            mode="edge",
        )
        blocks = padded.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
        dct = np.einsum("ij,abjk,lk->abil", _DCT_C, blocks - 128.0, _DCT_C)
        zz_planes.append(_zigzag_blocks(np.rint(dct / q).astype(np.int32)))

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + \
        struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tq, q in ((0, qlum),) if gray else ((0, qlum), (1, qchrom)):
        zzq = q.reshape(64)[_ZIGZAG].astype(np.uint8)
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + zzq.tobytes()
    nc = len(comps)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for i, (_p, _q, ch, cv, tq) in enumerate(comps):
        out += bytes([i + 1, (ch << 4) | cv, tq])
    for tc_th, table in (
        ((0x00,), _DC_TABLE), ((0x10,), _AC_TABLE),
        *((((0x01,), _DC_TABLE), ((0x11,), _AC_TABLE)) if not gray else ()),
    ):
        body = bytes(tc_th) + bytes(table.counts) + bytes(table.symbols)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    def sos(comp_specs, ss, se, ah, al, body_bits):
        hdr = b"\xff\xda" + struct.pack(
            ">HB", 6 + 2 * len(comp_specs), len(comp_specs)
        )
        for ci, tbls in comp_specs:
            hdr += bytes([ci, tbls])
        hdr += bytes([ss, se, (ah << 4) | al])
        return hdr + body_bits

    # scan 1: interleaved DC first at Al=1
    writer = _BitWriter()
    preds = [0] * nc
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (_p, _q, ch, cv, _tq) in enumerate(comps):
                for byy in range(cv):
                    for bxx in range(ch):
                        coef = int(zz_planes[ci][my * cv + byy, mx * ch + bxx][0])
                        v = coef >> 1  # DC point transform: arithmetic
                        diff = v - preds[ci]
                        preds[ci] = v
                        t = _category(diff)
                        length, code = _DC_TABLE.encode_map[t]
                        writer.write(code, length)
                        if t:
                            writer.write(
                                diff if diff > 0 else diff + (1 << t) - 1, t
                            )
    writer.flush()
    out += sos([(i + 1, 0x00) for i in range(nc)], 0, 0, 0, 1, writer.out)
    # scan 2: interleaved DC refinement (Ah=1, Al=0) — bit0 per block
    writer = _BitWriter()
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (_p, _q, ch, cv, _tq) in enumerate(comps):
                for byy in range(cv):
                    for bxx in range(ch):
                        coef = int(zz_planes[ci][my * cv + byy, mx * ch + bxx][0])
                        writer.write(coef & 1, 1)
    writer.flush()
    out += sos([(i + 1, 0x00) for i in range(nc)], 0, 0, 1, 0, writer.out)

    # per-component AC band scans: first at Al=1, then refinements
    bands = [(1, 5), (6, 63)]
    for al_first in (True, False):
        for ss, se in bands:
            for ci, (_p, _q, ch, cv, _tq) in enumerate(comps):
                plane = zz_planes[ci]
                bh_c, bw_c = plane.shape[:2]
                # non-interleaved grid per T.81 (can be smaller than the
                # interleaved layout's grid)
                bw_n = -(-(-(-w * ch // hmax)) // 8)
                bh_n = -(-(-(-h * cv // vmax)) // 8)
                writer = _BitWriter()
                ac = _ProgressiveACWriter(writer, _AC_TABLE)
                for byy in range(bh_n):
                    for bxx in range(bw_n):
                        if al_first:
                            _encode_ac_first_block(
                                ac, plane[byy, bxx], ss, se, 1
                            )
                        else:
                            _encode_ac_refine_block(
                                ac, plane[byy, bxx], ss, se, 1, 0
                            )
                ac.flush_eob()
                writer.flush()
                ah, al = (0, 1) if al_first else (1, 0)
                # SOS selector byte: DC table (high nibble, unused in AC
                # scans) | AC table (low nibble: 0 luma, 1 chroma)
                out += sos(
                    [(ci + 1, 0x00 if ci == 0 else 0x01)],
                    ss, se, ah, al, writer.out,
                )
    out += b"\xff\xd9"
    return bytes(out)
