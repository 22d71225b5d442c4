"""Pure-numpy media codecs: 24-bit BMP, 8-bit PNG, 16-bit PCM WAV (here)
and baseline JPEG (functions/jpeg.py).

These formats need no image/audio libraries — BMP/WAV are plain struct
layouts, PNG is zlib (stdlib) + per-row unfiltering, JPEG is canonical
Huffman + matrix IDCT over numpy — so the multimodal pipeline's decode
step is REAL for them (parse, pixel / sample math, resize, hashing all
operate on actual payload content) — incl. PROGRESSIVE JPEG (SOF2,
jpeg.py Annex-G scans) and MP4 container structure (mp4.py). What
genuinely needs external codecs (compressed video frame pixels,
arithmetic-coded JPEG) remains behind the explicit
`multimodal.require_real_decoder` boundary.

Implemented from the public format specifications:
- BMP: BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER (40 bytes),
  uncompressed BI_RGB 24bpp, BGR pixel order, rows padded to 4 bytes,
  bottom-up unless height < 0.
- PNG (RFC 2083 / W3C PNG spec): signature + IHDR/IDAT/IEND chunks,
  zlib-inflated scanlines, filter types 0-4 (None/Sub/Up/Average/Paeth),
  bit depth 8, color types 0/2/4/6 (gray, RGB, gray+alpha, RGBA),
  non-interlaced.
- WAV: RIFF/WAVE container, fmt chunk (PCM, format tag 1), data chunk of
  interleaved little-endian int16 samples.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


# --------------------------------------------------------------------------
# BMP
# --------------------------------------------------------------------------

def encode_bmp(pixels: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB -> 24-bit bottom-up BMP bytes."""
    h, w, c = pixels.shape
    assert c == 3
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    data_offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", data_offset + img_size, 0, 0, data_offset)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = bytearray()
    bgr = pixels[:, :, ::-1]  # BMP stores BGR
    pad = b"\x00" * (row_size - w * 3)
    for y in range(h - 1, -1, -1):  # bottom-up
        rows += bgr[y].tobytes() + pad
    return header + info + bytes(rows)


def decode_bmp(data: bytes) -> np.ndarray | None:
    """BMP bytes -> HxWx3 uint8 RGB, or None when not a parseable
    uncompressed 24bpp BMP."""
    if len(data) < 54 or data[:2] != b"BM":
        return None
    try:
        (_, _, _, _, offset) = struct.unpack_from("<2sIHHI", data, 0)
        (hdr, w, h, _planes, bpp, comp, *_rest) = struct.unpack_from(
            "<IiiHHI", data, 14
        )
    except struct.error:
        return None
    if hdr < 40 or bpp != 24 or comp != 0 or w <= 0 or h == 0:
        return None
    top_down = h < 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    if len(data) < offset + row_size * h:
        return None
    raw = np.frombuffer(data, dtype=np.uint8, count=row_size * h, offset=offset)
    rows = raw.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


# --------------------------------------------------------------------------
# PNG
# --------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (bit depth 8 only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def encode_png(pixels: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB -> non-interlaced 8-bit truecolor PNG bytes
    (filter type 0 rows — valid, just uncompressed-friendly)."""
    h, w, c = pixels.shape
    assert c == 3

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG row filters. raw is h rows of (1 filter byte + stride
    bytes); returns (h, stride) uint8. Row-sequential by necessity (Up/
    Average/Paeth reference the prior reconstructed row). None/Up are
    whole-row numpy ops and Sub is a per-channel-lane cumsum; Average and
    Paeth are inherently element-sequential (the predictor needs the just-
    reconstructed left byte through a floor/abs nonlinearity), so they run
    as plain-int list loops — still linear in pixels, no numpy scalar-
    indexing overhead."""
    rows = raw.reshape(h, 1 + stride)
    out = np.zeros((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        ftype = int(rows[y, 0])
        cur = rows[y, 1:].astype(np.int16)
        if ftype == 0:  # None
            rec = cur
        elif ftype == 1:  # Sub
            # rec[i] = cur[i] + rec[i-bpp] (mod 256) == per-lane prefix sum
            rec = (
                np.cumsum(cur.reshape(-1, bpp).astype(np.int64), axis=0) & 0xFF
            ).reshape(stride).astype(np.int16)
        elif ftype == 2:  # Up
            rec = (cur + prior) & 0xFF
        elif ftype == 3:  # Average
            rl = cur.tolist()
            pl = prior.tolist()
            for i in range(stride):
                left = rl[i - bpp] if i >= bpp else 0
                rl[i] = (rl[i] + ((left + pl[i]) >> 1)) & 0xFF
            rec = np.asarray(rl, dtype=np.int16)
        elif ftype == 4:  # Paeth
            rl = cur.tolist()
            pl = prior.tolist()
            for i in range(stride):
                a = rl[i - bpp] if i >= bpp else 0
                b = pl[i]
                c = pl[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rl[i] = (rl[i] + pred) & 0xFF
            rec = np.asarray(rl, dtype=np.int16)
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = rec.astype(np.uint8)
        prior = rec
    return out


def decode_png(data: bytes) -> np.ndarray | None:
    """PNG bytes -> HxWx3 uint8 RGB, or None when not a parseable
    non-interlaced 8-bit gray/RGB/gray+alpha/RGBA PNG. Alpha is dropped;
    grayscale expands to 3 identical channels."""
    if len(data) < len(_PNG_SIG) + 12 or not data.startswith(_PNG_SIG):
        return None
    pos = len(_PNG_SIG)
    w = h = channels = None
    idat = bytearray()
    try:
        while pos + 8 <= len(data):
            size = struct.unpack_from(">I", data, pos)[0]
            ctype = data[pos + 4 : pos + 8]
            body = data[pos + 8 : pos + 8 + size]
            if len(body) != size:
                return None
            if ctype == b"IHDR":
                w, h, depth, color, comp, filt, interlace = struct.unpack(
                    ">IIBBBBB", body
                )
                if (
                    depth != 8
                    or color not in _PNG_CHANNELS
                    or comp != 0
                    or filt != 0
                    or interlace != 0
                    or w == 0
                    or h == 0
                ):
                    return None
                channels = _PNG_CHANNELS[color]
            elif ctype == b"IDAT":
                idat += body
            elif ctype == b"IEND":
                break
            pos += 12 + size  # len + type + body + crc
        if w is None or channels is None or not idat:
            return None
        raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    except (struct.error, zlib.error):
        return None
    stride = w * channels
    if len(raw) != h * (1 + stride):
        return None
    try:
        px = _png_unfilter(raw, h, stride, channels).reshape(h, w, channels)
    except ValueError:
        return None
    if channels == 1:
        return np.repeat(px, 3, axis=2)
    if channels == 2:  # gray + alpha
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3].copy()  # RGB / RGBA


def decode_image(data: bytes) -> np.ndarray | None:
    """Decode any supported real image format (BMP, PNG, baseline JPEG)
    to HxWx3 RGB."""
    px = decode_bmp(data)
    if px is None:
        px = decode_png(data)
    if px is None:
        from letarette_spark.functions.jpeg import decode_jpeg

        px = decode_jpeg(data)
    return px


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize (numpy index arithmetic, no libs)."""
    h, w = pixels.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return pixels[ys][:, xs]


def luma(pixels: np.ndarray) -> np.ndarray:
    """ITU-R BT.601 luma in [0, 255] float64."""
    p = pixels.astype(np.float64)
    return 0.299 * p[:, :, 0] + 0.587 * p[:, :, 1] + 0.114 * p[:, :, 2]


def average_hash64(pixels: np.ndarray) -> int:
    """Classic 64-bit aHash: 8x8 nearest-resized luma, bit i set when the
    pixel exceeds the mean (row-major, bit 63 = first pixel). Signed
    64-bit to match a Spark LongType column."""
    small = luma(resize_nearest(pixels, 8, 8))
    bits = (small > small.mean()).flatten()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    if v >= 1 << 63:
        v -= 1 << 64
    return v


# --------------------------------------------------------------------------
# WAV
# --------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """1-D int16 mono samples -> PCM WAV bytes."""
    pcm = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(pcm))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )


def decode_wav(data: bytes) -> tuple[np.ndarray, int] | None:
    """WAV bytes -> (float64 mono samples in [-1, 1], sample_rate), or
    None when not parseable PCM-16. Multi-channel input is averaged."""
    if len(data) < 44 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    pos = 12
    rate = channels = None
    samples = None
    while pos + 8 <= len(data):
        cid, size = data[pos : pos + 4], struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            tag, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
            if tag != 1 or bits != 16:
                return None
        elif cid == b"data":
            samples = np.frombuffer(body[: len(body) & ~1], dtype="<i2")
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if not rate or samples is None or not channels:
        return None  # rate 0 (corrupt fmt chunk) is unparseable, not /0
    if channels > 1:
        n = len(samples) // channels * channels
        samples = samples[:n].reshape(-1, channels).mean(axis=1)
    return samples.astype(np.float64) / 32768.0, int(rate)
