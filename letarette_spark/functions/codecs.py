"""Pure-numpy media codecs: 24-bit BMP and 16-bit PCM WAV.

Both formats are plain struct layouts — no image/audio libraries needed —
so the multimodal pipeline's decode step is REAL for them (parse, pixel /
sample math, resize, hashing all operate on actual payload content).
Formats that genuinely need external codecs (JPEG, MP4, ...) remain
behind the explicit `multimodal.require_real_decoder` boundary.

Implemented from the public format specifications:
- BMP: BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER (40 bytes),
  uncompressed BI_RGB 24bpp, BGR pixel order, rows padded to 4 bytes,
  bottom-up unless height < 0.
- WAV: RIFF/WAVE container, fmt chunk (PCM, format tag 1), data chunk of
  interleaved little-endian int16 samples.
"""

from __future__ import annotations

import struct

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
