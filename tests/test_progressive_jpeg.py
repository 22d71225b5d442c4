"""Progressive (SOF2) JPEG decode: coefficient-identity against the
baseline pipeline, successive-approximation and spectral-selection
scans, EOBRUN handling, and robustness.

The central proof: encoding the SAME quantized coefficients as a
baseline stream and as a progressive stream (DC Al=1 + refine, AC
band 1-63 Al=1 + refine) must reconstruct to BYTE-IDENTICAL pixels —
the entropy-coding order differs, the coefficients do not."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from letarette_spark.functions.jpeg import (
    ZIGZAG,
    _idct2,
    decode_jpeg,
    encode_jpeg,
    encode_progressive_jpeg,
)


@pytest.mark.parametrize(
    "shape,quality,seed",
    [
        ((24, 40, 3), 80, 1),
        ((64, 64, 3), 90, 2),
        ((17, 31, 3), 50, 3),   # non-multiple-of-8 edges
        ((8, 8, 3), 95, 4),     # single MCU
        ((128, 96, 3), 75, 5),
    ],
)
def test_progressive_reconstructs_identically_to_baseline(shape, quality, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=quality))
    prog = decode_jpeg(encode_progressive_jpeg(img, quality=quality))
    assert base is not None and prog is not None
    assert np.array_equal(base, prog)


def test_gradient_image():
    yy, xx = np.mgrid[0:48, 0:80]
    img = np.stack(
        [(xx * 3) % 256, (yy * 5) % 256, ((xx + yy) * 2) % 256], axis=2
    ).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=85))
    prog = decode_jpeg(encode_progressive_jpeg(img, quality=85))
    assert np.array_equal(base, prog)
    # and the decode is a faithful (lossy-bounded) image
    assert np.abs(base.astype(int) - img.astype(int)).mean() < 16


def test_truncation_and_corruption_never_raise():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8)
    data = encode_progressive_jpeg(img, quality=70)
    for cut in range(0, len(data), 11):
        decode_jpeg(data[:cut])  # None or partial — never an exception
    for pos in range(2, min(len(data), 400), 3):
        mutated = bytearray(data)
        mutated[pos] ^= 0xFF
        decode_jpeg(bytes(mutated))


def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def test_eobrun_spanning_blocks():
    """Hand-assembled grayscale stream whose AC-first scan uses EOB1
    (an end-of-band RUN covering the current and the next block) — a
    path our own encoder never emits (it is Annex-K-table-bound to
    EOB0), so it is pinned with a custom Huffman table."""
    # 8x16 grayscale: two horizontal blocks
    h, w = 8, 16
    q = np.ones(64, dtype=int)  # flat quant table of 1s
    dqt = _seg(0xDB, bytes([0]) + bytes([1] * 64))
    sof = _seg(0xC2, bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0]))
    # DC table: symbol 2 with code '0' (cat 2), symbol 0 with code '10'
    dht_dc = _seg(0xC4, bytes([0x00]) + bytes([1, 1] + [0] * 14) + bytes([2, 0]))
    # AC table: codes: '0' -> 0x01 (run0,size1), '10' -> 0x10 (EOB1)
    dht_ac = _seg(0xC4, bytes([0x10]) + bytes([1, 1] + [0] * 14) + bytes([0x01, 0x10]))

    # scan 1: DC first Al=0: block0 dc=+3 (cat2 '11'), block1 diff=0
    #   bits: code('0') + '11'  then code('10')  -> 0 11 10 ... pad 1s
    dc_bits = "011" + "10"
    dc_scan = _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00]))
    dc_entropy = bytes([int(dc_bits.ljust(8, "1"), 2)])

    # scan 2: AC first Ss=1 Se=63 Al=0:
    #   block0: coeff k=1 -> +1: code('0')=0x01, sign/mag bit '1';
    #           then EOB1: code('10') + 1 appended bit '0'
    #           -> eobrun = (1<<1)-1 + 0 = 1 -> skips block1 entirely
    ac_bits = "0" + "1" + "10" + "0"
    ac_scan = _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00]))
    ac_entropy = bytes([int(ac_bits.ljust(8, "1"), 2)])

    data = (
        b"\xff\xd8" + dqt + sof + dht_dc + dht_ac
        + dc_scan + dc_entropy + ac_scan + ac_entropy + b"\xff\xd9"
    )
    out = decode_jpeg(data)
    assert out is not None and out.shape == (8, 16, 3)

    # expected: block0 zigzag {0: 3, 1: 1}; block1 {0: 3} (the DC
    # predictor carries across blocks — diff 0 keeps it at 3).
    # the grayscale output path clips+truncates (no rounding).
    def expected(zzvals):
        zz = np.zeros(64, dtype=np.int32)
        for k, v in zzvals.items():
            zz[k] = v
        blk = np.zeros(64, dtype=np.int32)
        blk[ZIGZAG] = zz
        return np.clip(
            _idct2(blk.reshape(8, 8).astype(float)) + 128.0, 0, 255
        ).astype(np.uint8)

    assert np.array_equal(out[:, :8, 0], expected({0: 3, 1: 1}))
    assert np.array_equal(out[:, 8:, 0], expected({0: 3}))
    # grayscale: all three channels equal
    assert np.array_equal(out[:, :, 0], out[:, :, 1])


def test_codecs_dispatch_handles_progressive():
    from letarette_spark.functions.codecs import decode_image

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    px = decode_image(encode_progressive_jpeg(img, quality=90))
    assert px is not None and px.shape == (16, 16, 3)
