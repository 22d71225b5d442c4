"""Arithmetic-coded JPEG codec (jpeg_arith.py) — interop pinned to the
compiled system libjpeg (ITU-T T.81 Annex D/F/G arithmetic coding):

- golden decode: files the library encoded (tests/data/jpeg_arith/,
  produced by tools/gen_jpeg_arith_goldens.py) must entropy-decode here
  to the library's own coefficient dump, integer-exact, across
  sequential/progressive x gray/444/420 x restart intervals.
- encoder round-trip: encode_arith_jpeg output decodes back to the
  exact coefficients the shared pixel pipeline produced.
- huffman/arithmetic equivalence: the same pixels encoded baseline,
  progressive-huffman and arithmetic reconstruct to IDENTICAL pixel
  arrays (entropy coding is lossless over the same coefficients).
- live libjpeg interop (skipped when no compiler): the library decodes
  this module's files to the same coefficients.
- fuzz: decode_jpeg never raises on corrupted arithmetic bytes.
"""

from __future__ import annotations

import glob
import gzip
import os
import shutil
import subprocess

import numpy as np
import pytest

from letarette_spark.functions.jpeg import (
    ZIGZAG,
    decode_jpeg,
    decode_jpeg_coefficients,
    encode_jpeg,
)
from letarette_spark.functions.jpeg_arith import (
    TBL,
    ArithDecoder,
    ArithEncoder,
    FIXED,
    encode_arith_jpeg,
)

DATA = os.path.join(os.path.dirname(__file__), "data", "jpeg_arith")
GOLDENS = sorted(
    os.path.basename(p)[:-4] for p in glob.glob(os.path.join(DATA, "*.jpg"))
)


def parse_coef_dump(text: str):
    """Parse the shim's `coef` output into {cid: (bh, bw, 64) natural}."""
    lines = text.splitlines()
    w, h, nc = map(int, lines[0].split())
    i = 1
    out = {}
    for _ in range(nc):
        _tag, cid, wb, hb = lines[i].split()
        cid, wb, hb = int(cid), int(wb), int(hb)
        i += 1
        buf = np.zeros((hb, wb, 64), dtype=np.int32)
        for by in range(hb):
            for bx in range(wb):
                buf[by, bx] = list(map(int, lines[i].split()))
                i += 1
        out[cid] = buf
    return out


def to_natural(zz_buf: np.ndarray) -> np.ndarray:
    nat = np.zeros_like(zz_buf)
    nat[..., ZIGZAG] = zz_buf
    return nat


@pytest.mark.parametrize("name", GOLDENS)
def test_golden_decode_matches_library_coefficients(name):
    data = open(os.path.join(DATA, f"{name}.jpg"), "rb").read()
    ref = parse_coef_dump(
        gzip.open(os.path.join(DATA, f"{name}.coef.gz"), "rt").read()
    )
    out = decode_jpeg_coefficients(data)
    assert out is not None, name
    _frame, coeffs = out
    for cid, refbuf in ref.items():
        hb, wb = refbuf.shape[:2]
        mine = to_natural(coeffs[cid][:hb, :wb])
        assert np.array_equal(mine, refbuf), (name, cid)


@pytest.mark.parametrize("name", GOLDENS)
def test_golden_decodes_to_pixels(name):
    data = open(os.path.join(DATA, f"{name}.jpg"), "rb").read()
    px = decode_jpeg(data)
    assert px is not None and px.ndim == 3 and px.shape[2] == 3
    assert px.dtype == np.uint8


def _grad(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * 3) % 256, (yy * 5) % 256, ((xx + yy) * 2) % 256], axis=2
    ).astype(np.uint8)


@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"subsampling": "420"},
        {"restart_interval": 2},
        {"progressive": True},
        {"progressive": True, "subsampling": "420"},
        {"quality": 40, "progressive": True},
    ],
    ids=lambda kw: "-".join(f"{k}={v}" for k, v in kw.items()) or "default",
)
def test_encode_roundtrip_exact_coefficients(kw):
    from letarette_spark.functions.jpeg_arith import (
        _comp_block_dims,
        _component_coeffs,
    )

    rng = np.random.RandomState(11)
    img = (rng.rand(41, 53, 3) * 255).astype(np.uint8)
    data = encode_arith_jpeg(img, **kw)
    h, w, comps, bufs, _ql, _qc = _component_coeffs(
        img, kw.get("quality", 90), kw.get("subsampling", "444")
    )
    out = decode_jpeg_coefficients(data)
    assert out is not None
    frame, coeffs = out
    for cid, buf in bufs.items():
        bh, bw = _comp_block_dims((h, w, comps), cid)
        assert np.array_equal(coeffs[cid][:bh, :bw], buf[:bh, :bw]), cid


def test_huffman_arithmetic_pixel_equivalence():
    """Same pixels, three entropy codings, identical reconstruction:
    entropy coding is lossless over identical quantized coefficients."""
    img = _grad(40, 56)
    base = decode_jpeg(encode_jpeg(img, quality=80))
    arith = decode_jpeg(encode_arith_jpeg(img, quality=80))
    assert np.array_equal(base, arith)
    arith_prog = decode_jpeg(
        encode_arith_jpeg(img, quality=80, progressive=True)
    )
    assert np.array_equal(base, arith_prog)


def test_encode_420_matches_huffman_420_pixels():
    img = _grad(40, 56)
    base = decode_jpeg(encode_jpeg(img, quality=75, subsampling="420"))
    arith = decode_jpeg(encode_arith_jpeg(img, quality=75, subsampling="420"))
    assert np.array_equal(base, arith)


def test_decoder_never_raises_on_fuzzed_bytes():
    rng = np.random.RandomState(7)
    img = (rng.rand(24, 24, 3) * 255).astype(np.uint8)
    good = bytearray(encode_arith_jpeg(img))
    for _ in range(150):
        bad = bytearray(good)
        for _k in range(rng.randint(1, 6)):
            bad[rng.randint(2, len(bad))] = rng.randint(0, 256)
        decode_jpeg(bytes(bad))  # must not raise
    # truncations
    for cut in range(2, len(good), max(1, len(good) // 40)):
        decode_jpeg(bytes(good[:cut]))
    # random garbage with SOI
    for _ in range(30):
        decode_jpeg(b"\xff\xd8" + rng.bytes(rng.randint(0, 400)))


def test_table_d3_invariants():
    """Structural sanity of the recovered Table D.3: 113 states + the
    fixed pseudo-state; transitions stay in range; the fixed state
    self-transitions and never switches."""
    assert len(TBL) == 114
    for qe, nmps, nlps, sw in TBL:
        assert 0 < qe <= 0x5B12
        assert 0 <= nmps < 114 and 0 <= nlps < 114
        assert sw in (0, 1)
    assert TBL[FIXED] == (0x5A1D, FIXED, FIXED, 0)
    assert TBL[0][0] == 0x5A1D and TBL[0][3] == 1


def test_raw_coder_roundtrip_random_decisions():
    """The bare QM coder pair round-trips arbitrary decision sequences
    through shared adaptive contexts (including renorm/byteout edges hit
    only by skewed distributions)."""
    rng = np.random.RandomState(5)
    for trial, p in enumerate((0.5, 0.9, 0.99, 0.03)):
        bits = (rng.rand(4000) < p).astype(int).tolist()
        enc = ArithEncoder()
        stats = bytearray(8)
        for j, b in enumerate(bits):
            enc.encode(stats, j % 8, b)
        blob = enc.finish() + b"\xff\xd9"
        dec = ArithDecoder(blob, 0)
        stats2 = bytearray(8)
        got = [dec.decode(stats2, j % 8) for j in range(len(bits))]
        assert got == bits, f"trial {trial}"


HAVE_TOOLCHAIN = (
    shutil.which("gcc") is not None
    and os.path.exists("/usr/include/jpeglib.h")
)


@pytest.mark.skipif(not HAVE_TOOLCHAIN, reason="no gcc/libjpeg headers")
def test_live_library_decodes_our_files():
    """The compiled libjpeg entropy-decodes THIS module's output to the
    exact coefficients our pipeline produced (encoder-side interop)."""
    from letarette_spark.functions.jpeg_arith import (
        _comp_block_dims,
        _component_coeffs,
    )

    shim_src = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools", "jpeg_arith_shim.c",
    )
    shim = "/tmp/jpeg_arith_shim_test"
    subprocess.run(["gcc", "-O2", "-o", shim, shim_src, "-ljpeg"], check=True)
    img = _grad(40, 56)
    for kw in ({}, {"progressive": True, "subsampling": "420"},
               {"restart_interval": 3}):
        data = encode_arith_jpeg(img, quality=85, **kw)
        r = subprocess.run([shim, "coef"], input=data, capture_output=True)
        assert r.returncode == 0, (kw, r.stderr)
        ref = parse_coef_dump(r.stdout.decode())
        h, w, comps, bufs, _ql, _qc = _component_coeffs(
            img, 85, kw.get("subsampling", "444")
        )
        for cid, refbuf in ref.items():
            hb, wb = refbuf.shape[:2]
            assert np.array_equal(
                to_natural(bufs[cid][:hb, :wb]), refbuf
            ), (kw, cid)


def test_arithmetic_jpeg_flows_through_image_pipeline():
    """codecs.decode_image dispatches on the JPEG magic, so arithmetic
    files get REAL pixels (not the sha-derived fake) through the same
    path image_features() uses."""
    from letarette_spark.functions.codecs import decode_image
    from letarette_spark.functions.multimodal import default_decode_image

    img = _grad(24, 32)
    data = encode_arith_jpeg(img, quality=90)
    px = decode_image(data)
    assert px is not None and px.shape == (24, 32, 3)
    feats = default_decode_image(data)
    assert feats["width"] == 32 and feats["height"] == 24
    assert 0.0 < feats["mean_luma"] < 1.0
