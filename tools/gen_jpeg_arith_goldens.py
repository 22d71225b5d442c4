"""Generate interop goldens for the arithmetic JPEG codec.

Builds tools/jpeg_arith_shim.c against the system libjpeg (which
implements T.81 arithmetic coding), encodes deterministic images across
the marker/config matrix, captures the library's own entropy-decoded
coefficient dump for each, and writes both under tests/data/jpeg_arith/:

    <name>.jpg       the libjpeg-encoded arithmetic file
    <name>.coef.gz   its coefficient dump (the shim's `coef` output)

tests/test_jpeg_arith.py then pins letarette_spark's decoder to these
without needing a compiler at test time.

Usage: python tools/gen_jpeg_arith_goldens.py
"""

from __future__ import annotations

import gzip
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "tests", "data", "jpeg_arith")
SHIM_SRC = os.path.join(REPO, "tools", "jpeg_arith_shim.c")
SHIM = "/tmp/jpeg_arith_shim"


def build_shim() -> str:
    subprocess.run(
        ["gcc", "-O2", "-o", SHIM, SHIM_SRC, "-ljpeg"], check=True
    )
    return SHIM


def images() -> dict[str, np.ndarray]:
    rng = np.random.RandomState(42)
    yy, xx = np.mgrid[0:40, 0:56]
    return {
        "noise_gray": (rng.rand(64, 48) * 255).astype(np.uint8),
        "noise_rgb": (rng.rand(48, 64, 3) * 255).astype(np.uint8),
        "gradient": np.stack(
            [(xx * 3) % 256, (yy * 5) % 256, ((xx + yy) * 2) % 256], axis=2
        ).astype(np.uint8),
        "odd_size": (rng.rand(37, 29, 3) * 255).astype(np.uint8),
    }


# (image, quality, progressive, subsamp(1=420), restart)
CASES = [
    ("seq_gray", "noise_gray", 90, 0, 0, 0),
    ("seq_rgb444", "noise_rgb", 90, 0, 0, 0),
    ("seq_rgb420", "noise_rgb", 90, 0, 1, 0),
    ("seq_grad420_q50", "gradient", 50, 0, 1, 0),
    ("seq_odd444", "odd_size", 90, 0, 0, 0),
    ("seq_rgb420_rst2", "noise_rgb", 90, 0, 1, 2),
    ("seq_gray_rst1", "noise_gray", 90, 0, 0, 1),
    ("prog_gray", "noise_gray", 90, 1, 0, 0),
    ("prog_rgb444", "noise_rgb", 90, 1, 0, 0),
    ("prog_grad420", "gradient", 90, 1, 1, 0),
    ("prog_grad420_rst3", "gradient", 90, 1, 1, 3),
    ("prog_odd444_q30", "odd_size", 30, 1, 0, 0),
]


def main() -> None:
    build_shim()
    os.makedirs(OUT, exist_ok=True)
    imgs = images()
    for name, img_key, q, prog, sub, rst in CASES:
        img = imgs[img_key]
        gray = 1 if img.ndim == 2 else 0
        h, w = img.shape[:2]
        args = [SHIM, "encode", str(w), str(h), str(q), str(prog),
                str(gray), str(sub)]
        if rst:
            args.append(str(rst))
        enc = subprocess.run(args, input=img.tobytes(), capture_output=True)
        assert enc.returncode == 0, (name, enc.stderr)
        coef = subprocess.run([SHIM, "coef"], input=enc.stdout,
                              capture_output=True)
        assert coef.returncode == 0, (name, coef.stderr)
        with open(os.path.join(OUT, f"{name}.jpg"), "wb") as f:
            f.write(enc.stdout)
        with gzip.open(os.path.join(OUT, f"{name}.coef.gz"), "wb") as f:
            f.write(coef.stdout)
        print(f"{name}: {len(enc.stdout)} jpg bytes")


if __name__ == "__main__":
    sys.exit(main())
