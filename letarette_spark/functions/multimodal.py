"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing — schemas, Arrow batch shapes, mapInPandas
signatures, partitioning — is real and tested, and so is the decode step
for struct-layout formats: 24-bit BMP images and PCM-16 WAV audio are
decoded with pure numpy (functions/codecs.py — actual pixels/samples
feed mean-luma, aHash, nearest-neighbor resize, RMS and duration).

Formats that genuinely need external codecs (JPEG, MP4, ...) fall back to
a clearly-marked DETERMINISTIC FAKE (features derived from sha256 of the
payload): pipelines, joins and tests behave exactly as they would with a
real decoder, and plugging one in is a one-function change
(`set_decoder`). Calling `require_real_decoder()` raises
NotImplementedError to make that boundary explicit.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),      # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("data", T.BinaryType(), False),       # opaque payload
        T.StructField("width", T.IntegerType(), True),      # images/video
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),  # audio
        T.StructField("duration_ms", T.IntegerType(), True),  # audio/video
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_luma", T.DoubleType(), False),
        T.StructField("phash", T.LongType(), False),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def _fake_decode_image(data: bytes) -> dict:
    """Deterministic fake decode: stats derived from sha256(data)."""
    h = hashlib.sha256(data).digest()
    return {
        "mean_luma": int.from_bytes(h[:4], "big") / 0xFFFFFFFF,
        "phash": int.from_bytes(h[4:12], "big", signed=True),
    }


def default_decode_image(data: bytes) -> dict:
    """REAL decode for BMP, PNG and baseline-JPEG payloads (pure
    numpy/stdlib — see codecs.py and jpeg.py); deterministic fake for
    anything else. mean_luma is normalized to [0, 1]; phash is the
    classic 64-bit average hash over actual pixels."""
    from letarette_spark.functions.codecs import average_hash64, decode_image, luma

    px = decode_image(data)
    if px is None:
        return _fake_decode_image(data)
    return {
        "mean_luma": float(luma(px).mean() / 255.0),
        "phash": average_hash64(px),
        "width": int(px.shape[1]),
        "height": int(px.shape[0]),
    }


_DECODER: Callable[[bytes], dict] = default_decode_image


def set_decoder(fn: Callable[[bytes], dict]) -> None:
    global _DECODER
    _DECODER = fn


def require_real_decoder() -> None:
    """The explicit stub boundary for CODEC-level decode still missing
    here: H.264/H.265 frame pixels. BMP, PNG, baseline, progressive AND
    arithmetic-coded JPEG (huffman + QM-coded SOF9/SOF10), and PCM WAV
    decode for real (codecs.py, jpeg.py, jpeg_arith.py) and MP4
    CONTAINER structure parses for real (mp4.py: duration, tracks,
    codec fourcc, dimensions, frame count) — only the
    compressed-video-frame pixel decode is faked."""
    raise NotImplementedError(
        "real video frame decoding requires ffmpeg, not present here; "
        "install one and call set_decoder()"
    )


def synthesize_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media corpus (payload = seeded pseudo-bytes)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.default_rng((seed << 32) ^ i)
                kind = kinds[i % 3]
                width = 64 + (i % 16) * 8 if kind != "audio" else None
                height = 48 + (i % 12) * 8 if kind != "audio" else None
                duration = 1000 + i % 9000 if kind != "image" else None
                if kind == "video":
                    # REAL ISO-BMFF container (mp4.py) around opaque
                    # frame payload bytes — the parse path downstream
                    # exercises genuine box structure
                    from letarette_spark.functions.mp4 import write_minimal_mp4

                    fps = 10 + (i % 3) * 5
                    data = write_minimal_mp4(
                        width=width,
                        height=height,
                        n_frames=max(1, duration * fps // 1000),
                        fps=fps,
                        mdat=rng.integers(
                            0, 256, size=256 + (i % 512), dtype=np.uint8
                        ).tobytes(),
                    )
                else:
                    data = rng.integers(
                        0, 256, size=256 + (i % 512), dtype=np.uint8
                    ).tobytes()
                rows.append(
                    {
                        "media_id": i,
                        "kind": kind,
                        "mime": {"image": "image/fake", "audio": "audio/fake",
                                 "video": "video/mp4"}[kind],
                        "data": data,
                        "width": width,
                        "height": height,
                        "sample_rate": 16000 if kind == "audio" else None,
                        "duration_ms": duration,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    par = max(spark.sparkContext.defaultParallelism, 2)
    return spark.range(0, n, numPartitions=par).mapInPandas(gen, schema=MEDIA_SCHEMA)


def image_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode -> per-image features. The decoder runs once
    per row inside the batch; heavy payloads stay columnar in Arrow."""

    def feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                d = _DECODER(bytes(r.data))
                rows.append(
                    {
                        "media_id": r.media_id,
                        # a real decode is authoritative over the metadata
                        "width": d.get("width", r.width),
                        "height": d.get("height", r.height),
                        "mean_luma": float(d["mean_luma"]),
                        "phash": int(d["phash"]),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "width", "height", "data")
        .mapInPandas(feat, schema=IMAGE_FEATURES_SCHEMA)
    )


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """(media_id, data): REAL nearest-neighbor resize for BMP/PNG/JPEG
    payloads (decode -> numpy index resize -> re-encode BMP); other
    formats get the deterministic fake payload (sha of payload + target
    dims)."""

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("data", T.BinaryType(), False),
        ]
    )

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from letarette_spark.functions.codecs import (
            decode_image, encode_bmp, resize_nearest,
        )

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = decode_image(bytes(r.data))
                if px is not None:
                    out = encode_bmp(resize_nearest(px, width, height))
                else:
                    h = hashlib.sha256(
                        bytes(r.data) + f"{width}x{height}".encode()
                    ).digest()
                    out = h * 4
                rows.append({"media_id": r.media_id, "data": out})
            yield pd.DataFrame(rows, columns=["media_id", "data"])

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "data")
        .mapInPandas(rs, schema=out_schema)
    )


VIDEO_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("container", T.StringType(), True),   # brand, or None=not ISO-BMFF
        T.StructField("codec", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("fps", T.DoubleType(), True),
    ]
)


def video_metadata(media: DataFrame) -> DataFrame:
    """REAL ISO-BMFF container parse (mp4.py): brand, video-track codec
    fourcc, dimensions, duration, frame count, fps. Payloads that are
    not MP4 containers keep the column metadata with container=None —
    nothing is faked here."""

    def vm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from letarette_spark.functions.mp4 import parse_mp4

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                meta = parse_mp4(bytes(r.data))
                vt = None
                if meta is not None:
                    vts = [t for t in meta["tracks"] if t["kind"] == "video"]
                    vt = vts[0] if vts else None
                rows.append(
                    {
                        "media_id": r.media_id,
                        "container": meta["brand"] if meta else None,
                        "codec": vt["codec"] if vt else None,
                        "width": (vt or {}).get("width") or r.width,
                        "height": (vt or {}).get("height") or r.height,
                        "duration_ms": (meta or {}).get("duration_ms")
                        or r.duration_ms,
                        "n_frames": (vt or {}).get("n_samples"),
                        "fps": (vt or {}).get("fps"),
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in VIDEO_META_SCHEMA.fields]
            )

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "width", "height", "duration_ms", "data")
        .mapInPandas(vm, schema=VIDEO_META_SCHEMA)
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling plumbing: one output row per sampled frame —
    demonstrates the 1->N mapInPandas fan-out a real ffmpeg sampler
    uses. For MP4 payloads the sampling GRID is real (frame count and
    timing from the parsed stts/mdhd boxes); the frame PIXELS are the
    documented fake boundary (codec decode needs ffmpeg —
    require_real_decoder)."""

    def fs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from letarette_spark.functions.mp4 import parse_mp4

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                meta = parse_mp4(bytes(r.data))
                duration = (meta or {}).get("duration_ms") or int(
                    r.duration_ms or 0
                )
                n_frames = max(1, duration // every_ms)
                if meta is not None:
                    vts = [
                        t for t in meta["tracks"]
                        if t["kind"] == "video" and t["n_samples"]
                    ]
                    if vts:  # can't sample more frames than the track has
                        n_frames = min(n_frames, vts[0]["n_samples"])
                base = hashlib.sha256(bytes(r.data)).digest()
                for i in range(n_frames):
                    rows.append(
                        {
                            "media_id": r.media_id,
                            "frame_idx": i,
                            "frame": hashlib.sha256(base + i.to_bytes(4, "big")).digest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "duration_ms", "data")
        .mapInPandas(fs, schema=FRAME_SCHEMA)
    )


def audio_features(media: DataFrame) -> DataFrame:
    """(media_id, duration_ms, rms) — REAL sample math for PCM-16 WAV
    payloads (duration from sample count / rate, RMS over normalized
    samples); fake rms from the payload hash otherwise."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("duration_ms", T.IntegerType(), True),
            T.StructField("rms", T.DoubleType(), False),
        ]
    )

    def af(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from letarette_spark.functions.codecs import decode_wav

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                dec = decode_wav(bytes(r.data))
                if dec is not None:
                    samples, rate = dec
                    rows.append(
                        {
                            "media_id": r.media_id,
                            "duration_ms": int(len(samples) * 1000 / rate),
                            "rms": float(np.sqrt((samples ** 2).mean()))
                            if len(samples) else 0.0,
                        }
                    )
                    continue
                h = hashlib.sha256(bytes(r.data)).digest()
                rows.append(
                    {
                        "media_id": r.media_id,
                        "duration_ms": r.duration_ms,
                        "rms": int.from_bytes(h[8:12], "big") / 0xFFFFFFFF,
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "duration_ms", "rms"])

    return (
        media.filter(F.col("kind") == "audio")
        .select("media_id", "duration_ms", "data")
        .mapInPandas(af, schema=out_schema)
    )
