"""ISO-BMFF (MP4) container parsing: box-walker structure, field
offsets (v0/v1, largesize), robustness on garbage, and the Spark-side
video_metadata / sample_frames integration over real containers."""

from __future__ import annotations

import struct

import pytest

from letarette_spark.functions.mp4 import (
    _box,
    parse_mp4,
    write_minimal_mp4,
)


def test_roundtrip_metadata():
    data = write_minimal_mp4(
        width=320, height=240, n_frames=50, fps=25, codec="avc1",
        mdat=b"\x01\x02" * 100,
    )
    meta = parse_mp4(data)
    assert meta["brand"] == "isom"
    assert meta["duration_ms"] == 2000
    (trk,) = meta["tracks"]
    assert trk == {
        "kind": "video", "codec": "avc1", "width": 320, "height": 240,
        "n_samples": 50, "duration_ms": 2000, "fps": 25.0,
    }


def test_not_mp4_returns_none():
    assert parse_mp4(b"") is None
    assert parse_mp4(b"\x00" * 100) is None
    assert parse_mp4(b"ftypmoov") is None
    # a valid PNG/JPEG magic is not a container either
    assert parse_mp4(b"\x89PNG\r\n\x1a\n" + b"\x00" * 50) is None


def test_truncation_is_safe():
    data = write_minimal_mp4()
    for cut in range(0, len(data)):
        parse_mp4(data[:cut])  # must never raise
    # corrupt every single byte position
    for pos in range(0, len(data)):
        mutated = bytearray(data)
        mutated[pos] ^= 0xFF
        parse_mp4(bytes(mutated))  # must never raise
    # size fields rewritten to lie about their box extents
    for pos in range(0, len(data) - 4, 4):
        mutated = bytearray(data)
        mutated[pos : pos + 4] = struct.pack(">I", 9)
        parse_mp4(bytes(mutated))
    # an mvhd whose body is empty (the repro that used to IndexError)
    assert parse_mp4(_box("moov", _box("mvhd", b"")) + b"") is None
    assert parse_mp4(_box("moov", _box("mvhd", b"\x00\x00\x00"))) is None


def test_largesize_and_v1_boxes():
    # a 64-bit largesize mdat wrapping, and version-1 mvhd (64-bit times)
    mvhd_v1 = _box(
        "mvhd",
        struct.pack(">B3xQQ", 1, 0, 0)
        + struct.pack(">IQ", 600, 1200)  # timescale 600, duration 1200
        + b"\x00" * 80,
    )
    moov = _box("moov", mvhd_v1)
    mdat_payload = b"x" * 10
    largesize_mdat = (
        struct.pack(">I", 1) + b"mdat"
        + struct.pack(">Q", 16 + len(mdat_payload)) + mdat_payload
    )
    meta = parse_mp4(_box("ftyp", b"mp42" + b"\x00" * 8) + moov + largesize_mdat)
    assert meta["brand"] == "mp42"
    assert meta["duration_ms"] == 2000  # 1200 / 600 s


def test_size_zero_box_extends_to_end():
    moov = _box("moov", _box("mvhd", struct.pack(">B3xII", 0, 0, 0)
                             + struct.pack(">II", 1000, 3000) + b"\x00" * 80))
    # mdat with size 0: runs to end of file
    tail = struct.pack(">I", 0) + b"mdat" + b"y" * 33
    meta = parse_mp4(moov + tail)
    assert meta["duration_ms"] == 3000


def test_video_metadata_over_real_containers(spark):
    from letarette_spark.functions.multimodal import (
        sample_frames,
        synthesize_media,
        video_metadata,
    )

    media = synthesize_media(spark, 30).cache()
    vids = {r["media_id"]: r for r in video_metadata(media).collect()}
    assert vids, "corpus must contain videos"
    for mid, r in vids.items():
        # every synthesized video is a REAL ISO-BMFF container; most are
        # opaque avc1, every third is a genuine MJPEG track
        assert r["container"] == "isom", r
        assert r["codec"] == ("jpeg" if mid % 9 == 2 else "avc1")
        assert r["width"] and r["height"]
        assert r["n_frames"] >= 1
        assert r["fps"] in (10.0, 15.0, 20.0)

    # the sampling grid respects the real frame count from stts
    frames = sample_frames(media, every_ms=100).collect()
    by_id: dict = {}
    for f in frames:
        by_id.setdefault(f["media_id"], 0)
        by_id[f["media_id"]] += 1
    for mid, cnt in by_id.items():
        assert cnt <= vids[mid]["n_frames"], (mid, cnt, vids[mid]["n_frames"])

    # metadata columns survive for a non-container payload: nothing fake
    # is invented (container=None)
    import pandas as pd

    from letarette_spark.functions.multimodal import MEDIA_SCHEMA

    raw = spark.createDataFrame(
        pd.DataFrame(
            [
                {
                    "media_id": 999, "kind": "video", "mime": "video/raw",
                    "data": b"\x00" * 64, "width": 10, "height": 10,
                    "sample_rate": None, "duration_ms": 1500,
                }
            ],
            columns=[f.name for f in MEDIA_SCHEMA.fields],
        ),
        schema=MEDIA_SCHEMA,
    )
    (r,) = video_metadata(raw).collect()
    assert r["container"] is None and r["codec"] is None
    assert r["width"] == 10 and r["duration_ms"] == 1500
    assert r["n_frames"] is None and r["fps"] is None
