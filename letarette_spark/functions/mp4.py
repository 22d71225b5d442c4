"""ISO base-media (MP4/MOV) CONTAINER parsing — pure stdlib.

The reference treats media strictly as opaque payloads; the brief asks
for first-class multimodal columns, so this module makes the video
boundary substantially real: the container structure (ISO/IEC 14496-12
box tree) is parsed for real — duration, track layout, codec fourcc,
visual dimensions, frame count, fps — while the codec-level frame
DECODE (H.264 etc.) stays behind multimodal.require_real_decoder.

Parsed boxes: ftyp (brand), moov/mvhd (timescale+duration, v0 and v1),
trak/tkhd (16.16-fixed width/height), mdia/mdhd (per-track timescale),
hdlr (vide/soun classification), minf/stbl/stsd (sample-entry fourcc +
visual width/height), stts (sample count = frame count), and the sample
addressing tables stsz/stsc/stco/co64 (video_sample_ranges resolves
every sample to its absolute (offset, size) byte range in the file —
the extraction step a frame sampler needs; for intra-coded codecs like
MJPEG each extracted sample is a complete decodable image).

write_minimal_mp4 builds a tiny valid container (used by the synthetic
media corpus and the tests) so the parse path is exercised on real
bytes, not mocks.
"""

from __future__ import annotations

import struct
from typing import Iterator


def _walk(data: bytes, start: int, end: int) -> Iterator[tuple[str, int, int]]:
    """Yield (fourcc, body_start, body_end) for each box in [start, end)."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack_from(">I", data, pos)[0]
        fourcc = data[pos + 4 : pos + 8].decode("latin-1")
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                return
            size = struct.unpack_from(">Q", data, pos + 8)[0]
            body = pos + 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < 8 or pos + size > end:
            return
        yield fourcc, body, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, fourcc: str):
    for fc, b, e in _walk(data, start, end):
        if fc == fourcc:
            return b, e
    return None


_CONTAINERS = ("moov", "trak", "mdia", "minf", "stbl")


def parse_mp4(data: bytes) -> dict | None:
    """Parse an ISO-BMFF container. Returns None when the payload is not
    one (no well-formed ftyp/moov at top level) OR when the box contents
    are truncated/malformed — this function NEVER raises (crawled
    corpora are full of cut-off files; one must not kill a Spark task)."""
    try:
        return _parse_mp4_inner(data)
    except (IndexError, struct.error, ValueError, ZeroDivisionError):
        return None


def _parse_mp4_inner(data: bytes) -> dict | None:
    n = len(data)
    top = list(_walk(data, 0, n))
    if not any(fc == "moov" for fc, _, _ in top):
        return None
    out: dict = {"brand": None, "duration_ms": None, "tracks": []}
    for fc, b, e in top:
        if fc == "ftyp" and e - b >= 4:
            out["brand"] = data[b : b + 4].decode("latin-1").strip()
        elif fc == "moov":
            _parse_moov(data, b, e, out)
    if out["duration_ms"] is None and not out["tracks"]:
        return None
    return out


def _parse_moov(data: bytes, start: int, end: int, out: dict) -> None:
    for fc, b, e in _walk(data, start, end):
        if fc == "mvhd":
            version = data[b]
            if version == 1:
                timescale, duration = struct.unpack_from(">IQ", data, b + 20)
            else:
                timescale, duration = struct.unpack_from(">II", data, b + 12)
            if timescale:
                out["duration_ms"] = int(duration * 1000 / timescale)
        elif fc == "trak":
            trk = _parse_trak(data, b, e)
            if trk is not None:
                out["tracks"].append(trk)


def _parse_trak(data: bytes, start: int, end: int) -> dict | None:
    trk: dict = {
        "kind": None, "codec": None, "width": None, "height": None,
        "n_samples": None, "duration_ms": None, "fps": None,
    }
    tkhd = _find(data, start, end, "tkhd")
    if tkhd is not None:
        b, _e = tkhd
        version = data[b]
        # width/height are the trailing 16.16 fixed-point fields:
        # v0 body offset 76, v1 (64-bit times) offset 88
        off = b + (88 if version == 1 else 76)
        try:
            w_fx, h_fx = struct.unpack_from(">II", data, off)
            if w_fx or h_fx:
                trk["width"] = w_fx >> 16
                trk["height"] = h_fx >> 16
        except struct.error:
            pass
    mdia = _find(data, start, end, "mdia")
    if mdia is None:
        return trk
    mb, me = mdia
    timescale = None
    duration = None
    for fc, b, e in _walk(data, mb, me):
        if fc == "mdhd":
            version = data[b]
            if version == 1:
                timescale, duration = struct.unpack_from(">IQ", data, b + 20)
            else:
                timescale, duration = struct.unpack_from(">II", data, b + 12)
        elif fc == "hdlr":
            handler = data[b + 8 : b + 12]
            trk["kind"] = {b"vide": "video", b"soun": "audio"}.get(
                handler, handler.decode("latin-1")
            )
        elif fc == "minf":
            stbl = _find(data, b, e, "stbl")
            if stbl is not None:
                _parse_stbl(data, stbl[0], stbl[1], trk)
    if timescale:
        trk["duration_ms"] = int((duration or 0) * 1000 / timescale)
        if trk["n_samples"] and duration:
            trk["fps"] = round(trk["n_samples"] * timescale / duration, 3)
    return trk


def _parse_stbl(data: bytes, start: int, end: int, trk: dict) -> None:
    for fc, b, e in _walk(data, start, end):
        if fc == "stsd":
            count = struct.unpack_from(">I", data, b + 4)[0]
            if count >= 1 and b + 16 <= e:
                # first sample entry: 32-bit size + fourcc
                trk["codec"] = data[b + 12 : b + 16].decode("latin-1")
                # visual sample entries carry width/height at +24/+26
                # past the entry header (ISO 14496-12 §12.1.3)
                if trk["width"] is None and b + 44 <= e:
                    w, h = struct.unpack_from(">HH", data, b + 40)
                    if 0 < w <= 16384 and 0 < h <= 16384:
                        trk["width"], trk["height"] = w, h
        elif fc == "stts":
            n_entries = struct.unpack_from(">I", data, b + 4)[0]
            total = 0
            for i in range(n_entries):
                off = b + 8 + i * 8
                if off + 8 > e:
                    break
                cnt, _delta = struct.unpack_from(">II", data, off)
                total += cnt
            trk["n_samples"] = total


# ---------------------------------------------------------------------------
# Sample addressing (ISO 14496-12 §8.7): stsz sizes + stsc sample->chunk
# runs + stco/co64 chunk offsets resolve every sample to an absolute byte
# range. This is real extraction — a frame of an MJPEG track sliced out
# with these ranges is a complete JPEG that jpeg.py decodes to pixels.
# ---------------------------------------------------------------------------


def _stbl_of_track(data: bytes, kind: str, index: int):
    """(stbl_start, stbl_end) of the index-th track whose hdlr matches
    *kind* ('video'/'audio'), or None."""
    want = {"video": b"vide", "audio": b"soun"}.get(kind)
    top = list(_walk(data, 0, len(data)))
    seen = 0
    for fc, b, e in top:
        if fc != "moov":
            continue
        for fc2, tb, te in _walk(data, b, e):
            if fc2 != "trak":
                continue
            mdia = _find(data, tb, te, "mdia")
            if mdia is None:
                continue
            hdlr = _find(data, mdia[0], mdia[1], "hdlr")
            if hdlr is None or data[hdlr[0] + 8 : hdlr[0] + 12] != want:
                continue
            if seen == index:
                minf = _find(data, mdia[0], mdia[1], "minf")
                if minf is None:
                    return None
                return _find(data, minf[0], minf[1], "stbl")
            seen += 1
    return None


def video_sample_ranges(
    data: bytes, track_index: int = 0, kind: str = "video"
) -> list[tuple[int, int]]:
    """Absolute (offset, size) byte range of every sample in the chosen
    track, in sample order. Returns [] for payloads that are not ISO-BMFF
    or whose sample tables are missing/truncated/out-of-bounds — NEVER
    raises (fuzz-tested like parse_mp4; crawled corpora are hostile)."""
    try:
        return _sample_ranges_inner(data, track_index, kind)
    except (IndexError, struct.error, ValueError, OverflowError):
        return []


def _sample_ranges_inner(data: bytes, track_index: int, kind: str):
    stbl = _stbl_of_track(data, kind, track_index)
    if stbl is None:
        return []
    sb, se = stbl
    sizes: list[int] | None = None
    chunk_offsets: list[int] | None = None
    stsc_runs: list[tuple[int, int]] | None = None  # (first_chunk, per_chunk)
    for fc, b, e in _walk(data, sb, se):
        if fc == "stsz":
            uniform, count = struct.unpack_from(">II", data, b + 4)
            if uniform:
                # uniform-size branch has no per-sample table to bounds-
                # check against the box, so sanity-cap the 32-bit count
                # against the whole file: count samples of size `uniform`
                # (or even 1 byte each) cannot exceed the payload — a
                # hostile count would otherwise allocate a multi-GB list
                # (MemoryError escapes the never-raise net) or send the
                # chunk walk through 4G iterations
                if count * max(uniform, 1) > len(data):
                    return []
                sizes = [uniform] * count
            else:
                if b + 12 + 4 * count > e:
                    return []
                sizes = list(struct.unpack_from(f">{count}I", data, b + 12))
        elif fc in ("stco", "co64"):
            count = struct.unpack_from(">I", data, b + 4)[0]
            w, fmt = (8, "Q") if fc == "co64" else (4, "I")
            if b + 8 + w * count > e:
                return []
            chunk_offsets = list(struct.unpack_from(f">{count}{fmt}", data, b + 8))
        elif fc == "stsc":
            count = struct.unpack_from(">I", data, b + 4)[0]
            if b + 8 + 12 * count > e:
                return []
            stsc_runs = []
            for i in range(count):
                first, per, _desc = struct.unpack_from(">III", data, b + 8 + 12 * i)
                if first < 1 or per < 1:
                    return []
                stsc_runs.append((first, per))
    if not sizes or not chunk_offsets or not stsc_runs:
        return []
    # expand stsc runs into per-chunk sample counts, walk chunks in order
    ranges: list[tuple[int, int]] = []
    si = 0
    n = len(data)
    for ci, coff in enumerate(chunk_offsets, start=1):
        per = 0
        for first, p in stsc_runs:
            if first <= ci:
                per = p
            else:
                break
        pos = coff
        for _ in range(per):
            if si >= len(sizes):
                return ranges
            sz = sizes[si]
            if pos + sz > n:  # truncated file: keep the samples we have
                return ranges
            ranges.append((pos, sz))
            pos += sz
            si += 1
    return ranges


def extract_samples(
    data: bytes, track_index: int = 0, kind: str = "video"
) -> list[bytes]:
    """The sample payload bytes themselves (convenience over
    video_sample_ranges). Never raises."""
    return [data[o : o + s] for o, s in video_sample_ranges(data, track_index, kind)]


# ---------------------------------------------------------------------------
# Minimal writer — enough structure for parse_mp4 and for any standard
# tool to recognize the container. Pass `samples` to embed real per-frame
# payloads with full stsz/stsc/stco addressing (e.g. JPEG frames from
# jpeg.encode_jpeg make a genuine MJPEG file); the bare `mdat` form keeps
# the opaque-payload synthesis side of the H.26x decode boundary.
# ---------------------------------------------------------------------------


def _box(fourcc: str, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc.encode("latin-1") + payload


def write_minimal_mp4(
    width: int = 64,
    height: int = 48,
    n_frames: int = 30,
    fps: int = 10,
    codec: str = "avc1",
    mdat: bytes = b"",
    samples: list[bytes] | None = None,
    samples_per_chunk: int = 4,
) -> bytes:
    """A tiny valid ISO-BMFF container: ftyp + moov(mvhd, one video trak
    with tkhd/mdhd/hdlr/minf/stbl(stsd, stts)) + mdat.

    With `samples`, each list element becomes one addressable sample:
    mdat carries their concatenation, grouped into chunks of
    `samples_per_chunk`, and the stbl gains stsz/stsc/stco with correct
    absolute offsets (n_frames is then len(samples))."""
    timescale = 1000
    if samples is not None:
        n_frames = len(samples)
        mdat = b"".join(samples)
    duration = int(n_frames * timescale / fps)

    mvhd = _box(
        "mvhd",
        struct.pack(">B3xII", 0, 0, 0)  # version, ctime, mtime
        + struct.pack(">II", timescale, duration)
        + struct.pack(">I", 0x00010000)  # rate 1.0
        + struct.pack(">H", 0x0100)      # volume
        + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),          # next track id
    )
    tkhd = _box(
        "tkhd",
        struct.pack(">B3xIII4x", 0, 0, 0, 1)  # v0, flags, times, track id
        + struct.pack(">I", duration)
        + b"\x00" * 16
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _box(
        "mdhd",
        struct.pack(">B3xII", 0, 0, 0)
        + struct.pack(">II", timescale, duration)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    hdlr = _box("hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 12 + b"video\x00")
    sample_entry = (
        struct.pack(">I", 86)
        + codec.encode("latin-1")
        + b"\x00" * 6
        + struct.pack(">H", 1)           # data ref index
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)           # frame count per sample
        + b"\x00" * 32
        + struct.pack(">H", 24)          # depth
        + struct.pack(">h", -1)
    )
    stsd = _box("stsd", struct.pack(">B3xI", 0, 1) + sample_entry)
    stts = _box(
        "stts",
        struct.pack(">B3xI", 0, 1)
        + struct.pack(">II", n_frames, timescale // fps),
    )
    def build(chunk_offsets: list[int]) -> bytes:
        tables = stsd + stts
        if samples is not None:
            per = max(1, samples_per_chunk)
            stsz = _box(
                "stsz",
                struct.pack(">B3xII", 0, 0, len(samples))
                + struct.pack(f">{len(samples)}I", *map(len, samples)),
            )
            # one stsc run covers all full chunks; a second covers the
            # short tail chunk (if any) — exercises multi-run resolution
            runs = [(1, per)]
            tail = len(samples) % per
            n_chunks = (len(samples) + per - 1) // per
            if tail and n_chunks > 1:
                runs.append((n_chunks, tail))
            stsc = _box(
                "stsc",
                struct.pack(">B3xI", 0, len(runs))
                + b"".join(struct.pack(">III", f, p, 1) for f, p in runs),
            )
            stco = _box(
                "stco",
                struct.pack(">B3xI", 0, len(chunk_offsets))
                + struct.pack(f">{len(chunk_offsets)}I", *chunk_offsets),
            )
            tables += stsz + stsc + stco
        stbl = _box("stbl", tables)
        minf = _box("minf", stbl)  # vmhd/dinf omitted: not needed to parse
        mdia = _box("mdia", mdhd + hdlr + minf)
        trak = _box("trak", tkhd + mdia)
        moov = _box("moov", mvhd + trak)
        ftyp = _box("ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
        return ftyp + moov + _box("mdat", mdat)

    if samples is None:
        return build([])
    # chunk offsets are absolute file positions inside mdat's body; the
    # moov size is independent of the offset VALUES (count is fixed), so
    # build once with placeholders to measure, then rebuild for real
    per = max(1, samples_per_chunk)
    n_chunks = (len(samples) + per - 1) // per
    placeholder = build([0] * n_chunks)
    base = len(placeholder) - len(mdat)  # mdat body starts here
    offsets, pos = [], base
    for c in range(n_chunks):
        offsets.append(pos)
        pos += sum(len(s) for s in samples[c * per : (c + 1) * per])
    return build(offsets)
