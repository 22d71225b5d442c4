"""Delta + varbyte (LEB128) codec for posting blocks, numpy-vectorized.

FTS5 stores doclists as varint-encoded rowid deltas inside segment B-tree
pages (public file-format documentation); our blocks table stores the same
delta+varbyte idea as parquet binary columns. Encode/decode run inside
Arrow batches — no per-row Python in the scan path.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_SEVEN = _U64(7)
_MASK = _U64(0x7F)
_CONT = np.uint8(0x80)


def encode_u64(values: np.ndarray) -> bytes:
    """LEB128-encode an array of uint64."""
    v = values.astype(_U64, copy=True)
    n = len(v)
    if n == 0:
        return b""
    # byte length per value: ceil(bits/7), min 1
    bits = np.zeros(n, dtype=np.int64)
    tmp = v.copy()
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        bits[nz] += 1
        tmp = tmp >> _SEVEN
    lengths = np.maximum(bits, 1)
    ends = np.cumsum(lengths)
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    starts = ends - lengths
    work = v.copy()
    max_len = int(lengths.max())
    for j in range(max_len):
        sel = lengths > j
        pos = starts[sel] + j
        byte = (work[sel] & _MASK).astype(np.uint8)
        cont = (j + 1 < lengths[sel]).astype(np.uint8) * _CONT
        out[pos] = byte | cont
        work[sel] = work[sel] >> _SEVEN
    return out.tobytes()


def decode_u64(data: bytes) -> np.ndarray:
    """Decode LEB128 bytes back to a uint64 array."""
    if not data:
        return np.empty(0, dtype=_U64)
    b = np.frombuffer(data, dtype=np.uint8)
    is_end = (b & _CONT) == 0
    ends = np.flatnonzero(is_end)
    starts = np.concatenate(([0], ends[:-1] + 1))
    lengths = ends - starts + 1
    n = len(ends)
    out = np.zeros(n, dtype=_U64)
    max_len = int(lengths.max())
    payload = (b & np.uint8(0x7F)).astype(_U64)
    for j in range(max_len):
        sel = lengths > j
        out[sel] |= payload[starts[sel] + j] << (_SEVEN * _U64(j))
    return out


_BIAS = np.uint64(1 << 63)


def encode_rowids(rowids: np.ndarray) -> bytes:
    """Sorted signed-64 rowids -> bias-to-unsigned -> delta -> varbyte."""
    u = rowids.astype(np.int64).astype(_U64) + _BIAS
    deltas = np.empty_like(u)
    deltas[0] = u[0]
    deltas[1:] = u[1:] - u[:-1]
    return encode_u64(deltas)


def decode_rowids(data: bytes) -> np.ndarray:
    deltas = decode_u64(data)
    if len(deltas) == 0:
        return np.empty(0, dtype=np.int64)
    u = np.cumsum(deltas, dtype=_U64)
    return (u - _BIAS).astype(np.int64)


def encode_ints(values: np.ndarray) -> bytes:
    """Small non-negative ints (tf counts) -> varbyte."""
    return encode_u64(np.asarray(values, dtype=np.int64).astype(_U64))


def decode_ints(data: bytes) -> np.ndarray:
    return decode_u64(data).astype(np.int64)
