"""compress / uncompress / iscompressed — the reference's document
compression functions (vendored sqlite compress extension,
internal/compress/compress.c), re-exposed as Spark column functions.

Container format (bit-compatible with the reference, verified against the
compiled extension — tests/compress_goldens.py):

    byte 0          magic 0xf8 (not valid UTF-8 — cheap detection)
    bytes 1..k      original size as a 1-5 byte varint: 7 bits per byte,
                    most-significant bits first, the LAST byte has 0x80 set
    rest            standard zlib stream (RFC 1950 deflate)

``uncompress`` returns its input unchanged when the header doesn't parse
or inflation fails — exactly the reference's "return the input if it is
not in zlib format" behavior, which is what makes mixed compressed /
uncompressed document columns safe to read uniformly. Reference quirks
preserved: a zero-length original is never "compressed" (the varint
value 0 fails the gate, compress.c:146 — compress(b'') round-trips to
the container blob, not to b''), and the zlib header bytes themselves
are validated, not just the 0xf8 magic. One deliberate softening: where
the reference raises an SQL error for a size-mismatched inflate, this
returns the input unchanged (a hostile blob should not kill a Spark
job).

The zlib payload bytes may differ between producers (compression level is
not part of the contract); interop is at the container level: each side
inflates the other's streams. At index scale the parquet/zstd codec does
the heavy lifting (COVERAGE.md §2.7); these functions exist for
reference-format blob columns flowing through pipelines.
"""

from __future__ import annotations

import zlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MAGIC = 0xF8


def _encode_size(n: int) -> bytes:
    # 5 seven-bit groups, MSB first; strip leading zero groups (always
    # keep the last); 0x80 flags the final byte
    x = [(n >> (7 * (4 - i))) & 0x7F for i in range(5)]
    i = 0
    while i < 4 and x[i] == 0:
        i += 1
    out = x[i:]
    out[-1] |= 0x80
    return bytes(out)


def _decode_size(b: bytes) -> tuple[int, int] | None:
    """(size, payload_offset) or None when the container is not a
    compress() blob. Mirrors the reference's gate exactly
    (compress.c:131-150 + isValidHeader): magic, terminated varint, a
    NON-ZERO original size, and a valid zlib header (0x78 with the
    RFC-1950 check bytes) right after the varint — so empty-input blobs
    and 0xf8-leading garbage are both "not compressed" and pass through,
    as in the reference."""
    if len(b) < 1 or b[0] != _MAGIC:
        return None
    n = 0
    i = 1
    while i < len(b) and i < 6:
        n = (n << 7) | (b[i] & 0x7F)
        if b[i] & 0x80:
            i += 1
            break
        i += 1
    # NB: like the C, an unterminated varint still proceeds with i at the
    # 6th byte — the zlib-header check is what gates it
    if n == 0:
        return None
    if len(b) < i + 2 or b[i] != 0x78 or (b[i] * 256 + b[i + 1]) % 31 != 0:
        return None
    return n, i


def compress_bytes(data: bytes | None) -> bytes | None:
    if data is None:
        return None
    return bytes([_MAGIC]) + _encode_size(len(data)) + zlib.compress(data)


def uncompress_bytes(data: bytes | None) -> bytes | None:
    """Inflate a compress()-format blob; pass anything else through.
    Like the C uncompress() into a size-n buffer: inflating to FEWER
    bytes than the varint claims still succeeds (short output returned);
    a stream needing more than n, or a corrupt stream, passes the input
    through (the reference raises an SQL error for the former — softened
    here so hostile blobs can't kill a Spark job)."""
    if data is None:
        return None
    hdr = _decode_size(data)
    if hdr is None:
        return data
    size, off = hdr
    try:
        d = zlib.decompressobj()
        out = d.decompress(data[off:], size)
        if not d.eof or d.unconsumed_tail:
            return data  # stream larger than the declared buffer
    except zlib.error:
        return data
    return out


def is_compressed_bytes(data: bytes | None) -> bool:
    if data is None:
        return False
    return _decode_size(data) is not None


def compress_expr(col: str) -> Column:
    @F.pandas_udf(T.BinaryType())
    def _c(s: pd.Series) -> pd.Series:
        return s.map(compress_bytes)

    return _c(F.col(col))


def uncompress_expr(col: str) -> Column:
    @F.pandas_udf(T.BinaryType())
    def _u(s: pd.Series) -> pd.Series:
        return s.map(uncompress_bytes)

    return _u(F.col(col))


def is_compressed_expr(col: str) -> Column:
    @F.pandas_udf(T.BooleanType())
    def _i(s: pd.Series) -> pd.Series:
        return s.map(is_compressed_bytes)

    return _i(F.col(col))
