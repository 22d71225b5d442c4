"""Document sharding: FNV-1a32(docID) % group_size, bit-compatible with the
reference (internal/letarette/sharding.go:27-38) — required if per-shard
result caps are ever to be reproduced against a sharded Letarette cluster.

FNV-1a is a public-domain hash: offset basis 2166136261, prime 16777619,
xor-then-multiply per byte, 32-bit wrap.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

FNV_OFFSET = 2166136261
FNV_PRIME = 16777619
_MASK = 0xFFFFFFFF


def fnv1a32(s: str) -> int:
    h = FNV_OFFSET
    for b in s.encode("utf-8"):
        h = ((h ^ b) * FNV_PRIME) & _MASK
    return h


def shard_of(doc_id: str, group_size: int) -> int:
    return fnv1a32(doc_id) % group_size


def shard_expr(doc_id_col: str, group_size: int) -> Column:
    """Vectorized shard assignment column: numpy FNV-1a over a padded
    byte matrix — the per-byte recurrence loops over byte POSITIONS
    (bounded by the longest id), each step vectorized across all rows;
    uint32 arithmetic wraps natively."""

    @F.pandas_udf(T.IntegerType())
    def _shard(ids: pd.Series) -> pd.Series:
        import numpy as np

        bs = [s.encode("utf-8") for s in ids]
        n = len(bs)
        if n == 0:
            return pd.Series([], dtype="int32")
        lens = np.fromiter((len(b) for b in bs), dtype=np.int64, count=n)
        maxlen = int(lens.max(initial=0))
        h = np.full(n, FNV_OFFSET, dtype=np.uint32)
        if maxlen:
            arr = np.zeros((n, maxlen), dtype=np.uint8)
            mask = np.arange(maxlen)[None, :] < lens[:, None]
            arr[mask] = np.frombuffer(b"".join(bs), dtype=np.uint8)
            prime = np.uint32(FNV_PRIME)
            for j in range(maxlen):
                active = lens > j
                nh = (h ^ arr[:, j].astype(np.uint32)) * prime
                h = np.where(active, nh, h)
        return pd.Series((h % np.uint32(group_size)).astype(np.int32))

    return _shard(F.col(doc_id_col))
