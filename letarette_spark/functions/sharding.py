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
    """Vectorized shard assignment column."""

    @F.pandas_udf(T.IntegerType())
    def _shard(ids: pd.Series) -> pd.Series:
        return ids.map(lambda s: fnv1a32(s) % group_size)

    return _shard(F.col(doc_id_col))
