"""Token-window document chunking — the sequence-prep step of a training
pipeline (long documents → overlapping fixed-budget chunks).

Chunks are windows over the simple-analyzer token array (the same token
definition every relational operator here uses), joined with single
spaces: normalized token text, which is what tokenizer-bound consumers
feed anyway. Start positions advance by ``max_tokens - overlap``; window
generation stops once a start would only re-cover the previous chunk's
overlap (no degenerate fully-contained tails). Zero-token documents
yield no chunks.

Scale shape: pure JVM array intrinsics (token split → sequence of starts
→ slice per start) + one posexplode — linear, zero shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from letarette_spark.functions.simple_text import token_array


def chunk_documents(
    df: DataFrame,
    max_tokens: int = 256,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, chunk_idx, chunk, n_tokens) — one row per token window.

    chunk_idx is 0-based in document order; the final chunk may be
    shorter than max_tokens but always extends past the previous chunk's
    overlap region."""
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    if not 0 <= overlap < max_tokens:
        raise ValueError(
            f"overlap must be in [0, max_tokens), got {overlap}"
        )
    step = max_tokens - overlap
    arr = token_array(text_col)
    size = F.size(arr)
    # last admissible start: a window starting later would only re-cover
    # the previous window's overlap
    last_start = F.greatest(size - overlap - 1, F.lit(0))
    starts = F.when(size > 0, F.sequence(F.lit(0), last_start, F.lit(step))) \
        .otherwise(F.array().cast("array<int>"))
    chunks = F.transform(
        starts,
        lambda s: F.slice(arr, (s + 1).cast("int"), max_tokens),
    )
    return (
        df.select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "__c"))
        .select(
            id_col,
            "chunk_idx",
            F.array_join("__c", " ").alias("chunk"),
            F.size("__c").cast("long").alias("n_tokens"),
        )
    )
