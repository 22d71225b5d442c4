"""Exact-substring span deduplication — remove long token spans that
repeat across the corpus (Lee et al., "Deduplicating Training Data Makes
Language Models Better": exact substring matching at ~50-token
granularity removes memorization-prone repeats that document-level
near-dup and line-level boilerplate both miss).

The published method builds a suffix array over the concatenated corpus;
that is inherently sequential. The distributed reformulation here works
at fixed window granularity: hash every L-token window (rolling shingle),
count window hashes across the corpus, and strip every token covered by
a window whose hash repeats (count >= min_count, so the default
min_count=2 removes a span on its second occurrence). A span of R repeated
tokens (R >= L) is covered by R-L+1 repeated windows, so entire repeated
regions are removed while unique text — including unique text BETWEEN
two repeated regions — survives. Granularity L trades recall (shorter
repeats survive) against false positives (hash collisions; md5 makes
them negligible and cross-engine identical).

Scale shape: window hashing is per-doc array arithmetic (zero shuffle);
the corpus-wide repeat table is one partial-agg shuffle keyed by window
hash; flagging is one hash join from exploded windows to that table and
one groupBy(doc) to collect flagged starts; the strip itself is pure
per-row array logic. Nothing quadratic, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from letarette_spark.functions.simple_text import token_array


def _windows(arr, L: int):
    """array<struct<start,whash>> — md5 of each L-token window, 0-based
    start positions; docs shorter than L yield an empty array."""
    n = F.size(arr)
    starts = F.when(
        n >= L, F.sequence(F.lit(0), n - L, F.lit(1))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        starts,
        lambda s: F.struct(
            s.cast("int").alias("start"),
            F.md5(
                F.array_join(F.slice(arr, (s + 1).cast("int"), L), " ")
            ).alias("whash"),
        ),
    )


def repeated_spans(
    df: DataFrame,
    span_tokens: int = 16,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(whash, n_occurrences, n_docs) — L-token windows that appear at
    least *min_count* times corpus-wide (the repeat table; the audit view
    of what strip_repeated_spans would remove)."""
    if span_tokens < 1:
        raise ValueError(f"span_tokens must be >= 1, got {span_tokens}")
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    w = df.select(
        F.col(id_col),
        F.explode(_windows(token_array(text_col), span_tokens)).alias("w"),
    )
    return (
        w.groupBy(F.col("w.whash").alias("whash"))
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct(id_col).alias("n_docs"),
        )
        .filter(F.col("n_occurrences") >= min_count)
    )


def strip_repeated_spans(
    df: DataFrame,
    span_tokens: int = 16,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, clean, n_tokens, n_removed) — the corpus with every token that
    any repeated window covers removed; surviving tokens re-join with
    single spaces in document order. A document that is entirely repeats
    comes back as ''. Self-repeats within one document count toward
    min_count (same as the suffix-array method: the second occurrence IS
    a repeat, wherever it lives)."""
    if span_tokens < 1:
        raise ValueError(f"span_tokens must be >= 1, got {span_tokens}")
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    arr = token_array(text_col)
    windows = _windows(arr, span_tokens)

    # ONE window table feeds both the repeat derivation and the flagging
    # join (tokenize + md5-per-window is the dominant cost — never run it
    # twice); the per-doc flagged-starts frame is small (docs with
    # repeats only) and checkpointed so the persisted windows release
    # deterministically.
    exploded = df.select(
        F.col(id_col), F.explode(windows).alias("w")
    ).select(
        id_col, F.col("w.start").alias("start"), F.col("w.whash").alias("whash")
    ).persist()
    try:
        rep = (
            exploded.groupBy("whash")
            .agg(F.count(F.lit(1)).alias("n_occurrences"))
            .filter(F.col("n_occurrences") >= min_count)
        )
        flagged = (
            exploded.join(rep.select("whash"), "whash")
            .groupBy(id_col)
            .agg(F.sort_array(F.collect_list("start")).alias("starts"))
            .localCheckpoint()
        )
    finally:
        exploded.unpersist()

    L = span_tokens
    base = df.select(F.col(id_col), arr.alias("toks"))
    joined = base.join(flagged, [id_col], "left").select(
        id_col,
        "toks",
        F.coalesce("starts", F.array().cast("array<int>")).alias("starts"),
    )
    # token i is covered iff some flagged start s satisfies s <= i <= s+L-1
    kept = F.filter(
        F.transform(
            joined["toks"],
            lambda t, i: F.struct(
                t.alias("tok"),
                (
                    ~F.exists(
                        joined["starts"],
                        lambda s: (s <= i) & (i <= s + F.lit(L - 1)),
                    )
                ).alias("keep"),
            ),
        ),
        lambda st: st["keep"],
    )
    return joined.select(
        id_col,
        F.array_join(F.transform(kept, lambda st: st["tok"]), " ").alias("clean"),
        F.size("toks").cast("long").alias("n_tokens"),
        (F.size("toks") - F.size(kept)).cast("long").alias("n_removed"),
    )
