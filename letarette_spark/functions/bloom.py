"""Bloom-filter incremental dedup — the new-batch-vs-seen-corpus pass.

A continuously-crawled corpus deduplicates each incoming batch against
everything already ingested. Joining the (small) new batch against the
(enormous) seen corpus every time shuffles history forever; the standard
fix is a Bloom filter over the seen keys: one compact bitmap, broadcast
once, filters the batch with ZERO shuffle, and only the bloom HITS (true
duplicates + ~fpp false positives) pay the exact confirmation join.

PySpark's `df.stat.bloomFilter` builds a JVM-side filter but offers no
column expression to apply it from Python, so the filter here is built in
plain DataFrame algebra and applied as a codegen'd expression:

  build:  key -> k bit positions (Kirsch-Mitzenmacher double hashing over
          one md5: pos_i = (h1 + i * h2) mod n_bits) -> explode ->
          groupBy(word = pos / 64) bit_or(1 << (pos % 64)) — the aggregate
          output is at most n_bits/64 rows (8M bits = 128 KiB), collected
          into one dense long array on the driver;
  apply:  the array rides a 1-row broadcast frame (the same shape as the
          BM25 stats joins); membership = AND over the k probes of
          `element_at(words, pos/64 + 1) & (1 << pos%64) != 0` — pure
          whole-stage codegen, no Python, no shuffle (plan-asserted in
          tests/test_bloom.py).

`incremental_dedup` composes build + apply + exact confirm so the result
is EXACTLY ``new ∖ seen`` by key — the bloom is a physical-plan
optimization, invisible in the semantics — which is why an exact ANSI-SQL
twin exists (driver gate ``bloom_dedup_kept``: a plain anti-join).

ANSI-mode note: h1, h2 < 2^32 and k <= 16, so h1 + i*h2 < 2^36 fits a
long with no overflow; `1 << bit` uses shiftleft on a long literal.

Reference relation: beyond-reference training-data operator; the
reference's own dedup is docid-keyed upsert (internal/letarette/db.go).
Companions: functions/dedup.py (within-corpus dedup), this module
(cross-batch dedup for incremental ingest).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_params(expected_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """(n_bits, n_hashes) sized for `expected_items` at target `fpp`,
    n_bits rounded up to a multiple of 64 (whole words)."""
    if expected_items <= 0:
        return 64, 1
    n_bits = int(math.ceil(-expected_items * math.log(fpp) / (math.log(2) ** 2)))
    n_bits = max(64, ((n_bits + 63) // 64) * 64)
    n_hashes = max(1, min(16, round(n_bits / expected_items * math.log(2))))
    return n_bits, int(n_hashes)


def _h1_h2(key: Column) -> tuple[Column, Column]:
    """Two independent 32-bit hashes from one md5: hex chars [1,8] and
    [9,8]; h2 forced odd so the double-hash probe sequence cycles through
    all residues of the (power-of-two-free) modulus."""
    digest = F.md5(key.cast("string"))
    h1 = F.conv(F.substring(digest, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(digest, 9, 8), 16, 10).cast("long").bitwiseOR(F.lit(1))
    return h1, h2


# 1 << i for i in [0, 64) as signed longs (bit 63 is the sign bit);
# shiftleft() needs a literal shift count, so bit values come from this
# literal lookup array instead
_BIT_VALUES = [1 << i for i in range(63)] + [-(1 << 63)]


def _long_array_lit(values: list[int]) -> Column:
    """array<bigint> literal from ONE SQL-string parse. Per-element
    ``F.lit(list)`` costs one py4j round trip per element (~0.8 s per 1k
    elements of serial driver time — the 3.7k-word filter for a 25k-item
    corpus alone cost ~3 s per plan build); integer decimal literals
    parse exactly, so the values are bit-identical."""
    return F.expr(
        "array(" + ",".join(f"{int(v)}L" for v in values) + ")"
    )


def _bit_value(bit: Column) -> Column:
    return F.element_at(_long_array_lit(_BIT_VALUES), bit.cast("int") + 1)


def _positions(key: Column, n_bits: int, n_hashes: int) -> Column:
    """array<long> of the k bit positions for `key`."""
    h1, h2 = _h1_h2(key)
    return F.array(
        *[(h1 + F.lit(i) * h2) % F.lit(n_bits) for i in range(n_hashes)]
    )


def bloom_build(
    seen: DataFrame,
    key: Column | str,
    n_bits: int,
    n_hashes: int,
) -> list[int]:
    """Dense word array (n_bits/64 signed longs, little-endian bit order
    within each word) of the Bloom filter over `key` of `seen`.

    Scale: one scan of `seen`; the only shuffle is the groupBy on the word
    index — at most n_bits/64 distinct keys, so the exchange is tiny no
    matter how large `seen` is; the collect is n_bits/8 bytes.

    NULL keys are skipped: NULL never equals any key under SQL
    semantics, so setting bits for it could only create false
    positives (and a NULL probe row would crash the word assembly)."""
    k = F.col(key) if isinstance(key, str) else key
    n_words = n_bits // 64
    rows = (
        seen.filter(k.isNotNull())
        .select(F.explode(_positions(k, n_bits, n_hashes)).alias("pos"))
        .select(
            (F.col("pos") / 64).cast("int").alias("word"),
            _bit_value(F.col("pos") % 64).alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
        .collect()
    )
    words = [0] * n_words
    for r in rows:
        words[r["word"]] = r["bits"]
    return words


def _might_expr(
    key: Column, words_col: Column, n_bits: int, n_hashes: int
) -> Column:
    """AND over the k probe bits against `words_col` (array<long>).

    NULL keys return False outright: the build skips NULLs, so the
    filter definitely does not contain one — and the guard is REQUIRED
    for correctness, not just clarity, because PySpark's Column-API
    ``element_at`` treats a NULL index as -1 (returns the LAST element,
    unlike SQL element_at which returns NULL), so an unguarded NULL key
    would probe the final word's sign bit and could flag true."""
    h1, h2 = _h1_h2(key)
    out = None
    for i in range(n_hashes):
        pos = (h1 + F.lit(i) * h2) % F.lit(n_bits)
        word = F.element_at(words_col, (pos / 64).cast("int") + 1)
        check = word.bitwiseAND(_bit_value(pos % 64)) != 0
        out = check if out is None else out & check
    return F.when(key.isNull(), F.lit(False)).otherwise(out)


def bloom_might_contain(
    key: Column | str, words: list[int], n_bits: int, n_hashes: int
) -> Column:
    """Boolean column: all k probe bits set (true for every seen key;
    true for an unseen key with probability ~fpp). The word array is baked
    in as a literal; the whole expression is codegen, zero shuffle.

    Literal-only form — suitable for SMALL filters. Building a Python
    list literal costs one py4j round trip per element (~30 s at 72k
    words, pure serial driver time), so for big filters use
    `with_bloom_flag`, which ships the array as a 1-row Arrow frame
    instead (milliseconds at any size)."""
    k = F.col(key) if isinstance(key, str) else key
    return _might_expr(k, _long_array_lit(words), n_bits, n_hashes)


# above this, even the one-parse SQL-string literal starts paying real
# Catalyst analysis time (similarity.py measured ~14 s at 262k literal
# elements) — ship the words as a broadcast 1-row frame instead
_LIT_WORDS_MAX = 4096


def with_bloom_flag(
    df: DataFrame,
    key_col: str,
    words: list[int],
    n_bits: int,
    n_hashes: int,
    out_col: str = "__bloom_hit",
) -> DataFrame:
    """df + boolean `out_col` = bloom membership of `key_col`. Small
    filters ride a plan literal (zero joins); big ones a broadcast 1-row
    Arrow frame (BroadcastNestedLoop against one row — the BM25
    stats-join shape; no data shuffle either way, and no serial
    driver-side literal construction)."""
    k = F.col(key_col)
    if len(words) <= _LIT_WORDS_MAX:
        return df.withColumn(out_col, _might_expr(k, _long_array_lit(words), n_bits, n_hashes))
    import pandas as pd

    wdf = df.sparkSession.createDataFrame(
        pd.DataFrame({"__bloom_words": [words]})
    )
    return (
        df.crossJoin(F.broadcast(wdf))
        .withColumn(
            out_col, _might_expr(k, F.col("__bloom_words"), n_bits, n_hashes)
        )
        .drop("__bloom_words")
    )


def bloom_fill_ratio(words: list[int]) -> float:
    """Fraction of set bits — sanity probe: predicted fpp ≈ fill^k."""
    n_bits = len(words) * 64
    set_bits = sum(bin(w & 0xFFFFFFFFFFFFFFFF).count("1") for w in words)
    return set_bits / n_bits if n_bits else 0.0


def incremental_dedup(
    new: DataFrame,
    seen: DataFrame,
    key_col: str = "text",
    expected_items: int | None = None,
    fpp: float = 0.01,
) -> DataFrame:
    """Rows of `new` whose `key_col` never appears in `seen` — exactly
    ``new ∖ seen`` by key (the driver gate pins value-identity against a
    plain anti-join twin). NULL keys follow SQL join semantics: NULL
    never equals anything, so NULL-key rows of `new` are always kept
    (the anti-join twin keeps them too) and NULL-key rows of `seen`
    can't mark anything as dup.

    Physical plan: bloom MISSES (the overwhelming majority of a mostly-
    fresh batch) are accepted by the zero-shuffle prefilter alone and
    never touch `seen`; only bloom HITS (true dups + ~fpp false
    positives) pay the exact left_anti join, whose left side is now tiny.
    With ``expected_items`` given, `seen` is scanned exactly once
    (filter build) plus once more over the candidate join's right side;
    the ``expected_items=None`` default adds a third scan for the sizing
    count — callers holding a persisted `seen` (or table stats) should
    pass the count. At 100 TB make `seen` a key-bucketed table so the
    confirm join prunes to matching buckets."""
    if expected_items is None:
        expected_items = seen.count()
    n_bits, n_hashes = bloom_params(expected_items, fpp)
    words = bloom_build(seen, key_col, n_bits, n_hashes)
    # localCheckpoint: the fresh/candidate split below consumes `flagged`
    # twice — without it the upstream scan of `new` AND all k bloom
    # probes re-ran for each side (the docstring's scan accounting only
    # covered `seen`). One eager materialization serves both filters.
    flagged = with_bloom_flag(
        new, key_col, words, n_bits, n_hashes
    ).localCheckpoint()
    # NULL key -> NULL probe -> NULL hit flag; those rows are fresh by
    # SQL equality semantics and must not vanish between the two filters
    hit = F.coalesce(F.col("__bloom_hit"), F.lit(False))
    fresh = flagged.filter(~hit).drop("__bloom_hit")
    candidates = flagged.filter(hit).drop("__bloom_hit")
    confirmed_fresh = candidates.join(
        seen.select(key_col).distinct(), key_col, "left_anti"
    )
    return fresh.unionByName(confirmed_fresh)
