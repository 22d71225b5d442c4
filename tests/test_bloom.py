"""Bloom-filter incremental dedup (functions/bloom.py): bit-exact build
vs a Python reference bloom, no false negatives ever, end-to-end result
identity with the exact anti-join, and the zero-shuffle prefilter plan.

The driver gate ``bloom_dedup_kept`` additionally pins value-identity
against a plain DuckDB anti-join twin at sf0.01."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from letarette_spark.functions.bloom import (
    bloom_build,
    bloom_fill_ratio,
    bloom_might_contain,
    bloom_params,
    incremental_dedup,
)


def _py_positions(s: str, n_bits: int, n_hashes: int) -> list[int]:
    d = hashlib.md5(s.encode()).hexdigest()
    h1 = int(d[:8], 16)
    h2 = int(d[8:16], 16) | 1
    return [(h1 + i * h2) % n_bits for i in range(n_hashes)]


def _py_bloom(keys, n_bits: int, n_hashes: int) -> list[int]:
    words = [0] * (n_bits // 64)
    for s in keys:
        for p in _py_positions(s, n_bits, n_hashes):
            words[p // 64] |= 1 << (p % 64)
    # to signed longs (Spark's bit_or aggregates signed)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


@pytest.fixture(scope="module")
def frames(spark):
    seen = spark.createDataFrame(
        [(i, f"doc body number {i} with words") for i in range(0, 400, 2)],
        "doc_id int, text string",
    )
    # new overlaps seen on multiples of 6, plus fresh odd ids
    new = spark.createDataFrame(
        [(i, f"doc body number {i} with words") for i in range(0, 300, 3)],
        "doc_id int, text string",
    )
    return seen, new


def test_params_sizing():
    n_bits, n_hashes = bloom_params(1000, 0.01)
    assert n_bits % 64 == 0
    # ~9.6 bits/item at 1% fpp
    assert 9 * 1000 <= n_bits <= 11 * 1000
    assert 5 <= n_hashes <= 9
    assert bloom_params(0) == (64, 1)


def test_build_bit_exact_vs_python(spark, frames):
    seen, _ = frames
    n_bits, n_hashes = bloom_params(200, 0.01)
    words = bloom_build(seen, "text", n_bits, n_hashes)
    keys = [r["text"] for r in seen.select("text").collect()]
    assert words == _py_bloom(keys, n_bits, n_hashes)
    assert 0.0 < bloom_fill_ratio(words) < 1.0


def test_no_false_negatives(spark, frames):
    seen, _ = frames
    n_bits, n_hashes = bloom_params(200, 0.01)
    words = bloom_build(seen, "text", n_bits, n_hashes)
    misses = seen.filter(~bloom_might_contain("text", words, n_bits, n_hashes))
    assert misses.count() == 0


def test_incremental_dedup_equals_exact_anti_join(spark, frames):
    seen, new = frames
    got = incremental_dedup(new, seen, "text")
    exact = new.join(seen.select("text").distinct(), "text", "left_anti")
    a = sorted(r["doc_id"] for r in got.collect())
    b = sorted(r["doc_id"] for r in exact.collect())
    assert a == b
    # overlap keys are multiples of 6 in [0, 300): exactly 50 dups dropped
    assert len(a) == new.count() - 50


def test_prefilter_plan_zero_shuffle_zero_python(spark, frames):
    seen, new = frames
    n_bits, n_hashes = bloom_params(200, 0.01)
    words = bloom_build(seen, "text", n_bits, n_hashes)
    plan = (
        new.filter(~bloom_might_contain("text", words, n_bits, n_hashes))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_result_partitioning_independent(spark, frames):
    seen, new = frames
    a = sorted(
        r["doc_id"]
        for r in incremental_dedup(new.repartition(7), seen, "text").collect()
    )
    b = sorted(
        r["doc_id"]
        for r in incremental_dedup(new.coalesce(1), seen.repartition(5), "text").collect()
    )
    assert a == b


def test_empty_seen_keeps_everything(spark, frames):
    _, new = frames
    empty = new.filter(F.lit(False))
    got = incremental_dedup(new, empty, "text")
    assert got.count() == new.count()


def test_null_keys_follow_sql_semantics(spark):
    """NULL never equals anything: NULL-key rows of `new` are always
    kept (they used to vanish — NULL bloom flag failed both filters) and
    NULL-key rows of `seen` mark nothing as dup (they used to crash the
    word assembly with a NULL position row). Matches the anti-join twin."""
    seen = spark.createDataFrame(
        [{"doc_id": 0, "text": "shared text"}, {"doc_id": 1, "text": None}]
    )
    new = spark.createDataFrame(
        [
            {"doc_id": 10, "text": "shared text"},  # true dup -> dropped
            {"doc_id": 11, "text": None},           # NULL key -> kept
            {"doc_id": 12, "text": "fresh"},        # fresh -> kept
        ]
    )
    kept = sorted(r["doc_id"] for r in incremental_dedup(new, seen, "text").collect())
    assert kept == [11, 12]
    # the exact anti-join twin agrees
    twin = sorted(
        r["doc_id"]
        for r in new.join(seen.select("text").distinct(), "text", "left_anti").collect()
    )
    assert kept == twin


def test_big_filter_frame_path(spark, frames):
    """Above _LIT_WORDS_MAX the words ride a broadcast 1-row frame, not a
    plan literal (a 72k-word literal costs ~30s of SERIAL driver time —
    the same at any parallelism level). Same results, no data shuffle, no
    Python."""
    from letarette_spark.functions.bloom import with_bloom_flag

    seen, new = frames
    # force the frame path: size the filter for 5M expected items
    n_bits, n_hashes = bloom_params(5_000_000, 0.01)
    assert n_bits // 64 > 4096
    words = bloom_build(seen, "text", n_bits, n_hashes)
    flagged = with_bloom_flag(new, "text", words, n_bits, n_hashes)
    # no false negatives through the frame path either
    seen_flagged = with_bloom_flag(seen, "text", words, n_bits, n_hashes)
    assert seen_flagged.filter(~F.col("__bloom_hit")).count() == 0
    plan = flagged._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert "Python" not in plan
    # end-to-end result identical to the exact anti-join at this sizing
    got = incremental_dedup(new, seen, "text", expected_items=5_000_000)
    exact = new.join(seen.select("text").distinct(), "text", "left_anti")
    assert sorted(r["doc_id"] for r in got.collect()) == sorted(
        r["doc_id"] for r in exact.collect()
    )
