"""Benchmark decontamination (functions/decontam.py): n-gram overlap
flags, pair counts, anti-join cleanup, and the broadcast-benchmark plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from letarette_spark.functions.decontam import (
    contaminated_pairs,
    decontaminate,
    decontamination_report,
)

BENCH_TEXT = (
    "the quick brown fox jumps over the lazy dog while the cat watches"
)


@pytest.fixture(scope="module")
def frames(spark):
    bench = spark.createDataFrame(
        [(100, BENCH_TEXT), (101, "completely different benchmark prompt here")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            # contains an exact 8-token run from BENCH_TEXT
            (1, "intro words then the quick brown fox jumps over the lazy dog outro"),
            # shares only a 5-gram (below n=8) -> clean
            (2, "the quick brown fox jumps somewhere else entirely now okay then"),
            # no overlap at all
            (3, "unrelated content about parsers and tokenizers in compilers everywhere"),
            # shorter than 8 tokens -> zero shingles, clean
            (4, "too short to shingle"),
        ],
        "doc_id long, text string",
    )
    return docs, bench


def test_report_flags(frames):
    docs, bench = frames
    rows = {
        r["doc_id"]: r
        for r in decontamination_report(docs, bench, n=8).collect()
    }
    assert set(rows) == {1, 2, 3, 4}
    assert rows[1]["contaminated"] and rows[1]["n_matched"] >= 1
    assert not rows[2]["contaminated"] and rows[2]["n_matched"] == 0
    assert not rows[3]["contaminated"]
    assert rows[4]["n_total"] == 0 and not rows[4]["contaminated"]
    # doc 1: 13 tokens -> 6 distinct 8-gram shingles
    assert rows[1]["n_total"] == 6


def test_pairs_exact(frames):
    docs, bench = frames
    pairs = {
        (r["doc_id"], r["bench_id"]): r["n_shared"]
        for r in contaminated_pairs(docs, bench, n=8).collect()
    }
    # doc 1 shares exactly the 8-grams of the copied 10-token run:
    # "the quick brown fox jumps over the lazy dog" is 9 tokens -> 2
    # 8-grams, both present in bench
    assert pairs == {(1, 100): 2}


def test_decontaminate_removes_dirty(frames):
    docs, bench = frames
    kept = sorted(
        r["doc_id"] for r in decontaminate(docs, bench, n=8).collect()
    )
    assert kept == [2, 3, 4]
    # column set preserved
    assert decontaminate(docs, bench, n=8).columns == docs.columns


def test_benchmark_broadcasts(frames):
    docs, bench = frames
    out = decontamination_report(docs, bench, n=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan


def test_small_n_matches_phrase_overlap(frames):
    """n=5 must flag doc 2 (it shares a 5-gram)."""
    docs, bench = frames
    rows = {
        r["doc_id"]: r["contaminated"]
        for r in decontamination_report(docs, bench, n=5).collect()
    }
    assert rows[1] and rows[2] and not rows[3]
