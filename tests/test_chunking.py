"""Token-window chunking (functions/chunking.py): window math, overlap,
tails, empty docs, zero-shuffle plan."""

from __future__ import annotations

import pytest

from letarette_spark.functions.chunking import chunk_documents


@pytest.fixture(scope="module")
def df(spark):
    words = " ".join(f"tok{i:02d}" for i in range(10))  # 10 tokens
    return spark.createDataFrame(
        [
            (1, words),
            (2, "just three tokens"),
            (3, ""),        # no tokens -> no chunks
            (4, "a b"),     # 1-char tokens are dropped by the analyzer
        ],
        "doc_id long, text string",
    )


def test_windows_with_overlap(df):
    out = sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk"], r["n_tokens"])
        for r in chunk_documents(df, max_tokens=8, overlap=4).collect()
    )
    # doc 1: starts 0 and 4 (a start of 8 would only re-cover the overlap)
    doc1 = [o for o in out if o[0] == 1]
    assert [o[1] for o in doc1] == [0, 1]
    assert doc1[0][2].split() == [f"tok{i:02d}" for i in range(8)]
    assert doc1[1][2].split() == [f"tok{i:02d}" for i in range(4, 10)]
    assert [o[3] for o in doc1] == [8, 6]
    # doc 2: one short chunk
    doc2 = [o for o in out if o[0] == 2]
    assert doc2 == [(2, 0, "just three tokens", 3)]
    # docs 3 and 4: no chunks at all
    assert not [o for o in out if o[0] in (3, 4)]


def test_no_overlap_exact_partition(df):
    out = [
        r for r in chunk_documents(df, max_tokens=5, overlap=0).collect()
        if r["doc_id"] == 1
    ]
    out.sort(key=lambda r: r["chunk_idx"])
    assert [r["n_tokens"] for r in out] == [5, 5]
    assert " ".join(r["chunk"] for r in out).split() == [
        f"tok{i:02d}" for i in range(10)
    ]


def test_param_validation(df):
    with pytest.raises(ValueError):
        chunk_documents(df, max_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(df, max_tokens=4, overlap=4)


def test_zero_shuffle(df):
    plan = chunk_documents(df, 8, 2)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
