"""Varbyte codec roundtrips + block-max WAND exactness.

WAND is a pruning optimization that must remain rank-identical
(SURVEY.md §4.2: 'a pruning optimization that must remain rank-identical
for top-k'). The oracle here is exhaustive scoring over the same index."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from letarette_spark.analysis.tokenizer import AnalyzerConfig
from letarette_spark.index.blocks import build_blocks, has_blocks
from letarette_spark.index.builder import Index, build_index
from letarette_spark.index.varbyte import (
    decode_ints,
    decode_rowids,
    encode_ints,
    encode_rowids,
)
from letarette_spark.query.wand import wand_topk
from letarette_spark.sources.corpus import docs_from_corpus, generate_corpus_local


class TestVarbyte:
    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=50))
    def test_ints_roundtrip(self, vals):
        arr = np.array(vals, dtype=np.int64)
        assert decode_ints(encode_ints(arr)).tolist() == vals

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
            min_size=1,
            max_size=50,
            unique=True,
        )
    )
    def test_rowids_roundtrip(self, vals):
        arr = np.array(sorted(vals), dtype=np.int64)
        assert decode_rowids(encode_rowids(arr)).tolist() == sorted(vals)

    def test_empty(self):
        assert decode_ints(encode_ints(np.array([], dtype=np.int64))).size == 0


@pytest.fixture(scope="module")
def blocked_index(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("wand_index"))
    corpus = spark.createDataFrame(generate_corpus_local(400, seed=11))
    cfg = AnalyzerConfig(mode="porter")
    build_index(spark, docs_from_corpus(corpus), root, config=cfg,
                n_build_partitions=4, chunk_size=4)
    idx = Index.open(spark, root, cfg)
    build_blocks(idx, block_size=32)  # small blocks -> pruning actually kicks in
    assert has_blocks(idx)
    return idx


def _exhaustive(idx, terms, k, mode):
    """Reference scorer: full scan over row postings."""
    import pyspark.sql.functions as F

    ndocs = int(idx.meta["ndocs"])
    avgdl = float(idx.meta["sum_dl"]) / ndocs
    stats = {
        r["term"]: int(r["df"])
        for r in idx.term_stats().filter(F.col("term").isin(terms)).collect()
    }
    idf = {}
    for t in set(terms):
        n = stats.get(t, 0)
        if n == 0:
            if mode == "and":
                return []
            continue
        v = math.log((ndocs - n + 0.5) / (n + 0.5))
        idf[t] = v if v > 0.0 else 1e-6
    if not idf:
        return []
    rows = (
        idx.postings()
        .filter(F.col("term").isin(sorted(idf)))
        .select("term", "rowid", "tf0", "tf1", "dl")
        .collect()
    )
    scores: dict[int, float] = {}
    counts: dict[int, int] = {}
    for r in rows:
        tf = 5.0 * r["tf0"] + 1.0 * r["tf1"]
        c = idf[r["term"]] * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * r["dl"] / avgdl))
        scores[r["rowid"]] = scores.get(r["rowid"], 0.0) + c
        counts[r["rowid"]] = counts.get(r["rowid"], 0) + 1
    if mode == "and":
        scores = {d: s for d, s in scores.items() if counts[d] == len(idf)}
    ranked = sorted(((-s, d) for d, s in scores.items()))
    return ranked[:k]


QUERY_SETS = [
    (["parser"], "or"),
    (["error"], "or"),
    (["zephyr"], "or"),               # rare term
    (["error", "handler"], "or"),
    (["error", "handler"], "and"),
    (["func", "main", "return"], "or"),
    (["func", "main", "return"], "and"),
    (["parser", "nonexistentxyz"], "or"),
    (["parser", "nonexistentxyz"], "and"),
    (["42"], "or"),
]


@pytest.mark.parametrize("terms,mode", QUERY_SETS, ids=[f"{'+'.join(t)}:{m}" for t, m in QUERY_SETS])
def test_wand_matches_exhaustive(blocked_index, terms, mode):
    k = 10
    expected = _exhaustive(blocked_index, terms, k, mode)
    got = [
        (r["score"], r["rowid"])
        for r in wand_topk(blocked_index, terms, k=k, mode=mode).collect()
    ]
    assert [d for _s, d in got] == [d for _s, d in expected]
    for (sg, _), (se, _) in zip(got, expected):
        assert math.isclose(sg, se, rel_tol=1e-9, abs_tol=1e-12)


def test_wand_prunes_blocks(blocked_index):
    """The pruning must actually skip work: selected blocks in round 2 for a
    selective query should be well under the total."""
    import pyspark.sql.functions as F

    from letarette_spark.index.blocks import blocks_df

    total = blocks_df(blocked_index).filter(F.col("term") == "error").count()
    # with k=1 and block_size=32, only a handful of 'error' blocks can matter
    got = wand_topk(blocked_index, ["error"], k=1).collect()
    assert total > 3 and len(got) == 1
