"""Randomized rank-identity: a dense small-vocabulary corpus (forcing NEAR
clusters, repeated instances, multi-column hits, ties) and ~40 generated
queries, every one compared against live FTS5 for exact top-10 docID order
and BM25 scores. This is the adversarial counterpart to the curated suite
in test_search_rank_identity.py."""

from __future__ import annotations

import math
import random

import pytest

from letarette_spark.analysis.tokenizer import AnalyzerConfig
from letarette_spark.index.builder import Index, build_index
from letarette_spark.query.executor import Searcher
from letarette_spark.query.parser import compile_match_string, parse_query, reduce_phrases
from tests.fts5_oracle import Fts5Index

VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "pad", "fill"]


def _mk_docs(n=80, seed=99):
    rng = random.Random(seed)
    docs = []
    for i in range(n):
        title = " ".join(rng.choices(VOCAB, k=rng.randint(1, 4)))
        body = " ".join(rng.choices(VOCAB + ["x%d" % j for j in range(30)], k=rng.randint(5, 60)))
        docs.append((i + 1, title, body))
    return docs


def _mk_queries(seed=7, n=40):
    rng = random.Random(seed)
    qs = []
    for _ in range(n):
        k = rng.randint(1, 3)
        terms = rng.sample(VOCAB[:6], k)
        parts = list(terms)
        if rng.random() < 0.4:
            parts.append("-" + rng.choice([v for v in VOCAB[:6] if v not in terms]))
        if rng.random() < 0.25:
            parts[0] = parts[0][:3] + "*"
        if rng.random() < 0.25 and k >= 2:
            parts = [f'"{terms[0]} {terms[1]}"'] + parts[2:]
        qs.append(" ".join(parts))
    return qs


@pytest.fixture(scope="module")
def dense(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("dense_index"))
    docs = _mk_docs()
    sdf = spark.createDataFrame(
        [
            {
                "doc_id": f"d{r}",
                "rowid": r,
                "space": "main",
                "title": t,
                "body": b,
                "alive": True,
            }
            for r, t, b in docs
        ]
    )
    cfg = AnalyzerConfig(mode="porter")
    build_index(spark, sdf, root, config=cfg, n_build_partitions=2, chunk_size=2)
    idx = Index.open(spark, root, cfg)
    from letarette_spark.index.blocks import build_blocks
    build_blocks(idx, block_size=16)  # single-term queries traverse the WAND path
    idx = Index.open(spark, root, cfg)
    return idx, Fts5Index.build(docs)


@pytest.mark.parametrize("query", _mk_queries())
def test_random_query_rank_identity(dense, query):
    index, oracle = dense
    searcher = Searcher(index)
    match = compile_match_string(reduce_phrases(parse_query(query)))
    expected = oracle.search(match, limit=10) if match else []
    df, _total, _capped = searcher.search_df(query, limit=10)
    got = [(r["rowid"], r["score"]) for r in df.collect()] if df is not None else []
    assert [r for r, _ in got] == [r for r, _ in expected], (
        f"{query!r}: got {got}\nwant {expected}"
    )
    for (_, sg), (_, se) in zip(got, expected):
        assert math.isclose(sg, se, rel_tol=1e-9, abs_tol=1e-12), (query, sg, se)
