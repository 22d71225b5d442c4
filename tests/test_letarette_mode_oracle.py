"""Rank-identity for the DEFAULT analyzer mode (letarette: unicode61 +
reference token rules + Porter2).

No external engine ships Letarette's exact tokenizer, so the scoring oracle
is constructed by PRE-STEMMING: both sides receive the identical token
stream (my analyzer's terms joined by spaces; stemmed terms are plain
alphanumerics, so FTS5's unicode61 re-tokenizes them 1:1 with identical
positions). FTS5 then computes real bm25(5,1)/NEAR/NOT over that stream —
validating the whole scoring/NEAR/paging pipeline under letarette-mode
tokenization. The tokenization itself is covered by the parity and golden
suites (test_tokenizer_parity.py, test_porter2.py)."""

from __future__ import annotations

import math
import random

import pytest

from letarette_spark.analysis.tokenizer import Analyzer, AnalyzerConfig
from letarette_spark.index.builder import Index, build_index
from letarette_spark.query.executor import Searcher
from letarette_spark.query.parser import Phrase, compile_match_string, parse_query, reduce_phrases

CFG = AnalyzerConfig()  # letarette mode, english (Porter2)
ANALYZER = Analyzer(CFG)

VOCAB = [
    "running", "runner", "analyzed", "analyzing", "generation", "skies",
    "dying", "early", "connection", "connected", "happiness", "quickly",
    "44", "a", "parser", "parsing",
]


def _docs(n=70, seed=13):
    rng = random.Random(seed)
    out = []
    for i in range(n):
        title = " ".join(rng.choices(VOCAB, k=rng.randint(1, 3)))
        body = " ".join(rng.choices(VOCAB + ["filler%d" % j for j in range(20)],
                                    k=rng.randint(5, 40)))
        out.append((i + 1, title, body))
    return out


def _prestem(text: str) -> str:
    return " ".join(ANALYZER.terms(text))


def _prestem_query(query: str) -> str:
    """Analyze each phrase with the letarette analyzer and rebuild the
    match string from stemmed terms (phrases keep adjacency)."""
    phrases = reduce_phrases(parse_query(query))
    out = []
    for p in phrases:
        terms = ANALYZER.terms(p.text)
        if not terms:
            continue
        out.append(Phrase(" ".join(terms), wildcard=p.wildcard, exclude=p.exclude))
    includes = [p for p in out if not p.exclude]
    if not includes:
        return ""
    return compile_match_string(out)


QUERIES = [
    "running", "runs", "analyzing", "generation quickly", '"running quickly"',
    "connection -early", "skies", "dying early", "44", "parser generation",
    "runn*",
]


@pytest.fixture(scope="module")
def leta(spark, tmp_path_factory):
    from tests.fts5_oracle import Fts5Index

    docs = _docs()
    root = str(tmp_path_factory.mktemp("leta_oracle"))
    sdf = spark.createDataFrame(
        [
            {"doc_id": f"d{r}", "rowid": r, "space": "main", "title": t,
             "body": b, "alive": True}
            for r, t, b in docs
        ]
    )
    build_index(spark, sdf, root, config=CFG, n_build_partitions=2, chunk_size=2)
    idx = Index.open(spark, root, CFG)
    oracle = Fts5Index.build(
        [(r, _prestem(t), _prestem(b)) for r, t, b in docs],
        tokenizer="unicode61",
    )
    return idx, oracle


@pytest.mark.parametrize("query", QUERIES, ids=QUERIES)
def test_letarette_mode_rank_identity(leta, query):
    idx, oracle = leta
    s = Searcher(idx, stopwords=frozenset(), synonyms={})
    match = _prestem_query(query)
    expected = oracle.search(match, limit=10) if match else []
    df, _t, _c = s.search_df(query, limit=10)
    got = [(r["rowid"], r["score"]) for r in df.collect()] if df is not None else []
    assert [r for r, _ in got] == [r for r, _ in expected], (query, match, got, expected)
    for (_, sg), (_, se) in zip(got, expected):
        assert math.isclose(sg, se, rel_tol=1e-9, abs_tol=1e-12), (query, sg, se)
