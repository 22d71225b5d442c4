"""The reference's literal query sets (testdata/simple.json,
multiwords.json, harder.json, stopwords.json) executed verbatim over a
wiki-style corpus in space 'wp', rank-identical to live FTS5 with
Letarette's configuration — the BASELINE.json contract 'rank-identical on
the reference query set'."""

from __future__ import annotations

import math
import random

import pytest

from letarette_spark.analysis.tokenizer import AnalyzerConfig
from letarette_spark.index.auxiliary import update_stopwords
from letarette_spark.index.builder import Index, build_index
from letarette_spark.query.executor import Searcher
from letarette_spark.query.parser import compile_match_string, parse_query, reduce_phrases
from tests.fts5_oracle import Fts5Index

SIMPLE = ["bike"]
MULTIWORDS = [
    "london city",
    "london -city",
    "speedway mud*",
    "holding pattern",
    "candy cane",
    '"stranger than fiction"',
]
HARDER = ["new york"]
STOPWORDS = ["the", "of", "and", "in", "to", "was", "is", "for", "as", "on",
             "by", "with", "it", "that", "from"]

_TOPICAL = [
    "bike rides", "london city traffic", "london bridges", "speedway races",
    "muddy speedway track", "holding pattern above heathrow",
    "candy cane sugar", "stranger than fiction", "new york boroughs",
    "mud and rain", "city of london", "new york city marathon",
]
_FUNCTION = ("the of and in to was is for as on by with it that from").split()
_CONTENT = (
    "about into over under city york new mud bike candy cane stranger "
    "fiction pattern holding speedway london river park street people history"
).split()
# function words 4x as likely: the derived stopword set lands on them
_FILLER = _FUNCTION * 4 + _CONTENT


def _wiki_docs(n=120, seed=5):
    rng = random.Random(seed)
    docs = []
    for i in range(n):
        title = _TOPICAL[i % len(_TOPICAL)] if i % 3 == 0 else " ".join(
            rng.choices(_FILLER, k=rng.randint(2, 4))
        )
        body = " ".join(rng.choices(_FILLER, k=rng.randint(15, 80)))
        docs.append((i + 1, title, body))
    return docs


@pytest.fixture(scope="module")
def wp(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("wp_index"))
    docs = _wiki_docs()
    sdf = spark.createDataFrame(
        [
            {"doc_id": f"wp{r}", "rowid": r, "space": "wp", "title": t,
             "body": b, "alive": True}
            for r, t, b in docs
        ]
    )
    cfg = AnalyzerConfig(mode="porter")
    build_index(spark, sdf, root, config=cfg, n_build_partitions=2, chunk_size=2)
    idx = Index.open(spark, root, cfg)
    return idx, Fts5Index.build(docs)


@pytest.mark.parametrize("query", SIMPLE + MULTIWORDS + HARDER,
                         ids=(SIMPLE + MULTIWORDS + HARDER))
def test_reference_queries_rank_identical(wp, query):
    idx, oracle = wp
    s = Searcher(idx, stopwords=frozenset(), synonyms={})
    match = compile_match_string(reduce_phrases(parse_query(query)))
    expected = oracle.search(match, limit=10) if match else []
    df, _t, _c = s.search_df(query, spaces=["wp"], limit=10)
    got = [(r["rowid"], r["score"]) for r in df.collect()] if df is not None else []
    assert [r for r, _ in got] == [r for r, _ in expected], (query, got, expected)
    for (_, sg), (_, se) in zip(got, expected):
        assert math.isclose(sg, se, rel_tol=1e-9, abs_tol=1e-12), (query, sg, se)


def test_stopword_set_queries(wp):
    """stopwords.json: 15 high-df terms. With auto-derived stopwords
    loaded, each single-term stopword query is dropped to an empty match
    (reference behavior: db_stopwords filter + empty-match short circuit,
    db_search.go:64-66)."""
    idx, _oracle = wp
    words = update_stopwords(idx, cutoff=0.01, top_n=15)
    assert len(words) == 15  # filler corpus is stopword-heavy by design
    s = Searcher(idx, synonyms={})
    for q in STOPWORDS:
        if q in words:
            df, total, _ = s.search_df(q)
            assert df is None and total == 0, q
    assert set(words) & set(STOPWORDS)  # derivation found real function words
    # and a non-stopword keeps matching
    assert "bike" not in words
    df, total, _ = s.search_df("bike")
    assert total > 0
