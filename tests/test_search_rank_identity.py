"""Rank-identity: the Spark engine's top-k (rowid, BM25 score) must equal
live SQLite FTS5 with Letarette's configuration (bm25 weights 5.0/1.0,
NEAR(…,15) conjunction, NOT exclusion, prefix wildcard) on the same corpus.

This is the correctness contract from BASELINE.json north_rule: "matching
the reference's top-k docIDs and BM25 scores (rank-identical) on the
reference query set". Query shapes follow the reference's load-test sets
(testdata/simple.json, multiwords.json, harder.json — see FIXTURES.md §3)
re-vocabularied over the synthetic code corpus.
"""

from __future__ import annotations

import math

import pytest

from letarette_spark.analysis.tokenizer import AnalyzerConfig
from letarette_spark.index.builder import Index, build_index
from letarette_spark.query.executor import Searcher
from letarette_spark.query.parser import compile_match_string, parse_query, reduce_phrases
from letarette_spark.sources.corpus import docs_from_corpus, generate_corpus_local
from tests.fts5_oracle import Fts5Index

N_DOCS = 150

# Reference query-set shapes over the code-corpus vocabulary (FIXTURES.md §3)
QUERIES = [
    "parser",                    # simple.json: single term
    "error handler",             # multiwords: NEAR conjunction
    "buffer -error",             # multiwords: exclusion
    "tokeniz*",                  # multiwords: wildcard
    '"error handler"',           # multiwords: quoted phrase
    "parser buffer token",       # 3-phrase NEAR
    "query search -",            # dangling exclude
    "zephyr",                    # rare term
    "42",                        # digit token
    "error -handler -buffer",    # multiple excludes
    '"parse buffer"*',           # wildcard phrase
    "nonexistenttermxyz",        # zero hits
]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("index"))
    corpus_rows = generate_corpus_local(N_DOCS, seed=7)
    corpus = spark.createDataFrame(corpus_rows)
    docs = docs_from_corpus(corpus)
    cfg = AnalyzerConfig(mode="porter")  # FTS5-oracle-verifiable mode
    build_index(spark, docs, root, config=cfg, n_build_partitions=4, chunk_size=2)
    index = Index.open(spark, root, cfg)
    from letarette_spark.index.blocks import build_blocks
    build_blocks(index, block_size=32)  # single-term queries traverse the WAND path

    local_docs = docs.select("rowid", "title", "body").collect()
    oracle = Fts5Index.build([(r["rowid"], r["title"], r["body"]) for r in local_docs])
    return index, oracle


@pytest.mark.parametrize("query", [q for q in QUERIES if q])
def test_rank_identity(built, query):
    index, oracle = built
    searcher = Searcher(index)

    match = compile_match_string(reduce_phrases(parse_query(query)))
    expected = oracle.search(match, limit=10) if match else []

    df, total, capped = searcher.search_df(query, limit=10)
    got = (
        [(r["rowid"], r["score"]) for r in df.collect()] if df is not None else []
    )

    assert [r for r, _ in got] == [r for r, _ in expected], (
        f"docID ranking mismatch for {query!r}: got {got}, want {expected}"
    )
    for (_, s_got), (_, s_exp) in zip(got, expected):
        assert math.isclose(s_got, s_exp, rel_tol=1e-9, abs_tol=1e-12), (
            f"score mismatch for {query!r}: got {s_got}, want {s_exp}"
        )


def test_total_hits_matches_oracle(built):
    index, oracle = built
    searcher = Searcher(index)
    df, total, capped = searcher.search_df("error", limit=5)
    assert total == len(oracle.match_rowids('"error"'))
    assert not capped


def test_empty_query_returns_no_hits(built):
    index, _ = built
    searcher = Searcher(index)
    df, total, capped = searcher.search_df("-only -excludes a b", limit=10)
    assert df is None and total == 0 and not capped


def test_capped_ranks_cap_plus_one_matches(built):
    """Reference cap semantics: the SQL LIMIT is resultCap+1 in rowid order
    (db_search.go:93-96), so the (cap+1)-th rowid-order match is still
    rankable while TotalHits caps at `cap`."""
    index, oracle = built
    s = Searcher(index, cap=3)
    df, total, capped = s.search_df("error", limit=10)
    all_rowids = oracle.match_rowids('"error"')
    assert len(all_rowids) > 4, "fixture must have >cap+1 matches"
    pool = all_rowids[:4]  # cap + 1 in rowid order
    expected = oracle.con.execute(
        "SELECT rowid, bm25(fts, 5.0, 1.0) AS r FROM fts WHERE fts MATCH ? "
        f"AND rowid IN ({','.join(map(str, pool))}) ORDER BY r, rowid LIMIT 10",
        ('"error"',),
    ).fetchall()
    got = [(r["rowid"], r["score"]) for r in df.collect()]
    assert capped and total == 3
    assert [r for r, _ in got] == [r for r, _ in expected]
    for (_, sg), (_, se) in zip(got, expected):
        assert math.isclose(sg, se, rel_tol=1e-9, abs_tol=1e-12)
