"""Direct FTS5 oracle for synonym expansion (round-2 verdict task #8).

The reference tokenizer emits synonyms as colocated FTS5 tokens looked up
on the unstemmed surface word (snowball.c:123-162): a doc containing "car"
indexes car+auto at ONE position, so querying "auto" scores that instance
exactly once, df("auto") covers docs containing any group member, and dl
is unchanged. Python's sqlite3 cannot register custom tokenizers, but
colocation has an exact surface-level equivalent when each group member
appears only in its exact surface form: REWRITE every member to the
canonical word in the oracle corpus. Token counts, positions, dl, tf and
df then coincide with the engine's query-side posting-list union —
rank/score identity at 1e-9 pins the broadcast-map expansion directly.
"""

from __future__ import annotations

import math

import pytest

from letarette_spark.analysis.tokenizer import AnalyzerConfig
from letarette_spark.index.auxiliary import update_synonyms
from letarette_spark.index.builder import Index, build_index
from letarette_spark.query.executor import Searcher
from letarette_spark.query.parser import compile_match_string, parse_query, reduce_phrases
from tests.fts5_oracle import Fts5Index

GROUP = ["auto", "car", "vehicle"]  # one synonym group
CANON = "auto"

DOCS = [
    (1, "garage note", "fix the car today and polish trim"),
    (2, "fleet memo", "vehicle inspection for the whole fleet"),
    (3, "auto shop", "auto parts arriving tomorrow morning"),
    (4, "mixed bag", "car vehicle auto all three mentioned"),
    (5, "engine log", "fix engine near the car bay"),
    (6, "unrelated", "zephyr quartz sphinx jumps quickly"),
    (7, "double car", "car problems and more car problems"),
    (8, "title car", "nothing relevant in the body text"),
    (9, "spares", "fix spares for the vehicle engine room"),
    (10, "plain fix", "fix everything else but transport"),
]
# doc 8 carries the group word in the TITLE to pin column weighting
DOCS[7] = (8, "car manual", "nothing relevant in the body text")

QUERIES = [
    "auto",            # single term -> union of three posting lists
    '"fix auto"',      # phrase with a synonym at position 2
    "auto engine",     # NEAR conjunction with an expanded phrase
    "auto -engine",    # exclusion stays unexpanded-independent
]


def _rewrite(text: str) -> str:
    return " ".join(CANON if w in GROUP else w for w in text.split())


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("syn_index"))
    docs = spark.createDataFrame(
        [
            {"doc_id": f"d{r}", "rowid": r, "space": "main", "title": t,
             "body": b, "alive": True}
            for r, t, b in DOCS
        ]
    )
    cfg = AnalyzerConfig(mode="porter")
    build_index(spark, docs, root, config=cfg, n_build_partitions=2, chunk_size=2)
    index = Index.open(spark, root, cfg)
    update_synonyms(index, [("transport", GROUP)])
    oracle = Fts5Index.build(
        [(r, _rewrite(t), _rewrite(b)) for r, t, b in DOCS]
    )
    return index, oracle


@pytest.mark.parametrize("query", QUERIES)
def test_synonym_expansion_rank_identity(built, query):
    index, oracle = built
    s = Searcher(index, stopwords=frozenset())  # synonyms load from index
    assert s.synonyms.get("car") == ["auto", "vehicle"]

    match = compile_match_string(reduce_phrases(parse_query(query)))
    expected = oracle.search(match, limit=10)
    df, total, _ = s.search_df(query, limit=10)
    got = [(r["rowid"], r["score"]) for r in df.collect()] if df is not None else []
    assert [r for r, _ in got] == [r for r, _ in expected], (query, got, expected)
    for (_, sg), (_, se) in zip(got, expected):
        assert math.isclose(sg, se, rel_tol=1e-9, abs_tol=1e-12), (query, sg, se)


def test_synonym_df_matches_union(built):
    """df of the expanded term = docs containing ANY group member — the
    idf every group query shares (colocated-token df semantics)."""
    index, oracle = built
    s = Searcher(index, stopwords=frozenset())
    _df, total, _ = s.search_df("auto", limit=10)
    assert total == len(oracle.match_rowids('"auto"'))
    # 8 docs carry a group member somewhere (1-5, 7, 8, 9)
    assert total == 8
