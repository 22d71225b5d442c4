"""TF-IDF keywords and PMI collocations (functions/keywords.py) vs
brute-force Python oracles, including the deterministic tie-breaks."""

from __future__ import annotations

import math
import re
from collections import Counter

from letarette_spark.functions.keywords import pmi_collocations, tfidf_keywords

DOCS = [
    (1, "spark shuffle join spark shuffle agg"),
    (2, "spark scan filter scan scan"),
    (3, "join join join window rank window"),
    (4, "filter rank agg window spark"),
]


def _toks(text):
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if len(t) >= 2]


def test_tfidf_matches_bruteforce(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    got = [
        (r["doc_id"], r["term"], r["tf"], r["score"], r["rank"])
        for r in tfidf_keywords(df, k=3).orderBy("doc_id", "rank").collect()
    ]
    n = len(DOCS)
    dfreq: Counter = Counter()
    tfs = {}
    for d, text in DOCS:
        c = Counter(_toks(text))
        tfs[d] = c
        for t in c:
            dfreq[t] += 1
    want = []
    for d, _ in DOCS:
        scored = sorted(
            (
                (t, c, round(c * math.log(n / dfreq[t]), 6))
                for t, c in tfs[d].items()
            ),
            key=lambda x: (-x[2], x[0]),
        )
        for i, (t, c, s) in enumerate(scored[:3], 1):
            want.append((d, t, c, s, i))
    assert got == want


def test_tfidf_everywhere_term_scores_zero(spark):
    df = spark.createDataFrame(
        [(1, "common alpha"), (2, "common beta"), (3, "common gamma")],
        "doc_id int, text string",
    )
    rows = tfidf_keywords(df, k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["term"], r["score"]))
    for d, lst in by_doc.items():
        lst.sort()
        # the distinctive term wins rank 1; 'common' (df = N) scores 0.0
        assert lst[0][2] > 0.0
        assert lst[1] == (2, "common", 0.0)


def test_pmi_matches_bruteforce(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    got = [
        (r["a"], r["b"], r["n_ab"], r["pmi"])
        for r in pmi_collocations(df, k=10, min_count=2).collect()
    ]
    uni: Counter = Counter()
    bi: Counter = Counter()
    for _, text in DOCS:
        ts = _toks(text)
        uni.update(ts)
        bi.update(zip(ts, ts[1:]))
    T = sum(uni.values())
    # p(a,b) normalizes over ALL bigram events; min_count only gates
    # which pairs are reported
    B = sum(bi.values())
    bi = Counter({p: c for p, c in bi.items() if c >= 2})
    want = sorted(
        (
            (a, b, c, round(math.log((c / B) / ((uni[a] / T) * (uni[b] / T))), 6))
            for (a, b), c in bi.items()
        ),
        key=lambda x: (-x[3], x[0], x[1]),
    )[:10]
    assert got == want
    assert len(got) > 0


def test_pmi_min_count_and_empty(spark):
    df = spark.createDataFrame(
        [(1, "xx yy"), (2, "zz qq")], "doc_id int, text string"
    )
    # every bigram occurs once -> min_count=2 filters all
    assert pmi_collocations(df, k=5, min_count=2).count() == 0


def test_keyword_plans(spark):
    """tfidf joins the corpus-size frame as a BROADCAST (never a
    shuffled join of a 1-row table); pmi broadcasts both totals."""
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    p1 = (
        tfidf_keywords(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in p1 or "BroadcastExchange" in p1
    assert "CartesianProduct" not in p1
    p2 = (
        pmi_collocations(df, min_count=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in p2
