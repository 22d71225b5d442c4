"""Snowball Armenian stemmer: full-vocabulary proof, live library
cross-check, chain membership, and rank identity.

25,177 (word, stem) golden vectors captured from the compiled
libstemmer 'armenian' UTF-8 stemmer (snowball 2.2.0).  The vocabulary
covers the setlimit-to-pV window on all four amongs (fail-link
navigation: 'բությանն' falls back from 'ությանն' to 'ն' inside the
window while 'մեծությանն' matches fully but fails the p2 check), the
ending/verb/adjective/noun sequencing, and the vowel grouping (ա ե է
ը ի ո ւ օ, not և).  Regenerate:
python tools/gen_snowball_goldens.py --lang armenian."""

from __future__ import annotations

import ctypes.util
import gzip
import math
import os
import random

import pytest

from letarette_spark.analysis import armenian
from letarette_spark.analysis.tokenizer import Analyzer, AnalyzerConfig

GOLDENS = os.path.join(
    os.path.dirname(__file__), "data", "snowball_armenian_goldens.tsv.gz"
)

_HAVE_LIB = bool(
    ctypes.util.find_library("stemmer")
    or os.path.exists("/usr/lib/x86_64-linux-gnu/libstemmer.so.0d")
)


def test_armenian_matches_compiled_snowball_goldens():
    bad = []
    n = 0
    with gzip.open(GOLDENS, "rt", encoding="utf-8") as f:
        for line in f:
            word, want = line.rstrip("\n").split("\t")
            n += 1
            got = armenian.stem(word)
            if got != want:
                bad.append((word, want, got))
    assert n > 20000
    assert not bad, f"{len(bad)}/{n} divergences, first 20: {bad[:20]}"


@pytest.mark.skipif(not _HAVE_LIB, reason="compiled libstemmer not available")
def test_armenian_matches_live_library_on_fresh_randoms():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from gen_snowball_goldens import SnowballStemmer

    st = SnowballStemmer("armenian")
    rng = random.Random()  # intentionally unseeded: fresh vectors each run
    alpha = "աբգդեզէըթժիլխծկհձղճմյնշոչպջռսվտրցւփքօֆև"
    bad = []
    for _ in range(4000):
        w = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 14)))
        if armenian.stem(w) != st.stem(w):
            bad.append((w, st.stem(w), armenian.stem(w)))
    assert not bad, bad[:10]


def test_known_armenian_forms():
    cases = {
        # windowed fail-link: strips ն then ան
        "բությանն": "բությ",
        # full match inside window, p2 check fails -> untouched
        "մեծությանն": "մեծությանն",
        # ending then verb then noun sequencing
        "մեծակել": "մեծ",
        # adjective precedes noun: a noun strip cannot feed adjective
        "գրերենակ": "գրերեն",
        "մեծերենի": "մեծ",
        "գրականների": "գրակ",
        "մեծական": "մեծ",
        "տներում": "տներ",
        "կարդալով": "կարդ",
        # և is not a region vowel
        "բևբալ": "բևբալ",
        "բւբալ": "բւբ",
    }
    for w, want in cases.items():
        assert armenian.stem(w) == want, (w, armenian.stem(w), want)


def test_chain_membership():
    from letarette_spark.analysis import porter2

    vocab = []
    with gzip.open(GOLDENS, "rt", encoding="utf-8") as f:
        for i, line in enumerate(f):
            if i % 17 == 0:
                vocab.append(line.split("\t")[0])

    def chain_expected(word, langs):
        stems = {"english": porter2.stem, "armenian": armenian.stem}
        out = word
        for lang in langs:
            out = stems[lang](word)
            if len(out.encode("utf-8")) != len(word.encode("utf-8")):  # byte rule, snowball.c:216
                break
        return out

    for langs in (("english", "armenian"), ("armenian", "english")):
        an = Analyzer(AnalyzerConfig(languages=langs))
        for w in vocab[:400]:
            if 3 <= len(w.encode("utf-8")) <= 40:
                assert an.term_of(w) == chain_expected(w, langs), (w, langs)


def test_rank_identity(spark, tmp_path):
    """Whole-pipeline identity under the armenian chain via
    pre-stemming (same oracle technique as test_swedish_goldens.py;
    armenian stems are never empty — every delete needs its cut at or
    past pV, which sits after the first vowel)."""
    from letarette_spark.index.builder import Index, build_index
    from letarette_spark.query.executor import Searcher
    from letarette_spark.query.parser import (
        Phrase,
        compile_match_string,
        parse_query,
        reduce_phrases,
    )
    from tests.fts5_oracle import Fts5Index

    cfg = AnalyzerConfig(languages=("armenian",))
    an = Analyzer(cfg)
    words = (
        "գրականների քաղաքների գյուղերում ծառերի ջրերը լեռներ "
        "աշխատանքներ խոսքերով մտածումներ երգերի պարերը խաղերում "
        "գործերի դրամներ ժամերը օրերի գիշերները կյանքում "
        "ընկերների ընտանիքներ մայրերի հայրերը որդիների և է որ"
    ).split()
    rng = random.Random(43)
    docs = []
    for i in range(40):
        title = " ".join(rng.choices(words, k=rng.randint(1, 3)))
        body = " ".join(rng.choices(words, k=rng.randint(8, 25)))
        docs.append((i + 1, title, body))

    root = str(tmp_path / "hy_rank_idx")
    sdf = spark.createDataFrame(
        [
            {"doc_id": f"d{r}", "rowid": r, "space": "m", "title": t,
             "body": b, "alive": True}
            for r, t, b in docs
        ]
    )
    build_index(spark, sdf, root, config=cfg, n_build_partitions=2,
                chunk_size=2)
    s = Searcher(Index.open(spark, root, cfg), stopwords=frozenset(),
                 synonyms={})

    def prestem(text):
        return " ".join(an.terms(text))

    oracle = Fts5Index.build(
        [(r, prestem(t), prestem(b)) for r, t, b in docs],
        tokenizer="unicode61 remove_diacritics 2",
    )
    for q in ("գրականների", "քաղաքների ծառերի", "երգերի -խաղերում"):
        phrases = []
        for p in reduce_phrases(parse_query(q)):
            terms = an.terms(p.text)
            if terms:
                phrases.append(
                    Phrase(" ".join(terms), wildcard=p.wildcard,
                           exclude=p.exclude)
                )
        match = compile_match_string(phrases)
        exp = oracle.search(match, limit=10) if match else []
        df, _t, _c = s.search_df(q, limit=10)
        got = (
            [(r["rowid"], r["score"]) for r in df.collect()]
            if df is not None
            else []
        )
        assert [r for r, _ in got] == [r for r, _ in exp], q
        for (_, sg), (_, se) in zip(got, exp):
            assert math.isclose(sg, se, rel_tol=1e-9, abs_tol=1e-12), q
