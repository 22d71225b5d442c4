"""Snowball Serbian stemmer: full-vocabulary proof, live library
cross-check, chain membership, and rank identity.

25,631 (word, stem) golden vectors captured from the compiled
libstemmer 'serbian' UTF-8 stemmer (snowball 2.2.0).  The vocabulary
covers the Cyrillic -> Latin transliteration, the ijekavian prelude
(ca'ije'ca / ca'je'ca -> 'e', 'dj' -> 'đ'), the no_diacritics gating
(52 Step_1/Step_2 rewrites only apply to diacritic-free text), the
region rules including the syllabic-r re-anchor ('prst', 'brka',
'rfsu' — and its leading-r-run + blocker-width quirk), and the
Step_1 (130) / Step_2 (2035, stops the stemmer) / Step_3 (deletion)
cascade.

Regenerate: python tools/gen_snowball_goldens.py --lang serbian."""

from __future__ import annotations

import ctypes.util
import gzip
import math
import os
import random

import pytest

from letarette_spark.analysis import serbian
from letarette_spark.analysis.tokenizer import Analyzer, AnalyzerConfig

GOLDENS = os.path.join(
    os.path.dirname(__file__), "data", "snowball_serbian_goldens.tsv.gz"
)

_HAVE_LIB = bool(
    ctypes.util.find_library("stemmer")
    or os.path.exists("/usr/lib/x86_64-linux-gnu/libstemmer.so.0d")
)


def test_serbian_matches_compiled_snowball_goldens():
    bad = []
    n = 0
    with gzip.open(GOLDENS, "rt", encoding="utf-8") as f:
        for line in f:
            word, want = line.rstrip("\n").split("\t")
            n += 1
            got = serbian.stem(word)
            if got != want:
                bad.append((word, want, got))
    assert n > 24000
    assert not bad, f"{len(bad)}/{n} divergences, first 20: {bad[:20]}"


@pytest.mark.skipif(not _HAVE_LIB, reason="compiled libstemmer not available")
def test_serbian_matches_live_library_on_fresh_randoms():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from gen_snowball_goldens import SnowballStemmer

    st = SnowballStemmer("serbian")
    rng = random.Random()  # intentionally unseeded: fresh vectors each run
    alpha = ("abcdefghijklmnoprstuvz" * 2 + "ćčđšž"
             + "абвгдежзиклмнопрстуфхцчшђјљњћџ")
    bad = []
    for _ in range(4000):
        w = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 12)))
        want = st.stem(w)
        if want is None:
            continue
        if serbian.stem(w) != want:
            bad.append((w, want, serbian.stem(w)))
    assert not bad, bad[:10]


def test_known_serbian_forms():
    cases = {
        # cyrillic transliteration
        "девојка": "devojk",
        "љубав": "ljubav",
        "џем": "džem",
        # prelude
        "djak": "đak",
        "prijedlog": "predl",
        # syllabic r region rule
        "prsta": "prst",
        "brka": "brk",
        "rfsu": "rfs",
        "rrfa": "rrfa",
        # no_diacritics gating: 'is' -> 'i' only without diacritics
        "zrcfvis": "zrcfvi",
        "žrcfvis": "žrcfvis",
        # cascade
        "trgovina": "trgovin",
        "jugoslavija": "jugoslav",
        "nestašluk": "nestašluk",
    }
    for w, want in cases.items():
        assert serbian.stem(w) == want, (w, serbian.stem(w), want)


def test_chain_membership():
    from letarette_spark.analysis import porter2

    vocab = []
    with gzip.open(GOLDENS, "rt", encoding="utf-8") as f:
        for i, line in enumerate(f):
            if i % 17 == 0:
                vocab.append(line.split("\t")[0])

    def chain_expected(word, langs):
        stems = {"english": porter2.stem, "serbian": serbian.stem}
        out = word
        nbytes = len(word.encode("utf-8"))
        for lang in langs:
            out = stems[lang](word)
            # byte-length chain rule (snowball.c:216)
            if len(out.encode("utf-8")) != nbytes:
                break
        return out

    for langs in (("english", "serbian"), ("serbian", "english")):
        an = Analyzer(AnalyzerConfig(languages=langs))
        for w in vocab[:400]:
            if 3 <= len(w.encode("utf-8")) <= 40:
                assert an.term_of(w) == chain_expected(w, langs), (w, langs)


def test_rank_identity(spark, tmp_path):
    """Whole-pipeline identity under the serbian chain via the
    term-remapping oracle (stems may collide after folding, so remap
    every term to a synthetic ASCII id, preserving positions, dl, and
    df exactly)."""
    from letarette_spark.index.builder import Index, build_index
    from letarette_spark.query.executor import Searcher
    from letarette_spark.query.parser import (
        Phrase,
        compile_match_string,
        parse_query,
        reduce_phrases,
    )
    from tests.fts5_oracle import Fts5Index

    cfg = AnalyzerConfig(languages=("serbian",))
    an = Analyzer(cfg)
    words = (
        "kuća škola knjiga devojka trgovina prijatelj učitelj radnik "
        "zemlja planina šuma cvet drvo ptica riba mačka mleko hleb "
        "jabuka voda kafa prozor vrata stolica radimo čitamo pišemo "
        "gledamo slušamo govorimo deca ljudi gradovi sela ulice"
    ).split()
    rng = random.Random(67)
    docs = []
    for i in range(40):
        title = " ".join(rng.choices(words, k=rng.randint(1, 3)))
        body = " ".join(rng.choices(words, k=rng.randint(8, 25)))
        docs.append((i + 1, title, body))

    root = str(tmp_path / "sr_rank_idx")
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

    ids: dict[str, str] = {}

    def remap(term: str) -> str:
        if term not in ids:
            ids[term] = f"tt{len(ids)}"
        return ids[term]

    def prestem(text):
        return " ".join(remap(t) for t in an.terms(text))

    oracle = Fts5Index.build(
        [(r, prestem(t), prestem(b)) for r, t, b in docs],
        tokenizer="unicode61 remove_diacritics 2",
    )
    for q in ("kuća", "devojka knjiga", "planina -voda"):
        phrases = []
        for p in reduce_phrases(parse_query(q)):
            terms = an.terms(p.text)
            if terms:
                phrases.append(
                    Phrase(" ".join(remap(t) for t in terms),
                           wildcard=p.wildcard, exclude=p.exclude)
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
