"""Snowball Hindi stemmer: full-vocabulary proof, live library
cross-check, chain membership, and rank identity.

27,860 (word, stem) golden vectors captured from the compiled
libstemmer 'hindi' UTF-8 stemmer (snowball 2.2.0). The vocabulary
covers the consonant-guarded vs free entry split with fall-through
('कताएं' -> 'कत': the guarded 'ताएं' fails its consonant guard and the
free 'ाएं' fires), the composite vowel+suffix entries
(अकर/ाकर/ाऊंगा/...), the exact consonant grouping including nukta
forms, and the bare virama entry. Regenerate:
python tools/gen_snowball_goldens.py --lang hindi."""

from __future__ import annotations

import ctypes.util
import gzip
import math
import os
import random

import pytest

from letarette_spark.analysis import hindi
from letarette_spark.analysis.tokenizer import Analyzer, AnalyzerConfig

GOLDENS = os.path.join(
    os.path.dirname(__file__), "data", "snowball_hindi_goldens.tsv.gz"
)

_HAVE_LIB = bool(
    ctypes.util.find_library("stemmer")
    or os.path.exists("/usr/lib/x86_64-linux-gnu/libstemmer.so.0d")
)


def test_hindi_matches_compiled_snowball_goldens():
    bad = []
    n = 0
    with gzip.open(GOLDENS, "rt", encoding="utf-8") as f:
        for line in f:
            word, want = line.rstrip("\n").split("\t")
            n += 1
            got = hindi.stem(word)
            if got != want:
                bad.append((word, want, got))
    assert n > 20000
    assert not bad, f"{len(bad)}/{n} divergences, first 20: {bad[:20]}"


@pytest.mark.skipif(not _HAVE_LIB, reason="compiled libstemmer not available")
def test_hindi_matches_live_library_on_fresh_randoms():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from gen_snowball_goldens import SnowballStemmer

    st = SnowballStemmer("hindi")
    rng = random.Random()  # intentionally unseeded: fresh vectors each run
    cons = "कखगघङचछजझञटठडढणतथदधनपफबभमयरलवशषसह"
    alpha = (
        cons * 2
        + "ािीुूृेैोौ" * 2
        + "अआइईउऊऋएऐओऔ"
        + "ँंः्"
        + "क़ख़ग़ज़ड़ढ़फ़य़़ऩऱळऴ"
    )
    bad = []
    for _ in range(4000):
        w = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 14)))
        if hindi.stem(w) != st.stem(w):
            bad.append((w, st.stem(w), hindi.stem(w)))
    assert not bad, bad[:10]


def test_known_hindi_forms():
    cases = {
        "लड़का": "लड़क",
        "लड़कियाँ": "लड़क",
        "किताबें": "किताब",
        "बच्चों": "बच्च",
        "करना": "कर",
        "खाऊंगा": "ख",
        # guarded suffix needs a consonant directly before it
        "कीकर": "कीकर",
        "क्कर": "क्कर",
        "अककर": "अक",
        # guard failure falls through to the free table
        "कताएं": "कत",
        "ाएं": "ा",
        # virama is a free entry
        "क्": "क",
    }
    for w, want in cases.items():
        assert hindi.stem(w) == want, (w, hindi.stem(w), want)


def test_chain_membership():
    from letarette_spark.analysis import porter2

    vocab = []
    with gzip.open(GOLDENS, "rt", encoding="utf-8") as f:
        for i, line in enumerate(f):
            if i % 17 == 0:
                vocab.append(line.split("\t")[0])

    def chain_expected(word, langs):
        stems = {"english": porter2.stem, "hindi": hindi.stem}
        out = word
        for lang in langs:
            out = stems[lang](word)
            if len(out.encode("utf-8")) != len(word.encode("utf-8")):  # byte rule, snowball.c:216
                break
        return out

    # Devanagari words are untouched by porter2, so english-first chains
    # still reach the hindi stemmer (length-unchanged -> next in chain).
    for langs in (("english", "hindi"), ("hindi", "english")):
        an = Analyzer(AnalyzerConfig(languages=langs))
        for w in vocab[:400]:
            if 3 <= len(w.encode("utf-8")) <= 40:
                assert an.term_of(w) == chain_expected(w, langs), (w, langs)


def test_rank_identity(spark, tmp_path):
    """Whole-pipeline identity under the hindi chain via pre-stemming
    (same oracle technique as test_swedish_goldens.py). Exercises the
    non-Latin script end-to-end: Devanagari survives unicode61 folding
    (vowel signs are not in the diacritic-removal set)."""
    from letarette_spark.index.builder import Index, build_index
    from letarette_spark.query.executor import Searcher
    from letarette_spark.query.parser import (
        Phrase,
        compile_match_string,
        parse_query,
        reduce_phrases,
    )
    from tests.fts5_oracle import Fts5Index

    cfg = AnalyzerConfig(languages=("hindi",))
    an = Analyzer(cfg)
    words = (
        "लड़का लड़के लड़कियाँ किताबें किताबों बच्चा बच्चे बच्चों "
        "खाता खाती खाते खाना करना करता करती आदमी औरतें घर सड़क "
        "स्कूल शहर गांव देश दुनिया समय दिन रात सुबह शाम और में है"
    ).split()
    rng = random.Random(31)
    docs = []
    for i in range(40):
        title = " ".join(rng.choices(words, k=rng.randint(1, 3)))
        body = " ".join(rng.choices(words, k=rng.randint(8, 25)))
        docs.append((i + 1, title, body))

    root = str(tmp_path / "hi_rank_idx")
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
    for q in ("लड़कियाँ", "किताबें बच्चों", "खाना -करना"):
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
