"""Snowball Nepali stemmer: full-vocabulary proof, live library
cross-check, chain membership, and rank identity.

30,274 (word, stem) golden vectors captured from the compiled
libstemmer 'nepali' UTF-8 stemmer (snowball 2.2.0).  The vocabulary
covers the three-category structure: category-1 postpositions with
the क-form ए/े guard ('कएको' -> क via category 3, 'कआको' -> कआ via
category 1), the context-gated category-2 nasals (ं after यौ/छौ/नौ/थे,
ै after त्र, stripped even when the following category-3 step fails:
'कनौं' -> कनौ), stacked category-3 loop chains, and whole-word
consumption ('हरूलाई' -> '').  Regenerate:
python tools/gen_snowball_goldens.py --lang nepali."""

from __future__ import annotations

import ctypes.util
import gzip
import math
import os
import random

import pytest

from letarette_spark.analysis import nepali
from letarette_spark.analysis.tokenizer import Analyzer, AnalyzerConfig

GOLDENS = os.path.join(
    os.path.dirname(__file__), "data", "snowball_nepali_goldens.tsv.gz"
)

_HAVE_LIB = bool(
    ctypes.util.find_library("stemmer")
    or os.path.exists("/usr/lib/x86_64-linux-gnu/libstemmer.so.0d")
)


def test_nepali_matches_compiled_snowball_goldens():
    bad = []
    n = 0
    with gzip.open(GOLDENS, "rt", encoding="utf-8") as f:
        for line in f:
            word, want = line.rstrip("\n").split("\t")
            n += 1
            got = nepali.stem(word)
            if got != want:
                bad.append((word, want, got))
    assert n > 20000
    assert not bad, f"{len(bad)}/{n} divergences, first 20: {bad[:20]}"


@pytest.mark.skipif(not _HAVE_LIB, reason="compiled libstemmer not available")
def test_nepali_matches_live_library_on_fresh_randoms():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from gen_snowball_goldens import SnowballStemmer

    st = SnowballStemmer("nepali")
    rng = random.Random()  # intentionally unseeded: fresh vectors each run
    cons = "कखगघङचछजझटठडढणतथदधनपफबभमयरलवशषसह"
    alpha = cons * 2 + "ािीुूृेैोौ" * 2 + "अआइईउऊएऐओऔ" + "ँंः्"
    bad = []
    for _ in range(4000):
        w = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 14)))
        if nepali.stem(w) != st.stem(w):
            bad.append((w, st.stem(w), nepali.stem(w)))
    assert not bad, bad[:10]


def test_known_nepali_forms():
    cases = {
        # category 1 once
        "रामले": "राम",
        "रामलाई": "राम",
        "रामको": "राम",
        "घरमा": "घर",
        # क-form guard: preceding ए/े defers to category 3
        "भएको": "भ",
        "कखेको": "कख",
        "कआको": "कआ",
        # category-3 loop, incl. whole-word consumption
        "केटाहरू": "केटा",
        "केटाहरूले": "केटा",
        "हरूलाई": "",
        "हुनेछ": "",
        "गर्छन्": "गर्",
        "गरेका": "गर",
        # category-2 nasal: context-gated, survives cat-3 failure
        "कयौं": "क",
        "कनौं": "कनौ",
        "रामं": "रामं",
        "कत्रै": "कत्र",
        "कखै": "कखै",
    }
    for w, want in cases.items():
        assert nepali.stem(w) == want, (w, nepali.stem(w), want)


def test_chain_membership():
    from letarette_spark.analysis import porter2

    vocab = []
    with gzip.open(GOLDENS, "rt", encoding="utf-8") as f:
        for i, line in enumerate(f):
            if i % 19 == 0:
                vocab.append(line.split("\t")[0])

    def chain_expected(word, langs):
        stems = {"english": porter2.stem, "nepali": nepali.stem}
        out = word
        for lang in langs:
            out = stems[lang](word)
            if len(out.encode("utf-8")) != len(word.encode("utf-8")):  # byte rule, snowball.c:216
                break
        return out

    for langs in (("english", "nepali"), ("nepali", "english")):
        an = Analyzer(AnalyzerConfig(languages=langs))
        for w in vocab[:400]:
            if 3 <= len(w.encode("utf-8")) <= 40:
                assert an.term_of(w) == chain_expected(w, langs), (w, langs)


def test_rank_identity(spark, tmp_path):
    """Whole-pipeline identity under the nepali chain.

    Unlike the hindi/swedish pre-stem-join oracle, nepali can stem a
    token to the EMPTY string ('छ' -> '': category 3 may consume the
    whole token; the reference emits it anyway, snowball.c:220 xToken
    with stemmedLength 0, so FTS5 indexes a zero-length term and the
    position is consumed).  A joined pre-stemmed text would silently
    drop those tokens, so instead every term (including '') is
    remapped to a synthetic ASCII id before feeding FTS5 — preserving
    positions, dl, and df exactly, which is all BM25 sees."""
    from letarette_spark.index.builder import Index, build_index
    from letarette_spark.query.executor import Searcher
    from letarette_spark.query.parser import (
        Phrase,
        compile_match_string,
        parse_query,
        reduce_phrases,
    )
    from tests.fts5_oracle import Fts5Index

    cfg = AnalyzerConfig(languages=("nepali",))
    an = Analyzer(cfg)
    words = (
        "राम घर किताब केटा केटी मान्छे नेपाल पहाड हिमाल नदी गाउँ "
        "शहर बाटो पानी रूख फूल चरा कुकुर गाई भात दाल खाना जीवन "
        "साथी परिवार आमा बुबा छोरा छोरी केटाहरू घरमा रामले गर्छन् "
        "भएको गरेका हुनेछ र छ हो"
    ).split()
    rng = random.Random(37)
    docs = []
    for i in range(40):
        title = " ".join(rng.choices(words, k=rng.randint(1, 3)))
        body = " ".join(rng.choices(words, k=rng.randint(8, 25)))
        docs.append((i + 1, title, body))

    root = str(tmp_path / "ne_rank_idx")
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
    for q in ("केटाहरू", "घरमा रामले", "किताब -खाना"):
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
