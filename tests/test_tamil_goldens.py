"""Snowball Tamil stemmer: full-vocabulary proof, live library
cross-check, chain membership, and rank identity.

17,184 (word, stem) golden vectors captured from the compiled
libstemmer 'tamil' UTF-8 stemmer (snowball 2.2.0).  The vocabulary
covers the section pipeline (question/pronoun prefixes, question
suffixes with their unconditional fix loop, um, common endings,
vetrumai urupukal, plural, command, the repeating tense step), the
sandhi fixes (ட்ப்->ள், ன்ற்->ல், ட்ட்->டு, ங்->ம், ்C்C deletion),
and the interactions that only emerge through section ordering
('வீடுங்கள்' -> வீடும் because plural has no fix tail of its own
while the tense loop's len guard protects short results).
Regenerate: python tools/gen_snowball_goldens.py --lang tamil."""

from __future__ import annotations

import ctypes.util
import gzip
import math
import os
import random

import pytest

from letarette_spark.analysis import tamil
from letarette_spark.analysis.tokenizer import Analyzer, AnalyzerConfig

GOLDENS = os.path.join(
    os.path.dirname(__file__), "data", "snowball_tamil_goldens.tsv.gz"
)

_HAVE_LIB = bool(
    ctypes.util.find_library("stemmer")
    or os.path.exists("/usr/lib/x86_64-linux-gnu/libstemmer.so.0d")
)


def test_tamil_matches_compiled_snowball_goldens():
    bad = []
    n = 0
    with gzip.open(GOLDENS, "rt", encoding="utf-8") as f:
        for line in f:
            word, want = line.rstrip("\n").split("\t")
            n += 1
            got = tamil.stem(word)
            if got != want:
                bad.append((word, want, got))
    assert n > 14000
    assert not bad, f"{len(bad)}/{n} divergences, first 20: {bad[:20]}"


@pytest.mark.skipif(not _HAVE_LIB, reason="compiled libstemmer not available")
def test_tamil_matches_live_library_on_fresh_randoms():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from gen_snowball_goldens import SnowballStemmer

    st = SnowballStemmer("tamil")
    rng = random.Random()  # intentionally unseeded: fresh vectors each run
    alpha = ("கஙசஞடணதநபமயரலவழளறன" * 2 + "அஆஇஈஉஊஎஏஐஒஓஔ"
             + "ாிீுூெேைொோௌ்" * 2)
    bad = []
    for _ in range(4000):
        w = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 12)))
        if tamil.stem(w) != st.stem(w):
            bad.append((w, st.stem(w), tamil.stem(w)))
    assert not bad, bad[:10]


def test_known_tamil_forms():
    cases = {
        # plural + sandhi
        "மரங்கள்": "மரங்",
        "பாடங்கள்": "பாடம்",
        "வீடுங்கள்": "வீடும்",
        "உணவுங்கள்": "உணவ்",
        "ஊர்கள்": "ஊர்",
        # um + fix chain
        "வீடும்": "வீ",
        "வீடுகும்": "வீட்",
        # tense
        "அஆஅமார்கள்": "அஆஅ",
        "உஞகிற": "உஞ",
        # vetrumai locatives delete outright
        "அஆஅகண்": "அஆஅ",
        # fix_ending sandhi
        "ஊத்தோ": "ஊ",
        "றழங்": "றழம்",
    }
    for w, want in cases.items():
        assert tamil.stem(w) == want, (w, tamil.stem(w), want)


def test_chain_membership():
    from letarette_spark.analysis import porter2

    vocab = []
    with gzip.open(GOLDENS, "rt", encoding="utf-8") as f:
        for i, line in enumerate(f):
            if i % 13 == 0:
                vocab.append(line.split("\t")[0])

    def chain_expected(word, langs):
        stems = {"english": porter2.stem, "tamil": tamil.stem}
        out = word
        for lang in langs:
            out = stems[lang](word)
            if len(out.encode("utf-8")) != len(word.encode("utf-8")):  # byte rule, snowball.c:216
                break
        return out

    for langs in (("english", "tamil"), ("tamil", "english")):
        an = Analyzer(AnalyzerConfig(languages=langs))
        for w in vocab[:400]:
            if 3 <= len(w.encode("utf-8")) <= 40:
                assert an.term_of(w) == chain_expected(w, langs), (w, langs)


def test_rank_identity(spark, tmp_path):
    """Whole-pipeline identity under the tamil chain via the
    term-remapping oracle (Tamil matras split under unicode61 exactly
    like Devanagari, and stems may collide after folding, so remap
    every term — including any empty stem — to a synthetic ASCII id,
    preserving positions, dl, and df exactly)."""
    from letarette_spark.index.builder import Index, build_index
    from letarette_spark.query.executor import Searcher
    from letarette_spark.query.parser import (
        Phrase,
        compile_match_string,
        parse_query,
        reduce_phrases,
    )
    from tests.fts5_oracle import Fts5Index

    cfg = AnalyzerConfig(languages=("tamil",))
    an = Analyzer(cfg)
    words = (
        "மரங்கள் வீடுகள் பள்ளிகள் புத்தகங்கள் குழந்தைகள் "
        "நண்பர்கள் ஆசிரியர்கள் மாணவர்கள் ஊர்கள் கடல்கள் "
        "மலைகள் ஆறுகள் பறவைகள் மீன்கள் நாய்கள் பூனைகள் "
        "மாடுகள் யானைகள் பழங்கள் பூக்கள் இலைகள் காடுகள் "
        "வயல்கள் சோறு பால் உணவு இரவு பகல் காலை மாலை "
        "ஆண்டுகள் மாதங்கள் வாரங்கள்"
    ).split()
    rng = random.Random(67)
    docs = []
    for i in range(40):
        title = " ".join(rng.choices(words, k=rng.randint(1, 3)))
        body = " ".join(rng.choices(words, k=rng.randint(8, 25)))
        docs.append((i + 1, title, body))

    root = str(tmp_path / "ta_rank_idx")
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
    for q in ("மரங்கள்", "வீடுகள் பள்ளிகள்", "மலைகள் -இரவு"):
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
