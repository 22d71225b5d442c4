"""Snowball Arabic stemmer: full-vocabulary proof, live library
cross-check, chain membership, and rank identity over an RTL script.

21,273 (word, stem) golden vectors captured from the compiled
libstemmer 'arabic' UTF-8 stemmer (snowball 2.2.0).  The vocabulary
covers Normalize_pre (tatweel/diacritic strip, Arabic-Indic digit
mapping, presentation-form folding), the Checks1 article detection
(is_noun/is_verb/is_defined gating), every noun/verb suffix table,
all prefix steps (hamza doubling, conjunctions, articles, ب/ك
doubling, verb tense prefixes incl. the يست/نست/تست -> است rewrite),
and Normalize_post hamza folding — each entry composed in front of /
behind real bases so the character-count length gates fire on both
sides.

Regenerate: python tools/gen_snowball_goldens.py --lang arabic."""

from __future__ import annotations

import ctypes.util
import gzip
import os
import random

import pytest

from letarette_spark.analysis import arabic
from letarette_spark.analysis.tokenizer import Analyzer, AnalyzerConfig

GOLDENS = os.path.join(
    os.path.dirname(__file__), "data", "snowball_arabic_goldens.tsv.gz"
)

_HAVE_LIB = bool(
    ctypes.util.find_library("stemmer")
    or os.path.exists("/usr/lib/x86_64-linux-gnu/libstemmer.so.0d")
)


def test_arabic_matches_compiled_snowball_goldens():
    bad = []
    n = 0
    with gzip.open(GOLDENS, "rt", encoding="utf-8") as f:
        for line in f:
            word, want = line.rstrip("\n").split("\t")
            n += 1
            got = arabic.stem(word)
            if got != want:
                bad.append((word, want, got))
    assert n > 20000
    assert not bad, f"{len(bad)}/{n} divergences, first 20: {bad[:20]}"


@pytest.mark.skipif(not _HAVE_LIB, reason="compiled libstemmer not available")
def test_arabic_matches_live_library_on_fresh_randoms():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from gen_snowball_goldens import SnowballStemmer

    st = SnowballStemmer("arabic")
    rng = random.Random()  # intentionally unseeded: fresh vectors each run
    alpha = (
        "ابتثجحخدذرزسشصضطظعغفقكلمنهوي" * 2
        + "ىةءأإآؤئًٌٍَُِّْـ٠١٢٣٤٥٦٧٨٩ﻻﻷﷲﺀﺁ"
    )
    bad = []
    for _ in range(4000):
        w = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 12)))
        want = st.stem(w)
        if want is None:
            continue
        if arabic.stem(w) != want:
            bad.append((w, want, arabic.stem(w)))
    assert not bad, bad[:10]


def test_known_arabic_forms():
    cases = {
        # Checks1 article detection + prefix strip
        "الكتاب": "كتاب",
        "بالمدرسة": "مدرس",
        # possessive suffix (noun path)
        "كتابهم": "كتاب",
        "مدرستها": "مدرس",
        # verb person/number endings (verb path)
        "يكتبون": "يكتب",
        # conjunction + tense prefix + object pronoun, all at once
        "فسيكتبونها": "يكتب",
        # است protected (Prefix_Step4_Verb leaves the است stem)
        "استخدام": "استخدام",
        # Normalize_pre: tatweel + harakat stripped
        "مـــدرســـة": "مدرس",
        "مُدَرِّسَةٌ": "مدرس",
        # Normalize_post hamza folding
        "قرؤوا": "قرء",
        "شيئا": "شيء",
        "مسؤول": "مسوول",
        # Arabic-Indic digits -> ASCII
        "٠١٢٣": "0123",
        # presentation-form ligature folding
        "ﻷن": "لان",
        # hamza-on-alef doubling (Prefix_Step1)
        "أأكل": "اكل",
        # bare alef maqsura rewrite
        "ى": "ي",
    }
    for w, want in cases.items():
        assert arabic.stem(w) == want, (w, arabic.stem(w), want)


def test_chain_membership():
    from letarette_spark.analysis import porter2

    vocab = []
    with gzip.open(GOLDENS, "rt", encoding="utf-8") as f:
        for i, line in enumerate(f):
            if i % 17 == 0:
                vocab.append(line.split("\t")[0])

    def chain_expected(word, langs):
        stems = {"english": porter2.stem, "arabic": arabic.stem}
        out = word
        nbytes = len(word.encode("utf-8"))
        for lang in langs:
            out = stems[lang](word)
            # byte-length chain rule (snowball.c:216)
            if len(out.encode("utf-8")) != nbytes:
                break
        return out

    for langs in (("english", "arabic"), ("arabic", "english")):
        an = Analyzer(AnalyzerConfig(languages=langs))
        for w in vocab[:400]:
            if 3 <= len(w.encode("utf-8")) <= 40:
                assert an.term_of(w) == chain_expected(w, langs), (w, langs)


def test_rank_identity(spark, tmp_path):
    """Whole-pipeline identity under the arabic chain — an RTL script
    — via the term-remapping oracle (stems collide after folding, so
    remap every term to a synthetic ASCII id, preserving positions,
    dl, and df exactly)."""
    from letarette_spark.index.builder import Index, build_index
    from letarette_spark.query.executor import Searcher
    from letarette_spark.query.parser import (
        Phrase,
        compile_match_string,
        parse_query,
        reduce_phrases,
    )
    from tests.fts5_oracle import Fts5Index

    cfg = AnalyzerConfig(languages=("arabic",))
    an = Analyzer(cfg)
    words = (
        "الكتاب المدرسة الجامعة الطالب المهندس الطبيب البيت الباب "
        "الشمس القمر البحر النهر الجبل الشجرة كتابهم مدرستها يكتبون "
        "تكتبين استخدام والمستخدمون الصديق الجار السلام الحرب الحب "
        "الفرح العلم النور السفر الوصول الدخول الخروج قرأ شرب أكل ذهب"
    ).split()
    rng = random.Random(68)
    docs = []
    for i in range(40):
        title = " ".join(rng.choices(words, k=rng.randint(1, 3)))
        body = " ".join(rng.choices(words, k=rng.randint(8, 25)))
        docs.append((i + 1, title, body))

    root = str(tmp_path / "ar_rank_idx")
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
    for q in ("الكتاب", "المدرسة العلم", "البحر -النور"):
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
        assert [r for r, _s in got] == [r for r, _s in exp], q
        for (_r1, s1), (_r2, s2) in zip(got, exp):
            assert abs(s1 - s2) < 1e-9, q
