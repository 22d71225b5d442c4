"""Snowball Italian + Portuguese stemmers: full-vocabulary proofs, live
compiled-library cross-checks, chain membership, and rank identity.

~50k (word, stem) golden vectors per language captured from the
compiled libstemmer UTF-8 stemmers (snowball 2.2.0 — the library the
reference's tokenizer links, internal/snowball/byggfil;
sb_stemmer_new(lang, "UTF_8"), snowball.c:296). Vectors cover bases x
suffix matrices over every rule family — Italian: acute->grave + qU/UI
prelude markings, attached pronouns after ando/endo/ar/er/ir, the
step-1 chains, the conjugation table, final-vowel(+i) deletion and
ch/gh -> c/g; Portuguese: nasal-vowel marking (ã/õ), the step-1 chains
incl. e+ira->ir, the conjugation table with ão/ões forms, c-i deletion,
residual vowels, gu/ci strips and ç->c — plus rule-edge adversarials
and 15k seeded random strings per language. Regenerate:
python tools/gen_snowball_goldens.py --lang italian|portuguese."""

from __future__ import annotations

import ctypes.util
import gzip
import math
import os
import random

import pytest

from letarette_spark.analysis import italian, portuguese
from letarette_spark.analysis.tokenizer import Analyzer, AnalyzerConfig

_DATA = os.path.join(os.path.dirname(__file__), "data")

_HAVE_LIB = bool(
    ctypes.util.find_library("stemmer")
    or os.path.exists("/usr/lib/x86_64-linux-gnu/libstemmer.so.0d")
)

_LANGS = [("italian", italian), ("portuguese", portuguese)]


@pytest.mark.parametrize("lang,mod", _LANGS, ids=[lg for lg, _ in _LANGS])
def test_matches_compiled_snowball_goldens(lang, mod):
    bad = []
    n = 0
    path = os.path.join(_DATA, f"snowball_{lang}_goldens.tsv.gz")
    with gzip.open(path, "rt", encoding="utf-8") as f:
        for line in f:
            word, want = line.rstrip("\n").split("\t")
            n += 1
            got = mod.stem(word)
            if got != want:
                bad.append((word, want, got))
    assert n > 45000
    assert not bad, f"{len(bad)}/{n} divergences, first 20: {bad[:20]}"


@pytest.mark.skipif(not _HAVE_LIB, reason="compiled libstemmer not available")
@pytest.mark.parametrize("lang,mod", _LANGS, ids=[lg for lg, _ in _LANGS])
def test_matches_live_library_on_fresh_randoms(lang, mod):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from gen_snowball_goldens import SnowballStemmer

    st = SnowballStemmer(lang)
    rng = random.Random()  # intentionally unseeded: fresh vectors each run
    alpha = {
        "italian": "abcdefghijklmnopqrstuvwxyzàèìòùáéíóú"
        + "aeiouàèìòù" * 2 + "qu" + "ch" + "gh",
        "portuguese": "abcdefghijklmnopqrstuvwxyzáéíóúâêôãõç"
        + "aeiouáéíóúâêôãõ" * 2 + "gu" + "ci",
    }[lang]
    bad = []
    for _ in range(4000):
        w = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 16)))
        if mod.stem(w) != st.stem(w):
            bad.append((w, st.stem(w), mod.stem(w)))
    assert not bad, bad[:10]


def test_chain_membership():
    """Italian and portuguese are chainable under snowball.c:213-219
    semantics (first length-change on the ORIGINAL token wins)."""
    vocab = []
    with gzip.open(
        os.path.join(_DATA, "snowball_italian_goldens.tsv.gz"),
        "rt",
        encoding="utf-8",
    ) as f:
        for i, line in enumerate(f):
            if i % 31 == 0:
                vocab.append(line.split("\t")[0])

    def chain_expected(word, langs):
        stems = {"italian": italian.stem, "portuguese": portuguese.stem}
        out = word
        for lang in langs:
            out = stems[lang](word)
            if len(out.encode("utf-8")) != len(word.encode("utf-8")):  # byte rule, snowball.c:216
                break
        return out

    order_matters = [
        w
        for w in vocab
        if chain_expected(w, ("italian", "portuguese"))
        != chain_expected(w, ("portuguese", "italian"))
    ]
    assert order_matters, "fixture vocabulary must exercise chain order"
    for langs in (("italian", "portuguese"), ("portuguese", "italian")):
        an = Analyzer(AnalyzerConfig(languages=langs))
        for w in vocab[:300] + order_matters[:50]:
            if 3 <= len(w.encode("utf-8")) <= 40:
                assert an.term_of(w) == chain_expected(w, langs), (w, langs)


@pytest.mark.parametrize(
    "lang,vocab,queries",
    [
        (
            "italian",
            "case giardini bambini parlavano cantavano mangeranno "
            "troverà nazionali generali felicemente seriamente "
            "possibilità confusioni psicologia attività creatività "
            "movimenti governi città canzoni meravigliosa antica europea "
            "di la il e un una che per",
            ("case", "giardini bambini", "canzoni -confusioni"),
        ),
        (
            "portuguese",
            "casas jardins meninos falavam cantavam comerão encontrará "
            "nacionais gerais felizmente seriamente possibilidades "
            "confusões psicologia atividades criatividade movimentos "
            "governos cidades canções maravilhosa antiga europeia "
            "de a o e um uma que para",
            ("casas", "jardins meninos", "canções -confusões"),
        ),
    ],
)
def test_rank_identity(spark, tmp_path, lang, vocab, queries):
    """Whole-pipeline identity under the language chain via pre-stemming
    (same oracle technique as test_swedish_goldens.py)."""
    from letarette_spark.index.builder import Index, build_index
    from letarette_spark.query.executor import Searcher
    from letarette_spark.query.parser import (
        Phrase,
        compile_match_string,
        parse_query,
        reduce_phrases,
    )
    from tests.fts5_oracle import Fts5Index

    cfg = AnalyzerConfig(languages=(lang,))
    an = Analyzer(cfg)
    words = vocab.split()
    rng = random.Random(11)
    docs = []
    for i in range(40):
        title = " ".join(rng.choices(words, k=rng.randint(1, 3)))
        body = " ".join(rng.choices(words, k=rng.randint(8, 25)))
        docs.append((i + 1, title, body))

    root = str(tmp_path / f"{lang}_rank_idx")
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
    for q in queries:
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
        assert [r for r, _ in got] == [r for r, _ in exp], (lang, q)
        for (_, sg), (_, se) in zip(got, exp):
            assert math.isclose(sg, se, rel_tol=1e-9, abs_tol=1e-12), (lang, q)
