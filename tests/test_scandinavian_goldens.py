"""Snowball Norwegian + Danish stemmers: full-vocabulary proofs, live
compiled-library cross-checks, chain membership, and rank identity.

~20k (word, stem) golden vectors per language captured from the compiled
libstemmer UTF-8 stemmers (the library the reference's tokenizer links —
internal/snowball/byggfil; sb_stemmer_new(lang, "UTF_8"),
snowball.c:296). Vectors cover bases x suffix matrices over every rule
family — Norwegian: the 25 step-1 endings + erte/ert->er + the
conditional s with its 'k-after-non-vowel' clause, dt/vt trims, the
step-3 lov-family; Danish: the 30 step-1 endings, the å-inclusive
s-ending set, gd/dt/gt/kt trims, igst/løst, the step-2 re-run after
ig/lig/elig/els, and final-consonant undoubling — plus rule-edge
adversarials and 15k seeded random strings per language. Regenerate:
python tools/gen_snowball_goldens.py --lang norwegian|danish."""

from __future__ import annotations

import ctypes.util
import gzip
import math
import os
import random

import pytest

from letarette_spark.analysis import danish, norwegian
from letarette_spark.analysis.tokenizer import Analyzer, AnalyzerConfig

_DATA = os.path.join(os.path.dirname(__file__), "data")

_HAVE_LIB = bool(
    ctypes.util.find_library("stemmer")
    or os.path.exists("/usr/lib/x86_64-linux-gnu/libstemmer.so.0d")
)

_LANGS = [("norwegian", norwegian), ("danish", danish)]


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
    assert n > 18000
    assert not bad, f"{len(bad)}/{n} divergences, first 20: {bad[:20]}"


@pytest.mark.skipif(not _HAVE_LIB, reason="compiled libstemmer not available")
@pytest.mark.parametrize("lang,mod", _LANGS, ids=[lg for lg, _ in _LANGS])
def test_matches_live_library_on_fresh_randoms(lang, mod):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from gen_snowball_goldens import SnowballStemmer

    st = SnowballStemmer(lang)
    rng = random.Random()  # intentionally unseeded: fresh vectors each run
    alpha = "abcdefghijklmnopqrstuvwxyzæåø" + "aeiouyæåø" * 2 + "st" * 2
    bad = []
    for _ in range(4000):
        w = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 12)))
        if mod.stem(w) != st.stem(w):
            bad.append((w, st.stem(w), mod.stem(w)))
    assert not bad, bad[:10]


def test_chain_membership_and_order():
    """All four non-English stemmers are chainable; snowball.c:213-219
    semantics (first length-change on the ORIGINAL token wins) hold for a
    norwegian+danish chain — the two languages are close enough that
    order genuinely matters for some tokens."""
    vocab = []
    with gzip.open(
        os.path.join(_DATA, "snowball_norwegian_goldens.tsv.gz"),
        "rt",
        encoding="utf-8",
    ) as f:
        for i, line in enumerate(f):
            if i % 13 == 0:
                vocab.append(line.split("\t")[0])

    def chain_expected(word, langs):
        stems = {"norwegian": norwegian.stem, "danish": danish.stem}
        out = word
        for lang in langs:
            out = stems[lang](word)
            if len(out.encode("utf-8")) != len(word.encode("utf-8")):  # byte rule, snowball.c:216
                break
        return out

    order_matters = [
        w
        for w in vocab
        if chain_expected(w, ("norwegian", "danish"))
        != chain_expected(w, ("danish", "norwegian"))
    ]
    assert order_matters, "fixture vocabulary must exercise chain order"
    for langs in (("norwegian", "danish"), ("danish", "norwegian")):
        an = Analyzer(AnalyzerConfig(languages=langs))
        for w in vocab[:300] + order_matters[:50]:
            if 3 <= len(w.encode("utf-8")) <= 40:
                assert an.term_of(w) == chain_expected(w, langs), (w, langs)


@pytest.mark.parametrize(
    "lang,vocab,queries",
    [
        (
            "norwegian",
            "guttene jentene husene barna landene bygningene klokeste "
            "vakreste mulighetene hemmeligheter kjærligheten vennskapet "
            "arbeidet skolene lærerne elevene spiste hoppet kjørte lærte "
            "på og at det som en av",
            ("guttene", "husene barna", "mulighetene -skolene"),
        ),
        (
            "danish",
            "drengene pigerne husene børnene landene bygningerne klogeste "
            "smukkeste mulighederne hemmeligheder kærligheden venskabet "
            "arbejdet skolerne lærerne eleverne spiste hoppede kørte lærte "
            "på og at det som en af",
            ("drengene", "husene børnene", "mulighederne -skolerne"),
        ),
    ],
)
def test_rank_identity(spark, tmp_path, lang, vocab, queries):
    """Whole-pipeline identity under the language chain via pre-stemming:
    both sides receive the identical folded+stemmed token stream, FTS5
    computes real bm25(5,1) over it — the same oracle technique as
    test_swedish_goldens.py."""
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
    rng = random.Random(5)
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


def test_supported_languages_and_config_validation():
    """Every chainable language is goldens-pinned; unknown languages are
    rejected at CONFIG time (not per-token inside an executor)."""
    import os

    import pytest as _pytest

    from letarette_spark.analysis.tokenizer import supported_languages

    langs = supported_languages()
    assert set(langs) >= {
        "english", "swedish", "german", "norwegian", "danish", "french",
        "spanish", "italian", "portuguese", "russian", "dutch",
        "finnish", "romanian",
    }
    for lg in langs:
        if lg in ("english", "porter"):
            continue  # english is pinned by its own porter2 goldens
        assert os.path.exists(
            os.path.join(_DATA, f"snowball_{lg}_goldens.tsv.gz")
        ), lg
    with _pytest.raises(ValueError, match="unsupported stemmer"):
        AnalyzerConfig(languages=("klingon",))
    AnalyzerConfig(mode="porter", languages=("whatever",))  # ignored
