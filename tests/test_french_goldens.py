"""Snowball French stemmer: full-vocabulary proof, live library
cross-check, chain membership, and rank identity.

47,510 (word, stem) golden vectors captured from the compiled
libstemmer 'french' UTF-8 stemmer (snowball 2.2.0 — the library the
reference's tokenizer links, internal/snowball/byggfil;
sb_stemmer_new(lang, "UTF_8"), snowball.c:296). Vectors cover ~190
French bases x a 140-suffix matrix over every rule family (the step-1
standard suffixes with their ic/iv/at/eus/abl/iqU/ièr/abil chains, the
2a i-verb and 2b er/a-verb conjugations, residual s/ion/ier/e,
undouble, unaccent, and the prelude markings u/i/y/qu/ë/ï), rule-edge
adversarials, and 15k seeded random strings. Regenerate:
python tools/gen_snowball_goldens.py --lang french."""

from __future__ import annotations

import ctypes.util
import gzip
import math
import os
import random

import pytest

from letarette_spark.analysis import french
from letarette_spark.analysis.tokenizer import Analyzer, AnalyzerConfig

GOLDENS = os.path.join(
    os.path.dirname(__file__), "data", "snowball_french_goldens.tsv.gz"
)

_HAVE_LIB = bool(
    ctypes.util.find_library("stemmer")
    or os.path.exists("/usr/lib/x86_64-linux-gnu/libstemmer.so.0d")
)


def test_french_matches_compiled_snowball_goldens():
    bad = []
    n = 0
    with gzip.open(GOLDENS, "rt", encoding="utf-8") as f:
        for line in f:
            word, want = line.rstrip("\n").split("\t")
            n += 1
            got = french.stem(word)
            if got != want:
                bad.append((word, want, got))
    assert n > 40000
    assert not bad, f"{len(bad)}/{n} divergences, first 20: {bad[:20]}"


@pytest.mark.skipif(not _HAVE_LIB, reason="compiled libstemmer not available")
def test_french_matches_live_library_on_fresh_randoms():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from gen_snowball_goldens import SnowballStemmer

    st = SnowballStemmer("french")
    rng = random.Random()  # intentionally unseeded: fresh vectors each run
    alpha = (
        "abcdefghijklmnopqrstuvwxyzâàëéêèïîôûùç"
        + "aeiouyéèêëï" * 2
        + "qu"
        + "st" * 2
    )
    bad = []
    for _ in range(4000):
        w = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 16)))
        if french.stem(w) != st.stem(w):
            bad.append((w, st.stem(w), french.stem(w)))
    assert not bad, bad[:10]


def test_known_french_forms():
    # canonical examples from the published algorithm's sample vocab
    cases = {
        "continuités": "continu",
        "majestueusement": "majestu",
        "chienne": "chien",
        "éreintée": "éreint",
        "importantes": "import",
        "nationaux": "national",
        "psychologie": "psycholog",
        "confusions": "confus",
        "heureusement": "heureux",
        "possibilité": "possibil",
        "naïves": "naïv",
        "maïs": "maï",
    }
    for w, want in cases.items():
        assert french.stem(w) == want, (w, french.stem(w), want)


def test_chain_membership():
    """French joins the analyzer chain; snowball.c:213-219 semantics
    (first length-change on the ORIGINAL token wins) hold for an
    english+french chain."""
    from letarette_spark.analysis import porter2

    vocab = []
    with gzip.open(GOLDENS, "rt", encoding="utf-8") as f:
        for i, line in enumerate(f):
            if i % 31 == 0:
                vocab.append(line.split("\t")[0])

    def chain_expected(word, langs):
        stems = {"english": porter2.stem, "french": french.stem}
        out = word
        for lang in langs:
            out = stems[lang](word)
            if len(out.encode("utf-8")) != len(word.encode("utf-8")):  # byte rule, snowball.c:216
                break
        return out

    order_matters = [
        w
        for w in vocab
        if chain_expected(w, ("english", "french"))
        != chain_expected(w, ("french", "english"))
    ]
    assert order_matters, "fixture vocabulary must exercise chain order"
    for langs in (("english", "french"), ("french", "english"), ("french",)):
        an = Analyzer(AnalyzerConfig(languages=langs))
        for w in vocab[:300] + order_matters[:50]:
            if 3 <= len(w.encode("utf-8")) <= 40:
                assert an.term_of(w) == chain_expected(w, langs), (w, langs)


def test_rank_identity(spark, tmp_path):
    """Whole-pipeline identity under the french chain via pre-stemming:
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

    cfg = AnalyzerConfig(languages=("french",))
    an = Analyzer(cfg)
    words = (
        "maisons jardins enfants parlaient chantaient mangeront trouvera "
        "nationaux généraux heureusement sérieusement possibilités "
        "confusions psychologie activités créativité mouvements "
        "gouvernements châteaux oiseaux merveilleuse ancienne européenne "
        "de la le et un une que pour"
    ).split()
    rng = random.Random(7)
    docs = []
    for i in range(40):
        title = " ".join(rng.choices(words, k=rng.randint(1, 3)))
        body = " ".join(rng.choices(words, k=rng.randint(8, 25)))
        docs.append((i + 1, title, body))

    root = str(tmp_path / "fr_rank_idx")
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
    for q in ("maisons", "jardins enfants", "châteaux -confusions",
              '"jardins enfants"'):
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
