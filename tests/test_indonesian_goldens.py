"""Snowball Indonesian stemmer: full-vocabulary proof, live library
cross-check, and chain membership.

25,810 (word, stem) golden vectors captured from the compiled
libstemmer 'indonesian' UTF-8 stemmer (snowball 2.2.0). The vocabulary
covers the particle/possessive strips, the first-order prefixes with
their recodings (meny->s, mem+vowel->p) and prefix classes, the
second-order ber/bel+ajar/be+C+er/per/pel+ajar/pe prefixes, the
class-restricted kan/an/i suffixes (incl. the -si guard and the
kan->an fall-through), and the >2-vowel measure gate — plus probe
words that discriminate the class semantics. Regenerate:
python tools/gen_snowball_goldens.py --lang indonesian."""

from __future__ import annotations

import ctypes.util
import gzip
import os
import random

import pytest

from letarette_spark.analysis import indonesian
from letarette_spark.analysis.tokenizer import Analyzer, AnalyzerConfig

GOLDENS = os.path.join(
    os.path.dirname(__file__), "data", "snowball_indonesian_goldens.tsv.gz"
)

_HAVE_LIB = bool(
    ctypes.util.find_library("stemmer")
    or os.path.exists("/usr/lib/x86_64-linux-gnu/libstemmer.so.0d")
)


def test_indonesian_matches_compiled_snowball_goldens():
    bad = []
    n = 0
    with gzip.open(GOLDENS, "rt", encoding="utf-8") as f:
        for line in f:
            word, want = line.rstrip("\n").split("\t")
            n += 1
            got = indonesian.stem(word)
            if got != want:
                bad.append((word, want, got))
    assert n > 20000
    assert not bad, f"{len(bad)}/{n} divergences, first 20: {bad[:20]}"


@pytest.mark.skipif(not _HAVE_LIB, reason="compiled libstemmer not available")
def test_indonesian_matches_live_library_on_fresh_randoms():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from gen_snowball_goldens import SnowballStemmer

    st = SnowballStemmer("indonesian")
    rng = random.Random()  # intentionally unseeded
    alpha = "abcdefghijklmnopqrstuvwxyz" + "aiueo" * 3 + "ng" + "k" * 2
    bad = []
    for _ in range(4000):
        w = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 16)))
        if indonesian.stem(w) != st.stem(w):
            bad.append((w, st.stem(w), indonesian.stem(w)))
    assert not bad, bad[:10]


def test_known_indonesian_forms():
    cases = {
        "memberikan": "beri",
        "menyapu": "sapu",
        "memilih": "pilih",
        "pengambilan": "ambil",
        "kemerdekaan": "merdeka",
        "belajar": "ajar",
        "pelajaran": "ajar",
        "bukunya": "buku",
        "memerdekakanlah": "perdeka",
        "siapapun": "siapa",
    }
    for w, want in cases.items():
        assert indonesian.stem(w) == want, (w, indonesian.stem(w), want)


def test_chain_membership():
    from letarette_spark.analysis import porter2

    vocab = []
    with gzip.open(GOLDENS, "rt", encoding="utf-8") as f:
        for i, line in enumerate(f):
            if i % 17 == 0:
                vocab.append(line.split("\t")[0])

    def chain_expected(word, langs):
        stems = {"english": porter2.stem, "indonesian": indonesian.stem}
        out = word
        for lang in langs:
            out = stems[lang](word)
            if len(out.encode("utf-8")) != len(word.encode("utf-8")):  # byte rule, snowball.c:216
                break
        return out

    for langs in (("english", "indonesian"), ("indonesian", "english")):
        an = Analyzer(AnalyzerConfig(languages=langs))
        for w in vocab[:400]:
            if 3 <= len(w.encode("utf-8")) <= 40:
                assert an.term_of(w) == chain_expected(w, langs), (w, langs)
