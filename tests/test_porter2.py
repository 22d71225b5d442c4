"""Porter2 (Snowball english) golden cases, hand-derived from the published
algorithm (snowballstem.org/algorithms/english/stemmer.html) — the stemmer
the reference uses via libstemmer (snowball.c:296)."""

from __future__ import annotations

import pytest

from letarette_spark.analysis import porter, porter2

GOLDEN = [
    # step 1a
    ("caresses", "caress"),
    ("mistresses", "mistress"),
    ("ties", "tie"),
    ("cries", "cri"),
    ("gas", "gas"),
    ("this", "this"),
    ("dogs", "dog"),
    ("gaps", "gap"),
    ("kiwis", "kiwi"),
    # step 1b
    ("agreed", "agre"),
    ("falling", "fall"),
    ("hopping", "hop"),
    ("hoping", "hope"),
    ("meetings", "meet"),
    ("owed", "owe"),
    ("rating", "rate"),
    # step 1c / y handling
    ("cry", "cri"),
    ("by", "by"),
    ("say", "say"),
    ("yearly", "year"),
    ("happy", "happi"),
    # steps 2-4
    ("relational", "relat"),
    ("conditional", "condit"),
    ("rational", "ration"),
    ("sensational", "sensat"),
    ("happiness", "happi"),
    ("universities", "univers"),
    ("generic", "generic"),
    ("knightly", "knight"),
    # step 5 / ll
    ("controlling", "control"),
    ("roll", "roll"),
    ("falls", "fall"),
    # exceptional forms
    ("skis", "ski"),
    ("skies", "sky"),
    ("dying", "die"),
    ("lying", "lie"),
    ("tying", "tie"),
    ("idly", "idl"),
    ("gently", "gentl"),
    ("ugly", "ugli"),
    ("early", "earli"),
    ("only", "onli"),
    ("singly", "singl"),
    ("sky", "sky"),
    ("news", "news"),
    ("atlas", "atlas"),
    ("cosmos", "cosmos"),
    ("bias", "bias"),
    ("andes", "andes"),
    # post-1a exceptions
    ("inning", "inning"),
    ("outing", "outing"),
    ("canning", "canning"),
    ("herring", "herring"),
    ("proceed", "proceed"),
    ("exceed", "exceed"),
    ("succeed", "succeed"),
]


@pytest.mark.parametrize("word,expected", GOLDEN, ids=[g[0] for g in GOLDEN])
def test_porter2_golden(word, expected):
    assert porter2.stem(word) == expected


def test_departures_from_porter1():
    """Cases where Porter2 intentionally differs from the original Porter —
    guards against accidentally wiring the wrong stemmer into the
    'letarette' analyzer mode."""
    assert porter2.stem("dying") == "die" and porter.stem("dying") == "dy"
    assert porter2.stem("news") == "news" and porter.stem("news") == "new"
    assert porter2.stem("skies") == "sky" and porter.stem("skies") == "ski"
    assert porter2.stem("early") == "earli"


def test_short_words_pass_through():
    for w in ("a", "ab", "is", "be", ""):
        assert porter2.stem(w) == w
