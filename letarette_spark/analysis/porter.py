"""Porter (1980) stemming algorithm.

Implemented from the published algorithm description (M. F. Porter, "An
algorithm for suffix stripping", Program 14(3) 1980) including the two
departures present in the widely-distributed ANSI C version that SQLite
FTS5's built-in ``porter`` tokenizer reproduces (step 2: ``bli``→``ble``,
``logi``→``log``). Parity with the live FTS5 porter tokenizer is asserted in
tests/test_tokenizer_parity.py.

The reference engine stems with Snowball ("english" a.k.a. Porter2 —
/root/reference/internal/snowball/snowball.c:296); we ship both: this module
for FTS5-oracle-verified mode, porter2.py for reference-default mode.
"""

from __future__ import annotations

from functools import lru_cache

_VOWELS = frozenset("aeiou")


def _is_cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return True if i == 0 else not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """Number of VC sequences in *stem*."""
    n = 0
    i = 0
    ln = len(stem)
    while True:
        if i >= ln:
            return n
        if not _is_cons(stem, i):
            break
        i += 1
    i += 1
    while True:
        while True:
            if i >= ln:
                return n
            if _is_cons(stem, i):
                break
            i += 1
        i += 1
        n += 1
        while True:
            if i >= ln:
                return n
            if not _is_cons(stem, i):
                break
            i += 1
        i += 1


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _ends_cvc(word: str) -> bool:
    """Stem ends consonant-vowel-consonant, final consonant not w/x/y."""
    if len(word) < 3:
        return False
    if not _is_cons(word, len(word) - 1):
        return False
    if _is_cons(word, len(word) - 2):
        return False
    if not _is_cons(word, len(word) - 3):
        return False
    return word[-1] not in "wxy"


def _step1ab(w: str) -> str:
    if w.endswith("s"):
        if w.endswith("sses"):
            w = w[:-2]
        elif w.endswith("ies"):
            w = w[:-2]
        elif not w.endswith("ss"):
            w = w[:-1]
    flag = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if _has_vowel(w[:-2]):
            w = w[:-2]
            flag = True
    elif w.endswith("ing"):
        if _has_vowel(w[:-3]):
            w = w[:-3]
            flag = True
    if flag:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _ends_cvc(w):
            w += "e"
    return w


def _step1c(w: str) -> str:
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"
    return w


# (suffix, replacement) — applied when measure(stem) > 0, first match wins.
_STEP2 = (
    ("ational", "ate"),
    ("tional", "tion"),
    ("enci", "ence"),
    ("anci", "ance"),
    ("izer", "ize"),
    ("bli", "ble"),
    ("alli", "al"),
    ("entli", "ent"),
    ("eli", "e"),
    ("ousli", "ous"),
    ("ization", "ize"),
    ("ation", "ate"),
    ("ator", "ate"),
    ("alism", "al"),
    ("iveness", "ive"),
    ("fulness", "ful"),
    ("ousness", "ous"),
    ("aliti", "al"),
    ("iviti", "ive"),
    ("biliti", "ble"),
    ("logi", "log"),
)

_STEP3 = (
    ("icate", "ic"),
    ("ative", ""),
    ("alize", "al"),
    ("iciti", "ic"),
    ("ical", "ic"),
    ("ful", ""),
    ("ness", ""),
)

_STEP4 = (
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
)


def _map_suffix(w: str, table, min_measure: int) -> str:
    for suf, rep in table:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > min_measure - 1:
                return stem + rep
            return w
    return w


def _step4(w: str) -> str:
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if suf == "ion" and not stem.endswith(("s", "t")):
                continue
            if _measure(stem) > 1:
                return stem
            return w
    return w


def _step5(w: str) -> str:
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _ends_cvc(w[:-1])):
            w = w[:-1]
    if w.endswith("ll") and _measure(w) > 1:
        w = w[:-1]
    return w


@lru_cache(maxsize=65536)
def stem(word: str) -> str:
    """Porter-stem one lowercase token. Tokens of length <= 2 pass through."""
    if len(word) <= 2:
        return word
    w = _step1ab(word)
    w = _step1c(w)
    w = _map_suffix(w, _STEP2, 1)
    w = _map_suffix(w, _STEP3, 1)
    w = _step4(w)
    w = _step5(w)
    return w
