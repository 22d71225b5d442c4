"""Porter2 ("english") Snowball stemming algorithm.

Implemented from the published algorithm description at
snowballstem.org/algorithms/english/stemmer.html (the same algorithm the
reference links via libstemmer: snowball.c:296 creates
sb_stemmer_new("english", "UTF_8")). Pure Python, lru-cached per token;
applied inside Arrow-batched UDFs.
"""

from __future__ import annotations

from functools import lru_cache

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = frozenset("cdeghkmnrt")

_EXCEPTIONS1 = {
    "skis": "ski",
    "skies": "sky",
    "dying": "die",
    "lying": "lie",
    "tying": "tie",
    "idly": "idl",
    "gently": "gentl",
    "ugly": "ugli",
    "early": "earli",
    "only": "onli",
    "singly": "singl",
    # invariant forms
    "sky": "sky",
    "news": "news",
    "howe": "howe",
    "atlas": "atlas",
    "cosmos": "cosmos",
    "bias": "bias",
    "andes": "andes",
}

_EXCEPTIONS2 = frozenset(
    ["inning", "outing", "canning", "herring", "earring", "proceed", "exceed", "succeed"]
)


def _is_vowel(w: str, i: int) -> bool:
    return w[i] in _VOWELS


def _r1(word: str) -> int:
    """Start of R1: after the first non-vowel following a vowel; special
    prefixes gener-/commun-/arsen- fix R1 at the prefix end."""
    for pre in ("gener", "commun", "arsen"):
        if word.startswith(pre):
            return len(pre)
    for i in range(1, len(word)):
        if not _is_vowel(word, i) and _is_vowel(word, i - 1):
            return i + 1
    return len(word)


def _r2(word: str, r1: int) -> int:
    for i in range(r1 + 1, len(word)):
        if not _is_vowel(word, i) and _is_vowel(word, i - 1):
            return i + 1
    return len(word)


def _short_syllable_at(w: str, i: int) -> bool:
    """Short syllable ending at index i (the vowel is at i, non-vowel at
    i+1): (a) i>0, w[i-1] non-vowel, w[i] vowel, w[i+1] non-vowel not in
    wxY; or (b) i==0, w[0] vowel, w[1] non-vowel."""
    if i == 0:
        return len(w) >= 2 and _is_vowel(w, 0) and not _is_vowel(w, 1)
    return (
        i + 1 < len(w)
        and _is_vowel(w, i)
        and not _is_vowel(w, i + 1)
        and w[i + 1] not in "wxY"
        and not _is_vowel(w, i - 1)
    )


def _ends_short_syllable(w: str) -> bool:
    """Word ends in a short syllable."""
    n = len(w)
    if n >= 3 and _is_vowel(w, n - 2) and not _is_vowel(w, n - 1) and w[n - 1] not in "wxY" and not _is_vowel(w, n - 3):
        return True
    if n == 2 and _is_vowel(w, 0) and not _is_vowel(w, 1):
        return True
    return False


def _is_short(w: str, r1: int) -> bool:
    return r1 >= len(w) and _ends_short_syllable(w)


def _has_vowel(w: str) -> bool:
    return any(c in _VOWELS for c in w)


@lru_cache(maxsize=65536)
def stem(word: str) -> str:
    if len(word) <= 2:
        return word
    w = word
    if w[0] == "'":
        w = w[1:]
    if w in _EXCEPTIONS1:
        return _EXCEPTIONS1[w]

    # mark consonant-y
    if w and w[0] == "y":
        w = "Y" + w[1:]
    w = list(w)
    for i in range(1, len(w)):
        if w[i] == "y" and w[i - 1] in _VOWELS:
            w[i] = "Y"
    w = "".join(w)

    # step 0: strip ', 's, 's'
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break

    r1 = _r1(w)
    r2 = _r2(w, r1)

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith(("ied", "ies")):
        w = w[:-3] + ("i" if len(w) > 4 else "ie")
    elif w.endswith(("us", "ss")):
        pass
    elif w.endswith("s"):
        if any(c in _VOWELS for c in w[:-2]):
            w = w[:-1]

    if w in _EXCEPTIONS2:
        return w

    # step 1b
    if w.endswith(("eed", "eedly")):
        suf = "eedly" if w.endswith("eedly") else "eed"
        if len(w) - len(suf) >= r1:
            w = w[: -len(suf)] + "ee"
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if w.endswith(suf):
                stem_part = w[: -len(suf)]
                if _has_vowel(stem_part):
                    w = stem_part
                    if w.endswith(("at", "bl", "iz")):
                        w += "e"
                    elif w.endswith(_DOUBLES):
                        w = w[:-1]
                    elif _is_short(w, _r1(w)):
                        w += "e"
                    r1 = _r1(w)
                    r2 = _r2(w, r1)
                break

    # step 1c
    if (
        len(w) > 2
        and w[-1] in "yY"
        and w[-2] not in _VOWELS
    ):
        w = w[:-1] + "i"

    # step 2 (longest suffix, in R1)
    step2 = (
        ("ization", "ize"),
        ("ational", "ate"),
        ("fulness", "ful"),
        ("ousness", "ous"),
        ("iveness", "ive"),
        ("tional", "tion"),
        ("biliti", "ble"),
        ("lessli", "less"),
        ("entli", "ent"),
        ("ation", "ate"),
        ("alism", "al"),
        ("aliti", "al"),
        ("ousli", "ous"),
        ("iviti", "ive"),
        ("fulli", "ful"),
        ("enci", "ence"),
        ("anci", "ance"),
        ("abli", "able"),
        ("izer", "ize"),
        ("ator", "ate"),
        ("alli", "al"),
        ("bli", "ble"),
    )
    for suf, rep in step2:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                w = w[: -len(suf)] + rep
            break
    else:
        if w.endswith("ogi"):
            if len(w) - 3 >= r1 and len(w) >= 4 and w[-4] == "l":
                w = w[:-1]
        elif w.endswith("li"):
            if len(w) - 2 >= r1 and len(w) >= 3 and w[-3] in _LI_ENDING:
                w = w[:-2]

    # step 3 (in R1)
    step3 = (
        ("ational", "ate"),
        ("tional", "tion"),
        ("alize", "al"),
        ("icate", "ic"),
        ("iciti", "ic"),
        ("ical", "ic"),
        ("ness", ""),
        ("ful", ""),
    )
    for suf, rep in step3:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                w = w[: -len(suf)] + rep
            break
    else:
        if w.endswith("ative") and len(w) - 5 >= r2:
            w = w[:-5]

    # step 4 (in R2)
    step4 = (
        "ement", "ance", "ence", "able", "ible", "ment",
        "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
        "al", "er", "ic",
    )
    for suf in step4:
        if w.endswith(suf):
            if len(w) - len(suf) >= r2:
                w = w[: -len(suf)]
            break
    else:
        if w.endswith("ion") and len(w) - 3 >= r2 and len(w) >= 4 and w[-4] in "st":
            w = w[:-3]

    # step 5
    r1 = _r1(w)
    r2 = _r2(w, r1)
    if w.endswith("e"):
        if len(w) - 1 >= r2:
            w = w[:-1]
        elif len(w) - 1 >= r1 and not _ends_short_syllable(w[:-1]):
            w = w[:-1]
    elif w.endswith("l") and len(w) - 1 >= r2 and len(w) >= 2 and w[-2] == "l":
        w = w[:-1]

    return w.replace("Y", "y")
