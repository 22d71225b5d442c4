"""Snowball Indonesian stemmer — pure Python, bit-exact to the
compiled libstemmer 'indonesian' UTF-8 stemmer (snowball 2.2.0).
Pinned by tests/test_indonesian_goldens.py against the golden vectors
captured from the compiled library (reference internal/snowball/
byggfil; snowball.c:210-220 chain semantics).

Implements the published Indonesian algorithm
(snowballstem.org/algorithms/indonesian/stemmer.html), with the
prefix-class suffix restrictions derived by probing the compiled
stemmer:

  measure = vowel count (a i u e o); every step needs measure > 2
  1 particle kah/lah/pun; 2 possessive ku/mu/nya
  3 first-order prefix: di/meng/men/me/ter (class 1), ke/peng/pen/
    peny/pem (class 2), meny -> s, mem+vowel -> p
  4 if a first-order prefix was removed: suffix kan/an/i (class-
    restricted), then a second-order prefix
    else: second-order prefix ber / bel+ajar / be+C+er (class 4),
    per / pel+ajar / pe (class 3), then suffix
  suffix restrictions: class 1 allows kan/i, class 2 allows an,
    class 3 allows an/i, class 4 allows kan/an; a blocked longer
    suffix falls through to a nested shorter one (kan -> an)
"""

from __future__ import annotations

_V = frozenset("aiueo")


def _measure(w: str) -> int:
    return sum(1 for c in w if c in _V)


def _remove_particle(w: str) -> str:
    for suf in ("kah", "lah", "pun"):
        if w.endswith(suf):
            return w[:-3]
    return w


def _remove_possessive(w: str) -> str:
    for suf in ("nya", "ku", "mu"):
        if w.endswith(suf):
            return w[: -len(suf)]
    return w


def _first_order_prefix(w: str):
    """Returns (word, prefix_class or None, recoded)."""
    if w.startswith("meny") and len(w) > 4 and w[4] in _V:
        return "s" + w[4:], 1, True
    if w.startswith("peny") and len(w) > 4 and w[4] in _V:
        return "s" + w[4:], 2, True
    if w.startswith("mem") and len(w) > 3 and w[3] in _V:
        return "p" + w[3:], 1, True
    if w.startswith("pem") and len(w) > 3 and w[3] in _V:
        return "p" + w[3:], 2, True
    for pre, cls in (("meng", 1), ("men", 1), ("mem", 1), ("me", 1),
                     ("di", 1), ("ter", 1),
                     ("peng", 2), ("pen", 2), ("pem", 2), ("ke", 2)):
        if w.startswith(pre):
            return w[len(pre):], cls, False
    return w, None, False


def _second_order_prefix(w: str):
    if w.startswith("belajar"):
        return w[3:], 4
    if w.startswith("ber"):
        return w[3:], 4
    if (
        w.startswith("be")
        and len(w) > 4
        and w[2] not in _V
        and w[3:5] == "er"
    ):
        return w[2:], 4
    if w.startswith("pelajar"):
        # pel+ajar imposes no suffix restriction (probe-derived:
        # pelajarkan -> ajar, pelajaran -> ajar, pelajari -> ajar)
        return w[3:], 0
    if w.startswith("per"):
        return w[3:], 3
    if w.startswith("pe"):
        return w[2:], 3
    return w, None


_ALLOWED = {
    None: {"kan", "an", "i"},
    0: {"kan", "an", "i"},
    1: {"kan", "i"},
    2: {"an"},
    3: {"an", "i"},
    4: {"kan", "an"},
}


def _remove_suffix(w: str, cls):
    allowed = _ALLOWED[cls]
    # longest match with fall-through on a blocked nested suffix
    if w.endswith("kan"):
        if "kan" in allowed:
            return w[:-3], True
        if "an" in allowed:
            return w[:-2], True
        return w, False
    if w.endswith("an"):
        if "an" in allowed:
            return w[:-2], True
        return w, False
    if w.endswith("i"):
        # -i never strips after s (the compiled stemmer's guard)
        if "i" in allowed and not w.endswith("si"):
            return w[:-1], True
        return w, False
    return w, False


def stem(word: str) -> str:
    w = word
    if _measure(w) <= 2:
        return w
    w = _remove_particle(w)
    if _measure(w) <= 2:
        return w
    w = _remove_possessive(w)
    if _measure(w) <= 2:
        return w

    w2, cls, recoded = _first_order_prefix(w)
    if cls is not None:
        w = w2
        if _measure(w) > 2:
            w3, removed = _remove_suffix(w, cls)
            if removed:
                w = w3
                # a recoded prefix (meny->s, mem->p) restored a stem
                # letter; the apparent per-/ber- is part of the stem
                if not recoded and _measure(w) > 2:
                    w4, cls2 = _second_order_prefix(w)
                    if cls2 is not None:
                        w = w4
        return w

    w2, cls = _second_order_prefix(w)
    if cls is not None:
        w = w2
    if _measure(w) > 2:
        w3, removed = _remove_suffix(w, cls)
        if removed:
            w = w3
    return w
