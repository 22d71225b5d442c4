"""Snowball Dutch stemmer — pure Python, bit-exact to the compiled
libstemmer 'dutch' UTF-8 stemmer (snowball 2.2.0) the reference links
against (reference internal/snowball/byggfil fetches libstemmer_c;
snowball.c:210-220 runs the configured stemmer chain over folded
tokens). Pinned by tests/test_dutch_goldens.py against 22,586 vectors
captured from the compiled library.

Implements the published Dutch algorithm
(snowballstem.org/algorithms/dutch/stemmer.html):

  prelude: strip umlauts/acutes (ä ë ï ö ü á é í ó ú -> plain); mark
      initial y, y after a vowel, and i between vowels as Y/I
  vowels: a e i o u y è
  R1 (>= 3 clamp) / R2 standard
  step 1: heden -> heid (R1); en/ene in R1 after a non-vowel not 'gem'
      -> delete + kk/dd/tt undouble; s/se in R1 after a non-vowel
      other than j -> delete
  step 2: e in R1 after a non-vowel -> delete + undouble (sets e_found)
  step 3a: heid in R2 not after c -> delete, then an en as in step 1
  step 3b: end/ing (R2) -> delete then ig (R2, not after e) or
      undouble; ig (R2, not after e); lijk (R2) then step 2 again;
      baar (R2); bar (R2, only if step 2 fired)
  step 4: undouble aa/ee/oo/uu between consonants (final consonant
      not I): maan -> man
  postlude: unmark Y I
"""

from __future__ import annotations

_V = frozenset("aeiouyè")

_DEACCENT = str.maketrans("äëïöüáéíóú", "aeiouaeiou")


def _prelude(word: str) -> str:
    w = list(word.translate(_DEACCENT))
    if w and w[0] == "y":
        w[0] = "Y"
    p = 0
    while p < len(w):
        c = w[p]
        nxt = w[p + 1] if p + 1 < len(w) else ""
        if c in _V and nxt == "i":
            # following-vowel context is a TEST: resume after the mark
            if p + 2 < len(w) and w[p + 2] in _V:
                w[p + 1] = "I"
                p += 2
                continue
        if c in _V and nxt == "y":
            w[p + 1] = "Y"
            p += 2
            continue
        p += 1
    return "".join(w)


def _regions(w: str) -> tuple[int, int]:
    n = len(w)

    def _after_v_nonv(start: int) -> int:
        i = start
        while i < n and w[i] not in _V:
            i += 1
        while i < n and w[i] in _V:
            i += 1
        return i + 1 if i < n else n

    p1u = _after_v_nonv(0)
    # p2 continues from the UNCLAMPED p1 (the sbl clamps after setmark)
    p2 = _after_v_nonv(p1u) if p1u < n else n
    # the >=3 clamp is a literal BYTE position in the sbl ($p1 = 3), so
    # 'è' counts as 2 — find the first char boundary at byte offset >= 3
    off = 0
    clamp = n
    for i in range(n + 1):
        if off >= 3:
            clamp = i
            break
        if i < n:
            off += len(w[i].encode("utf-8"))
    p1 = max(p1u, clamp)
    return p1, p2


def _undouble(w: str) -> str:
    for d in ("kk", "dd", "tt"):
        if w.endswith(d):
            return w[:-1]
    return w


def _en_ending(w: str, s: int, p1: int):
    """en/ene removal conditions at suffix start *s*: R1, preceded by a
    non-vowel, and not preceded by 'gem'. Returns (word, ok)."""
    if (
        s >= p1
        and s >= 1
        and w[s - 1] not in _V
        and w[max(0, s - 3) : s] != "gem"
    ):
        return _undouble(w[:s]), True
    return w, False


def stem(word: str) -> str:
    w = _prelude(word)
    p1, p2 = _regions(w)

    # ---- step 1 (longest among: heden | en/ene | s/se) ----
    if w.endswith("heden"):
        s = len(w) - 5
        if s >= p1:
            w = w[:s] + "heid"
    elif w.endswith("ene"):
        w, _ = _en_ending(w, len(w) - 3, p1)
    elif w.endswith("en"):
        w, _ = _en_ending(w, len(w) - 2, p1)
    elif w.endswith("se"):
        s = len(w) - 2
        if s >= p1 and s >= 1 and w[s - 1] not in _V and w[s - 1] != "j":
            w = w[:s]
    elif w.endswith("s"):
        s = len(w) - 1
        if s >= p1 and s >= 1 and w[s - 1] not in _V and w[s - 1] != "j":
            w = w[:s]

    # ---- step 2 ----
    e_found = False
    if w.endswith("e") and len(w) - 1 >= p1 and len(w) >= 2 and w[-2] not in _V:
        w = _undouble(w[:-1])
        e_found = True

    # ---- step 3a: heid ----
    if w.endswith("heid") and len(w) - 4 >= p2 and w[len(w) - 5 : len(w) - 4] != "c":
        w = w[:-4]
        if w.endswith("en"):
            w, _ = _en_ending(w, len(w) - 2, p1)

    # ---- step 3b (longest among) ----
    if w.endswith("end") or w.endswith("ing"):
        s = len(w) - 3
        if s >= p2:
            w = w[:s]
            if (
                w.endswith("ig")
                and len(w) - 2 >= p2
                and w[len(w) - 3 : len(w) - 2] != "e"
            ):
                w = w[:-2]
            else:
                w = _undouble(w)
    elif w.endswith("lijk"):
        s = len(w) - 4
        if s >= p2:
            w = w[:s]
            # repeat step 2
            if (
                w.endswith("e")
                and len(w) - 1 >= p1
                and len(w) >= 2
                and w[-2] not in _V
            ):
                w = _undouble(w[:-1])
    elif w.endswith("baar"):
        s = len(w) - 4
        if s >= p2:
            w = w[:s]
    elif w.endswith("ig"):
        s = len(w) - 2
        if s >= p2 and w[s - 1 : s] != "e":
            w = w[:s]
    elif w.endswith("bar"):
        s = len(w) - 3
        if s >= p2 and e_found:
            w = w[:s]

    # ---- step 4: undouble vowel (C V V D, D not I) ----
    if len(w) >= 4:
        c, v1, v2, d = w[-4], w[-3], w[-2], w[-1]
        if (
            c not in _V
            and d not in _V
            and d != "I"
            and v1 == v2
            and v1 in "aeou"
        ):
            w = w[:-2] + d

    # postlude
    return w.replace("Y", "y").replace("I", "i")
