"""Snowball Italian stemmer — pure Python, bit-exact to the compiled
libstemmer 'italian' UTF-8 stemmer (snowball 2.2.0) the reference links
against (reference internal/snowball/byggfil fetches libstemmer_c;
snowball.c:210-220 runs the configured stemmer chain over folded
tokens). Pinned by tests/test_italian_goldens.py against 49,595 vectors
captured from the compiled library.

Implements the published Italian algorithm
(snowballstem.org/algorithms/italian/stemmer.html):

  prelude: acute accents -> grave (á->à …); qu -> qU; u/i between
      vowels -> U/I (same cursor semantics as the French prelude)
  vowels: a e i o u à è ì ò ù
  RV/R1/R2: the standard Romance regions
  step 0: attached pronoun (ci/gli/la/…/vene) after ando/endo (delete)
      or ar/er/ir (-> e) in RV
  step 1: standard suffixes with ic/iv/at/os/abil chains (amento family
      needs RV, amente needs R1, the rest R2)
  step 2 (if step 1 removed nothing): conjugation endings in RV
  step 3a: final vowel (a e i o à è ì ò) in RV, then an extra i in RV
  step 3b: ch -> c, gh -> g in RV
  postlude: unmark U I
"""

from __future__ import annotations

_V = frozenset("aeiouàèìòù")

_ACUTE_TO_GRAVE = str.maketrans("áéíóú", "àèìòù")

_PRONOUNS = sorted(
    [
        "ci", "gli", "la", "le", "li", "lo", "mi", "ne", "si", "ti",
        "vi", "sene", "gliela", "gliele", "glieli", "glielo", "gliene",
        "mela", "mele", "meli", "melo", "mene", "tela", "tele", "teli",
        "telo", "tene", "cela", "cele", "celi", "celo", "cene", "vela",
        "vele", "veli", "velo", "vene",
    ],
    key=len,
    reverse=True,
)

_STEP1_DELETE_R2 = (
    "anza", "anze", "ico", "ici", "ica", "ice", "iche", "ichi", "ismo",
    "ismi", "abile", "abili", "ibile", "ibili", "ista", "iste", "isti",
    "istà", "istè", "istì", "oso", "osi", "osa", "ose", "mente",
    "atrice", "atrici", "ante", "anti",
)
_STEP1_AZIONE = ("azione", "azioni", "atore", "atori")
_STEP1_SUFFIXES = sorted(
    [
        *_STEP1_DELETE_R2, *_STEP1_AZIONE, "logia", "logie", "uzione",
        "uzioni", "usione", "usioni", "enza", "enze", "amento",
        "amenti", "imento", "imenti", "amente", "ità", "ivo", "ivi",
        "iva", "ive",
    ],
    key=len,
    reverse=True,
)

_STEP2 = sorted(
    [
        "ammo", "ando", "ano", "are", "arono", "asse", "assero", "assi",
        "assimo", "ata", "ate", "ati", "ato", "ava", "avamo", "avano",
        "avate", "avi", "avo", "emmo", "enda", "ende", "endi", "endo",
        "erà", "erai", "eranno", "ere", "erebbe", "erebbero", "erei",
        "eremmo", "eremo", "ereste", "eresti", "erete", "erò", "erono",
        "essero", "ete", "eva", "evamo", "evano", "evate", "evi", "evo",
        "Yamo", "iamo", "immo", "irà", "irai", "iranno", "ire",
        "irebbe", "irebbero", "irei", "iremmo", "iremo", "ireste",
        "iresti", "irete", "irò", "irono", "isca", "iscano", "isce",
        "isci", "isco", "iscono", "issero", "ita", "ite", "iti", "ito",
        "iva", "ivamo", "ivano", "ivate", "ivi", "ivo", "ono", "uta",
        "ute", "uti", "uto", "ar", "ir",
    ],
    key=len,
    reverse=True,
)


def _prelude(word: str) -> str:
    w = list(word.translate(_ACUTE_TO_GRAVE))
    # qu -> qU (global pass)
    for i in range(len(w) - 1):
        if w[i] == "q" and w[i + 1] == "u":
            w[i + 1] = "U"
    # u/i between vowels (following-vowel context is a TEST: the scan
    # resumes right after the marked letter)
    p = 0
    while p < len(w):
        c = w[p]
        nxt = w[p + 1] if p + 1 < len(w) else ""
        if c in _V and nxt in ("u", "i"):
            if p + 2 < len(w) and w[p + 2] in _V:
                w[p + 1] = "U" if nxt == "u" else "I"
                p += 2
                continue
        p += 1
    return "".join(w)


def _regions(w: str) -> tuple[int, int, int]:
    n = len(w)
    pv = n
    if n >= 2:
        if w[0] in _V:
            if w[1] not in _V:
                for i in range(2, n):
                    if w[i] in _V:
                        pv = i + 1
                        break
            else:
                for i in range(2, n):
                    if w[i] not in _V:
                        pv = i + 1
                        break
        else:
            if w[1] in _V:
                if n > 2:
                    pv = 3
            else:
                for i in range(2, n):
                    if w[i] in _V:
                        pv = i + 1
                        break

    def _after_v_nonv(start: int) -> int:
        i = start
        while i < n and w[i] not in _V:
            i += 1
        while i < n and w[i] in _V:
            i += 1
        return i + 1 if i < n else n

    p1 = _after_v_nonv(0)
    p2 = _after_v_nonv(p1) if p1 < n else n
    return pv, p1, p2


def _attached_pronoun(w: str, pv: int) -> str:
    pron = None
    for p in _PRONOUNS:
        if w.endswith(p):
            pron = p
            break
    if pron is None:
        return w
    s = len(w) - len(pron)
    base = w[:s]
    for end in ("ando", "endo"):
        if base.endswith(end) and s - 4 >= pv:
            return base
    for end in ("ar", "er", "ir"):
        if base.endswith(end) and s - 2 >= pv:
            return base + "e"
    return w


def _standard_suffix(w: str, pv: int, p1: int, p2: int):
    suf = None
    for s1 in _STEP1_SUFFIXES:
        if w.endswith(s1):
            suf = s1
            break
    if suf is None:
        return w, False
    s = len(w) - len(suf)

    if suf in _STEP1_DELETE_R2:
        if s >= p2:
            return w[:s], True
        return w, False
    if suf in _STEP1_AZIONE:
        if s < p2:
            return w, False
        w = w[:s]
        if w.endswith("ic") and len(w) - 2 >= p2:
            w = w[:-2]
        return w, True
    if suf in ("logia", "logie"):
        if s >= p2:
            return w[:s] + "log", True
        return w, False
    if suf in ("uzione", "uzioni", "usione", "usioni"):
        if s >= p2:
            return w[:s] + "u", True
        return w, False
    if suf in ("enza", "enze"):
        if s >= p2:
            return w[:s] + "ente", True
        return w, False
    if suf in ("amento", "amenti", "imento", "imenti"):
        if s >= pv:
            return w[:s], True
        return w, False
    if suf == "amente":
        if s < p1:
            return w, False
        w = w[:s]
        if w.endswith("iv") and len(w) - 2 >= p2:
            w = w[:-2]
            if w.endswith("at") and len(w) - 2 >= p2:
                w = w[:-2]
        else:
            for pre in ("os", "ic", "abil"):
                if w.endswith(pre) and len(w) - len(pre) >= p2:
                    w = w[: -len(pre)]
                    break
        return w, True
    if suf == "ità":
        if s < p2:
            return w, False
        w = w[:s]
        for pre in ("abil", "ic", "iv"):
            if w.endswith(pre) and len(w) - len(pre) >= p2:
                w = w[: -len(pre)]
                break
        return w, True
    if suf in ("ivo", "ivi", "iva", "ive"):
        if s < p2:
            return w, False
        w = w[:s]
        if w.endswith("at") and len(w) - 2 >= p2:
            w = w[:-2]
            if w.endswith("ic") and len(w) - 2 >= p2:
                w = w[:-2]
        return w, True
    return w, False  # pragma: no cover


def _verb_suffix(w: str, pv: int):
    # setlimit to RV: longest suffix fitting in RV wins
    for suf in _STEP2:
        if w.endswith(suf) and len(w) - len(suf) >= pv:
            return w[: len(w) - len(suf)], True
    return w, False


def stem(word: str) -> str:
    w = _prelude(word)
    pv, p1, p2 = _regions(w)
    w = _attached_pronoun(w, pv)
    w2, ok = _standard_suffix(w, pv, p1, p2)
    if ok:
        w = w2
    else:
        w, _ = _verb_suffix(w, pv)

    # step 3a: final vowel in RV, then an optional extra i in RV
    if w and w[-1] in "aeioàèìò" and len(w) - 1 >= pv:
        w = w[:-1]
        if w.endswith("i") and len(w) - 1 >= pv:
            w = w[:-1]

    # step 3b: ch -> c, gh -> g in RV
    if (w.endswith("ch") or w.endswith("gh")) and len(w) - 2 >= pv:
        w = w[:-1]

    # postlude
    return w.replace("I", "i").replace("U", "u")
