"""Snowball French stemmer — pure Python, bit-exact to the compiled
libstemmer 'french' UTF-8 stemmer (snowball 2.2.0) the reference links
against (reference internal/snowball/byggfil fetches libstemmer_c;
snowball.c:210-220 runs the configured stemmer chain over folded
tokens). Pinned by tests/test_french_goldens.py against 47,510 vectors
captured from the compiled library.

Implements the published French algorithm
(snowballstem.org/algorithms/french/stemmer.html):

  prelude: mark u/i between vowels, y next to a vowel, and u after q as
      consonants (U I Y); ë -> He, ï -> Hi (H is a consonant marker)
  regions: RV (after an initial two-vowel pair or par/col/tap: position
      3; else after the first vowel past position 0), standard R1/R2
  step 1: standard suffixes (with the ic/iv/at/eus/abl/iqU/ièr/abil
      follow-up chains); amment/emment/ment(s) strip but fall through
      to the verb steps
  step 2a: i-verb suffixes in RV preceded by a non-vowel (not H) in RV
  step 2b: other verb suffixes in RV (ions needs R2; the a-family also
      strips a preceding e in RV)
  step 3 (only after step 1/2 success): final Y -> i, ç -> c
  step 4 (only after step 1/2 failure): residual s / ion / ier / e
  always: undouble enn/onn/ett/ell/eill, unaccent é/è before trailing
      non-vowels; postlude unmarks U I Y He Hi
"""

from __future__ import annotations

_V = frozenset("aeiouyâàëéêèïîôûù")

_STEP1_A = (
    "ances", "iqUes", "ismes", "ables", "istes", "ance", "iqUe", "isme",
    "able", "iste", "eux",
)
_STEP1_B = ("atrices", "ateurs", "ations", "atrice", "ateur", "ation")
_STEP1_SUFFIXES = sorted(
    [
        *_STEP1_A, *_STEP1_B, "logies", "logie", "usions", "utions",
        "usion", "ution", "ences", "ence", "ements", "ement", "ités",
        "ité", "ives", "ifs", "ive", "if", "eaux", "aux", "euses",
        "euse", "issements", "issement", "amment", "emment", "ments",
        "ment",
    ],
    key=len,
    reverse=True,
)

_I_VERB = sorted(
    [
        "îmes", "ît", "îtes", "i", "ie", "ies", "ir", "ira", "irai",
        "iraIent", "irais", "irait", "iras", "irent", "irez", "iriez",
        "irions", "irons", "iront", "is", "issaIent", "issais", "issait",
        "issant", "issante", "issantes", "issants", "isse", "issent",
        "isses", "issez", "issiez", "issions", "issons", "it",
    ],
    key=len,
    reverse=True,
)

_VERB_E = (
    "eraIent", "erions", "èrent", "erais", "erait", "erez", "eriez",
    "erons", "eront", "erai", "eras", "ées", "era", "iez", "ez", "és",
    "ée", "er", "é",
)
_VERB_A = (
    "assions", "assiez", "assent", "aIent", "antes", "asses", "âmes",
    "âtes", "ante", "ants", "asse", "ais", "ait", "ant", "as", "ai",
    "ât", "a",
)
_VERB_SUFFIXES = sorted(
    ["ions", *_VERB_E, *_VERB_A], key=len, reverse=True
)

_KEEP_S = frozenset("aiouès")

_RESIDUAL = sorted(
    ["ion", "ier", "ière", "Ier", "Ière", "e"], key=len, reverse=True
)

_DOUBLES = ("eill", "enn", "onn", "ett", "ell")


def _prelude(word: str) -> str:
    """repeat goto ( mark-rules ): left-to-right, each application
    resumes from where the matched rule left the cursor."""
    w = list(word)
    p = 0
    while p < len(w):
        c = w[p]
        nxt = w[p + 1] if p + 1 < len(w) else ""
        # ë/ï unmark FIRST (they win over the vowel-context branches
        # when both could apply, e.g. 'ëy…'), and the scan resumes AT
        # the inserted e/i so it can anchor the next marking ('ëuit')
        if c == "ë":
            w[p : p + 1] = ["H", "e"]
            p += 1
            continue
        if c == "ï":
            w[p : p + 1] = ["H", "i"]
            p += 1
            continue
        if c in _V and nxt in ("u", "i"):
            # following-vowel context is a TEST (non-consuming): the
            # scan resumes right after the marked letter, so that vowel
            # can itself anchor the next marking (e.g. a[u]o[u]i)
            if p + 2 < len(w) and w[p + 2] in _V:
                w[p + 1] = "U" if nxt == "u" else "I"
                p += 2
                continue
        if c in _V and nxt == "y":
            w[p + 1] = "Y"
            p += 2
            continue
        if c == "y" and nxt in _V:
            w[p] = "Y"
            p += 1
            continue
        if c == "q" and nxt == "u":
            w[p + 1] = "U"
            p += 2
            continue
        p += 1
    return "".join(w)


def _regions(w: str) -> tuple[int, int, int]:
    n = len(w)
    # RV
    pv = n
    if n >= 3 and w[0] in _V and w[1] in _V:
        pv = 3
    elif w[:3] in ("par", "col", "tap"):
        pv = 3
    else:
        for i in range(1, n):
            if w[i] in _V:
                pv = i + 1
                break
    # R1 / R2
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


# standard_suffix outcomes
_FAIL = 0       # no change; try step 2a on the original word
_DONE = 1       # changed; go to step 3
_CONTINUE = 2   # ment-family stripped; still try step 2a/2b


def _standard_suffix(w: str, pv: int, p1: int, p2: int):
    suf = None
    for s in _STEP1_SUFFIXES:
        if w.endswith(s):
            suf = s
            break
    if suf is None:
        return w, _FAIL
    s = len(w) - len(suf)

    if suf in _STEP1_A:
        if s >= p2:
            return w[:s], _DONE
        return w, _FAIL
    if suf in _STEP1_B:
        if s < p2:
            return w, _FAIL
        w = w[:s]
        if w.endswith("ic"):
            t = len(w) - 2
            w = w[:t] if t >= p2 else w[:t] + "iqU"
        return w, _DONE
    if suf in ("logie", "logies"):
        if s >= p2:
            return w[:s] + "log", _DONE
        return w, _FAIL
    if suf in ("usion", "ution", "usions", "utions"):
        if s >= p2:
            return w[:s] + "u", _DONE
        return w, _FAIL
    if suf in ("ence", "ences"):
        if s >= p2:
            return w[:s] + "ent", _DONE
        return w, _FAIL
    if suf in ("ement", "ements"):
        if s < pv:
            return w, _FAIL
        w = w[:s]
        if w.endswith("iv") and len(w) - 2 >= p2:
            w = w[:-2]
            if w.endswith("at") and len(w) - 2 >= p2:
                w = w[:-2]
        elif w.endswith("eus"):
            t = len(w) - 3
            if t >= p2:
                w = w[:t]
            elif t >= p1:
                w = w[:t] + "eux"
        elif w.endswith("abl") and len(w) - 3 >= p2:
            w = w[:-3]
        elif w.endswith("iqU") and len(w) - 3 >= p2:
            w = w[:-3]
        elif (w.endswith("ièr") or w.endswith("Ièr")) and len(w) - 3 >= pv:
            w = w[:-3] + "i"
        return w, _DONE
    if suf in ("ité", "ités"):
        if s < p2:
            return w, _FAIL
        w = w[:s]
        if w.endswith("abil"):
            t = len(w) - 4
            w = w[:t] if t >= p2 else w[:t] + "abl"
        elif w.endswith("ic"):
            t = len(w) - 2
            w = w[:t] if t >= p2 else w[:t] + "iqU"
        elif w.endswith("iv") and len(w) - 2 >= p2:
            w = w[:-2]
        return w, _DONE
    if suf in ("if", "ive", "ifs", "ives"):
        if s < p2:
            return w, _FAIL
        w = w[:s]
        if w.endswith("at") and len(w) - 2 >= p2:
            w = w[:-2]
            if w.endswith("ic"):
                t = len(w) - 2
                w = w[:t] if t >= p2 else w[:t] + "iqU"
        return w, _DONE
    if suf == "eaux":
        return w[:s] + "eau", _DONE
    if suf == "aux":
        if s >= p1:
            return w[:s] + "al", _DONE
        return w, _FAIL
    if suf in ("euse", "euses"):
        if s >= p2:
            return w[:s], _DONE
        if s >= p1:
            return w[:s] + "eux", _DONE
        return w, _FAIL
    if suf in ("issement", "issements"):
        if s >= p1 and s >= 1 and w[s - 1] not in _V:
            return w[:s], _DONE
        return w, _FAIL
    if suf == "amment":
        if s >= pv:
            return w[:s] + "ant", _CONTINUE
        return w, _FAIL
    if suf == "emment":
        if s >= pv:
            return w[:s] + "ent", _CONTINUE
        return w, _FAIL
    if suf in ("ment", "ments"):
        if s >= 1 and w[s - 1] in _V and s - 1 >= pv:
            return w[:s], _CONTINUE
        return w, _FAIL
    return w, _FAIL  # pragma: no cover


def _i_verb_suffix(w: str, pv: int):
    # setlimit to RV: the longest suffix FITTING in RV is the among
    # match; its condition then commits (no fallback to shorter entries)
    for suf in _I_VERB:
        if w.endswith(suf) and len(w) - len(suf) >= pv:
            s = len(w) - len(suf)
            if (
                s >= 1
                and s - 1 >= pv
                and w[s - 1] not in _V
                and w[s - 1] != "H"
            ):
                return w[:s], True
            return w, False
    return w, False


def _verb_suffix(w: str, pv: int, p2: int):
    # setlimit to RV: longest suffix fitting in RV wins the among
    for suf in _VERB_SUFFIXES:
        if w.endswith(suf) and len(w) - len(suf) >= pv:
            s = len(w) - len(suf)
            if suf == "ions":
                if s >= p2:
                    return w[:s], True
                return w, False
            if suf in _VERB_E:
                return w[:s], True
            # a-family: also strip a preceding e inside RV
            w = w[:s]
            if w.endswith("e") and len(w) - 1 >= pv:
                w = w[:-1]
            return w, True
    return w, False


def _residual_suffix(w: str, pv: int, p2: int) -> str:
    if w.endswith("s"):
        before = w[-2] if len(w) >= 2 else ""
        if len(w) >= 2 and (
            w[-3:-1] == "Hi" or (before and before not in _KEEP_S)
        ):
            w = w[:-1]
    # setlimit to RV: longest suffix fitting in RV wins the among
    for suf in _RESIDUAL:
        if w.endswith(suf) and len(w) - len(suf) >= pv:
            s = len(w) - len(suf)
            if suf == "ion":
                if s >= p2 and s >= 1 and s - 1 >= pv and w[s - 1] in "st":
                    return w[:s]
                return w
            if suf == "e":
                return w[:s]
            return w[:s] + "i"  # ier / ière / Ier / Ière
    return w


def stem(word: str) -> str:
    w = _prelude(word)
    pv, p1, p2 = _regions(w)

    altered = False
    w2, status = _standard_suffix(w, pv, p1, p2)
    if status == _DONE:
        w = w2
        altered = True
    else:
        w = w2  # _CONTINUE keeps the stripped form; _FAIL is unchanged
        w, ok = _i_verb_suffix(w, pv)
        if ok:
            altered = True
        else:
            w, ok = _verb_suffix(w, pv, p2)
            if ok:
                altered = True

    if altered:
        # step 3
        if w.endswith("Y"):
            w = w[:-1] + "i"
        elif w.endswith("ç"):
            w = w[:-1] + "c"
    else:
        w = _residual_suffix(w, pv, p2)

    # undouble
    for d in _DOUBLES:
        if w.endswith(d):
            w = w[:-1]
            break

    # unaccent: é/è before one-or-more trailing non-vowels -> e
    # (H is a consonant here: a stripped He/Hi marker exposes the accent)
    i = len(w) - 1
    while i >= 0 and w[i] not in _V:
        i -= 1
    if i >= 0 and i < len(w) - 1 and w[i] in "éè":
        w = w[:i] + "e" + w[i + 1 :]

    # postlude
    out = []
    i = 0
    while i < len(w):
        c = w[i]
        if c == "H":
            nxt = w[i + 1] if i + 1 < len(w) else ""
            if nxt == "e":
                out.append("ë")
                i += 2
                continue
            if nxt == "i":
                out.append("ï")
                i += 2
                continue
            i += 1
            continue
        if c == "I":
            out.append("i")
        elif c == "U":
            out.append("u")
        elif c == "Y":
            out.append("y")
        else:
            out.append(c)
        i += 1
    return "".join(out)
