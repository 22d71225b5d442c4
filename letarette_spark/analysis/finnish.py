"""Snowball Finnish stemmer — pure Python, bit-exact to the compiled
libstemmer 'finnish' UTF-8 stemmer (snowball 2.2.0) the reference links
against (reference internal/snowball/byggfil fetches libstemmer_c;
snowball.c:210-220 runs the configured stemmer chain over folded
tokens). Pinned by tests/test_finnish_goldens.py against 36,031 vectors
captured from the compiled library.

Implements the published Finnish algorithm
(snowballstem.org/algorithms/finnish/stemmer.html):

  vowels: a e i o u y ä ö ; R1/R2 standard
  step 1: particles kin/kaan/kään/ko/kö/han/hän/pa/pä after n/t/vowel;
      sti in R2
  step 2: possessives si (not after k), ni (then kse->ksi),
      nsa/nsä/mme/nne, an/än after their case stems, en after lle/ine
  step 3: cases — vowel-harmony hXn forms, siin/den/tten after Vi,
      seen after a long vowel, a/ä after consonant+vowel, tta/ttä
      after e, the ta/ssa/sta/lla/lta/lle/na/ksi/ine family, and n
      (shortening a trailing long vowel or ie)
  step 4: comparatives mpi/mma family (not after po) and
      impi/imma/eja in R2
  step 5: i/j plural if step 3 fired, else t plural after a vowel
      (then imma/mma in R2)
  step 6 tidy (in R1): shorten a final long vowel; drop a final
      a/ä/e/i after a consonant; drop j after o/u; drop o after j;
      then (whole word) undouble a final double consonant that is
      followed only by vowels
"""

from __future__ import annotations

_V = frozenset("aeiouyäö")

_PARTICLES = sorted(
    ["kin", "kaan", "kään", "ko", "kö", "han", "hän", "pa", "pä",
     "sti"],
    key=len,
    reverse=True,
)

_POSS_SIMPLE = ("nsa", "nsä", "mme", "nne")
_POSSESSIVES = sorted(
    ["si", "ni", *_POSS_SIMPLE, "an", "än", "en"], key=len, reverse=True
)

# the compiled stemmer's case among carries only these six harmony
# forms — hun/hyn are NOT entries (such words fall through to 'n')
_HARMONY = {"han": "a", "hen": "e", "hin": "i", "hon": "o",
            "hän": "ä", "hön": "ö"}
_CASE_SIMPLE = ("ta", "tä", "ssa", "ssä", "sta", "stä", "lla", "llä",
                "lta", "ltä", "lle", "na", "nä", "ksi", "ine")
_CASES = sorted(
    [*_HARMONY, "siin", "den", "tten", "seen", "a", "ä", "tta", "ttä",
     *_CASE_SIMPLE, "n"],
    key=len,
    reverse=True,
)

_STEP4_GUARDED = ("mpi", "mpa", "mpä", "mmi", "mma", "mmä")
_STEP4_PLAIN = ("impi", "impa", "impä", "immi", "imma", "immä", "eja",
                "ejä")
_STEP4 = sorted([*_STEP4_GUARDED, *_STEP4_PLAIN], key=len, reverse=True)

# NB: yy is NOT a long vowel in the snowball grouping
_LONG_V = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")


def _regions(w: str) -> tuple[int, int]:
    n = len(w)

    def _after_v_nonv(start: int) -> int:
        i = start
        while i < n and w[i] not in _V:
            i += 1
        while i < n and w[i] in _V:
            i += 1
        return i + 1 if i < n else n

    p1 = _after_v_nonv(0)
    p2 = _after_v_nonv(p1) if p1 < n else n
    return p1, p2


def stem(word: str) -> str:
    w = word
    p1, p2 = _regions(w)

    # ---- step 1: particle etc (longest suffix fitting R1) ----
    for suf in _PARTICLES:
        if w.endswith(suf) and len(w) - len(suf) >= p1:
            s = len(w) - len(suf)
            if suf == "sti":
                if s >= p2:
                    w = w[:s]
            elif s >= 1 and (w[s - 1] in _V or w[s - 1] in "nt"):
                w = w[:s]
            break

    # ---- step 2: possessive (longest fitting R1) ----
    for suf in _POSSESSIVES:
        if w.endswith(suf) and len(w) - len(suf) >= p1:
            s = len(w) - len(suf)
            if suf == "si":
                if not (s >= 1 and w[s - 1] == "k"):
                    w = w[:s]
            elif suf == "ni":
                w = w[:s]
                if w.endswith("kse"):
                    w = w[:-1] + "i"
            elif suf in _POSS_SIMPLE:
                w = w[:s]
            elif suf == "an":
                if any(w[:s].endswith(p) for p in
                       ("ta", "ssa", "sta", "lla", "lta", "na")):
                    w = w[:s]
            elif suf == "än":
                if any(w[:s].endswith(p) for p in
                       ("tä", "ssä", "stä", "llä", "ltä", "nä")):
                    w = w[:s]
            else:  # en
                if w[:s].endswith("lle") or w[:s].endswith("ine"):
                    w = w[:s]
            break

    # ---- step 3: case ending ----
    # among semantics here are RETRY-on-condition-failure: when the
    # longest fitting entry's context test fails, the next-longest
    # fitting entry is tried (the unconditional 'n' is the backstop) —
    # observable because den/seen/siin/tten/hXn all nest over 'n'
    ending_removed = False
    for suf in _CASES:
        if not (w.endswith(suf) and len(w) - len(suf) >= p1):
            continue
        s = len(w) - len(suf)
        if suf in _HARMONY:
            if s >= 1 and w[s - 1] == _HARMONY[suf]:
                w = w[:s]
                ending_removed = True
            # a failed harmony condition ABORTS the whole step (commit
            # semantics) — unlike the Vi/LV/e/cv entries, which fall
            # through to shorter fitting entries ('n' is the backstop)
            break
        elif suf in ("siin", "den", "tten"):
            # Vi uses the restricted vowel grouping (V2: no y)
            if s >= 2 and w[s - 1] == "i" and w[s - 2] in "aeiouäö":
                w = w[:s]
                ending_removed = True
                break
        elif suf == "seen":
            if s >= 2 and w[s - 2 : s] in _LONG_V:
                w = w[:s]
                ending_removed = True
                break
        elif suf in ("a", "ä"):
            # cv condition; failure commits (aborts the step)
            if s >= 2 and w[s - 1] in _V and w[s - 2] not in _V:
                w = w[:s]
                ending_removed = True
            break
        elif suf in ("tta", "ttä"):
            # e condition; failure commits (aborts the step)
            if s >= 1 and w[s - 1] == "e":
                w = w[:s]
                ending_removed = True
            break
        elif suf in _CASE_SIMPLE:
            w = w[:s]
            ending_removed = True
            break
        else:  # n
            w = w[:s]
            ending_removed = True
            if w[-2:] in _LONG_V or w.endswith("ie"):
                w = w[:-1]
            break

    # ---- step 4: other endings (longest fitting R2) ----
    for suf in _STEP4:
        if w.endswith(suf) and len(w) - len(suf) >= p2:
            s = len(w) - len(suf)
            if suf in _STEP4_GUARDED:
                if not w[:s].endswith("po"):
                    w = w[:s]
            else:
                w = w[:s]
            break

    # ---- step 5: plurals ----
    if ending_removed:
        if w and w[-1] in "ij" and len(w) - 1 >= p1:
            w = w[:-1]
    else:
        if (
            w.endswith("t")
            and len(w) - 1 >= p1
            and len(w) >= 2
            and w[-2] in _V
        ):
            w = w[:-1]
            for suf in ("imma", "mma"):
                if w.endswith(suf) and len(w) - len(suf) >= p2:
                    s = len(w) - len(suf)
                    if suf == "mma" and w[:s].endswith("po"):
                        break
                    w = w[:s]
                    break

    # ---- step 6: tidy (each rule independent, in R1) ----
    if len(w) >= 2 and w[-2:] in _LONG_V and len(w) - 2 >= p1:
        w = w[:-1]
    if (
        len(w) >= 2
        and w[-1] in "aäei"
        and w[-2] not in _V
        and len(w) - 1 >= p1
        and len(w) - 2 >= p1
    ):
        w = w[:-1]
    if (
        w.endswith("j")
        and len(w) >= 2
        and w[-2] in "ou"
        and len(w) - 1 >= p1
        and len(w) - 2 >= p1
    ):
        w = w[:-1]
    if (
        w.endswith("o")
        and len(w) >= 2
        and w[-2] == "j"
        and len(w) - 1 >= p1
        and len(w) - 2 >= p1
    ):
        w = w[:-1]
    # undouble a final double consonant followed only by vowels (whole
    # word, not limited to R1)
    i = len(w) - 1
    while i >= 0 and w[i] in _V:
        i -= 1
    if i >= 1 and w[i] not in _V and w[i - 1] == w[i]:
        w = w[: i] + w[i + 1 :]
    return w
