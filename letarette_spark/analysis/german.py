"""Snowball German stemmer — pure Python, bit-exact to the compiled
libstemmer 'german' UTF-8 stemmer the reference links against
(internal/snowball/byggfil; sb_stemmer_new(lang, "UTF_8"),
snowball.c:296).

Implements the published German algorithm (snowballstem.org/algorithms/
german/stemmer.html, classic revision — verified against the compiled
library: no ae/oe/ue -> umlaut folding, i.e. not the german2 variant):

  pre:   ß -> ss; u and y BETWEEN vowels are marked as consonants
  vowels: a e i o u y ä ö ü
  R1/R2 standard, with R2 computed from the UNADJUSTED R1 scan and R1
      then clamped so >= 3 letters precede it (verified: 'ewigkeit' ->
      'ewig' requires R2 from the raw p1)
  step 1 (longest in R1): em ern er | e en es (then a trailing 'niss'
      loses one s) | s after a valid s-ending (b d f g h k l m n r t)
  step 2 (longest in R1): en er est | st after a valid st-ending
      (b d f g h k l m n t) itself preceded by >= 3 letters
  step 3 (d-suffixes): end ung (R2; then a preceding ig in R2 not after
      e also goes) | ig ik isch (R2, not after e) | lich heit (R2; then
      a preceding er/en in R1 goes) | keit (R2; then a preceding lich or
      ig in R2 goes)
  post:  unmark consonant U/Y, strip umlauts ä ö ü -> a o u

Pinned by tests/test_german_goldens.py against vectors captured from the
compiled library (tools/gen_snowball_goldens.py --lang german)."""

from __future__ import annotations

_VOWELS = frozenset("aeiouyäöü")
_S_ENDINGS = frozenset("bdfghklmnrt")
_ST_ENDINGS = frozenset("bdfghklmnt")


def _regions(word: str) -> tuple[int, int]:
    """(r1, r2) start indices: standard scan for p1 and p2, then the
    German >=3-letter clamp applied to p1 ONLY (p2 keeps the raw scan)."""
    n = len(word)
    p1 = p2 = n
    i = 0
    while i < n - 1:
        if word[i] in _VOWELS and word[i + 1] not in _VOWELS:
            p1 = i + 2
            break
        i += 1
    i = p1
    while i < n - 1:
        if word[i] in _VOWELS and word[i + 1] not in _VOWELS:
            p2 = i + 2
            break
        i += 1
    return max(p1, 3), p2


def stem(word: str) -> str:
    word = word.replace("ß", "ss")
    # mark intervocalic u/y as consonants (internal uppercase)
    if "u" in word or "y" in word:
        chars = list(word)
        for i in range(1, len(chars) - 1):
            if (
                chars[i] in ("u", "y")
                and chars[i - 1] in _VOWELS
                and chars[i + 1] in _VOWELS
            ):
                chars[i] = chars[i].upper()
        word = "".join(chars)

    r1, r2 = _regions(word)

    # ---- step 1 ----
    for suf in ("ern", "em", "er"):
        if word.endswith(suf) and len(word) - len(suf) >= r1:
            word = word[: -len(suf)]
            break
    else:
        for suf in ("en", "es", "e"):
            if word.endswith(suf) and len(word) - len(suf) >= r1:
                word = word[: -len(suf)]
                if word.endswith("niss"):
                    word = word[:-1]
                break
        else:
            if (
                word.endswith("s")
                and len(word) - 1 >= r1
                and len(word) >= 2
                and word[-2] in _S_ENDINGS
            ):
                word = word[:-1]

    # ---- step 2 ----
    for suf in ("est", "en", "er"):
        if word.endswith(suf) and len(word) - len(suf) >= r1:
            word = word[: -len(suf)]
            break
    else:
        if (
            word.endswith("st")
            and len(word) - 2 >= r1
            and len(word) >= 6  # st-ending char at index >= 3
            and word[-3] in _ST_ENDINGS
        ):
            word = word[:-2]

    # ---- step 3 (longest d-suffix first) ----
    if word.endswith("isch"):
        if len(word) - 4 >= r2 and (len(word) < 5 or word[-5] != "e"):
            word = word[:-4]
    elif word.endswith("lich") or word.endswith("heit"):
        if len(word) - 4 >= r2:
            word = word[:-4]
            for pre in ("er", "en"):
                if word.endswith(pre) and len(word) - 2 >= r1:
                    word = word[:-2]
                    break
    elif word.endswith("keit"):
        if len(word) - 4 >= r2:
            word = word[:-4]
            if word.endswith("lich") and len(word) - 4 >= r2:
                word = word[:-4]
            elif word.endswith("ig") and len(word) - 2 >= r2:
                word = word[:-2]
    elif word.endswith("end") or word.endswith("ung"):
        if len(word) - 3 >= r2:
            word = word[:-3]
            if (
                word.endswith("ig")
                and len(word) - 2 >= r2
                and (len(word) < 3 or word[-3] != "e")
            ):
                word = word[:-2]
    elif word.endswith("ig") or word.endswith("ik"):
        if len(word) - 2 >= r2 and (len(word) < 3 or word[-3] != "e"):
            word = word[:-2]

    # ---- post: unmark + strip umlauts ----
    out = []
    for c in word:
        if c == "U":
            out.append("u")
        elif c == "Y":
            out.append("y")
        elif c == "ä":
            out.append("a")
        elif c == "ö":
            out.append("o")
        elif c == "ü":
            out.append("u")
        else:
            out.append(c)
    return "".join(out)
