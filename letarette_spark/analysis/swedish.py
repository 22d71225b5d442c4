"""Snowball Swedish stemmer — pure Python, bit-exact to the compiled
libstemmer 'swedish' UTF-8 stemmer the reference links against
(reference internal/snowball/byggfil fetches libstemmer_c;
snowball.c:210-220 runs the configured stemmer chain over folded tokens).

Implements the published Swedish algorithm (snowballstem.org/algorithms/
swedish/stemmer.html, classic revision — verified against the compiled
library: no '-et' handling, unlimited s-ending lookback):

  vowels: a e i o u y ä å ö
  R1: after the first non-vowel following a vowel, but never before
      position 3 (the region before R1 keeps >= 3 letters)
  step 1: longest suffix in R1 among the 36 unconditional endings ->
      delete; else 's' in R1 preceded (possibly outside R1) by a valid
      s-ending -> delete. The 'among' commits to the longest suffix that
      FITS in R1 — a failed s-ending check deletes nothing.
  step 2: dd gd nn dt gt kt tt in R1 -> drop last letter
  step 3: lig ig els in R1 -> delete; löst -> lös; fullt -> full

Pinned by tests/test_swedish_goldens.py against vectors captured from the
compiled library (tools/gen_snowball_goldens.py --lang swedish), the same
oracle technique as the english Porter2 goldens.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouyäåö")
_S_ENDINGS = frozenset("bcdfghjklmnoprtvy")

# step 1 unconditional endings, longest-first (ties keep list order; all
# distinct lengths matter only for the longest-match scan)
_STEP1 = sorted(
    [
        "a", "arna", "erna", "heterna", "orna", "ad", "e", "ade", "ande",
        "arne", "are", "aste", "en", "anden", "aren", "heten", "ern", "ar",
        "er", "heter", "or", "as", "arnas", "ernas", "ornas", "es", "ades",
        "andes", "ens", "arens", "hetens", "erns", "at", "andet", "het",
        "ast",
    ],
    key=len,
    reverse=True,
)

_STEP2 = ("dd", "gd", "nn", "dt", "gt", "kt", "tt")

# step 3: (suffix, replacement); delete entries replace with ""
_STEP3 = [("fullt", "full"), ("löst", "lös"), ("lig", ""), ("els", ""), ("ig", "")]


def _r1(word: str) -> int:
    """Start index of R1 with the Swedish >=3-letters adjustment.

    The first non-vowel following the first vowel is always immediately
    preceded by a vowel, so an adjacent (vowel, non-vowel) scan finds it."""
    n = len(word)
    p1 = n
    for i in range(n - 1):
        if word[i] in _VOWELS and word[i + 1] not in _VOWELS:
            p1 = i + 2
            break
    return max(p1, 3)


def stem(word: str) -> str:
    if len(word) < 2:
        return word
    r1 = _r1(word)

    # ---- step 1 (longest suffix fitting in R1; 's' is conditional) ----
    for suf in _STEP1:
        if word.endswith(suf) and len(word) - len(suf) >= r1:
            word = word[: -len(suf)]
            break
    else:
        if (
            word.endswith("s")
            and len(word) - 1 >= r1
            and len(word) >= 2
            and word[-2] in _S_ENDINGS
        ):
            word = word[:-1]

    # ---- step 2 (drop one letter) ----
    for suf in _STEP2:
        if word.endswith(suf) and len(word) - 2 >= r1:
            word = word[:-1]
            break

    # ---- step 3 ----
    for suf, rep in _STEP3:
        if word.endswith(suf) and len(word) - len(suf) >= r1:
            word = word[: -len(suf)] + rep
            break
    return word
