"""Snowball Danish stemmer — pure Python, bit-exact to the compiled
libstemmer 'danish' UTF-8 stemmer the reference links against
(reference internal/snowball/byggfil fetches libstemmer_c;
snowball.c:210-220 runs the configured stemmer chain over folded tokens).

Implements the published Danish algorithm (snowballstem.org/algorithms/
danish/stemmer.html — verified against the compiled library by
tests/test_danish_goldens.py):

  vowels: a e i o u y æ å ø
  R1: after the first non-vowel following a vowel, but never before
      position 3
  step 1: longest suffix in R1 among 30 unconditional endings ->
      delete; else 's' in R1 preceded (possibly outside R1) by a valid
      s-ending letter (a b c d f g h j k l m n o p r t v y z å) ->
      delete
  step 2: gd dt gt kt in R1 -> drop last letter
  step 3: word ends 'igst' -> drop 'st' (no R1 condition); then longest
      of ig lig elig els in R1 -> delete AND re-run step 2;
      løst in R1 -> løs
  step 4 (undouble): word ends in a doubled non-vowel whose final copy
      is in R1 -> drop one
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouyæåø")
_S_ENDINGS = frozenset("abcdfghjklmnoprtvyzå")

_STEP1 = sorted(
    [
        "hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene",
        "erne", "ere", "en", "heden", "eren", "er", "heder", "erer",
        "heds", "es", "endes", "erendes", "enes", "ernes", "eres", "ens",
        "hedens", "erens", "ers", "ets", "erets", "et", "eret",
    ],
    key=len,
    reverse=True,
)

_STEP2 = ("gd", "dt", "gt", "kt")

_STEP3_DELETE = sorted(["ig", "lig", "elig", "els"], key=len, reverse=True)


def _r1(word: str) -> int:
    """Start index of R1 with the >=3-letters adjustment (the first
    non-vowel following the first vowel is always immediately preceded
    by a vowel, so an adjacent (vowel, non-vowel) scan finds it)."""
    n = len(word)
    p1 = n
    for i in range(n - 1):
        if word[i] in _VOWELS and word[i + 1] not in _VOWELS:
            p1 = i + 2
            break
    return max(p1, 3)


def _consonant_pair(word: str, r1: int) -> str:
    for suf in _STEP2:
        if word.endswith(suf) and len(word) - 2 >= r1:
            return word[:-1]
    return word


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

    # ---- step 2 ----
    word = _consonant_pair(word, r1)

    # ---- step 3 ----
    if word.endswith("igst"):  # no R1 condition on the st strip
        word = word[:-2]
    if word.endswith("løst") and len(word) - 4 >= r1:
        word = word[:-1]
    else:
        for suf in _STEP3_DELETE:
            if word.endswith(suf) and len(word) - len(suf) >= r1:
                word = word[: -len(suf)]
                word = _consonant_pair(word, r1)
                break

    # ---- step 4: undouble a trailing non-vowel pair ending in R1 ----
    if (
        len(word) >= 2
        and word[-1] == word[-2]
        and word[-1] not in _VOWELS
        and len(word) - 1 >= r1
    ):
        word = word[:-1]
    return word
