"""Snowball Norwegian stemmer — pure Python, bit-exact to the compiled
libstemmer 'norwegian' UTF-8 stemmer the reference links against
(reference internal/snowball/byggfil fetches libstemmer_c;
snowball.c:210-220 runs the configured stemmer chain over folded tokens).

Implements the published Norwegian algorithm (snowballstem.org/
algorithms/norwegian/stemmer.html — verified against the compiled
library by tests/test_norwegian_goldens.py):

  vowels: a e i o u y æ å ø
  R1: after the first non-vowel following a vowel, but never before
      position 3 (the region before R1 keeps >= 3 letters)
  step 1: longest suffix in R1 among the 25 unconditional endings ->
      delete; erte/ert -> er; else 's' in R1 preceded (possibly outside
      R1) by a valid s-ending letter, OR by 'k' that itself follows a
      non-vowel -> delete. The 'among' commits to the longest suffix
      that FITS in R1 — a failed s condition deletes nothing.
  step 2: dt vt in R1 -> drop last letter
  step 3: leg eleg ig eig lig elig els lov elov slov hetslov in R1 ->
      delete
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouyæåø")
_S_ENDINGS = frozenset("bcdfghjlmnoprtvyz")

_STEP1_DELETE = sorted(
    [
        "a", "e", "ede", "ande", "ende", "ane", "ene", "hetene", "en",
        "heten", "ar", "er", "heter", "as", "es", "edes", "endes", "enes",
        "hetenes", "ens", "hetens", "ers", "ets", "et", "het", "ast",
    ],
    key=len,
    reverse=True,
)

_STEP3 = sorted(
    ["leg", "eleg", "ig", "eig", "lig", "elig", "els", "lov", "elov",
     "slov", "hetslov"],
    key=len,
    reverse=True,
)


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


def stem(word: str) -> str:
    if len(word) < 2:
        return word
    r1 = _r1(word)

    # ---- step 1: longest suffix fitting in R1 wins the 'among' ----
    # (erte/ert and the conditional s compete with the delete endings on
    # suffix LENGTH — e.g. 'erte' beats 'e' — so scan one merged list)
    n = len(word)
    best = None  # (kind, suffix)
    for suf in _STEP1_DELETE:
        if word.endswith(suf) and n - len(suf) >= r1:
            best = ("delete", suf)
            break
    for suf in ("erte", "ert"):
        if word.endswith(suf) and n - len(suf) >= r1:
            if best is None or len(suf) > len(best[1]):
                best = ("er", suf)
            break
    if best is None and word.endswith("s") and n - 1 >= r1:
        best = ("s", "s")

    if best is not None:
        kind, suf = best
        if kind == "delete":
            word = word[: -len(suf)]
        elif kind == "er":
            word = word[: -len(suf)] + "er"
        else:  # conditional s: check the letter before it (may be < R1)
            if len(word) >= 2 and (
                word[-2] in _S_ENDINGS
                or (
                    word[-2] == "k"
                    and len(word) >= 3
                    and word[-3] not in _VOWELS
                )
            ):
                word = word[:-1]

    # ---- step 2: dt / vt in R1 -> drop the final t ----
    if (word.endswith("dt") or word.endswith("vt")) and len(word) - 2 >= r1:
        word = word[:-1]

    # ---- step 3 ----
    for suf in _STEP3:
        if word.endswith(suf) and len(word) - len(suf) >= r1:
            word = word[: -len(suf)]
            break
    return word
