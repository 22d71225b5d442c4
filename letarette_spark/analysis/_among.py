"""Faithful reimplementation of the snowball runtime's backwards
among() matcher.

The bit-exact stemmers in this package originally used naive
longest-suffix matching, which agrees with the snowball runtime
almost everywhere — but NOT when a `setlimit` window cuts a longer
candidate mid-comparison.  The real matcher (find_among_b in the
public snowball runtime, utilities.c) is a binary search over
entries sorted by reversed BYTE string, treating a limit hit as
"text smaller", followed by a walk down substring_i fail-links from
the landing entry.  Which shorter entry (if any) is reachable after
a limit hit depends on the byte sort order and the fail-link chain —
e.g. Armenian 'բությանն' falls back from 'ությանն' to 'ն' inside the
R2 window, while 'մեծությանն' lands where no link reaches 'ն' and
the among fails.  Only a faithful port reproduces both.

Everything is BYTE-level: libstemmer's UTF-8 stemmers compare
unsigned chars, and trailing-byte order of multibyte sequences does
not track codepoint order, so a char-level binary search against the
byte-sorted tables can misnavigate.  Tables are fed in the EXACT
order recovered from the compiled library's data section
(tools/extract_among.py), including each entry's substring_i link.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence


class Among(NamedTuple):
    s: bytes          # entry text (matched right-to-left as a suffix)
    substring_i: int  # fail-link: index of next-shorter candidate, -1 = none
    result: int       # branch id returned on a full match


def make_amongs(entries) -> tuple[Among, ...]:
    """entries: iterable of (text, substring_i, result) with str text."""
    return tuple(
        Among(s.encode("utf-8"), sub_i, res) for s, sub_i, res in entries
    )


def find_among_b(
    word: bytes, c: int, lb: int, v: Sequence[Among]
) -> tuple[int, int]:
    """Match an entry as a suffix of word[lb:c] (byte offsets).

    Returns (result, new_c): the matched branch id and the cursor
    after removing the matched span, or (0, c) when nothing matches.
    Mirrors utilities.c find_among_b including the limit-hit
    'diff = -1' and the substring_i walk.
    """
    i = 0
    j = len(v)
    common_i = 0
    common_j = 0
    first_key_inspected = False
    while True:
        k = i + ((j - i) >> 1)
        diff = 0
        common = min(common_i, common_j)
        w = v[k]
        for i2 in range(len(w.s) - 1 - common, -1, -1):
            if c - common == lb:
                diff = -1
                break
            diff = word[c - 1 - common] - w.s[i2]
            if diff != 0:
                break
            common += 1
        if diff < 0:
            j = k
            common_j = common
        else:
            i = k
            common_i = common
        if j - i <= 1:
            if i > 0:
                break
            if j == i:
                break
            if first_key_inspected:
                break
            first_key_inspected = True
    while True:
        w = v[i]
        if common_i >= len(w.s):
            return w.result, c - len(w.s)
        i = w.substring_i
        if i < 0:
            return 0, c


def find_among(
    word: bytes, c: int, l: int, v: Sequence[Among]
) -> tuple[int, int]:
    """Forward (prefix) variant: match an entry at word[c:l].

    Returns (result, new_c) with new_c = c + matched length, or
    (0, c).  Mirrors utilities.c find_among — used by stemmers with
    initial morphology (e.g. Irish eclipsis/lenition prefixes).
    """
    i = 0
    j = len(v)
    common_i = 0
    common_j = 0
    first_key_inspected = False
    while True:
        k = i + ((j - i) >> 1)
        diff = 0
        common = min(common_i, common_j)
        w = v[k]
        for i2 in range(common, len(w.s)):
            if c + common == l:
                diff = -1
                break
            diff = word[c + common] - w.s[i2]
            if diff != 0:
                break
            common += 1
        if diff < 0:
            j = k
            common_j = common
        else:
            i = k
            common_i = common
        if j - i <= 1:
            if i > 0:
                break
            if j == i:
                break
            if first_key_inspected:
                break
            first_key_inspected = True
    while True:
        w = v[i]
        if common_i >= len(w.s):
            return w.result, c + len(w.s)
        i = w.substring_i
        if i < 0:
            return 0, c
