"""unicode61-style base tokenization.

Reimplements (from the public SQLite FTS5 documentation, not code) the
behavior of the ``unicode61`` tokenizer that the reference's custom tokenizer
wraps (/root/reference/internal/snowball/snowball.c:68-74 wraps unicode61 with
``remove_diacritics`` — snowball.go:78-85):

- token characters are codepoints in Unicode general categories L* and N*;
  everything else separates tokens — with SQLite's own quirks on top (its
  tables predate current Unicode: unassigned and private-use codepoints are
  token chars, most combining marks are SEPARATORS, and only the marks in
  its remove-diacritics table continue a token);
- tokens are case-folded (simple per-character lowercase, SQLite's table);
- diacritics are removed ("remove_diacritics 2") for characters in SQLite's
  diacritic table.

The heuristic below (isalnum + NFD-strip-lower) matches FTS5 for the
overwhelming majority of codepoints; every divergence — probed exhaustively
over all 1.1M codepoints against the live FTS5 by
tools/gen_unicode61_table.py — is overlaid from the generated exception
table (u61data.py: class ranges + fold overrides).  Parity is asserted by
tests/test_tokenizer_parity.py against Python's sqlite3 (live FTS5 oracle).
"""

from __future__ import annotations

import re
import unicodedata
from bisect import bisect_right
from functools import lru_cache

from letarette_spark.analysis import u61data

# Runs of Unicode alphanumerics (L* and N* categories). \w == alnum + '_',
# so [^\W_] == alnum exactly.
_TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)

_CLS_STARTS = tuple(r[0] for r in u61data.CLS_RANGES)
_FI_STARTS = tuple(r[0] for r in u61data.FOLD_IDENT_RANGES)


@lru_cache(maxsize=65536)
def _classify(c: str) -> str:
    """FTS5 unicode61 class of one codepoint: 't' = token char,
    's' = separator, 'd' = diacritic mark (continues a token, folds
    to ''). Exception ranges first (probed from the live FTS5), then
    the category heuristic."""
    cp = ord(c)
    i = bisect_right(_CLS_STARTS, cp) - 1
    if i >= 0:
        a, b, k = u61data.CLS_RANGES[i]
        if cp <= b:
            return k
    if unicodedata.category(c) in ("Mn", "Me"):
        return "d"
    return "t" if c.isalnum() else "s"


@lru_cache(maxsize=65536)
def _fold_char(c: str) -> str:
    cp = ord(c)
    if cp in u61data.FOLD_EXC:  # e.g. ς -> σ, µ -> μ (SQLite's fold table)
        return u61data.FOLD_EXC[cp]
    i = bisect_right(_FI_STARTS, cp) - 1
    if i >= 0 and cp <= u61data.FOLD_IDENT_RANGES[i][1]:
        return c
    d = unicodedata.normalize("NFD", c)
    if ord(d[0]) < 128:
        # Latin/ASCII base: strip the combining marks (remove_diacritics 2).
        return "".join(ch for ch in d if unicodedata.category(ch) != "Mn").lower()
    # Non-Latin base (Greek ά, Cyrillic ё, ...): FTS5 keeps the precomposed
    # character; simple per-char case fold (no context-sensitive final sigma).
    return c.lower()


def fold(token: str) -> str:
    """Case-fold and strip diacritics from a single raw token.

    Empirically matched to FTS5 unicode61(remove_diacritics 2): diacritics
    are stripped only from characters whose NFD base is ASCII (ø/ł/ð/ß and
    Greek/Cyrillic precomposed characters pass through), then simple
    lowercase. Verified property-based against the live FTS5 tokenizer in
    tests/test_tokenizer_parity.py.
    """
    if token.isascii():
        return token.lower()
    return "".join(_fold_char(c) for c in token)


def raw_tokens(
    text: str,
    token_chars: frozenset[str] = frozenset(),
    separators: frozenset[str] = frozenset(),
) -> list[tuple[str, int, int]]:
    """Split *text* into unicode61 tokens.

    Returns ``[(folded_token, start_char, end_char), ...]`` in document
    order. Character (not byte) offsets — sufficient for snippet assembly.

    ``token_chars`` / ``separators`` override the category rules for
    specific characters (FTS5 ``tokenchars`` / ``separators`` options —
    the reference exposes them as config, internal/letarette/config.go:64-65;
    separators win over tokenchars, matching FTS5).

    Empirical FTS5 behavior (probed exhaustively by
    tools/gen_unicode61_table.py, verified in
    tests/test_tokenizer_parity.py): only the marks in SQLite's
    remove-diacritics table *continue* a token (and are stripped from
    its text); all other combining marks — Arabic harakat included —
    and Mc marks are separators. ASCII text can't contain marks, so it
    takes the fast regex path.
    """
    if text.isascii() and not token_chars and not separators:
        return [
            (m.group(0).lower(), m.start(), m.end()) for m in _TOKEN_RE.finditer(text)
        ]
    out: list[tuple[str, int, int]] = []
    start = -1
    chars: list[str] = []
    for i, c in enumerate(text):
        if c in separators:
            cls = "s"
        elif c in token_chars:
            cls = "t"
        else:
            cls = _classify(c)
        if cls == "t":
            if start < 0:
                start = i
            chars.append(c)
        elif cls == "d" and start >= 0:
            continue  # mark continues the token; dropped from its text
        else:
            if start >= 0:
                out.append((fold("".join(chars)), start, i))
                start = -1
                chars = []
    if start >= 0:
        out.append((fold("".join(chars)), start, len(text)))
    return out
