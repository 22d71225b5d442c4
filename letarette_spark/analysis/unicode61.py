"""unicode61-style base tokenization.

Reimplements (from the public SQLite FTS5 documentation, not code) the
behavior of the ``unicode61`` tokenizer that the reference's custom tokenizer
wraps (/root/reference/internal/snowball/snowball.c:68-74 wraps unicode61 with
``remove_diacritics`` — snowball.go:78-85):

- token characters are codepoints in Unicode general categories L* and N*;
  everything else separates tokens (Python's ``str.isalnum`` matches exactly
  L* + N*, which lets us use the regex ``[^\\W_]+`` for run detection);
- tokens are case-folded (simple lowercase);
- diacritics are removed ("remove_diacritics 2"): NFD-decompose, drop
  combining marks (category Mn), plus a small table of Latin characters whose
  diacritic is not a combining mark (stroked/crossed letters) matching the
  "complex" mode-2 behavior.

Parity with the real FTS5 unicode61 is asserted by
tests/test_tokenizer_parity.py against Python's sqlite3 (live FTS5 oracle).
"""

from __future__ import annotations

import re
import unicodedata
from functools import lru_cache

# Runs of Unicode alphanumerics (L* and N* categories). \w == alnum + '_',
# so [^\W_] == alnum exactly.
_TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)

@lru_cache(maxsize=65536)
def _fold_char(c: str) -> str:
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

    Empirical FTS5 behavior (verified in tests/test_tokenizer_parity.py):
    combining marks (categories Mn/Me) *continue* a token but never start
    one, and are stripped from the token text; Mc marks are separators.
    ASCII text can't contain marks, so it takes the fast regex path.
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
            is_tok = False
        elif c in token_chars:
            is_tok = True
        else:
            is_tok = c.isalnum()
        if is_tok:
            if start < 0:
                start = i
            chars.append(c)
        elif start >= 0 and unicodedata.category(c) in ("Mn", "Me"):
            continue  # mark continues the token; dropped from its text
        else:
            if start >= 0:
                out.append((fold("".join(chars)), start, i))
                start = -1
                chars = []
    if start >= 0:
        out.append((fold("".join(chars)), start, len(text)))
    return out
