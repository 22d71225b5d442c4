"""Letarette query grammar: parse, reduce, canonicalize.

Grammar (documented at /root/reference/internal/letarette/parser.go:17-42,
golden cases in parser_test.go:25-244 — behavior reimplemented, not code):

- whitespace separates phrases; parentheses are stripped outside quotes;
- ``-`` before a phrase (attached or as a lone token) marks exclusion;
  a ``-`` inside or at the end of a word is part of the word;
- ``*`` after a phrase (attached or as a lone token) marks prefix search;
  a ``*`` also terminates a word (``cat*litter`` = ``cat*`` + ``litter``);
- double-quoted strings are multi-word phrases, with backslash escapes
  (Go text/scanner string rules).

Reduce (parser.go:124-162): drop words of <= 1 rune from every phrase,
drop phrases left empty. Canonicalize (parser.go:166-199): lowercase,
dedupe, sort — used for cache keys and equivalence.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, replace

_WORD_BREAK = set(' \t\n\r\v\f"()*')

# reducePhrase regexes (parser.go:123-126): \pL = unicode letter. Python's
# [^\W\d_] is exactly the unicode-letter class, so [\W\d_] is Go's \PL.
_NON_LETTER = r"[\W\d_]"
_LETTER = r"[^\W\d_]"
_SINGLE_MID = re.compile(_NON_LETTER + _LETTER + _NON_LETTER)
_SINGLE_START = re.compile("^" + _LETTER + _NON_LETTER)
_SINGLE_END = re.compile(_NON_LETTER + _LETTER + "$")
_WHITESPACES = re.compile(r"\s+")


@dataclass(frozen=True)
class Phrase:
    text: str
    wildcard: bool = False
    exclude: bool = False

    def __str__(self) -> str:
        quoted = f'"{self.text}"' if any(c.isspace() for c in self.text) or not self.text else self.text
        return ("-" if self.exclude else "") + quoted + ("*" if self.wildcard else "")


def parse_query(query: str) -> list[Phrase]:
    phrases: list[Phrase] = []
    pending_exclude = False
    i, n = 0, len(query)
    while i < n:
        c = query[i]
        if c.isspace() or c in "()":
            i += 1
            continue
        if c == "*":
            if phrases:
                phrases[-1] = replace(phrases[-1], wildcard=True)
            i += 1
            continue
        if c == '"':
            i += 1
            buf = []
            while i < n and query[i] != '"':
                if query[i] == "\\" and i + 1 < n:
                    i += 1
                buf.append(query[i])
                i += 1
            i += 1  # closing quote (or end)
            text = "".join(buf)
            wildcard = False
            if i < n and query[i] == "*":
                wildcard = True
                i += 1
            phrases.append(Phrase(text, wildcard=wildcard, exclude=pending_exclude))
            pending_exclude = False
            continue
        # word (may start with '-')
        exclude = pending_exclude
        if c == "-":
            j = i + 1
            if j >= n or query[j].isspace() or query[j] in "()":
                pending_exclude = True
                i = j
                continue
            if query[j] == '"' or query[j] == "*":
                # '-' directly before a quote/star: treat as exclusion marker
                pending_exclude = True
                i = j
                continue
            exclude = True
            i = j
        start = i
        while i < n and query[i] not in _WORD_BREAK:
            i += 1
        word = query[start:i]
        wildcard = False
        if i < n and query[i] == "*":
            wildcard = True
            i += 1
        if word:
            phrases.append(Phrase(word, wildcard=wildcard, exclude=exclude))
            pending_exclude = False
    return phrases


def _reduce_text(text: str) -> str:
    """Faithful port of reducePhrase (parser.go:133-148): a 1-rune phrase
    is cut unless it is a NUMBER (unicode.IsNumber), and inside longer
    phrases only single LETTERS (\\pL, digits excluded) flanked by
    non-letters are stripped — so 'error 7' keeps the lone digit, and the
    regex passes run in the reference's exact order (mid, start, end,
    whitespace collapse)."""
    # the Go cut is BYTE-length based: a single multi-byte rune ('å') has
    # len > 1 in Go, skips the cut, and survives the \pL regexes (they
    # need a flanking non-letter) — only 1-BYTE non-number phrases die
    if len(text.encode("utf-8")) == 1 and not text.isnumeric():
        return ""
    t = _SINGLE_MID.sub(" ", text)
    t = _SINGLE_START.sub(" ", t)
    t = _SINGLE_END.sub(" ", t)
    t = _WHITESPACES.sub(" ", t)
    return t.strip()


def reduce_phrases(phrases: list[Phrase]) -> list[Phrase]:
    """Strip un-indexable 1-rune words; drop emptied phrases
    (parser.go:133-162)."""
    out = []
    for p in phrases:
        text = _reduce_text(p.text)
        if not text:
            continue
        out.append(replace(p, text=text))
    return out


def canonicalize(phrases: list[Phrase]) -> tuple[tuple[bool, str, bool], ...]:
    """Canonical key: lowercase, dedupe, sort (parser.go:166-199)."""
    s = {(p.exclude, p.text.lower(), p.wildcard) for p in phrases}
    return tuple(sorted(s))


def compile_match_string(phrases: list[Phrase], near_range: int = 15) -> str:
    """FTS5 match expression, exactly as the reference compiles it
    (db_search.go:27-56): includes -> NEAR("p1" "p2" ..., 15), excludes ->
    NOT (e1 OR e2). Used by the test oracle to query real FTS5; the Spark
    engine executes the same IR natively (query/executor.py)."""

    def q(p: Phrase) -> str:
        body = '"' + p.text.replace('"', '""') + '"'
        return body + ("*" if p.wildcard else "")

    includes = [p for p in phrases if not p.exclude]
    excludes = [p for p in phrases if p.exclude]
    if not includes:
        return ""
    if len(includes) == 1:
        m = q(includes[0])
    else:
        m = "NEAR(" + " ".join(q(p) for p in includes) + f", {near_range})"
    if excludes:
        m += " NOT (" + " OR ".join(q(p) for p in excludes) + ")"
    return m
