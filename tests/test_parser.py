"""Parser golden cases ported (behaviorally) from the reference's
internal/letarette/parser_test.go:25-244 — see FIXTURES.md §4."""

from __future__ import annotations

import pytest

from letarette_spark.query.parser import (
    Phrase,
    canonicalize,
    compile_match_string,
    parse_query,
    reduce_phrases,
)


def P(text, wildcard=False, exclude=False):
    return Phrase(text, wildcard=wildcard, exclude=exclude)


GOLDEN = [
    ("cat dog banana", [P("cat"), P("dog"), P("banana")]),
    (
        "cat -dog banana - fishtank",
        [P("cat"), P("dog", exclude=True), P("banana"), P("fishtank", exclude=True)],
    ),
    (
        "cat* -dog * banana - fishtank",
        [
            P("cat", wildcard=True),
            P("dog", wildcard=True, exclude=True),
            P("banana"),
            P("fishtank", exclude=True),
        ],
    ),
    (
        "cat- cat-litter - -dog -",
        [P("cat-"), P("cat-litter"), P("dog", exclude=True)],
    ),
    (
        'cat* cat*litter "*dog*"',
        [P("cat", wildcard=True), P("cat", wildcard=True), P("litter"), P("*dog*")],
    ),
    (
        '"cat - * - dog" "kawo\\"nka"*',
        [P("cat - * - dog"), P('kawo"nka', wildcard=True)],
    ),
    ('""dog""', [P(""), P("dog"), P("")]),
    ('(WinkelWolt) )))((( "()"', [P("WinkelWolt"), P("()")]),
]


@pytest.mark.parametrize("query,expected", GOLDEN, ids=[g[0] for g in GOLDEN])
def test_parse_golden(query, expected):
    assert parse_query(query) == expected


def test_reduce():
    # parser_test.go:219-226: 1-rune words removed, emptied phrases dropped
    phrases = parse_query('rökare a a "b b" - angle "grinder u"*t')
    reduced = reduce_phrases(phrases)
    assert [p.text for p in reduced] == ["rökare", "angle", "grinder"]
    assert reduced[2].wildcard  # the quoted phrase kept its prefix flag


def test_canonicalize_equivalence():
    # parser_test.go:231-236
    a = canonicalize(parse_query("Yabba* -Dabba Doo Doo"))
    b = canonicalize(parse_query('-daBBa -dAbBa "DOO" "YABBA" *'))
    assert a == b


def test_compile_match_string():
    # db_search.go:27-56 shapes
    assert compile_match_string(parse_query("bike")) == '"bike"'
    assert (
        compile_match_string(parse_query("london city"))
        == 'NEAR("london" "city", 15)'
    )
    assert (
        compile_match_string(parse_query("london -city"))
        == '"london" NOT ("city")'
    )
    assert compile_match_string(parse_query("speedway mud*")) == (
        'NEAR("speedway" "mud"*, 15)'
    )
    assert compile_match_string(parse_query("-only -excludes")) == ""


def test_reduce_keeps_single_digit_words():
    # reducePhrase cuts 1-rune words only when !unicode.IsNumber — 'error 7'
    # keeps the lone digit (the index keeps all-digit tokens too)
    reduced = reduce_phrases(parse_query("error 7 x"))
    assert [p.text for p in reduced] == ["error", "7"]
    reduced = reduce_phrases(parse_query('"error 7 x"'))
    assert [p.text for p in reduced] == ["error 7"]


def test_reduce_regex_order_matches_reference():
    # reducePhrase applies \PL\pL\PL, then ^\pL\PL, then \PL\pL$ in order
    # (parser.go:139-145) — single letters flanked by non-letters vanish,
    # single digits survive (\pL excludes digits)
    from letarette_spark.query.parser import _reduce_text

    assert _reduce_text("7") == "7"
    assert _reduce_text("b") == ""
    assert _reduce_text("error 7") == "error 7"
    assert _reduce_text("a 7 b") == "7"
    assert _reduce_text("x-y") == ""          # both letters are single runs
    assert _reduce_text("grinder u") == "grinder"


def test_reduce_keeps_single_multibyte_letters():
    # the Go cut is byte-length based: len("å") == 2 bytes, so a 1-rune
    # non-ASCII phrase survives (and the \pL regexes need flanking
    # non-letters, so they leave it alone too)
    from letarette_spark.query.parser import _reduce_text

    assert _reduce_text("å") == "å"
    assert _reduce_text("b") == ""
    # flanked single letters still die regardless of byte width — the
    # \pL regexes are rune-based (Go: "ö x" -> "")
    assert _reduce_text("ö x") == ""
    assert _reduce_text("åland ö") == "åland"
