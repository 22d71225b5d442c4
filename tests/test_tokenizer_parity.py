"""Tokenizer parity vs live SQLite FTS5 (unicode61 + porter).

These tests pin the single most correctness-critical contract (SURVEY.md
§1.4): the Spark engine's analyzer must emit exactly the token stream FTS5
would, or every df/tf statistic and BM25 score silently drifts.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from letarette_spark.analysis import unicode61
from letarette_spark.analysis.tokenizer import Analyzer, AnalyzerConfig
from tests.fts5_oracle import fts5_tokenize

# Alphabet exercising: case folding, digits, separators, diacritics (both
# precomposed and combining), complex-fold latin letters, CJK, punctuation,
# and an RTL script (Arabic letters, harakat combining marks, tatweel,
# Arabic-Indic digits, presentation-form ligatures).
ALPHABET = (
    "abcxyzABCXYZ0123456789 \t\n.,;:-_'\"()[]*/\\+=!?@#"
    "éÉüÜåÅñçøØłŁðÐßẞİıάλΣσВгдё"
    "中文界"
    "ابتكلمنهويىةءأإآؤئًَُّْـ٠٣٩ﻻﷲ"
)

WORDS = st.text(alphabet=ALPHABET, min_size=0, max_size=60)


def u61_terms(text: str) -> list[tuple[str, int]]:
    return [(t, i) for i, (t, _s, _e) in enumerate(unicode61.raw_tokens(text))]


class TestUnicode61Parity:
    @pytest.mark.parametrize(
        "text",
        [
            "Hello, World!",
            "foo_bar baz-qux",            # '_' and '-' are separators
            "Crème brûlée à la ÉÅÜ",      # diacritics removed, case folded
            "x1 2x 42 a 7",               # digits are token chars
            "NEAR(p1 p2, 15) NOT e*",
            "øl Øl łódź Ðe ß İstanbul",   # non-decomposable letters pass through
            "étude",                # combining acute: separator char
            "中文 mixed 界 text",
            "",
            "   ",
            "don't stop",
            "0ً0 كِتَابٌ",           # Arabic harakat are SEPARATORS to FTS5
            "مـــدرســـة",           # tatweel is a token char (Lm)
            "ΟΔΥΣΣΕΥΣ οδυσσευς",     # final sigma folds to σ (SQLite table)
            "µ µm ſ",                # micro sign µ -> μ, long s ſ -> ſ
            "a͸b cd",     # unassigned/private-use are token chars
            "x̀y x̕y",     # U+0300 continues+strips, U+0315 separates
        ],
    )
    def test_pinned(self, text):
        assert u61_terms(text) == fts5_tokenize(text, "unicode61 remove_diacritics 2")

    @settings(max_examples=300, deadline=None)
    @given(WORDS)
    def test_property(self, text):
        assert u61_terms(text) == fts5_tokenize(text, "unicode61 remove_diacritics 2")

    @settings(max_examples=300, deadline=None)
    @given(st.text(min_size=0, max_size=40))  # unrestricted: ALL of Unicode
    def test_property_full_unicode(self, text):
        assert u61_terms(text) == fts5_tokenize(text, "unicode61 remove_diacritics 2")


class TestPorterParity:
    @pytest.mark.parametrize(
        "text",
        [
            "running runner ran runs easily",
            "caresses ponies ties caress cats",
            "feed agreed plastered bled motoring sing",
            "conflated troubled sized hopping tanned falling hissing fizzed",
            "failing filing happy sky crying",
            "relational conditional rational valenci hesitanci digitizer",
            "conformabli radicalli differentli vileli analogousli",
            "vietnamization predication operator feudalism",
            "decisiveness hopefulness callousness formaliti sensitiviti sensibiliti",
            "triplicate formative formalize electriciti electrical hopeful goodness",
            "revival allowance inference airliner gyroscopic adjustable defensible",
            "irritant replacement adjustment dependent adoption homologou",
            "communism activate angulariti homologous effective bowdlerize",
            "probate rate cease controll roll archaeology",
            "a ab abc abcd generalization oscillators",
        ],
    )
    def test_pinned(self, text):
        mine = [
            (t.term, t.pos) for t in Analyzer(AnalyzerConfig(mode="porter")).tokens(text)
        ]
        assert mine == fts5_tokenize(text, "porter unicode61 remove_diacritics 2")

    @settings(max_examples=300, deadline=None)
    @given(WORDS)
    def test_property(self, text):
        mine = [
            (t.term, t.pos) for t in Analyzer(AnalyzerConfig(mode="porter")).tokens(text)
        ]
        assert mine == fts5_tokenize(text, "porter unicode61 remove_diacritics 2")


class TestLetaretteRules:
    def test_min_length_drop_with_digit_exemption(self):
        # snowball.c:184-187 — <2 chars dropped unless all ASCII digits.
        a = Analyzer(AnalyzerConfig(mode="letarette", languages=()))
        terms = [t.term for t in a.tokens("a 7 ab 42 x yz")]
        assert terms == ["7", "ab", "42", "yz"]

    def test_positions_have_no_gaps(self):
        a = Analyzer(AnalyzerConfig(mode="letarette", languages=()))
        toks = a.tokens("a big cat x sat")
        assert [t.pos for t in toks] == list(range(len(toks)))
        assert [t.term for t in toks] == ["big", "cat", "sat"]

    def test_stem_window(self):
        # Only tokens of 3..40 bytes are stemmed (snowball.c:27-28, 202).
        a = Analyzer(AnalyzerConfig(mode="letarette", languages=("porter",)))
        long_tok = "x" * 41 + "ing"
        terms = [t.term for t in a.tokens(f"is running {long_tok}")]
        assert terms == ["is", "run", long_tok]

    def test_simple_mode_matches_sql_semantics(self):
        a = Analyzer(AnalyzerConfig(mode="simple"))
        assert a.terms("Foo BAR-baz 42 a_b x 9") == ["foo", "bar", "baz", "42"]


class TestTokencharsSeparators:
    """tokenchars / separators overrides (reference config.go:61-67) —
    verified against live FTS5 with the same options."""

    @pytest.mark.parametrize(
        "text",
        [
            "foo_bar baz-qux",
            "a_b_c d-e_f",
            "under_score-dash mix_42",
            "axb cxd x",          # 'x' as separator
            "__lead _trail_ -x-",
        ],
    )
    def test_parity(self, text):
        from letarette_spark.analysis import unicode61

        mine = [
            (t, i)
            for i, (t, _s, _e) in enumerate(
                unicode61.raw_tokens(
                    text, token_chars=frozenset("_-"), separators=frozenset("x")
                )
            )
        ]
        fts = fts5_tokenize(
            text,
            "unicode61 remove_diacritics 2 tokenchars ''_-'' separators ''x''",
        )
        assert mine == fts

    @settings(max_examples=150, deadline=None)
    @given(st.text(alphabet="abxy_-. 0", min_size=0, max_size=40))
    def test_property(self, text):
        from letarette_spark.analysis import unicode61

        mine = [
            (t, i)
            for i, (t, _s, _e) in enumerate(
                unicode61.raw_tokens(
                    text, token_chars=frozenset("_-"), separators=frozenset("x")
                )
            )
        ]
        fts = fts5_tokenize(
            text,
            "unicode61 remove_diacritics 2 tokenchars ''_-'' separators ''x''",
        )
        assert mine == fts
